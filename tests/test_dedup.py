"""Simhash near-dup property tests (VERDICT r1 #4: the rows-only simhash
operator had no correctness signal).

All inputs are seed-fixed (datagen.synth_text), so the assertions are exact,
not statistical: exact duplicates hash identically, 2-word edits of ≥40-word
docs stay within hamming K, distinct docs from the shared vocab sit above K.
K is token-hash-family dependent — with the pd.util.hash_array (siphash)
family the measured distributions are near-dup ≤ 5 vs distinct ≥ 7, so
K = 6 (margin 1 on each side).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.datagen import synth_text
from layerg_crawler_v2_spark.operators.dedup import hamming64, simhash

LONG_IDS = [i for i in range(200) if len(synth_text(i).split()) >= 40][:10]
K = 6  # near-dup/distinct hamming cut (siphash family; see module docstring)


@pytest.fixture(scope="module")
def hashes(spark):
    rows = []
    for n, i in enumerate(LONG_IDS):
        t = synth_text(i)
        w = t.split()
        w[-1], w[len(w) // 2] = "zzzz", "qqqq"
        rows.append((i, t))                     # original
        rows.append((i + 10_000, t))            # exact duplicate
        rows.append((i + 20_000, " ".join(w)))  # near-dup (2-word edit)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}


def test_exact_dup_identical_simhash(hashes):
    for i in LONG_IDS:
        assert hashes[i] == hashes[i + 10_000]


def test_near_dup_small_hamming(hashes):
    for i in LONG_IDS:
        d = bin((hashes[i] ^ hashes[i + 20_000]) & (2**64 - 1)).count("1")
        assert d <= K, (i, d)


def test_distinct_docs_large_hamming(hashes):
    for a in LONG_IDS[:5]:
        for b in LONG_IDS[5:]:
            d = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            assert d > K, (a, b, d)


def test_minhash_family_parity_on_exact_dups(spark):
    """Both hash families (md5 oracle-portable, xxhash64 production) give
    identical signatures for identical texts, and their LSH band joins both
    surface the exact-dup pair."""
    from layerg_crawler_v2_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(1, synth_text(3)), (2, synth_text(3)), (3, synth_text(4)),
            (4, synth_text(5))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fam in ("md5", "xxhash64"):
        sigs = minhash_signatures(df, n_hashes=8, shingle_n=3, hash_family=fam)
        by_id = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(8))
                 for r in sigs.collect()}
        assert by_id[1] == by_id[2], fam          # exact dups: equal sigs
        assert by_id[1] != by_id[3], fam          # distinct docs: differ
        pairs = {(r["id_a"], r["id_b"]) for r in
                 lsh_candidate_pairs(sigs, n_hashes=8, n_bands=4,
                                     hash_family=fam).collect()}
        assert (1, 2) in pairs, fam


def test_hamming64_column_matches_python(spark, hashes):
    pairs = [(hashes[a], hashes[b]) for a in LONG_IDS[:3] for b in LONG_IDS[3:6]]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = df.select(hamming64(F.col("a"), F.col("b")).alias("d")).collect()
    for (a, b), r in zip(pairs, got):
        assert r["d"] == bin((a ^ b) & (2**64 - 1)).count("1")


# --- connected components (pair evidence -> dedup clusters) -----------------

def _cc_map(spark, edges):
    from layerg_crawler_v2_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_cc_two_components_and_direction_insensitivity(spark):
    # {1,2,3} via 1-2, 3-2 (reversed edge), {7,8}; node 9 absent from pairs
    got = _cc_map(spark, [(1, 2), (3, 2), (7, 8), (8, 7)])
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_cc_long_chain_converges(spark):
    # path 0-1-2-...-19: diameter 19 >> O(log^2 n) star rounds
    got = _cc_map(spark, [(i, i + 1) for i in range(19)])
    assert got == {i: 0 for i in range(20)}


def test_cc_empty_pairs(spark):
    from layerg_crawler_v2_spark.operators.dedup import connected_components

    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_singletons_and_representatives(spark):
    from layerg_crawler_v2_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 4), (4, 5)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert {i: rows[i]["cluster_id"] for i in range(6)} == {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 0, 5: 0
    }
    assert [i for i in range(6) if rows[i]["is_representative"]] == [0, 1, 2, 3]


def test_keep_best_one_survivor_per_cluster_longest_wins(spark, sf_dir):
    """dedup_pipeline_keep_best: exactly one keeper per cluster, and it is
    the longest member (ties -> lowest doc_id). Cross-engine value parity
    is covered by test_oracle_parity; this pins the semantics."""
    import __spark_entry__ as em

    res = em.queries()["dedup_pipeline_keep_best"](spark, sf_dir)
    docs = em._docs2(spark, sf_dir).select(
        "doc_id", F.length("text").alias("n_chars")
    )
    pdf = res.join(docs, "doc_id").toPandas()
    assert len(pdf) == docs.count()
    per = pdf.groupby("cluster_id")
    assert (per["keep"].sum() == 1).all()
    for _, g in pdf[pdf.cluster_id.isin(pdf[~pdf.keep].cluster_id)].groupby(
        "cluster_id"
    ):
        kept = g[g.keep].iloc[0]
        mx = g.n_chars.max()
        assert kept.n_chars == mx
        assert kept.doc_id == g[g.n_chars == mx].doc_id.min()


def test_editdist_pairs_blocking_and_banded_distance(spark):
    from layerg_crawler_v2_spark.operators.dedup import editdist_near_dup_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma felta"),   # 1 edit from doc 1
            (3, "alpha beta XXXXX YYYYY ZZZZZ QQ"),  # same block, far
            (4, "omega psi chi"),             # different block
            (5, "Alpha beta gamma delta!!"),  # normalizes equal to doc 1
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_dist"]
        for r in editdist_near_dup_pairs(docs, max_dist=3).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 5)] == 0
    assert got[(2, 5)] == 1
    assert (1, 3) not in got          # beyond the band -> dropped
    assert all(4 not in p for p in got)  # different block never compared
    # banded result for kept rows equals plain python Levenshtein
    assert set(got.values()) <= {0, 1, 2, 3}


def test_editdist_pairs_partitioning_invariance(spark):
    from layerg_crawler_v2_spark.operators.dedup import editdist_near_dup_pairs

    docs = spark.createDataFrame(
        [(i, f"common prefix body {i % 7} tail") for i in range(60)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, editdist_near_dup_pairs(docs).collect()))
    b = sorted(map(tuple, editdist_near_dup_pairs(docs.repartition(13)).collect()))
    assert a == b and len(a) > 0


# --- incremental LSH (new-batch-vs-index) ----------------------------------

def _incr_fixture(spark):
    from layerg_crawler_v2_spark.operators.dedup import minhash_signatures

    rows = []
    for i in LONG_IDS:
        t = synth_text(i)
        rows.append((i, t))                      # index
        rows.append((i + 10_000, t))             # index: exact dup pair inside index
        rows.append((i + 50_000, t))             # NEW: dup of an indexed doc
    rows.append((50_001 + 10 ** 6, synth_text(LONG_IDS[0])))  # NEW: dup of new
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return minhash_signatures(df, n_hashes=8, shingle_n=3)


def test_incremental_equals_full_filtered(spark):
    from layerg_crawler_v2_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_incremental_pairs,
    )

    sigs = _incr_fixture(spark).cache()
    new = F.col("doc_id") >= 50_000
    full = lsh_candidate_pairs(sigs, n_hashes=8, n_bands=4)
    expect = sorted(
        (r["id_a"], r["id_b"])
        for r in full.filter(
            (F.col("id_a") >= 50_000) | (F.col("id_b") >= 50_000)
        ).collect()
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in lsh_incremental_pairs(sigs, new, n_hashes=8, n_bands=4).collect()
    )
    assert got == expect and len(got) > 0
    # index×index pairs (both sides < 50k) are never emitted
    assert all(b >= 50_000 for _, b in got) or all(
        a >= 50_000 or b >= 50_000 for a, b in got
    )
    sigs.unpersist()


def test_incremental_index_side_not_shuffled(spark):
    from layerg_crawler_v2_spark.operators.dedup import lsh_incremental_pairs

    sigs = _incr_fixture(spark)
    plan = (
        lsh_incremental_pairs(sigs, F.col("doc_id") >= 50_000, n_hashes=8, n_bands=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# --- duplicated_substring_spans (Lee et al. positional form) -----------------

def _span_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_spans_planted_cross_doc(spark):
    from layerg_crawler_v2_spark.operators.dedup import duplicated_substring_spans

    shared = " ".join(f"s{i}" for i in range(12))  # 12 shared words
    a = "a0 a1 a2 a3 " + shared + " a4 a5 a6 a7"   # shared at words 5..16
    b = shared + " b0 b1 b2 b3 b4 b5 b6 b7 b8"     # shared at words 1..12
    out = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicated_substring_spans(
            _span_docs(spark, [(1, a), (2, b)]), k=8
        ).collect()
    }
    # 12-word region, k=8 -> 5 duplicated windows, merged into ONE span each
    assert out == {(1, 5, 16, 5), (2, 1, 12, 5)}


def test_substring_spans_within_doc_repeat(spark):
    from layerg_crawler_v2_spark.operators.dedup import duplicated_substring_spans

    phrase = " ".join(f"p{i}" for i in range(8))
    text = phrase + " x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 " + phrase
    rows = duplicated_substring_spans(
        _span_docs(spark, [(1, text)]), k=8
    ).collect()
    got = sorted((r.span_start, r.span_end) for r in rows)
    assert got == [(1, 8), (19, 26)]


def test_substring_spans_short_doc_and_unique_doc_empty(spark):
    from layerg_crawler_v2_spark.operators.dedup import duplicated_substring_spans

    rows = [(1, "only three words"), (2, " ".join(f"u{i}" for i in range(30)))]
    assert duplicated_substring_spans(_span_docs(spark, rows), k=8).count() == 0


def _brute_jaccard_pairs(texts, n, t_num, t_den):
    """Independent brute-force twin (normalize + shingle + all pairs)."""
    import re as _re

    def shingles(t):
        w = _re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} if len(
            w
        ) >= n else set()

    sets = {i: shingles(t) for i, t in texts.items()}
    out = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if inter * t_den >= t_num * (len(sets[a]) + len(sets[b]) - inter):
                out.append((a, b, inter, len(sets[a]), len(sets[b])))
    return sorted(out)


def test_jaccard_prefix_join_exact_vs_brute_force(spark):
    from layerg_crawler_v2_spark.operators.dedup import jaccard_prefix_join

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",
        3: "the quick brown fox jumps over the lazy dog today",
        4: "completely different words appear in this one document here",
        5: "completely different words appear in this one document here",
        6: "short text",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    got = sorted(
        map(tuple, jaccard_prefix_join(df, t_num=1, t_den=2).collect())
    )
    assert got == _brute_jaccard_pairs(texts, 3, 1, 2)
    # identical docs must be found with inter == sz
    assert any(a == 4 and b == 5 and i == sa == sb for a, b, i, sa, sb in got)


def test_jaccard_prefix_join_fuzz_recall_is_exact(spark):
    """Prefix filtering is EXACT (theorem, not probability): fuzz random
    near-dup corpora and require set-equality with brute force."""
    import random

    from layerg_crawler_v2_spark.operators.dedup import jaccard_prefix_join

    rng = random.Random(411)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    did = 0
    for _ in range(12):
        base = [rng.choice(vocab) for _ in range(rng.randint(5, 25))]
        texts[did] = " ".join(base)
        did += 1
        if rng.random() < 0.7:  # mutated twin
            mut = list(base)
            for _ in range(rng.randint(0, 3)):
                mut[rng.randrange(len(mut))] = rng.choice(vocab)
            texts[did] = " ".join(mut)
            did += 1
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    for t_num, t_den in [(1, 2), (7, 10), (9, 10)]:
        got = sorted(
            map(tuple, jaccard_prefix_join(df, t_num=t_num, t_den=t_den).collect())
        )
        assert got == _brute_jaccard_pairs(texts, 3, t_num, t_den), (t_num, t_den)


def test_jaccard_prefix_join_partitioning_invariant(spark):
    from layerg_crawler_v2_spark.operators.dedup import jaccard_prefix_join

    texts = [(i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7} w{i % 3} tail common")
             for i in range(30)]
    df1 = spark.createDataFrame(texts, "doc_id bigint, text string").repartition(1)
    df2 = spark.createDataFrame(texts, "doc_id bigint, text string").repartition(11)
    a = sorted(map(tuple, jaccard_prefix_join(df1).collect()))
    b = sorted(map(tuple, jaccard_prefix_join(df2).collect()))
    assert a == b and len(a) > 0


def _brute_containment_pairs(texts, n, t_num, t_den):
    """Directional brute force: t of A's shingles inside B."""
    import re as _re

    def shingles(t):
        w = _re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} if len(
            w
        ) >= n else set()

    sets = {i: shingles(t) for i, t in texts.items()}
    out = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a == b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if inter * t_den >= t_num * len(sets[a]):
                out.append((a, b, inter, len(sets[a]), len(sets[b])))
    return sorted(out)


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc embedded verbatim in a long wrapper: containment finds
    the directional pair; Jaccard at the same threshold does not."""
    from layerg_crawler_v2_spark.operators.dedup import (
        containment_prefix_join,
        jaccard_prefix_join,
    )

    snippet = "breaking news the quake struck the coastal town at dawn"
    wrapper = (
        "portal home nav sidebar promo "
        + snippet
        + " related stories footer links copyright terms privacy contact"
        + " more filler words to stretch the wrapper page body even longer"
    )
    texts = {1: snippet, 2: wrapper}
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    cont = sorted(
        map(tuple, containment_prefix_join(df, t_num=4, t_den=5).collect())
    )
    assert cont == _brute_containment_pairs(texts, 3, 4, 5)
    assert any(a == 1 and b == 2 for a, b, *_ in cont)  # snippet -> wrapper
    jac = jaccard_prefix_join(df, t_num=4, t_den=5).collect()
    assert jac == []  # symmetric Jaccard blind to the asymmetric embed


def test_containment_fuzz_recall_is_exact(spark):
    """The overlap prefix theorem is exact: set-equality with brute force
    across random corpora and thresholds."""
    import random

    from layerg_crawler_v2_spark.operators.dedup import containment_prefix_join

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    did = 0
    for _ in range(10):
        base = [rng.choice(vocab) for _ in range(rng.randint(5, 20))]
        texts[did] = " ".join(base)
        did += 1
        if rng.random() < 0.6:  # wrapper-embeds of an earlier doc
            pad = [rng.choice(vocab) for _ in range(rng.randint(3, 12))]
            texts[did] = " ".join(pad + base + pad[::-1])
            did += 1
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    for t_num, t_den in [(1, 2), (4, 5), (1, 1)]:
        got = sorted(
            map(
                tuple,
                containment_prefix_join(df, t_num=t_num, t_den=t_den).collect(),
            )
        )
        assert got == _brute_containment_pairs(texts, 3, t_num, t_den), (
            t_num,
            t_den,
        )


def test_containment_partitioning_invariant(spark):
    from layerg_crawler_v2_spark.operators.dedup import containment_prefix_join

    texts = [
        (i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5} w{i % 3} tail common pad")
        for i in range(24)
    ]
    df1 = spark.createDataFrame(texts, "doc_id bigint, text string").repartition(1)
    df2 = spark.createDataFrame(texts, "doc_id bigint, text string").repartition(9)
    a = sorted(map(tuple, containment_prefix_join(df1).collect()))
    b = sorted(map(tuple, containment_prefix_join(df2).collect()))
    assert a == b and len(a) > 0
