"""Distributed BPE training (operators/bpe.py) vs the independent
sequential textbook implementation — merge lists must be identical,
including argmax tie-breaks and overlapping-run merge semantics."""

from __future__ import annotations

import random

from layerg_crawler_v2_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    encode_reference,
    train_bpe_merges,
    train_bpe_reference,
)


def _merges(spark, texts, n, min_freq=1):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.rank, r.left, r.right, r.merged, r.cnt)
        for r in train_bpe_merges(df, n, min_freq=min_freq)
        .orderBy("rank")
        .collect()
    ]
    want = train_bpe_reference(texts, n, min_freq=min_freq)
    return got, want


def test_textbook_example(spark):
    # the classic low/lower/newest/widest corpus (Sennrich et al. §3.2)
    texts = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    got, want = _merges(spark, [texts[0].strip()], 10)
    assert got == want
    assert got[0][1:4] == ("e", "s", "es")  # es: 6+3=9, the known first merge


def test_overlapping_run_semantics(spark):
    # 'aaaa' -> merge (a,a) twice greedily left-to-right, never (aa,a) first
    got, want = _merges(spark, ["aaaa aaaa aaa b"], 4)
    assert got == want
    assert got[0][1:4] == ("a", "a", "aa")


def test_real_corpus_sample(spark, sf_dir):
    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .limit(120)
        .collect()
    ]
    got, want = _merges(spark, texts, 12)
    assert got == want and len(got) == 12


def test_fuzz_random_corpora(spark):
    rng = random.Random(20260819)
    for trial in range(3):
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 5)))
            for _ in range(30)
        ]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(3, 20)))
            for _ in range(15)
        ]
        got, want = _merges(spark, texts, 8)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_min_freq_prune(spark):
    texts = ["zz zz zz qq", "zz yy"]
    got, want = _merges(spark, texts, 3, min_freq=2)
    assert got == want
    assert all("q" not in m for _, _, _, m, _ in got)


# --- encode (vocabulary-encode + positional rejoin) --------------------------

def _encode(spark, texts, n_merges, parts=4):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)
    merges_df = train_bpe_merges(df, n_merges)
    merges = [
        (r.left, r.right) for r in merges_df.orderBy("rank").collect()
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["tokens"])
        for r in bpe_encode(df, merges_df).collect()
    }
    return got, merges


def test_encode_matches_sequential_reference(spark):
    texts = [
        "low low low low low lower lower newest newest newest widest",
        "newest widest low lower",
        "aaaa aaa aa a low",
    ]
    got, merges = _encode(spark, texts, 10)
    want = encode_reference(texts, merges)
    for i, toks in enumerate(want):
        assert got[i] == (len(toks), toks), f"doc {i}"


def test_encode_round_trip(spark):
    """Stripping token boundaries reconstructs the exact original words —
    encoding is lossless."""
    texts = ["the quick brown fox", "jumps over the lazy dog dog dog"]
    got, _ = _encode(spark, texts, 8)
    for i, t in enumerate(texts):
        joined = "".join(got[i][1])
        assert joined == "".join(w + END_OF_WORD for w in t.split(" "))


def test_encode_partition_independent(spark):
    texts = ["abc abd abe abc " * 3, "abc abd", "xyz abc abd"]
    a, _ = _encode(spark, texts, 6, parts=2)
    b, _ = _encode(spark, texts, 6, parts=16)
    assert a == b


def test_encode_real_corpus_sample(spark, sf_dir):
    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .limit(40)
        .collect()
    ]
    got, merges = _encode(spark, texts, 8)
    want = encode_reference(texts, merges)
    assert len(got) == len(want)
    for i, toks in enumerate(want):
        assert got[i] == (len(toks), toks), f"doc {i}"
