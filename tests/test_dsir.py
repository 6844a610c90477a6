"""DSIR importance-resampling invariants (operators/dsir.py).

The oracle-parity replica (tests/test_oracle_parity.py) already checks
both entry-registry forms bit-for-bit against DuckDB; these tests pin the
operator-level properties the SQL comparison can't express: partitioning
invariance, weight monotonicity toward the target distribution, the
Gumbel-top-k selection-probability ordering, and the degenerate-input
edges (empty text, wrong model size).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.dsir import (
    N_BUCKETS,
    dsir_resample_topk,
    fit_logratio_micro,
    gram_buckets,
    importance_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gram_buckets_unigrams_and_bigrams(spark):
    df = _docs(spark, [(1, "Ab cd ef"), (2, "solo"), (3, ""), (4, "9 42 ")])
    out = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", gram_buckets("text").alias("b")).collect()
    }

    def bkt(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % N_BUCKETS

    assert out[1] == [bkt(g) for g in ["ab", "cd", "ef", "ab cd", "cd ef"]]
    assert out[2] == [bkt("solo")]  # no bigrams from one token
    assert out[3] == []  # empty text -> no grams
    assert out[4] == []  # digits tokenize to nothing


def test_fit_model_shape_and_smoothing(spark):
    df = _docs(spark, [(0, "target target words"), (1, "raw only words")])
    lr = fit_logratio_micro(df, F.col("doc_id") == 0)
    assert len(lr) == N_BUCKETS
    assert all(isinstance(x, int) for x in lr)
    # a token only in the target subset must score above one only outside it
    t_b = int(hashlib.md5(b"target").hexdigest()[:8], 16) % N_BUCKETS
    r_b = int(hashlib.md5(b"raw").hexdigest()[:8], 16) % N_BUCKETS
    assert lr[t_b] > lr[r_b]
    # unseen buckets carry the pure-smoothing default, identical everywhere
    seen = {
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % N_BUCKETS
        for g in [
            "target", "words", "raw", "only", "target target",
            "target words", "raw only", "only words",
        ]
    }
    defaults = {lr[b] for b in range(N_BUCKETS) if b not in seen}
    assert len(defaults) == 1


def test_weights_prefer_target_like_docs(spark):
    rows = [(i, "curated prose about crawling the web") for i in range(0, 40, 2)]
    rows += [(i, "zzz spam spam zzz buy now") for i in range(1, 40, 2)]
    df = _docs(spark, rows)
    lr = fit_logratio_micro(df, F.col("doc_id") % 2 == 0)
    w = {r["doc_id"]: r["logw_micro"] for r in importance_weights(df, lr).collect()}
    assert min(w[i] for i in range(0, 40, 2)) > max(w[i] for i in range(1, 40, 2))


def test_weights_partitioning_invariant(spark):
    rows = [(i, f"alpha beta gamma doc {chr(97 + i % 26)}") for i in range(60)]
    df = _docs(spark, rows)
    lr = fit_logratio_micro(df, F.col("doc_id") % 7 == 0)
    a = sorted(map(tuple, importance_weights(df.repartition(1), lr).collect()))
    b = sorted(map(tuple, importance_weights(df.repartition(13), lr).collect()))
    assert a == b


def test_empty_text_scores_zero_grams(spark):
    df = _docs(spark, [(1, "some words"), (2, "")])
    lr = fit_logratio_micro(df, F.col("doc_id") == 1)
    out = {r["doc_id"]: (r["n_grams"], r["logw_micro"])
           for r in importance_weights(df, lr).collect()}
    assert out[2] == (0, 0)


def test_wrong_model_size_rejected(spark):
    df = _docs(spark, [(1, "x y")])
    with pytest.raises(ValueError, match="buckets"):
        importance_weights(df, [0] * 17)


def test_gumbel_topk_weight_ordering_and_determinism(spark):
    # two tiers separated by far more than any Gumbel draw can bridge:
    # micro-nat gap 60e6 = 60 nats; P(Gumbel spread > 60) ~ 1e-26.
    rows = [(i, 60_000_000 if i < 10 else 0) for i in range(200)]
    w = spark.createDataFrame(rows, "doc_id bigint, logw_micro bigint")
    top = dsir_resample_topk(w, 10)
    ids = sorted(r["doc_id"] for r in top.collect())
    assert ids == list(range(10))
    again = dsir_resample_topk(w.repartition(7), 10)
    assert sorted(map(tuple, top.collect())) == sorted(map(tuple, again.collect()))


def test_gumbel_topk_is_sampling_not_truncation(spark):
    # equal weights: winners are decided by the hash noise alone, so the
    # selected set must NOT be the first k ids (which a sort-by-weight
    # tiebreak on doc_id would produce)
    w = spark.createDataFrame(
        [(i, 0) for i in range(500)], "doc_id bigint, logw_micro bigint"
    )
    ids = sorted(r["doc_id"] for r in dsir_resample_topk(w, 20).collect())
    assert ids != list(range(20))
    assert len(ids) == 20


def test_gram_buckets_matches_python_reference_on_fuzz_corpus(spark):
    """Batch fuzz: one Spark job over a seeded random corpus, every row's
    bucket array compared against an independent pure-Python rendering of
    the contract (tokenize on [^a-z]+ of the lowercased text, unigrams +
    space-joined bigrams, first-8-hex-md5 mod B) — pins the tokenizer,
    bigram construction, and hash family on inputs nobody hand-seeds.
    Alphabet avoids locale-sensitive case edges (dotted I etc.) where JVM
    and Python lowercasing legitimately diverge."""
    import random
    import re

    rng = random.Random(404)
    alphabet = "abz AB?.,-09\n\t'&<>é漢😀"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", gram_buckets("text").alias("b")
        ).collect()
    }
    for i, text in rows:
        toks = [t for t in re.split("[^a-z]+", text.lower()) if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        want = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % N_BUCKETS
            for g in grams
        ]
        assert got[i] == want, (i, text)
