"""Simhash near-dup property tests (VERDICT r1 #4: the rows-only simhash
operator had no correctness signal).

All inputs are seed-fixed (datagen.synth_text), so the assertions are exact,
not statistical: exact duplicates hash identically, 2-word edits of ≥40-word
docs stay within hamming 6, distinct docs from the shared vocab sit at ≥7.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.datagen import synth_text
from layerg_crawler_v2_spark.operators.dedup import hamming64, simhash

LONG_IDS = [i for i in range(200) if len(synth_text(i).split()) >= 40][:10]


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
        assert d <= 6, (i, d)


def test_distinct_docs_large_hamming(hashes):
    for a in LONG_IDS[:5]:
        for b in LONG_IDS[5:]:
            d = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            assert d > 6, (a, b, d)


def test_hamming64_column_matches_python(spark, hashes):
    pairs = [(hashes[a], hashes[b]) for a in LONG_IDS[:3] for b in LONG_IDS[3:6]]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = df.select(hamming64(F.col("a"), F.col("b")).alias("d")).collect()
    for (a, b), r in zip(pairs, got):
        assert r["d"] == bin((a ^ b) & (2**64 - 1)).count("1")
