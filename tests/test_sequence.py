"""Global prefix-sum + sequence-packing operators (operators/sequence.py).

with_global_seq itself is pinned transitively by every fetch-log golden test;
these cover the cumsum/packing additions directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.sequence import (
    pack_contiguous,
    with_global_cumsum,
)

BUDGET = 100


@pytest.fixture(scope="module")
def vals(spark):
    rows = [(i, (i * 37) % 90 + 1) for i in range(500)]
    rows[13] = (13, None)  # NULL counts as 0
    return spark.createDataFrame(rows, "id long, n long")


def _expected_cumsum(rows):
    out, acc = {}, 0
    for i, n in sorted(rows):
        acc += n or 0
        out[i] = acc
    return out


def test_cumsum_matches_sequential(spark, vals):
    want = _expected_cumsum([(r.id, r.n) for r in vals.collect()])
    got = {
        r["id"]: r["cum"]
        for r in with_global_cumsum(vals, "n", [F.col("id")]).collect()
    }
    assert got == want


def test_cumsum_partitioning_invariant(spark, vals):
    a = with_global_cumsum(vals.repartition(1), "n", [F.col("id")]).collect()
    b = with_global_cumsum(vals.repartition(16), "n", [F.col("id")]).collect()
    key = lambda rows: sorted((r["id"], r["cum"]) for r in rows)
    assert key(a) == key(b)


def test_pack_contiguous_semantics(spark, vals):
    pdf = (
        pack_contiguous(vals, "n", [F.col("id")], budget=BUDGET)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # pack ids are contiguous non-decreasing runs over the global order
    assert (pdf["pack_id"].diff().fillna(0) >= 0).all()
    assert set(pdf["pack_id"]) == set(range(pdf["pack_id"].max() + 1))
    # overflow bound: total minus the final doc fits the budget
    g = pdf.fillna({"n": 0}).groupby("pack_id")["n"]
    assert ((g.sum() - g.last()) <= BUDGET).all()
    # docs are never split: every doc appears exactly once
    assert pdf["id"].is_unique and len(pdf) == 500


def test_pack_partitioning_invariant(spark, vals):
    key = lambda df: sorted(
        (r["id"], r["pack_id"])
        for r in pack_contiguous(df, "n", [F.col("id")], budget=BUDGET).collect()
    )
    assert key(vals.repartition(1)) == key(vals.repartition(16))


# --------------------------------------------------------------------------
# concat-and-chop packing
# --------------------------------------------------------------------------

def _chop_ref(rows, capacity):
    """Sequential reference: rows = [(id, tokens)] in order."""
    out = []
    pos = 0
    for i, n in rows:
        if not n:
            continue
        start, end = pos, pos + n
        b = start // capacity
        while b * capacity < end:
            lo = max(start, b * capacity)
            hi = min(end, (b + 1) * capacity)
            out.append((i, b, lo - start, lo - b * capacity, hi - lo))
            b += 1
        pos = end
    return set(out)


def test_chop_spans_matches_reference(spark):
    from pyspark.sql import functions as F

    from layerg_crawler_v2_spark.operators.sequence import chop_spans

    rows = [(i, (i * 37) % 23 + (0 if i % 7 else 40)) for i in range(50)]
    rows += [(100, 0), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, n long").repartition(7)
    got = {
        (r["doc_id"], r["bin_id"], r["doc_offset"], r["bin_offset"], r["n_tokens"])
        for r in chop_spans(df, "n", [F.col("doc_id")], capacity=32).collect()
    }
    ordered = [(i, n or 0) for i, n in sorted(rows)]
    assert got == _chop_ref(ordered, 32)


def test_chop_spans_bins_exact_capacity(spark):
    from pyspark.sql import functions as F

    from layerg_crawler_v2_spark.operators.sequence import chop_spans

    rows = [(i, 17) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    spans = chop_spans(df, "n", [F.col("doc_id")], capacity=64).collect()
    total = sum(r["n_tokens"] for r in spans)
    assert total == 40 * 17
    by_bin = {}
    for r in spans:
        by_bin.setdefault(r["bin_id"], 0)
        by_bin[r["bin_id"]] += r["n_tokens"]
    last = max(by_bin)
    for b, tok in by_bin.items():
        assert tok == 64 or b == last
    # bin offsets tile each bin without overlap
    for b in by_bin:
        segs = sorted(
            (r["bin_offset"], r["bin_offset"] + r["n_tokens"])
            for r in spans
            if r["bin_id"] == b
        )
        pos = 0
        for lo, hi in segs:
            assert lo == pos
            pos = hi


def test_chop_spans_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from layerg_crawler_v2_spark.operators.sequence import chop_spans

    rows = [(i, 5 + i % 11) for i in range(60)]
    a = spark.createDataFrame(rows, "doc_id long, n long").repartition(2)
    b = spark.createDataFrame(rows, "doc_id long, n long").repartition(13)
    ga = sorted(
        map(tuple, chop_spans(a, "n", [F.col("doc_id")], 50).collect())
    )
    gb = sorted(
        map(tuple, chop_spans(b, "n", [F.col("doc_id")], 50).collect())
    )
    assert ga == gb
