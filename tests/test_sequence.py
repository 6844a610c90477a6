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
