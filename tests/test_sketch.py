"""Count-min heavy hitters (operators/sketch.py): upper-bound guarantee,
zipf recall, sketch-size bound, partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_sketch,
    heavy_hitters_topk,
)


def _zipf_df(spark, n=20_000, parts=8):
    # key j appears ~ n/(j+1) times: heavy head, long tail — deterministic
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.concat(
                F.lit("k"),
                F.floor(
                    F.pow(F.lit(200.0), F.pmod(F.xxhash64("id"), 10_000) / 10_000.0)
                ).cast("long"),
            ).alias("key")
        )
    )


def test_estimates_upper_bound_and_zipf_recall(spark):
    df = _zipf_df(spark).cache()
    exact = {
        r["key"]: r["c"]
        for r in df.groupBy("key").agg(F.count("*").alias("c")).collect()
    }
    got = heavy_hitters_topk(df, "key", k=10).collect()
    for r in got:
        assert r["est_count"] >= exact[r["key"]]  # CMS never undercounts
    want_top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [r["key"] for r in got] == [k for k, _ in want_top]
    df.unpersist()


def test_exact_when_collision_free(spark):
    # 50 distinct keys into 2048*4 cells: est == exact for the top-k here
    # (and if a freak 4-row collision ever breaks this, the fixture is
    # deterministic so it breaks loudly, not flakily)
    df = spark.range(5_000).select(
        F.concat(F.lit("u"), F.pmod("id", 50)).alias("key")
    )
    exact = {
        r["key"]: r["c"]
        for r in df.groupBy("key").agg(F.count("*").alias("c")).collect()
    }
    for r in heavy_hitters_topk(df, "key", k=5).collect():
        assert r["est_count"] == exact[r["key"]]


def test_sketch_bounded_and_partitioning_invariant(spark):
    df = _zipf_df(spark, n=8_000)
    s1 = cms_sketch(df.coalesce(1), "key")
    s8 = cms_sketch(df.repartition(13), "key")
    rows1 = {(r["i"], r["pos"]): r["cnt"] for r in s1.collect()}
    rows8 = {(r["i"], r["pos"]): r["cnt"] for r in s8.collect()}
    assert rows1 == rows8  # cell counts are sums: partitioning-independent
    assert len(rows1) <= CMS_WIDTH * CMS_DEPTH
    # total mass per hash row == input size
    n = df.count()
    for i in range(CMS_DEPTH):
        assert sum(c for (ri, _), c in rows1.items() if ri == i) == n


def test_topk_deterministic_across_partitionings(spark):
    df = _zipf_df(spark, n=12_000)
    a = [tuple(r) for r in heavy_hitters_topk(df.coalesce(2), "key", k=8).collect()]
    b = [tuple(r) for r in heavy_hitters_topk(df.repartition(16), "key", k=8).collect()]
    assert a == b
