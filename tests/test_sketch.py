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


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------

import hashlib
import math

from layerg_crawler_v2_spark.operators.sketch import (
    HLL_B,
    hll_estimate,
    hll_registers,
)


def _py_registers(keys, b=HLL_B):
    """Sequential reference: same portable 60-bit md5-prefix hash."""
    nbits = 60 - b
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        bucket, suffix = h >> nbits, h & ((1 << nbits) - 1)
        rho = nbits + 1 if suffix == 0 else nbits + 1 - suffix.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _keys_df(spark, n, parts=8, dup=1):
    return spark.range(n * dup).select(
        F.concat(F.lit("https://h"), (F.col("id") % n).cast("string"),
                 F.lit(".test/p")).alias("url")
    ).repartition(parts)


def test_hll_registers_match_sequential_reference(spark):
    n = 3_000
    got = {
        int(r["bucket"]): int(r["register"])
        for r in hll_registers(_keys_df(spark, n), "url").collect()
    }
    want = _py_registers([f"https://h{i}.test/p" for i in range(n)])
    assert got == want


def test_hll_duplicate_insensitive_and_mergeable(spark):
    a = _keys_df(spark, 1_000, dup=1)
    a3 = _keys_df(spark, 1_000, dup=3)  # same key set, 3x multiplicity
    ra = hll_registers(a, "url")
    assert {tuple(r) for r in ra.collect()} == {
        tuple(r) for r in hll_registers(a3, "url").collect()
    }
    # merge(registers(A), registers(B)) == registers(A union B)
    b = spark.range(500, 1_700).select(
        F.concat(F.lit("https://h"), F.col("id").cast("string"),
                 F.lit(".test/p")).alias("url")
    )
    merged = (
        ra.unionByName(hll_registers(b, "url"))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    whole = hll_registers(
        a.select("url").unionByName(b.select("url")), "url"
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_hll_estimate_within_error_bound(spark):
    n = 5_000
    est = hll_estimate(hll_registers(_keys_df(spark, n, dup=2), "url"))
    stderr = 1.04 / math.sqrt(1 << HLL_B)  # ~3.3% at b=10
    assert abs(est - n) / n < 5 * stderr


def test_hll_partitioning_invariance(spark):
    n = 2_000
    r1 = hll_registers(_keys_df(spark, n, parts=1), "url").collect()
    r32 = hll_registers(_keys_df(spark, n, parts=32), "url").collect()
    assert {tuple(r) for r in r1} == {tuple(r) for r in r32}


def test_hll_grouped_matches_per_group_build(spark):
    """hll_registers_by(group) == hll_registers run on each group's rows
    alone — the grouped form is the ungrouped pipeline per group, and
    each group's estimate lands within the standard error bound."""
    from pyspark.sql import functions as F

    from layerg_crawler_v2_spark.operators.sketch import hll_registers_by

    df = _keys_df(spark, 6_000, dup=2).withColumn(
        "grp",
        F.concat(F.lit("g"), (F.xxhash64("url") % 3).cast("string")),
    )
    grouped = hll_registers_by(df, "grp", "url")
    for g in [r["grp"] for r in df.select("grp").distinct().collect()]:
        alone = hll_registers(df.filter(F.col("grp") == g), "url")
        got = {
            (r["bucket"], r["register"])
            for r in grouped.filter(F.col("group") == g)
            .select("bucket", "register")
            .collect()
        }
        want = {tuple(r) for r in alone.collect()}
        assert got == want, g
        n_true = df.filter(F.col("grp") == g).select("url").distinct().count()
        est = hll_estimate(
            grouped.filter(F.col("group") == g).select("bucket", "register")
        )
        assert abs(est - n_true) / n_true < 5 * (1.04 / math.sqrt(1 << HLL_B))


# --------------------------------------------------------------------------
# HLL merge / intersection
# --------------------------------------------------------------------------

def test_hll_merge_is_exactly_union(spark):
    from layerg_crawler_v2_spark.operators.sketch import (
        hll_merge,
        hll_registers,
    )

    a = spark.range(0, 3000).select(
        (F.col("id")).cast("string").alias("k")
    )
    b = spark.range(2000, 6000).select(
        (F.col("id")).cast("string").alias("k")
    )
    u = a.unionByName(b)
    merged = {
        (r["bucket"], r["register"])
        for r in hll_merge(
            hll_registers(a, "k"), hll_registers(b, "k")
        ).collect()
    }
    direct = {
        (r["bucket"], r["register"])
        for r in hll_registers(u, "k").collect()
    }
    assert merged == direct  # bit-exact, not approximate


def test_hll_intersection_estimate_accuracy(spark):
    from layerg_crawler_v2_spark.operators.sketch import (
        hll_intersect_estimate,
        hll_registers,
    )

    a = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(3000, 8000).select(
        F.col("id").cast("string").alias("k")
    )
    est = hll_intersect_estimate(
        hll_registers(a, "k"), hll_registers(b, "k")
    )
    # true overlap 2000; inclusion-exclusion compounds ~3.3% per term on
    # |union|=8000 — accept a generous but meaningful band
    assert 1200 < est < 2800


def test_hll_merge_idempotent_and_variadic(spark):
    from layerg_crawler_v2_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    a = spark.range(0, 1000).select(F.col("id").cast("string").alias("k"))
    ra = hll_registers(a, "k")
    self_merged = hll_merge(ra, ra, ra)
    assert hll_estimate(self_merged) == hll_estimate(ra)
