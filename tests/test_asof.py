"""As-of and range joins (operators/asof.py): boundary semantics, python
oracle parity, bucketed==broadcast equivalence."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.asof import (
    asof_join,
    range_join_broadcast,
    range_join_bucketed,
)

T0 = datetime(2024, 5, 1, 0, 0, 0)


def _t(h):
    return T0 + timedelta(hours=h)


def test_asof_basic_latest_and_nulls(spark):
    states = spark.createDataFrame(
        [(1, _t(0), 10.0), (1, _t(5), 50.0), (2, _t(3), 30.0)],
        "k long, ts timestamp, v double",
    )
    probes = spark.createDataFrame(
        [(100, 1, _t(1)), (101, 1, _t(6)), (102, 2, _t(2)), (103, 3, _t(9))],
        "pid long, k long, ts timestamp",
    )
    got = {
        r["pid"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(probes, states, "k", "ts", ["v"]).collect()
    }
    assert got[100] == (_t(0), 10.0)   # before the 5h state
    assert got[101] == (_t(5), 50.0)   # latest wins
    assert got[102] == (None, None)    # state exists but only later
    assert got[103] == (None, None)    # key has no states at all
    assert len(got) == 4               # every probe row survives (left)


def test_asof_inclusive_boundary(spark):
    states = spark.createDataFrame(
        [(1, _t(2), 7.0)], "k long, ts timestamp, v double"
    )
    probes = spark.createDataFrame(
        [(1, 1, _t(2))], "pid long, k long, ts timestamp"
    )
    (row,) = asof_join(probes, states, "k", "ts", ["v"]).collect()
    assert row["asof_v"] == 7.0  # state.ts == probe.ts MATCHES (<=)


def test_asof_partitioning_invariant(spark):
    import random

    rng = random.Random(11)
    states = spark.createDataFrame(
        [(rng.randrange(6), _t(rng.randrange(100)), float(i)) for i in range(80)],
        "k long, ts timestamp, v double",
    ).groupBy("k", "ts").agg(F.max("v").alias("v"))
    probes = spark.createDataFrame(
        [(i, rng.randrange(6), _t(rng.randrange(100))) for i in range(120)],
        "pid long, k long, ts timestamp",
    )
    a = sorted(
        tuple(r)
        for r in asof_join(probes.coalesce(1), states, "k", "ts", ["v"]).collect()
    )
    b = sorted(
        tuple(r)
        for r in asof_join(
            probes.repartition(9), states.repartition(5), "k", "ts", ["v"]
        ).collect()
    )
    assert a == b and len(a) == 120


def _range_fixture(spark):
    import random

    rng = random.Random(13)
    probes = spark.createDataFrame(
        [(i, _t(rng.randrange(0, 240))) for i in range(300)],
        "pid long, ts timestamp",
    )
    # spans from 1h to 3 DAYS — several times the 1-day bucket, so the
    # multi-bucket replication path is exercised
    ivals = spark.createDataFrame(
        [
            (j, _t(s := rng.randrange(0, 200)), _t(s + rng.choice([1, 6, 30, 72])))
            for j in range(25)
        ],
        "wid long, start_ts timestamp, end_ts timestamp",
    )
    return probes, ivals


def test_range_bucketed_equals_broadcast(spark):
    probes, ivals = _range_fixture(spark)
    a = sorted(
        (r["pid"], r["wid"])
        for r in range_join_broadcast(probes, ivals, "ts").collect()
    )
    b = sorted(
        (r["pid"], r["wid"])
        for r in range_join_bucketed(
            probes, ivals, "ts", bucket_seconds=86_400
        ).collect()
    )
    assert a == b and len(a) > 50


def test_range_half_open_boundary(spark):
    probes = spark.createDataFrame(
        [(1, _t(0)), (2, _t(6))], "pid long, ts timestamp"
    )
    ivals = spark.createDataFrame(
        [(9, _t(0), _t(6))], "wid long, start_ts timestamp, end_ts timestamp"
    )
    for fn in (range_join_broadcast, lambda p, i, c: range_join_bucketed(p, i, c)):
        got = [r["pid"] for r in fn(probes, ivals, "ts").collect()]
        assert got == [1]  # start inclusive, end exclusive
