"""Batched lookup (S5) and handler registry dispatch (U1) unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from layerg_crawler_v2_spark.operators.dispatch import HandlerRegistry
from layerg_crawler_v2_spark.operators.enrich import batched_lookup

META = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("meta", T.StringType()),
    ]
)


def test_batched_lookup_enriches_and_dedups(spark):
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "row_id long, k long"
    )

    def lookup(keys):
        assert len(keys) <= 3, "batch_size must cap each call"
        assert len(keys) == len(set(keys)), "keys must reach lookup deduped"
        return [{"k": k, "meta": f"m{k}"} for k in keys]

    out = batched_lookup(df, "k", lookup, META, batch_size=3).collect()
    assert len(out) == 100
    for r in out:
        assert r["meta"] == f"m{r['k']}"


def test_batched_lookup_missing_keys_null(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "row_id long, k long")

    def lookup(keys):
        return [{"k": k, "meta": f"m{k}"} for k in keys if k != 20]

    got = {r["k"]: r["meta"] for r in batched_lookup(df, "k", lookup, META).collect()}
    assert got == {10: "m10", 20: None}


def test_batched_lookup_requires_key_in_schema(spark):
    df = spark.createDataFrame([(1,)], "k long")
    bad = T.StructType([T.StructField("meta", T.StringType())])
    with pytest.raises(AssertionError):
        batched_lookup(df, "k", lambda ks: [], bad)


def test_dispatch_routes_and_defaults(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "a")], "id long, event_type string"
    )
    reg = (
        HandlerRegistry()
        .register("a", lambda d: d.select("id", F.lit("ha").alias("h")))
        .register("b", lambda d: d.select("id", F.lit("hb").alias("h")))
        .register_default(lambda d: d.select("id", F.lit("other").alias("h")))
    )
    got = {r["id"]: r["h"] for r in reg.dispatch(df).collect()}
    assert got == {1: "ha", 4: "ha", 2: "hb", 3: "other"}


def test_dispatch_drops_unrouted_without_default(spark):
    df = spark.createDataFrame([(1, "a"), (2, "z")], "id long, event_type string")
    reg = HandlerRegistry().register("a", lambda d: d.select("id"))
    assert [r["id"] for r in reg.dispatch(df).collect()] == [1]


def test_dispatch_duplicate_registration_raises():
    reg = HandlerRegistry().register("a", lambda d: d)
    with pytest.raises(ValueError):
        reg.register("a", lambda d: d)
