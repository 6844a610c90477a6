"""Pointer-doubling redirect resolution (operators/redirects.py):
exact hop counts, cycle verdicts, the 2**rounds horizon, and
partitioning-invariance of the self-join composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.redirects import resolve_redirects


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _resolve(spark, pairs, rounds=6):
    rows = resolve_redirects(_df(spark, pairs), rounds=rounds).collect()
    return {r["url"]: (r["terminal_url"], r["hops"], r["resolved"]) for r in rows}


def test_chain_exact_hops(spark):
    # a -> b -> c -> d (terminal)
    got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        "a": ("d", 3, True),
        "b": ("d", 2, True),
        "c": ("d", 1, True),
    }


def test_cycle_unresolved_chain_into_cycle_too(spark):
    # x -> c0 -> c1 -> c2 -> c0 : every source trapped by the cycle fails
    got = _resolve(spark, [("x", "c0"), ("c0", "c1"), ("c1", "c2"), ("c2", "c0")])
    assert got == {
        "x": (None, None, False),
        "c0": (None, None, False),
        "c1": (None, None, False),
        "c2": (None, None, False),
    }


def test_horizon_is_two_to_the_rounds(spark):
    # chain of length 5; rounds=2 covers 4 hops, so only the deepest
    # source is beyond the horizon
    chain = [(f"n{i}", f"n{i+1}") for i in range(5)]  # n0..n5
    got = _resolve(spark, chain, rounds=2)
    assert got["n1"] == ("n5", 4, True)
    assert got["n0"] == (None, None, False)
    got3 = _resolve(spark, chain, rounds=3)
    assert got3["n0"] == ("n5", 5, True)


def test_forest_of_chains_and_self_contained_terminals(spark):
    got = _resolve(spark, [("a", "t"), ("b", "t"), ("c", "b")])
    assert got == {
        "a": ("t", 1, True),
        "b": ("t", 1, True),
        "c": ("t", 2, True),
    }


def test_partitioning_invariance(spark):
    pairs = [(f"u{i}", f"u{i-1}") for i in range(1, 40) if i % 8 != 0]
    base = _resolve(spark, pairs)
    skewed = resolve_redirects(_df(spark, pairs).repartition(17), rounds=6).collect()
    assert {r["url"]: (r["terminal_url"], r["hops"], r["resolved"]) for r in skewed} == base


def test_rounds_validation(spark):
    with pytest.raises(ValueError):
        resolve_redirects(_df(spark, [("a", "b")]), rounds=0)


# ---------------------------------------------------------------------------
# Pagination series (rel=next chains)
# ---------------------------------------------------------------------------


def test_pagination_series_orders_chains(spark):
    from layerg_crawler_v2_spark.operators.redirects import pagination_series

    # two series: a->b->c->d and x->y; plus a self-loop (dropped edge)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("s", "s")],
        "url string, next_url string",
    )
    got = {
        r["url"]: (r["series_head"], r["position"], r["resolved"])
        for r in pagination_series(edges).collect()
    }
    assert got == {
        "a": ("a", 0, True),
        "b": ("a", 1, True),
        "c": ("a", 2, True),
        "d": ("a", 3, True),
        "x": ("x", 0, True),
        "y": ("x", 1, True),
    }


def test_pagination_series_cycle_unresolved_and_conflict_dedup(spark):
    from layerg_crawler_v2_spark.operators.redirects import pagination_series

    # cycle p->q->p; conflict: both m and k declare next=z (min wins: k)
    edges = spark.createDataFrame(
        [("p", "q"), ("q", "p"), ("m", "z"), ("k", "z")],
        "url string, next_url string",
    )
    rows = {r["url"]: r for r in pagination_series(edges).collect()}
    assert not rows["p"]["resolved"] and rows["p"]["series_head"] is None
    assert not rows["q"]["resolved"]
    assert rows["z"]["series_head"] == "k" and rows["z"]["position"] == 1
    # the orphaned predecessor anchors its own series at position 0
    assert rows["m"]["series_head"] == "m" and rows["m"]["position"] == 0
    assert rows["k"]["series_head"] == "k" and rows["k"]["position"] == 0


def test_pagination_series_partitioning_invariant(spark):
    from layerg_crawler_v2_spark.operators.redirects import pagination_series

    rows = [(f"u{i}", f"u{i+1}") for i in range(0, 40) if (i + 1) % 8 != 0]
    e1 = spark.createDataFrame(rows, "url string, next_url string").repartition(1)
    e2 = spark.createDataFrame(rows, "url string, next_url string").repartition(13)
    a = sorted(map(tuple, pagination_series(e1).collect()))
    b = sorted(map(tuple, pagination_series(e2).collect()))
    assert a == b and len(a) > 0
