"""KLL mergeable quantile sketch (operators/kll.py).

Evidence model: rank-interval error bounds vs exact sorted ground truth
across distribution shapes (uniform / heavy-duplicate zipf / sorted /
constant), merge correctness, partition-count invariance of the BOUND
(bit-invariance is impossible for any merge-order-dependent summary and
is declared in the module docstring), serialization round trip, and the
sketch-sized-exchange scale shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from layerg_crawler_v2_spark.operators.kll import (
    KLLSketch,
    kll_partition_sketches,
    kll_quantiles,
    kll_sketch,
)

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
EPS = 0.02  # measured worst ~0.007 at k=200 on 200k rows; 3x margin


def _interval_err(srt: np.ndarray, est: float, q: float) -> float:
    """0 when q*n falls inside est's duplicate-rank interval, else the
    distance to the interval (the correct error notion for quantiles
    over data with repeated values)."""
    n = len(srt)
    lo = np.searchsorted(srt, est, side="left") / n
    hi = np.searchsorted(srt, est, side="right") / n
    if lo <= q <= hi:
        return 0.0
    return min(abs(q - lo), abs(q - hi))


def _worst(data: np.ndarray, sk: KLLSketch) -> float:
    srt = np.sort(data)
    return max(_interval_err(srt, sk.quantile(q), q) for q in QS)


@pytest.mark.parametrize(
    "name",
    ["uniform", "zipf", "sorted", "reverse", "constant"],
)
def test_rank_error_bound(name):
    rng = np.random.RandomState(7)
    data = {
        "uniform": rng.uniform(0, 1, 200_000),
        "zipf": rng.zipf(1.5, 200_000).astype(float),
        "sorted": np.arange(200_000, dtype=float),
        "reverse": np.arange(200_000, dtype=float)[::-1].copy(),
        "constant": np.full(200_000, 3.14),
    }[name]
    sk = KLLSketch(k=200)
    for chunk in np.array_split(data, 37):
        sk.update_batch(chunk)
    assert sk.n == len(data)
    assert sk.retained() < 1000  # sublinear summary, not a copy
    assert _worst(data, sk) <= EPS


def test_exact_when_small():
    # n <= capacity: nothing ever compacts, quantiles are exact
    data = np.array([5.0, 1.0, 9.0, 3.0, 7.0])
    sk = KLLSketch(k=200)
    sk.update_batch(data)
    assert sk.quantile(0.0) == 1.0
    assert sk.quantile(0.5) == 5.0
    assert sk.quantile(1.0) == 9.0
    assert sk.rank(4.0) == 2


def test_merge_bound_and_counts():
    rng = np.random.RandomState(11)
    a = rng.uniform(0, 1, 100_000)
    b = rng.normal(5, 2, 150_000)
    s1 = KLLSketch(k=200)
    s1.update_batch(a)
    s2 = KLLSketch(k=200)
    s2.update_batch(b)
    m = s1.merge(s2)
    assert m.n == 250_000
    assert _worst(np.concatenate([a, b]), m) <= EPS


def test_merge_with_empty_and_mismatched_k():
    s = KLLSketch(k=200)
    s.update_batch(np.arange(1000.0))
    merged = s.merge(KLLSketch(k=200))
    assert merged.n == 1000
    with pytest.raises(AssertionError):
        s.merge(KLLSketch(k=100))


def test_nan_and_empty_updates():
    sk = KLLSketch(k=200)
    sk.update_batch(np.array([np.nan, 1.0, np.nan, 2.0]))
    sk.update_batch(np.empty(0))
    assert sk.n == 2
    assert sk.quantile(1.0) == 2.0
    assert np.isnan(KLLSketch(k=200).quantile(0.5))


def test_serialization_round_trip():
    rng = np.random.RandomState(3)
    sk = KLLSketch(k=64)
    sk.update_batch(rng.uniform(0, 10, 50_000))
    back = KLLSketch.from_row(sk.to_row())
    assert back.n == sk.n
    assert back.parities == sk.parities
    for q in QS:
        assert back.quantile(q) == sk.quantile(q)


def test_spark_sketch_bound_and_partition_invariance(spark):
    rng = np.random.RandomState(5)
    data = rng.uniform(0, 100, 120_000)
    pdf = pd.DataFrame({"v": data})
    for parts in (3, 16):
        df = spark.createDataFrame(pdf).repartition(parts)
        sk = kll_sketch(df, "v", k=200)
        assert sk.n == len(data)
        assert _worst(data, sk) <= EPS


def test_spark_exchange_is_sketch_sized(spark):
    pdf = pd.DataFrame({"v": np.arange(50_000, dtype=float)})
    df = spark.createDataFrame(pdf).repartition(8)
    rows = kll_partition_sketches(df, "v", k=100).collect()
    assert 0 < len(rows) <= 8  # one row per non-empty partition
    assert all(len(r["items"]) < 2000 for r in rows)


def test_grouped_quantiles_bound_per_group(spark):
    from layerg_crawler_v2_spark.operators.kll import kll_grouped_quantiles

    rng = np.random.RandomState(9)
    groups = {
        "a": rng.uniform(0, 1, 60_000),
        "b": rng.normal(100, 10, 40_000),
        "c": np.arange(500, dtype=float),  # small group: exact
    }
    pdf = pd.concat(
        [pd.DataFrame({"host": key, "v": vals}) for key, vals in groups.items()],
        ignore_index=True,
    ).sample(frac=1.0, random_state=1)  # interleave groups across partitions
    df = spark.createDataFrame(pdf).repartition(12)
    out = kll_grouped_quantiles(df, "host", "v", [0.1, 0.5, 0.9], k=200)
    rows = out.collect()
    assert {r["key"] for r in rows} == {"a", "b", "c"}
    for r in rows:
        data = groups[r["key"]]
        assert r["n"] == len(data)
        assert _interval_err(np.sort(data), r["value"], r["q"]) <= EPS


def test_kll_quantiles_surface(spark):
    pdf = pd.DataFrame({"v": np.arange(10_000, dtype=float)})
    df = spark.createDataFrame(pdf)
    out = {
        r["q"]: r["value"]
        for r in kll_quantiles(df, "v", [0.5, 0.9]).collect()
    }
    assert abs(out[0.5] - 5000) <= EPS * 10_000
    assert abs(out[0.9] - 9000) <= EPS * 10_000
