"""robust_outliers: planted-anomaly detection, degenerate-MAD nulling,
median/MAD exactness on hand-computable groups."""

from __future__ import annotations

from layerg_crawler_v2_spark.operators.stats import robust_outliers


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, source string, v long")
    out = robust_outliers(df, group_col="source", value_col="v")
    return {r["doc_id"]: r for r in out.collect()}


def test_planted_outlier_flagged(spark):
    # group a: tight cluster around 100 plus one 100x point
    rows = [(i, "a", 100 + (i % 5)) for i in range(20)] + [(99, "a", 10_000)]
    got = _run(spark, rows)
    assert len(got) == 21  # one row per input row
    assert got[99]["is_outlier"] is True
    assert all(not got[i]["is_outlier"] for i in range(20))


def test_constant_group_scores_nobody(spark):
    # MAD == 0: mz NULL, is_outlier False for every row, even a "weird" one
    rows = [(i, "c", 50) for i in range(9)]
    got = _run(spark, rows)
    assert all(r["mz"] is None and r["is_outlier"] is False for r in got.values())


def test_median_and_mad_exact(spark):
    # v = 1,2,3,4 -> median 2.5 (interpolated), absdev 1.5,0.5,0.5,1.5 ->
    # MAD = 1.0; mz(4) = 0.6745*1.5 = 1.011750
    rows = [(i, "g", i + 1) for i in range(4)]
    got = _run(spark, rows)
    assert got[0]["med"] == 2.5 and got[0]["mad"] == 1.0
    assert abs(got[3]["mz"] - 1.01175) < 1e-9


def test_breakdown_resistance(spark):
    # the outlier itself must not move the baseline: same cluster stats
    # whether the 10k point is present or not
    base = [(i, "a", 100 + (i % 5)) for i in range(20)]
    with_out = _run(spark, base + [(99, "a", 10_000)])
    without = _run(spark, base)
    assert with_out[0]["med"] == without[0]["med"]
    assert with_out[0]["mad"] == without[0]["mad"]
