"""grouped_percentiles_disc: exact percentile_disc rank rule, tie and
boundary behavior, and the histogram-only scale shape."""

from __future__ import annotations

from layerg_crawler_v2_spark.operators.stats import grouped_percentiles_disc


def _got(spark, rows, pcts):
    df = spark.createDataFrame(rows, "g string, v long")
    out = grouped_percentiles_disc(df, "g", "v", pcts=pcts).collect()
    return {(r["g"], r["pct"]): r["val"] for r in out}


def test_rank_rule_exact_boundaries(spark):
    # n=4, values 10..40: rank = max(1, ceil(pct*n/100))
    rows = [("a", v) for v in (10, 20, 30, 40)]
    got = _got(spark, rows, pcts=(25, 26, 50, 75, 99, 100))
    assert got[("a", 25)] == 10   # ceil(1.0) = 1
    assert got[("a", 26)] == 20   # ceil(1.04) = 2
    assert got[("a", 50)] == 20
    assert got[("a", 75)] == 30
    assert got[("a", 99)] == 40
    assert got[("a", 100)] == 40


def test_duplicates_and_singleton_groups(spark):
    # duplicates collapse into histogram counts; median of 1,1,1,9 is 1
    rows = [("d", 1), ("d", 1), ("d", 1), ("d", 9), ("s", 42)]
    got = _got(spark, rows, pcts=(50, 99))
    assert got[("d", 50)] == 1
    assert got[("d", 99)] == 9
    assert got[("s", 50)] == 42 and got[("s", 99)] == 42


def test_no_global_single_partition_window(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "g string, v long")
    plan = (
        grouped_percentiles_disc(df, "g", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the cumulative window is partitioned by group — a global percentile
    # via a single-partition sort would show SinglePartition here
    assert "SinglePartition" not in plan


def test_analyze_table_one_pass_with_nulls(spark):
    from layerg_crawler_v2_spark.operators.stats import analyze_table

    df = spark.createDataFrame(
        [(1, "b"), (2, None), (2, "a"), (None, "a")],
        "k long, s string",
    )
    got = {
        r.col_name: (r.row_count, r.n_nulls, r.n_distinct, r.min_value, r.max_value)
        for r in analyze_table(df, ["k", "s"]).collect()
    }
    assert got == {
        "k": (4, 1, 2, "1", "2"),
        "s": (4, 1, 2, "a", "b"),
    }


def test_analyze_numeric_minmax_is_native_order(spark):
    from layerg_crawler_v2_spark.operators.stats import analyze_table

    df = spark.createDataFrame([(9,), (10,), (100,)], "n long")
    row = analyze_table(df, ["n"]).collect()[0]
    # lexicographic order would give min='10', max='9'
    assert (row.min_value, row.max_value) == ("9", "100")
