"""Adaptive recrawl policy: planted change histories."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.recrawl import recrawl_schedule


def _obs(spark, rows):
    return spark.createDataFrame(
        [
            (k, datetime.fromtimestamp(ts, tz=timezone.utc), h, i)
            for i, (k, ts, h) in enumerate(rows)
        ],
        "url string, fetch_ts timestamp, content_hash string, obs_id long",
    )


def _sched(spark, rows, **kw):
    df = recrawl_schedule(
        _obs(spark, rows), tiebreak_col="obs_id", **kw
    )
    return {r["key"]: r for r in df.collect()}


def test_static_page_backs_off_exponentially(spark):
    rows = [("u", 1000.0 + 100 * i, "same") for i in range(4)]
    out = _sched(spark, rows)["u"]
    # 3 consecutive unchanged after the first -> base * 2^3
    assert out["n_obs"] == 4 and out["n_changes"] == 1
    assert out["next_interval_s"] == 3600 * 8
    assert out["next_fetch_epoch"] == 1300 + 3600 * 8


def test_changing_page_stays_at_base_interval(spark):
    rows = [("u", 1000.0 + 100 * i, f"h{i}") for i in range(4)]
    out = _sched(spark, rows)["u"]
    assert out["n_changes"] == 4
    assert out["next_interval_s"] == 3600


def test_change_resets_the_backoff(spark):
    rows = (
        [("u", 1000.0 + 100 * i, "a") for i in range(5)]  # long static run
        + [("u", 2000.0, "b")]                            # then a change
    )
    out = _sched(spark, rows)["u"]
    assert out["next_interval_s"] == 3600  # streak reset by the change


def test_interval_clamped_to_max(spark):
    rows = [("u", 1000.0 + i, "same") for i in range(25)]
    out = _sched(spark, rows, max_interval_s=86400)["u"]
    assert out["next_interval_s"] == 86400


def test_single_observation_uses_base(spark):
    out = _sched(spark, [("u", 1000.0, "x")])["u"]
    assert (out["n_obs"], out["n_changes"]) == (1, 1)
    assert out["next_interval_s"] == 3600


# --- Cho & Garcia-Molina change-rate estimator -------------------------------

def test_change_rate_estimator_values(spark):
    import math

    from layerg_crawler_v2_spark.operators.recrawl import change_rate

    # key 1: 5 obs hourly, 2 changed transitions (a,a,b,b,c)
    # key 2: 2 obs, no change; key 3: single obs (dropped)
    rows = []
    for i, c in enumerate("aabbc"):
        rows.append((1, 3600 * i, c))
    rows += [(2, 0, "x"), (2, 7200, "x"), (3, 0, "y")]
    df = spark.createDataFrame(rows, "url long, t long, content_hash string")
    df = df.select("url", F.expr("timestamp_seconds(t)").alias("fetch_ts"), "content_hash")
    got = {r["url"]: r for r in change_rate(df, key_col="url").collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1["n_intervals"] == 4 and r1["n_changes"] == 2
    assert r1["mean_interval_s"] == 3600.0
    lam = -math.log((4 - 2 + 0.5) / (4 + 0.5)) / 3600.0 * 86400.0
    assert abs(r1["lambda_per_day"] - round(lam, 6)) < 1e-9
    # no observed change: (n-0+0.5)/(n+0.5) == 1, so the estimate is
    # exactly zero — never-changed pages report rate 0, not a small prior
    r2 = got[2]
    assert r2["n_changes"] == 0 and r2["lambda_per_day"] == 0.0


def test_change_rate_finite_when_every_fetch_changed(spark):
    import math

    from layerg_crawler_v2_spark.operators.recrawl import change_rate

    rows = [(1, 3600 * i, str(i)) for i in range(4)]  # X == n == 3
    df = spark.createDataFrame(rows, "url long, t long, content_hash string")
    df = df.select("url", F.expr("timestamp_seconds(t)").alias("fetch_ts"), "content_hash")
    r = change_rate(df, key_col="url").collect()[0]
    lam = -math.log(0.5 / 3.5) / 3600.0 * 86400.0
    assert abs(r["lambda_per_day"] - round(lam, 6)) < 1e-9


def test_change_rate_zero_span_is_null(spark):
    from layerg_crawler_v2_spark.operators.recrawl import change_rate

    rows = [(1, 0, "a"), (1, 0, "b")]
    df = spark.createDataFrame(rows, "url long, t long, content_hash string")
    df = df.select("url", F.expr("timestamp_seconds(t)").alias("fetch_ts"), "content_hash")
    r = change_rate(df, key_col="url").collect()[0]
    assert r["lambda_per_day"] is None


def test_revalidation_savings_classification(spark):
    from layerg_crawler_v2_spark.operators.recrawl import revalidation_savings

    rows = [
        # url A on host h1: fp unchanged across 3 fetches -> 2 refetches,
        # both 304; only the first 100-byte body transfers
        ("u/a", "h1", 0, "fpA", 100),
        ("u/a", "h1", 1, "fpA", 100),
        ("u/a", "h1", 2, "fpA", 100),
        # url B on h1: changes at round 1 -> refetch 1 is a 200,
        # refetch 2 is a 304
        ("u/b", "h1", 0, "fpB0", 50),
        ("u/b", "h1", 1, "fpB1", 50),
        ("u/b", "h1", 2, "fpB1", 50),
        # url C on h2: single fetch, no refetches
        ("u/c", "h2", 0, "fpC", 7),
    ]
    f = spark.createDataFrame(
        rows, "url string, host string, round int, content_fp string, bytes int"
    )
    out = {r.host: r for r in revalidation_savings(f).collect()}
    h1 = out["h1"]
    assert (h1.n_fetch, h1.n_refetch, h1.n_304) == (6, 4, 3)
    # transferred: A round0 (100) + B rounds 0,1 (50+50); saved: A r1+r2
    # (200) + B r2 (50)
    assert (h1.bytes_transferred, h1.bytes_saved) == (200, 250)
    h2 = out["h2"]
    assert (h2.n_fetch, h2.n_refetch, h2.n_304) == (1, 0, 0)
    assert (h2.bytes_transferred, h2.bytes_saved) == (7, 0)


def test_revalidation_savings_partitioning_invariant(spark):
    from layerg_crawler_v2_spark.operators.recrawl import revalidation_savings

    rows = [
        (f"u/{i}", f"h{i % 3}", r, f"fp{i}#{min(r, i % 2)}", 10 + i)
        for i in range(40)
        for r in range(3)
    ]
    schema = "url string, host string, round int, content_fp string, bytes int"
    a = sorted(
        map(tuple, revalidation_savings(
            spark.createDataFrame(rows, schema).repartition(1)
        ).collect())
    )
    b = sorted(
        map(tuple, revalidation_savings(
            spark.createDataFrame(rows, schema).repartition(17)
        ).collect())
    )
    assert a == b


def test_staleness_report_integer_semantics(spark):
    from layerg_crawler_v2_spark.operators.recrawl import staleness_report

    now = 1_000_000
    rows = [
        # changes 1000/kday = 1/day -> target 86400s; age 100000 > target
        ("u1", "h1", now - 100_000, 1000),
        # same rate, age 50000 < target -> fresh
        ("u2", "h1", now - 50_000, 1000),
        # zero rate: never stale regardless of age
        ("u3", "h1", now - 10_000_000, 0),
        # high rate 2000/kday -> target 43200; age 43201 -> stale by 1s
        ("u4", "h2", now - 43_201, 2000),
    ]
    f = spark.createDataFrame(
        rows,
        "url string, host string, last_fetch_epoch bigint, changes_per_kday bigint",
    )
    out = {r.host: r for r in staleness_report(f, now_epoch=now).collect()}
    h1 = out["h1"]
    assert (h1.n_urls, h1.n_stale) == (3, 1)
    assert h1.max_age_s == 10_000_000
    assert h1.sum_age_s == 100_000 + 50_000 + 10_000_000
    assert h1.max_overdue_s == 100_000 - 86_400
    h2 = out["h2"]
    assert (h2.n_urls, h2.n_stale, h2.max_overdue_s) == (1, 1, 1)
