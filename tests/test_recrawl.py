"""Adaptive recrawl policy: planted change histories."""

from __future__ import annotations

from datetime import datetime, timezone

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
