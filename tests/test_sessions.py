"""Native session windows (operators/sessions.py): boundary semantics,
python gaps-and-islands parity, decimal totals."""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

from layerg_crawler_v2_spark.operators.sessions import sessionize

T0 = datetime(2024, 3, 1, 12, 0, 0)
GAP = timedelta(hours=4)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


def _sessions(spark, rows, gap="4 hours"):
    out = sessionize(_events(spark, rows), gap=gap).collect()
    return sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["total_dec"])
        for r in out
    )


def py_sessions(rows, gap=GAP):
    """Sequential gaps-and-islands oracle (mirrors the DuckDB twin in
    __spark_entry__._SESSIONIZE_DUCK)."""
    byu: dict[int, list] = {}
    for u, ts, v in rows:
        byu.setdefault(u, []).append((ts, v))
    out = []
    for u, evs in byu.items():
        evs.sort()
        cur = []
        for ts, v in evs:
            if cur and ts - cur[-1][0] > gap:
                out.append((u, cur))
                cur = []
            cur.append((ts, v))
        out.append((u, cur))
    return sorted(
        (
            u,
            s[0][0],
            len(s),
            sum(Decimal(str(v)).quantize(Decimal("0.01")) for _, v in s),
        )
        for u, s in out
    )


def test_gap_splits_sessions(spark):
    rows = [
        (1, T0, 1.0),
        (1, T0 + timedelta(hours=1), 2.0),
        (1, T0 + timedelta(hours=9), 4.0),
        (2, T0, 8.0),
    ]
    got = _sessions(spark, rows)
    assert [(u, n) for u, _, n, _ in got] == [(1, 2), (1, 1), (2, 1)]
    assert got == py_sessions(rows)


def test_exact_gap_boundary_merges(spark):
    # ts2 - ts1 == gap exactly: Spark session windows merge on TOUCH, so
    # this is ONE session (the oracle's island starts strictly > gap)
    rows = [(1, T0, 1.0), (1, T0 + GAP, 1.0)]
    got = _sessions(spark, rows)
    assert len(got) == 1 and got[0][2] == 2
    assert got == py_sessions(rows)

    # one microsecond PAST the gap: TWO sessions
    rows2 = [(1, T0, 1.0), (1, T0 + GAP + timedelta(microseconds=1), 1.0)]
    got2 = _sessions(spark, rows2)
    assert len(got2) == 2
    assert got2 == py_sessions(rows2)


def test_chained_events_extend_one_session(spark):
    # each consecutive pair is inside the gap, ends 9h apart overall:
    # sessions merge transitively into one
    rows = [(1, T0 + timedelta(hours=3 * i), float(i)) for i in range(4)]
    got = _sessions(spark, rows)
    assert len(got) == 1 and got[0][2] == 4
    assert got == py_sessions(rows)


def test_decimal_totals_exact(spark):
    rows = [(1, T0 + timedelta(minutes=i), 0.1) for i in range(10)]
    (_, _, n, total), = _sessions(spark, rows)
    assert n == 10 and total == Decimal("1.00")


def test_parity_on_random_fixture(spark):
    import random

    rng = random.Random(42)
    rows = [
        (
            rng.randrange(5),
            T0 + timedelta(seconds=rng.randrange(3_000_000)),
            round(rng.uniform(-5, 5), 2),
        )
        for _ in range(400)
    ]
    assert _sessions(spark, rows) == py_sessions(rows)


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    """The SAME sessionize() call runs under Structured Streaming (the
    claim in operators/sessions.py): file-source stream, watermark,
    complete mode (session-window aggs reject update mode; append would
    hold back sessions the final watermark never passes). The complete-
    mode table is the fully-merged session set — asserted equal to the
    batch plan."""
    import random

    rng = random.Random(7)
    rows = [
        (
            rng.randrange(4),
            T0 + timedelta(seconds=rng.randrange(2_000_000)),
            round(rng.uniform(0, 3), 2),
        )
        for _ in range(200)
    ]
    batch_df = _events(spark, rows)
    feed = str(tmp_path / "sess_feed")
    batch_df.coalesce(1).write.mode("overwrite").parquet(feed)

    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(feed)
        .withWatermark("ts", "1 second")
    )
    q = (
        sessionize(stream, gap="4 hours")
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["total_dec"])
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    )
    want = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["total_dec"])
        for r in sessionize(batch_df, gap="4 hours").collect()
    )
    assert got == want and len(got) > 4
