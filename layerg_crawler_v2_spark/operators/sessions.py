"""Event sessionization: native session windows over the activity stream.

The reference's event pipeline groups rows by block/batch boundaries
(`internal/worker/worker.go` drains per-block batches; SURVEY.md A5's
per-batch rollup is the driver-oracled twin). The webtext/analytics analog
users actually ask for is *sessions*: group a user's events into bursts
separated by an inactivity gap, then aggregate per burst — the canonical
"session window" shape.

Spark side: `F.session_window(ts, gap)` — the NATIVE operator, one
groupBy(user, session_window) that Catalyst executes as a sort-merge
within user partitions and that transfers verbatim to Structured
Streaming: tests/test_sessions.py runs THIS function over a file-source
stream with a watermark and asserts batch parity (complete output mode —
Spark rejects update mode for session-window aggs, and append emits a
session only once the watermark passes its end). No window-function
self-join, no driver loops.

Semantics pinned cross-engine: two consecutive events of the same user
belong to one session iff ts2 - ts1 <= gap, microsecond-exact — Spark
merges [ts, ts+gap] windows that overlap OR touch, so the boundary case
ts2 - ts1 == gap MERGES (verified empirically; the fixture in
test_sessions.py pins it). The DuckDB oracle's gaps-and-islands
formulation starts an island on `epoch_us diff > gap_us` — strictly
greater — encoding the identical merge-on-touch boundary.

Scale shape: ONE shuffle on user_id (the session merge is per-user local
work after the exchange); aggregates are map-side-combined; skewed users
(bots) are bounded by the politeness/trap layers upstream — and the gap
merge is linear in a user's events, not quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "4 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (user, session) stats: start, event count, exact value total.

    Returns (user_id, session_start timestamp, n_events, total DECIMAL):
    one row per inactivity-gap-separated burst. Decimal totals keep the
    sum order-independent (the repo's cross-engine discipline).
    """
    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("sw")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(30,2)")).alias("total_dec"),
        )
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            "n_events",
            "total_dec",
        )
    )
