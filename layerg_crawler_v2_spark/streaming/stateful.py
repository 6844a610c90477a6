"""Custom stateful streaming operator: per-host crawl-budget tracking with
event-time state TTL, via `applyInPandasWithState`.

The reference enforces per-host pacing only inside a single poll iteration
(cmd/onchain.go's sequential loop has no cross-iteration host memory). A
live crawl needs the cross-batch form: how many pages has this host yielded
ACROSS micro-batches, is it over its crawl budget, and when the host goes
quiet, when can its state be dropped (T6 state TTL — the analog of the
reference's 15-minute Redis TTL caches, db/redis.go:193).

Spark-native shape: `groupBy(host).applyInPandasWithState` with
`GroupStateTimeout.EventTimeTimeout` — state lives in the streaming state
store (RocksDB/HDFS-backed on a cluster, partitioned by host, never on the
driver), and expiry is driven by the WATERMARK, so it is deterministic under
replay: a host whose last page is older than `ttl` behind the watermark gets
one final `expired=true` row and its state is removed. A re-appearing host
starts a fresh budget — exactly Redis-TTL semantics, minus the wall-clock
nondeterminism.

Per-row work stays in pandas on Arrow batches (one call per host per
micro-batch), never per-row Python.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

HOST_BUDGET = T.StructType(
    [
        T.StructField("host", T.StringType(), True),
        T.StructField("batch_pages", T.LongType(), False),
        T.StructField("total_pages", T.LongType(), False),
        T.StructField("total_bytes", T.LongType(), False),
        T.StructField("over_budget", T.BooleanType(), False),
        T.StructField("expired", T.BooleanType(), False),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("total_pages", T.LongType(), False),
        T.StructField("total_bytes", T.LongType(), False),
    ]
)


def track_host_budget(
    indexed: DataFrame,
    max_pages: int,
    ttl: str = "2 hours",
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Streaming per-host budget rows over an indexed pages stream.

    Input needs `host`, `warc_ts`, and a `text` column (bytes accounting).
    Emits one row per host per micro-batch it appears in (cumulative totals,
    over-budget flag), plus one final `expired=true` row when the watermark
    passes the host's last event by `ttl`."""
    ttl_ms = _interval_ms(ttl)

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.hasTimedOut:
            total_pages, total_bytes = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "host": [host],
                    "batch_pages": [0],
                    "total_pages": [total_pages],
                    "total_bytes": [total_bytes],
                    "over_budget": [total_pages > max_pages],
                    "expired": [True],
                }
            )
            return
        batch_pages = 0
        batch_bytes = 0
        ev_max_ms = 0
        for pdf in pdfs:
            batch_pages += len(pdf)
            batch_bytes += int(
                pdf["text"].astype(str).str.len().sum()
            )
            if len(pdf):
                ev_max_ms = max(
                    ev_max_ms, int(pdf["warc_ts"].max().value // 1_000_000)
                )
        total_pages, total_bytes = (state.get if state.exists else (0, 0))
        total_pages += batch_pages
        total_bytes += batch_bytes
        state.update((total_pages, total_bytes))
        # expire when the watermark passes this host's newest event by ttl;
        # clamp above the current watermark (required by the API for very
        # late stragglers)
        state.setTimeoutTimestamp(
            max(ev_max_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {
                "host": [host],
                "batch_pages": [batch_pages],
                "total_pages": [total_pages],
                "total_bytes": [total_bytes],
                "over_budget": [total_pages > max_pages],
                "expired": [False],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        indexed.withWatermark("warc_ts", watermark_delay)
        .groupBy("host")
        .applyInPandasWithState(
            fn,
            outputStructType=HOST_BUDGET,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _interval_ms(interval: str) -> int:
    qty, unit = interval.split()
    mult = {
        "second": 1_000, "seconds": 1_000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
        "day": 86_400_000, "days": 86_400_000,
    }[unit]
    return int(qty) * mult


def start_budget_stream(
    spark,
    feed_dir: str,
    store,
    checkpoint_dir: str,
    max_pages: int,
    ttl: str = "2 hours",
    max_files_per_trigger: int | None = 1,
):
    """Stream parquet page drops through index_pages -> track_host_budget,
    committing each micro-batch's budget rows via the SnapshotStore (batch id
    = round key, idempotent on replay — same discipline as live ingest)."""
    from pyspark.sql import functions as F

    from .. import schema as S
    from .live import LiveIngest, index_pages

    reader = spark.readStream.schema(S.PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)
    budget = track_host_budget(index_pages(stream), max_pages=max_pages, ttl=ttl)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        store.commit(
            int(batch_id),
            appends={
                "host_budget": batch_df.withColumn(
                    "batch_id", F.lit(int(batch_id))
                )
            },
        )

    query = (
        budget.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    return LiveIngest(store=store, query=query)
