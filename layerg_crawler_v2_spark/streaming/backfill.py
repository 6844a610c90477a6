"""Chunk-aligned historical backfill with per-chunk checkpointed resume.

Graft analog of the reference's backfill worker (cmd/worker_cmd.go:140-214):
a historical block range is split into chunks aligned to a fixed chunk size
(:147-157), each chunk's range is claimed (status CRAWLING), processed, and
marked CRAWLED with its cursor persisted so a killed worker resumes at the
first unfinished chunk.

Spark-first shape: a chunk is a `warc_ts` range PREDICATE on the pages table
— Catalyst pushes it to the parquet scan (partition pruning on a
date-partitioned Iceberg table), so a chunk touches only its own files, never
the whole corpus. Each chunk commits ONE atomic snapshot through
SnapshotStore: the processed output + a cursor row. The reference needs the
intermediate CRAWLING status because its side effects are visible before the
cursor write; under snapshot-atomic commits a half-processed chunk is simply
never referenced, so the persisted status is always CRAWLED and `progress`
derives PENDING rows from the plan — same observable contract, no replay
window.

Default per-page processing re-runs the extraction pipeline (text +
outlink count + fingerprint) — the "re-index a historical range after a
handler fix" use case; pass `transform` for custom reprocessing.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.canon import canonicalize_udf
from ..functions.extract import extract_outlinks_udf, extract_text_udf
from ..sources.snapshots import SnapshotStore

BACKFILL_CURSOR = T.StructType(
    [
        T.StructField("chunk_id", T.IntegerType(), False),
        T.StructField("chunk_start", T.TimestampType(), False),
        T.StructField("chunk_end", T.TimestampType(), False),
        T.StructField("status", T.StringType(), False),  # CRAWLED (see above)
        T.StructField("rows", T.LongType(), False),
    ]
)

BACKFILL_OUT = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("n_links", T.IntegerType(), False),
        T.StructField("text_hash", T.StringType(), True),
        T.StructField("chunk_id", T.IntegerType(), False),
    ]
)


@dataclass
class BackfillConfig:
    start_ts: datetime
    end_ts: datetime  # half-open [start, end)
    chunk_seconds: int = 3600


def plan_chunks(cfg: BackfillConfig) -> list[tuple[datetime, datetime]]:
    """Chunk the range on boundaries ALIGNED to chunk_seconds (epoch-floored,
    worker_cmd.go:147-157 analog): restarting with the same config always
    reproduces the identical chunk list, so cursors stay meaningful."""
    step = cfg.chunk_seconds
    first = int(cfg.start_ts.timestamp()) // step * step
    out = []
    t = first
    end = int(cfg.end_ts.timestamp())
    while t < end:
        out.append(
            (
                datetime.fromtimestamp(t, tz=timezone.utc),
                datetime.fromtimestamp(t + step, tz=timezone.utc),
            )
        )
        t += step
    return out


def default_reindex(chunk: DataFrame) -> DataFrame:
    """Re-extraction over a chunk: canonical url, outlink count, text hash."""
    return chunk.select(
        canonicalize_udf("url").alias("url_canon"),
        "warc_ts",
        F.size(extract_outlinks_udf("html")).alias("n_links"),
        F.md5(extract_text_udf("html").cast("binary")).alias("text_hash"),
    ).filter(F.col("url_canon").isNotNull())


def run_backfill(
    spark: SparkSession,
    pages: DataFrame,
    store: SnapshotStore,
    cfg: BackfillConfig,
    transform=default_reindex,
    resume: bool = True,
    max_chunks: int | None = None,
) -> dict[str, int]:
    """Process (or resume) the range; one atomic commit per chunk.

    `max_chunks` bounds this invocation (the kill-and-resume test's hook and
    the production "N chunks per worker lease" knob)."""
    chunks = plan_chunks(cfg)
    last = store.last_round() if resume else None
    start_idx = 0 if last is None else last + 1
    done = 0
    for i in range(start_idx, len(chunks)):
        if max_chunks is not None and done >= max_chunks:
            break
        cs, ce = chunks[i]
        # range predicate reaches the parquet scan (PushedFilters on warc_ts)
        chunk = pages.filter((F.col("warc_ts") >= cs) & (F.col("warc_ts") < ce))
        out = transform(chunk).withColumn("chunk_id", F.lit(i)).cache()
        n = out.count()
        cursor = spark.createDataFrame(
            [(i, cs, ce, "CRAWLED", n)], BACKFILL_CURSOR
        )
        store.commit(
            i,
            appends={"backfill_out": out, "backfill_cursor": cursor},
            counters={"chunk": i, "rows": n},
        )
        out.unpersist()
        done += 1
    return {"chunks_done": done, "total_chunks": len(chunks)}


def backfill_progress(
    spark: SparkSession, store: SnapshotStore, cfg: BackfillConfig
) -> DataFrame:
    """Per-chunk status view: committed cursor rows + PENDING rows derived
    from the (deterministic) chunk plan — the worker's progress API."""
    plan = spark.createDataFrame(
        [(i, cs, ce) for i, (cs, ce) in enumerate(plan_chunks(cfg))],
        "chunk_id int, chunk_start timestamp, chunk_end timestamp",
    )
    cur = store.read(spark, "backfill_cursor", BACKFILL_CURSOR).select(
        "chunk_id", "status", "rows"
    )
    return plan.join(cur, on="chunk_id", how="left").select(
        "chunk_id",
        "chunk_start",
        "chunk_end",
        F.coalesce("status", F.lit("PENDING")).alias("status"),
        F.coalesce("rows", F.lit(0)).cast("long").alias("rows"),
    )
