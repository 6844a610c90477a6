"""Live ingest: Structured Streaming over an arriving pages feed.

The reference's live mode is a poll loop — every `block_time` ms fetch
whatever new blocks appeared and run the fixed decode->upsert pipeline
(cmd/onchain.go:16-25, 52-124), checkpointing `latest_block` afterwards
(:115-119). The Spark-native equivalent is a file-source stream: new page
batches (parquet drops) are discovered by the source, each micro-batch runs
the same deterministic canonicalize->extract pipeline, and `foreachBatch`
commits results through the SnapshotStore with the batch id as the round
key — idempotent on replay, which closes the reference's
process-then-checkpoint replay window (T2/T3) exactly like the batch rounds
do.

Streaming-only semantics carried over from SURVEY.md §2.9:
  * T1 pacing  — `trigger(processingTime=...)` ≈ block_time poll cadence
                 (tests use availableNow for determinism);
  * T2 resume  — Spark's own checkpointLocation + the store's idempotent
                 per-batch commit;
  * T4/T5      — watermarked tumbling-window per-host throughput telemetry
                 over `warc_ts` (the reference has no late-data story; we
                 get one for free from `withWatermark`).

All row work stays in the same Arrow UDFs as the batch path, so a page
ingested live yields byte-identical text to the same page in a batch crawl
(input_hint invariant), proven by test_streaming.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.canon import canonicalize_udf, host_udf, url_hash_col
from ..functions.extract import extract_outlinks_udf, extract_text_udf
from ..sources.snapshots import SnapshotStore
from .. import schema as S

PAGE_INDEX = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n_outlinks", T.IntegerType(), True),
        T.StructField("batch_id", T.LongType(), False),
    ]
)

INGEST_STATS = T.StructType(
    [
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("window_end", T.TimestampType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("pages", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("batch_id", T.LongType(), False),
    ]
)


def index_pages(pages: DataFrame) -> DataFrame:
    """The per-batch pipeline: canonicalize + extract, all Arrow UDFs.

    Pure function of its input — the stream and the batch engine share it,
    which is what makes live-vs-batch byte-identity testable."""
    canon = pages.select(
        canonicalize_udf("url").alias("url"),
        "warc_ts",
        "html",
        "lang",
    ).filter(F.col("url").isNotNull())
    return canon.select(
        "url",
        url_hash_col("url").alias("url_hash"),
        host_udf("url").alias("host"),
        "warc_ts",
        extract_text_udf("html").alias("text"),
        "lang",
        F.size(extract_outlinks_udf("html")).cast("int").alias("n_outlinks"),
    )


def batch_stats(indexed: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window per-host page counts (T5 telemetry)."""
    return (
        indexed.withWatermark("warc_ts", "1 hour")
        .groupBy(F.window("warc_ts", window), "host")
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.octet_length("text")).cast("long").alias("bytes"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "host",
            "pages",
            "bytes",
        )
    )


@dataclass
class LiveIngest:
    store: SnapshotStore
    query: object  # StreamingQuery

    def await_termination(self, timeout: float | None = None):
        return self.query.awaitTermination(timeout)

    def stop(self):
        self.query.stop()


def start_live_ingest(
    spark: SparkSession,
    feed_dir: str,
    store: SnapshotStore,
    checkpoint_dir: str,
    trigger_seconds: float | None = None,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> LiveIngest:
    """Stream parquet drops in `feed_dir` into page_index + ingest_stats.

    Exactly-once: Spark's checkpoint makes batch ids stable across restarts,
    and the store commit is keyed on batch_id — a replayed batch replaces its
    own partial output instead of duplicating it."""
    reader = spark.readStream.schema(S.PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        indexed = index_pages(batch_df).cache()
        try:
            stats = batch_stats(indexed)
            store.commit(
                int(batch_id),
                appends={
                    "page_index": indexed.withColumn("batch_id", F.lit(int(batch_id))),
                    "ingest_stats": stats.withColumn("batch_id", F.lit(int(batch_id))),
                },
                counters={"pages": indexed.count()},
            )
        finally:
            indexed.unpersist()

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return LiveIngest(store=store, query=writer.start())


def start_dedup_stream(
    spark: SparkSession,
    feed_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = "1 hour",
) -> "LiveIngest":
    """Streaming URL-seen set with BOUNDED state: emit each canonical
    url_hash once per watermark horizon via dropDuplicatesWithinWatermark.

    This is the streaming analog of the batch seen path (operators/seen.py)
    with an explicit state budget: a key's dedup state lives only until the
    `warc_ts` watermark passes its event time, so executor state is
    O(arrival rate x horizon) — never O(all urls ever) — and a URL
    re-appearing AFTER the horizon is re-emitted (recrawl-tolerant
    semantics, the same freshness contract operators/recrawl.py schedules
    by). Rows older than the current watermark are dropped as late data,
    exactly like every other watermarked stage here (T4).

    Exactly-once: file sink + checkpoint; resume replays no emitted row
    (pinned, with the expiry semantics, by tests/test_streaming.py)."""
    stream = spark.readStream.schema(S.PAGES).parquet(feed_dir)
    canon = stream.select(
        canonicalize_udf("url").alias("url"),
        "warc_ts",
        "lang",
    ).filter(F.col("url").isNotNull())
    deduped = (
        canon.select("url", url_hash_col("url").alias("url_hash"),
                     "warc_ts", "lang")
        .withWatermark("warc_ts", delay)
        .dropDuplicatesWithinWatermark(["url_hash"])
    )
    query = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return LiveIngest(store=None, query=query)
