"""Structured-Streaming live ingest: batch parity, incrementality, replay
idempotence (SURVEY.md §2.9 T1-T3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark import schema as S
from layerg_crawler_v2_spark.datagen import build_pages
from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
from layerg_crawler_v2_spark.streaming.live import (
    PAGE_INDEX,
    index_pages,
    start_live_ingest,
)


@pytest.fixture(scope="module")
def pages_df(spark, sf_dir):
    return build_pages(spark, sf_dir).cache()


def _drop(pages_df, feed_dir: str, lo: int, hi: int, name: str) -> None:
    """Write one parquet chunk of pages into the feed directory."""
    bucket = F.pmod(F.xxhash64("url"), F.lit(100))
    part = pages_df.filter((bucket >= lo) & (bucket < hi))
    part.coalesce(1).write.mode("overwrite").parquet(os.path.join(feed_dir, name))


def _run_stream(spark, feed_dir, store_dir, ckpt_dir):
    store = SnapshotStore(store_dir)
    ingest = start_live_ingest(
        spark, feed_dir + "/*", store, ckpt_dir, available_now=True
    )
    ingest.await_termination(120)
    return store


def _index_rows(spark, store):
    df = store.read(spark, "page_index", PAGE_INDEX)
    return sorted(
        (r["url"], r["url_hash"], r["host"], r["text"], r["n_outlinks"])
        for r in df.collect()
    )


def test_stream_matches_batch_pipeline(spark, pages_df, tmp_path):
    feed = str(tmp_path / "feed")
    _drop(pages_df, feed, 0, 50, "chunk0")
    _drop(pages_df, feed, 50, 100, "chunk1")

    store = _run_stream(spark, feed, str(tmp_path / "store"), str(tmp_path / "ckpt"))
    got = _index_rows(spark, store)

    want = sorted(
        (r["url"], r["url_hash"], r["host"], r["text"], r["n_outlinks"])
        for r in index_pages(pages_df).collect()
    )
    assert got == want  # live == batch, text byte-identical per url
    assert len(got) > 0


def test_stream_resumes_incrementally(spark, pages_df, tmp_path):
    feed = str(tmp_path / "feed")
    store_dir, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    _drop(pages_df, feed, 0, 60, "chunk0")
    store = _run_stream(spark, feed, store_dir, ckpt)
    n1 = len(_index_rows(spark, store))

    # a later drop: restart the stream with the SAME checkpoint — only the
    # new chunk is processed (reference analog: poll picks up new blocks)
    _drop(pages_df, feed, 60, 100, "chunk1")
    store = _run_stream(spark, feed, store_dir, ckpt)
    rows = _index_rows(spark, store)
    assert len(rows) > n1
    want = sorted(
        (r["url"], r["url_hash"], r["host"], r["text"], r["n_outlinks"])
        for r in index_pages(pages_df).collect()
    )
    assert rows == want

    # replay with a FRESH checkpoint but the same store: batches rerun with
    # the same ids -> commits replace, never duplicate (idempotent replay)
    store = _run_stream(spark, feed, store_dir, str(tmp_path / "ckpt2"))
    assert _index_rows(spark, store) == want


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming URL-seen set with BOUNDED state (start_dedup_stream):
    a canonical url_hash is emitted once per watermark horizon, its dedup
    state expires once the watermark passes event_time + delay (so a
    recrawl-aged URL is re-emitted), and rows older than the watermark
    never produce output."""
    from datetime import datetime

    from layerg_crawler_v2_spark.streaming.live import start_dedup_stream

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ts(h, m=0):
        return datetime(2026, 1, 1, h, m)

    def drop_chunk(name, rows):
        df = spark.createDataFrame(rows, S.PAGES)
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(feed, name))

    a = "http://a.example.com/page"
    b = "http://b.example.com/page"
    # batch 1: A twice inside the horizon (one emit), B once at 13:00 so the
    # post-batch watermark lands at 12:00 (delay = 1 hour)
    drop_chunk(
        "chunk0",
        [
            (a, ts(10, 0), None, None, "en"),
            (a, ts(10, 20), None, None, "en"),
            (b, ts(13, 0), None, None, "en"),
        ],
    )
    q = start_dedup_stream(spark, feed + "/*", out, ckpt, delay="1 hour")
    q.await_termination(120)
    got1 = spark.read.parquet(out)
    assert got1.count() == 2  # A once, B once
    assert got1.select("url_hash").distinct().count() == 2

    # batch 2 (same checkpoint, watermark now 12:00):
    #   A @12:30 — A's state (10:00 + 1h < 12:00) has EXPIRED -> re-emitted
    #   B @11:00 — below the watermark (late) and/or still in state -> no row
    drop_chunk(
        "chunk1",
        [
            (a, ts(12, 30), None, None, "en"),
            (b, ts(11, 0), None, None, "en"),
        ],
    )
    q = start_dedup_stream(spark, feed + "/*", out, ckpt, delay="1 hour")
    q.await_termination(120)
    got2 = spark.read.parquet(out)
    per_url = {r["url"]: r["n"] for r in got2.groupBy("url").agg(F.count("*").alias("n")).collect()}
    assert sum(per_url.values()) == 3
    canon_a = [u for u in per_url if "a.example.com" in u]
    canon_b = [u for u in per_url if "b.example.com" in u]
    assert per_url[canon_a[0]] == 2  # re-emitted after horizon expiry
    assert per_url[canon_b[0]] == 1  # late/duplicate row produced nothing


def test_stream_stats_windowing(spark, pages_df, tmp_path):
    from layerg_crawler_v2_spark.streaming.live import INGEST_STATS

    feed = str(tmp_path / "feed")
    _drop(pages_df, feed, 0, 100, "chunk0")
    store = _run_stream(spark, feed, str(tmp_path / "store"), str(tmp_path / "ckpt"))
    stats = store.read(spark, "ingest_stats", INGEST_STATS)
    total = stats.agg(F.sum("pages")).collect()[0][0]
    indexed = store.read(spark, "page_index", PAGE_INDEX).count()
    assert total == indexed  # windows partition the batch exactly
    # window bounds are aligned, hosts non-null
    bad = stats.filter(
        F.col("window_start").isNull() | (F.col("window_end") <= F.col("window_start"))
    )
    assert bad.count() == 0
