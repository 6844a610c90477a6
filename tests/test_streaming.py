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
