"""applyInPandasWithState: per-host budget tracking across micro-batches with
event-time state TTL (SURVEY §2.9 T6 — previously declared n/a, now real).

Feed drops are forced into ONE micro-batch each (maxFilesPerTrigger=1 +
explicit file mtimes), so the assertions pin exactly which batch each state
transition happens in: accumulation across batches, over-budget crossing,
watermark-driven expiry of a quiet host, and a fresh budget after expiry."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from layerg_crawler_v2_spark import schema as S
from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
from layerg_crawler_v2_spark.streaming.stateful import (
    HOST_BUDGET,
    start_budget_stream,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)
HTML = b"<html><body>hello world</body></html>"

BUDGET_READ = T.StructType(
    list(HOST_BUDGET.fields) + [T.StructField("batch_id", T.LongType(), False)]
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(url, ts, HTML, None, "en") for url, ts in rows], S.PAGES
    )


def _drop(spark, feed: str, name: str, rows, mtime: float) -> None:
    path = os.path.join(feed, name)
    _pages(spark, rows).repartition(1).write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


@pytest.fixture(scope="module")
def budget_rows(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stateful")
    feed = str(tmp / "feed")
    os.makedirs(feed)
    h10 = T0 + timedelta(hours=10)
    base = 1_700_000_000.0
    # batch 0: host a (3 pages), host b (2 pages) at T0
    _drop(spark, feed, "c0", [
        ("http://hosta.example/1", T0),
        ("http://hosta.example/2", T0 + timedelta(seconds=1)),
        ("http://hosta.example/3", T0 + timedelta(seconds=2)),
        ("http://hostb.example/1", T0),
        ("http://hostb.example/2", T0 + timedelta(seconds=1)),
    ], base)
    # batch 1: host c, 10h later — advances the watermark past a/b's ttl
    _drop(spark, feed, "c1", [
        ("http://hostc.example/1", h10),
        ("http://hostc.example/2", h10),
    ], base + 10)
    # batch 2: host a again (accumulates: expiry only fires for NO-DATA
    # groups) + host d; host b is quiet -> b expires THIS batch
    _drop(spark, feed, "c2", [
        ("http://hosta.example/4", h10 + timedelta(seconds=2)),
        ("http://hostd.example/1", h10 + timedelta(seconds=2)),
    ], base + 20)
    # batch 3: host b returns after expiry -> fresh budget
    _drop(spark, feed, "c3", [
        ("http://hostb.example/3", h10 + timedelta(seconds=4)),
    ], base + 30)

    store = SnapshotStore(str(tmp / "store"))
    ingest = start_budget_stream(
        spark, feed + "/*", store, str(tmp / "ckpt"),
        max_pages=3, ttl="2 hours", max_files_per_trigger=1,
    )
    ingest.await_termination(180)
    rows = store.read(spark, "host_budget", BUDGET_READ).collect()
    return {(r.host, r.batch_id): r for r in rows}


def test_state_accumulates_across_batches(budget_rows):
    a0 = budget_rows[("hosta.example", 0)]
    assert (a0.batch_pages, a0.total_pages, a0.over_budget) == (3, 3, False)
    a2 = budget_rows[("hosta.example", 2)]
    assert (a2.batch_pages, a2.total_pages) == (1, 4)
    assert a2.over_budget  # crossed max_pages=3 via accumulated state
    assert a2.total_bytes > a0.total_bytes


def test_quiet_host_expires_by_watermark(budget_rows):
    b2 = budget_rows[("hostb.example", 2)]
    assert b2.expired
    assert (b2.batch_pages, b2.total_pages) == (0, 2)
    # no spurious expiry rows for hosts that had data
    assert not budget_rows[("hosta.example", 2)].expired
    assert not budget_rows[("hostd.example", 2)].expired


def test_expired_host_restarts_fresh(budget_rows):
    b3 = budget_rows[("hostb.example", 3)]
    assert not b3.expired
    assert (b3.batch_pages, b3.total_pages) == (1, 1)  # NOT 3: state was dropped


def test_no_premature_expiry(budget_rows):
    # batch 1 (host c) must not expire a/b: its watermark still trails T0
    assert ("hosta.example", 1) not in budget_rows
    assert ("hostb.example", 1) not in budget_rows
