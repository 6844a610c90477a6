"""Cuckoo-filter unit properties + seen-strategy equivalence.

The three physical seen-set strategies (exact anti-join / broadcast bloom /
per-partition cuckoo) and the salted scheduler MUST all reproduce the
sequential simulator's fetch log bit-for-bit — the physical plan may change,
the crawl may not (SURVEY.md §7 hard-item (e))."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark import schema as S
from layerg_crawler_v2_spark.datagen import build_pages, seed_urls
from layerg_crawler_v2_spark.operators.cuckoo import (
    CuckooFilter,
    build_filters,
    filter_unseen_cuckoo,
    update_filters,
)
from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
from layerg_crawler_v2_spark.streaming.rounds import CrawlConfig, run_crawl

RNG = np.random.default_rng(42)


# --- pure filter properties ---------------------------------------------------


def test_insert_then_contains():
    keys = RNG.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    f = CuckooFilter.for_capacity(len(keys))
    f.insert_many(np.sort(keys))
    assert f.contains(keys).all()


def test_false_positive_rate_bounded():
    keys = RNG.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    other = RNG.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    other = np.setdiff1d(other, keys)
    f = CuckooFilter.for_capacity(len(keys))
    f.insert_many(np.sort(keys))
    fpp = f.contains(other).mean()
    # 16-bit fingerprints, 4-slot buckets: theoretical fpp ~ 2*4/2^16 ≈ 0.012%
    assert fpp < 0.005, fpp


def test_delete_removes_membership():
    keys = np.arange(1000, dtype=np.int64) * 7919
    f = CuckooFilter.for_capacity(len(keys))
    f.insert_many(keys)
    dropped = keys[:100]
    assert f.delete_many(dropped) == 100
    assert not f.contains(dropped).any() or f.contains(dropped).mean() < 0.01
    assert f.contains(keys[100:]).all()


def test_add_if_absent_idempotent():
    keys = np.arange(500, dtype=np.int64)
    f = CuckooFilter.for_capacity(2000)
    assert f.insert_many(keys) == 500
    assert f.insert_many(keys) == 0  # duplicates never double-insert
    assert f.n_keys == 500


def test_serialization_roundtrip_bytes_identical():
    keys = RNG.integers(-(2**62), 2**62, size=3000, dtype=np.int64)
    f = CuckooFilter.for_capacity(len(keys))
    f.insert_many(np.sort(keys))
    blob = f.to_bytes()
    g = CuckooFilter.from_bytes(blob)
    assert g.to_bytes() == blob
    assert g.contains(keys).all()
    assert g.n_keys == f.n_keys


def test_overfull_raises():
    f = CuckooFilter(2)  # 4 buckets * 4 slots = 16 capacity
    with pytest.raises(RuntimeError):
        f.insert_many(np.arange(64, dtype=np.int64))


def test_stack_grows_instead_of_raising():
    """A filter stack absorbs arbitrarily many inserts by appending grown
    filters (ADVICE r1: growing crawls must not crash in cuckoo mode)."""
    from layerg_crawler_v2_spark.operators.cuckoo import (
        stack_contains,
        stack_from_bytes,
        stack_insert,
        stack_to_bytes,
    )

    stack = [CuckooFilter.for_capacity(64)]
    all_keys = []
    for batch in range(6):  # 6 × 500 keys into a 64-capacity start
        keys = np.arange(batch * 500, (batch + 1) * 500, dtype=np.int64) * 7919
        stack_insert(stack, np.sort(keys), headroom=1.0)
        all_keys.append(keys)
    keys = np.concatenate(all_keys)
    assert stack_contains(stack, keys).all()
    assert len(stack) > 1  # actually grew
    # byte round-trip preserves the whole stack
    again = stack_from_bytes(stack_to_bytes(stack))
    assert stack_to_bytes(again) == stack_to_bytes(stack)
    assert stack_contains(again, keys).all()
    # single-filter legacy blobs parse as a 1-deep stack
    solo = CuckooFilter.for_capacity(100)
    solo.insert_many(np.arange(50, dtype=np.int64))
    parsed = stack_from_bytes(solo.to_bytes())
    assert len(parsed) == 1 and parsed[0].contains(np.arange(50, dtype=np.int64)).all()


# --- Spark surface ------------------------------------------------------------


@pytest.fixture(scope="module")
def seen_df(spark):
    return spark.range(0, 2000).select(
        F.xxhash64("id").alias("url_hash"),
        F.concat(F.lit("http://h.example.com/d/"), F.col("id")).alias("url"),
        F.lit(0).alias("first_depth"),
        F.pmod(F.xxhash64("id"), F.lit(8)).cast("int").alias("partition_id"),
    ).cache()


def test_build_and_check_filters(spark, seen_df):
    filters = build_filters(seen_df.select("url_hash"), n_partitions=8).cache()
    rows = filters.collect()
    assert {r["partition_id"] for r in rows} <= set(range(8))
    assert sum(r["n_keys"] for r in rows) == 2000

    # discovered = 1000 seen + 1000 novel
    discovered = spark.range(1000, 3000).select(
        F.concat(F.lit("http://h.example.com/d/"), F.col("id")).alias("url"),
        F.xxhash64("id").alias("url_hash"),
    )
    new = filter_unseen_cuckoo(
        discovered, filters, seen_df.select("url_hash", "url"), n_partitions=8
    )
    got = sorted(r["url"] for r in new.collect())
    want = sorted(f"http://h.example.com/d/{i}" for i in range(2000, 3000))
    assert got == want


def test_update_filters_accumulates(spark, seen_df):
    filters = build_filters(seen_df.select("url_hash"), n_partitions=8)
    new_keys = spark.range(5000, 5500).select(F.xxhash64("id").alias("url_hash"))
    updated = update_filters(filters, new_keys, n_partitions=8).cache()
    assert updated.agg(F.sum("n_keys")).collect()[0][0] == 2500
    # both old and new keys are now members
    probe = spark.range(0, 5500).filter((F.col("id") < 2000) | (F.col("id") >= 5000)).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.xxhash64("id").alias("url_hash"),
    )
    none_new = filter_unseen_cuckoo(
        probe, updated,
        probe.select("url_hash", "url"),  # exact set = everything -> no new
        n_partitions=8,
    )
    assert none_new.count() == 0


# --- end-to-end strategy equivalence -----------------------------------------


@pytest.fixture(scope="module")
def pages_df(spark, sf_dir):
    return build_pages(spark, sf_dir).cache()


def _crawl_log(spark, pages_df, seeds, tmp, cfg):
    store = SnapshotStore(tmp)
    run_crawl(spark, pages_df, seeds, store, cfg)
    rows = (
        store.read(spark, "fetch_log", S.FETCH_LOG).orderBy("round", "seq").collect()
    )
    seen = sorted(
        r["url"] for r in store.read(spark, "url_seen", S.URL_SEEN).collect()
    )
    return [(r["round"], r["seq"], r["url"], r["status"]) for r in rows], seen


def test_seen_strategies_identical_crawl(spark, pages_df, tmp_path):
    n = pages_df.count()
    seeds = seed_urls(n, n_seeds=5)
    base_log, base_seen = _crawl_log(
        spark, pages_df, seeds, str(tmp_path / "exact"),
        CrawlConfig(rounds=3, seen_filter="exact"),
    )
    assert len(base_log) > 0
    for name, cfg in [
        ("bloom", CrawlConfig(rounds=3, use_bloom=True, bloom_min_seen=0)),
        ("cuckoo", CrawlConfig(rounds=3, seen_filter="cuckoo", cuckoo_partitions=8)),
        ("salted", CrawlConfig(rounds=3, scheduler_salt_buckets=4)),
    ]:
        log, seen = _crawl_log(spark, pages_df, seeds, str(tmp_path / name), cfg)
        assert log == base_log, name
        assert seen == base_seen, name


def test_update_filters_grows_under_pressure(spark):
    """Spark-side growth: a tiny initial sizing absorbs a 10× key influx."""
    seed_keys = spark.range(0, 100).select(F.xxhash64("id").alias("url_hash"))
    filters = build_filters(seed_keys, n_partitions=2, headroom=1.0)
    influx = spark.range(100, 1100).select(F.xxhash64("id").alias("url_hash"))
    updated = update_filters(filters, influx, n_partitions=2, headroom=1.0).cache()
    assert updated.agg(F.sum("n_keys")).collect()[0][0] == 1100
    probe = spark.range(0, 1100).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.xxhash64("id").alias("url_hash"),
    )
    none_new = filter_unseen_cuckoo(
        probe, updated, probe.select("url_hash", "url"), n_partitions=2
    )
    assert none_new.count() == 0
    updated.unpersist()


def test_cuckoo_resume_after_mode_switch(spark, pages_df, tmp_path):
    """A store created in exact mode then resumed in cuckoo mode must NOT
    re-admit seen URLs (ADVICE r1: empty filter table ≠ empty seen set)."""
    n = pages_df.count()
    seeds = seed_urls(n, n_seeds=5)
    full_log, full_seen = _crawl_log(
        spark, pages_df, seeds, str(tmp_path / "ex3"),
        CrawlConfig(rounds=3, seen_filter="exact"),
    )
    d = str(tmp_path / "switch")
    _crawl_log(spark, pages_df, seeds, d, CrawlConfig(rounds=2, seen_filter="exact"))
    store = SnapshotStore(d)
    run_crawl(
        spark, pages_df, seeds, store,
        CrawlConfig(rounds=3, seen_filter="cuckoo", cuckoo_partitions=8),
        resume=True,
    )
    rows = store.read(spark, "fetch_log", S.FETCH_LOG).orderBy("round", "seq").collect()
    log = [(r["round"], r["seq"], r["url"], r["status"]) for r in rows]
    seen = sorted(r["url"] for r in store.read(spark, "url_seen", S.URL_SEEN).collect())
    assert log == full_log
    assert seen == full_seen


def test_bloom_auto_switches_to_cuckoo_at_scale(spark, pages_df, tmp_path):
    """VERDICT r2 wrong #2: use_bloom=True must not quietly keep driver
    round-tripping bloom state as seen grows — above bloom_max_seen the
    round hands off to partitioned cuckoo filters, with an identical crawl."""
    n = pages_df.count()
    seeds = seed_urls(n, n_seeds=5)
    base_log, base_seen = _crawl_log(
        spark, pages_df, seeds, str(tmp_path / "exact_as"),
        CrawlConfig(rounds=3, seen_filter="exact"),
    )
    d = str(tmp_path / "autoswitch")
    log, seen = _crawl_log(
        spark, pages_df, seeds, d,
        CrawlConfig(rounds=3, use_bloom=True, bloom_min_seen=0,
                    bloom_max_seen=10, cuckoo_partitions=8),
    )
    assert log == base_log
    assert seen == base_seen
    store = SnapshotStore(d)
    # the handoff actually happened: cuckoo filters exist and cover seen
    assert store.has_table("cuckoo")
    assert store.last_counter("cuckoo_synced", 0) == store.last_counter(
        "seen_total", -1
    )


def test_mode_flipflop_rebuilds_stale_filters(spark, pages_df, tmp_path):
    """A filter table that missed rounds run under OTHER modes is STALE —
    trusting it would mark seen URLs unseen. The `_synced` counters force a
    rebuild from the authoritative seen table on re-entry to each mode."""
    n = pages_df.count()
    seeds = seed_urls(n, n_seeds=5)
    full_log, full_seen = _crawl_log(
        spark, pages_df, seeds, str(tmp_path / "ex_ff"),
        CrawlConfig(rounds=4, seen_filter="exact"),
    )
    d = str(tmp_path / "flipflop")
    # round 0-1 bloom -> bloom table current; round 2 cuckoo -> bloom stale;
    # round 3 bloom again -> MUST rebuild bloom, not trust the stale table
    _crawl_log(spark, pages_df, seeds, d,
               CrawlConfig(rounds=2, use_bloom=True, bloom_min_seen=0))
    store = SnapshotStore(d)
    run_crawl(spark, pages_df, seeds, store,
              CrawlConfig(rounds=3, seen_filter="cuckoo", cuckoo_partitions=8),
              resume=True)
    run_crawl(spark, pages_df, seeds, store,
              CrawlConfig(rounds=4, use_bloom=True, bloom_min_seen=0),
              resume=True)
    rows = store.read(spark, "fetch_log", S.FETCH_LOG).orderBy("round", "seq").collect()
    log = [(r["round"], r["seq"], r["url"], r["status"]) for r in rows]
    seen = sorted(r["url"] for r in store.read(spark, "url_seen", S.URL_SEEN).collect())
    assert log == full_log
    assert seen == full_seen
