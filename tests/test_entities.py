"""Entity materialization: incremental batch replay == one-shot aggregate
(transfer_handler.go:288-378 semantics; VERDICT r1 missing #2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
from layerg_crawler_v2_spark.streaming.entities import (
    USERS,
    materialize_events,
    read_balances,
    signed_delta,
    with_week_batch,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return with_week_batch(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).cache()


def _balances(spark, store):
    return {
        r["user_id"]: float(r["balance"])
        for r in read_balances(spark, store).collect()
    }


def test_incremental_equals_one_shot(spark, events, tmp_path):
    store = SnapshotStore(str(tmp_path / "inc"))
    materialize_events(spark, events, store)
    got = _balances(spark, store)
    want = {
        r["user_id"]: float(r["b"])
        for r in events.groupBy("user_id")
        .agg(F.sum(signed_delta(F.col("value"), F.col("event_type"))).alias("b"))
        .collect()
    }
    assert got == want


def test_get_or_create_first_batch(spark, events, tmp_path):
    store = SnapshotStore(str(tmp_path / "users"))
    materialize_events(spark, events, store)
    users = store.read(spark, "users", USERS).collect()
    ids = [r["id"] for r in users]
    assert len(ids) == len(set(ids))  # created exactly once
    first = {
        r["user_id"]: r["fb"]
        for r in events.groupBy("user_id").agg(F.min("batch").alias("fb")).collect()
    }
    for r in users:
        assert r["created_batch"] == first[r["id"]], r


def test_only_dirty_buckets_rewritten(spark, events, tmp_path):
    """The bucketed MERGE rewrites ONLY buckets its deltas touch: a batch
    confined to one user leaves every other bucket's parquet paths
    byte-identical (the Iceberg matched-file-rewrite analog, VERDICT r3
    wrong #2), and replay parity is kept."""
    from layerg_crawler_v2_spark.streaming.entities import N_BALANCE_BUCKETS

    store = SnapshotStore(str(tmp_path / "dirty"))
    batches = sorted(r[0] for r in events.select("batch").distinct().collect())
    ev0 = events.filter(F.col("batch") == batches[0])
    materialize_events(spark, ev0, store)
    before = {
        k: store.bucket_paths("balances", [k]) for k in range(N_BALANCE_BUCKETS)
    }
    one_user = events.filter(F.col("batch") == batches[1]).first()["user_id"]
    ev1 = events.filter(
        (F.col("batch") == batches[1]) & (F.col("user_id") == one_user)
    )
    materialize_events(spark, ev1, store)
    after = {
        k: store.bucket_paths("balances", [k]) for k in range(N_BALANCE_BUCKETS)
    }
    dirty_k = int(one_user) % N_BALANCE_BUCKETS
    assert after[dirty_k] != before[dirty_k]
    for k in range(N_BALANCE_BUCKETS):
        if k != dirty_k:
            assert after[k] == before[k], k
    # parity: the bucketed store equals the one-shot aggregate over ev0+ev1
    both = ev0.unionByName(ev1)
    want = {
        r["user_id"]: float(r["b"])
        for r in both.groupBy("user_id")
        .agg(F.sum(signed_delta(F.col("value"), F.col("event_type"))).alias("b"))
        .collect()
    }
    assert _balances(spark, store) == want


def test_resume_mid_replay(spark, events, tmp_path):
    """Kill after the first two batches; resume matches the full run."""
    full = SnapshotStore(str(tmp_path / "full"))
    materialize_events(spark, events, full)

    part = SnapshotStore(str(tmp_path / "part"))
    batches = sorted(r[0] for r in events.select("batch").distinct().collect())
    materialize_events(
        spark, events.filter(F.col("batch").isin(batches[:2])), part
    )
    materialize_events(spark, events, part)  # resume skips batches <= last
    assert _balances(spark, part) == _balances(spark, full)
