"""Priority + politeness scheduling for one frontier round.

Reference analogs:
  * per-chain pacing — one goroutine per chain fires every `block_time` ms
    (cmd/onchain.go:16-25, block_time=500 cmd/crawler_cmd.go:84). Here: each
    host gets at most `max_parallel` fetches per round, spaced `delay_ms`
    apart on a simulated per-round clock, so no host is hit faster than its
    budget no matter how many executors run.
  * "next block per chain" cursor (cmd/onchain.go:75) → top-K per host by
    (priority DESC, url ASC) via a host-partitioned window — never a global
    window, so the selection parallelizes across host buckets.

Determinism (SURVEY.md §7 hard-item (e)): ordering is fully defined by
(priority, host, url); the round clock is simulated (EPOCH + round*1h), so
golden fixtures hold on any cluster at any parallelism.

Skew: the window partitions by host; a hot host is one partition, but its
output is capped at max_parallel rows, so the expensive downstream work
(fetch+extract) is rebalanced by the later repartition — the analog of
hot-host salting for the fetch stage lives in rounds.py.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND_EPOCH = datetime.datetime(2024, 6, 1, tzinfo=datetime.timezone.utc)
ROUND_SPACING_S = 3600


def round_start(round_no: int) -> datetime.datetime:
    return ROUND_EPOCH + datetime.timedelta(seconds=round_no * ROUND_SPACING_S)


def select_for_fetch(
    queued: DataFrame,
    hosts: DataFrame | None,
    round_no: int,
    default_delay_ms: int = 500,
    default_max_parallel: int = 8,
    salt_buckets: int = 0,
) -> DataFrame:
    """Pick this round's fetch set: top max_parallel per host, paced.

    Returns queued columns + (slot, fetch_ts). `hosts` is a small dim table
    (host, delay_ms, max_parallel) — broadcast, the analog of the in-memory
    chain config map (cmd/crawler_cmd.go:27).

    `salt_buckets > 0` enables the hot-host skew split (SURVEY.md §4): a
    first window partitioned by (host, xxhash64(url) % salt) keeps only each
    salt shard's top max_parallel, so no single task ever sorts a hot host's
    whole queue; the second window then picks the global per-host top-K from
    ≤ salt_buckets × max_parallel survivors. Result is IDENTICAL to the
    unsalted plan (any global top-K row is its shard's top-K row — the order
    (priority DESC, url ASC) is total), only the physical distribution
    changes."""
    if hosts is not None:
        q = queued.join(F.broadcast(hosts), on="host", how="left")
    else:
        q = queued.withColumn("delay_ms", F.lit(None).cast("int")).withColumn(
            "max_parallel", F.lit(None).cast("int")
        )
    q = q.withColumn("delay_ms", F.coalesce("delay_ms", F.lit(default_delay_ms)))
    q = q.withColumn(
        "max_parallel", F.coalesce("max_parallel", F.lit(default_max_parallel))
    )
    if salt_buckets > 0:
        salt = F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
        w0 = Window.partitionBy("host", salt).orderBy(
            F.desc("priority"), F.asc("url")
        )
        q = (
            q.withColumn("__shard_slot", F.row_number().over(w0))
            .filter(F.col("__shard_slot") <= F.col("max_parallel"))
            .drop("__shard_slot")
        )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    picked = (
        q.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= F.col("max_parallel"))
    )
    start = F.lit(round_start(round_no))
    return picked.withColumn(
        "fetch_ts",
        start
        + (F.col("slot") - 1) * F.col("delay_ms") * F.expr("INTERVAL 1 MILLISECOND"),
    ).drop("delay_ms", "max_parallel")


def politeness_violations(fetch_log: DataFrame, hosts: DataFrame | None, default_delay_ms: int = 500) -> DataFrame:
    """Audit: consecutive same-host fetches closer than the host's budget.

    The lag-window check from SURVEY.md W3; used by tests and ops, returns an
    empty DataFrame when the schedule is polite."""
    w = Window.partitionBy("host").orderBy("fetch_ts")
    lagged = fetch_log.withColumn("prev_ts", F.lag("fetch_ts").over(w))
    if hosts is not None:
        lagged = lagged.join(F.broadcast(hosts), on="host", how="left")
        lagged = lagged.withColumn(
            "delay_ms", F.coalesce("delay_ms", F.lit(default_delay_ms))
        )
    else:
        lagged = lagged.withColumn("delay_ms", F.lit(default_delay_ms))
    gap_ms = (
        F.col("fetch_ts").cast("double") - F.col("prev_ts").cast("double")
    ) * 1000.0
    return lagged.filter(F.col("prev_ts").isNotNull() & (gap_ms < F.col("delay_ms")))
