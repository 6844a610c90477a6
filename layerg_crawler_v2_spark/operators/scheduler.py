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


def allocate_budget(
    weights: DataFrame,
    total_budget: int,
    key_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """Integer crawl-budget apportionment by Hamilton's largest-remainder
    method: each key gets floor(total * w / W) fetches, and the leftover
    (total - sum of floors, always < #keys) goes one-each to the keys with
    the largest fractional remainders (ties to the smaller key — fully
    deterministic). Quotas sum to EXACTLY total_budget, the property a
    per-round fetch scheduler needs (proportional rounding drifts, and a
    drifted sum either idles fetch slots or violates the global cap).
    (Degenerate case: if every weight is <= 0 there is no eligible key and
    all quotas are 0. Inputs are assumed to keep total * w inside BIGINT —
    true for any real budget x count weights.)

    This is the budget step of Cho & Garcia-Molina's refresh optimization
    reduced to its scheduler contract: upstream supplies the weights
    (host quality x change rate x politeness headroom — e.g.
    host_quality_rollup keep_rates joined with recrawl change_rate);
    this operator turns them into integers that sum. All arithmetic is
    BIGINT (num = total * w; quota = num div W; remainder = num % W), so
    the oracle matches bit-for-bit — no float apportionment anywhere.

    Keys with weight <= 0 or NULL get quota 0 and never receive leftover.
    Scale shape: one map-side-combined global sum (broadcast back as a
    1-row dim), one projection, one window over the remainder order —
    rank only the remainders, never the corpus. At 10^7 hosts the window
    is a single ~10^7-row partition: acceptable for a per-round planning
    step (rows are 3 columns), and replaceable by the two-pass
    range-partitioned rank of operators/sequence.py if hosts outgrow one
    partition."""
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    w = weights.select(
        F.col(key_col),
        F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0)).alias("w"),
    ).withColumn("w", F.when(F.col("w") > 0, F.col("w")).otherwise(F.lit(0)))
    tot = w.agg(F.sum("w").alias("w_total"))
    j = w.crossJoin(F.broadcast(tot))
    j = j.select(
        key_col,
        "w",
        F.when(
            F.col("w_total") > 0, F.expr(f"({total_budget} * w) div w_total")
        )
        .otherwise(F.lit(0))
        .alias("quota_floor"),
        F.when(F.col("w_total") > 0, F.expr(f"({total_budget} * w) % w_total"))
        .otherwise(F.lit(0))
        .alias("rem"),
        F.col("w_total"),
    )
    floors = j.agg(F.sum("quota_floor").alias("floor_sum"))
    rank = F.row_number().over(
        Window.partitionBy(F.lit(1)).orderBy(
            F.col("rem").desc(), F.col(key_col).asc()
        )
    )
    leftover = F.lit(total_budget) - F.col("floor_sum")
    out = j.crossJoin(F.broadcast(floors)).select(
        key_col,
        F.col("w").alias(weight_col),
        (
            F.col("quota_floor")
            + F.when(
                (F.col("w_total") > 0) & (F.col("rem") > 0) & (rank <= leftover),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("quota"),
    )
    return out


def adaptive_crawl_delay(
    fetch_history: DataFrame,
    robots: DataFrame | None = None,
    default_delay_ms: int = 500,
    mult_pct: int = 1000,
    backoff_cap: int = 6,
    max_delay_ms: int = 60_000,
) -> DataFrame:
    """Per-host adaptive politeness delay from observed fetch history —
    the feedback loop the static `hosts` dim (select_for_fetch) can't give.
    Three classic signals, composed:

      * latency-proportional pacing (Heydon & Najork, "Mercator" 1999:
        wait k x last download time, k=10): `mult_pct` percent of the
        host's mean observed latency (1000 = the Mercator 10x);
      * the host's declared robots crawl-delay as a floor (RFC 9309
        extension field; `robots` is a small (host, crawl_delay_ms) dim,
        broadcast like select_for_fetch's hosts);
      * exponential error backoff: the count of TRAILING failures (every
        fetch after the host's last success; all of them when it never
        succeeded) doubles the delay per failure, capped at `backoff_cap`
        doublings — AIMD's multiplicative-increase half, the reference's
        per-chain retry pacing analog (cmd/onchain.go's fixed block_time
        made adaptive).

    delay_ms = least(max_delay_ms,
                     greatest(robots_ms, mult_pct * avg_latency div 100)
                     << consec_fail_tail)

    Integer-exact end to end (the graph.py cash discipline): avg latency
    is an integer div, the backoff a bit shift — a DuckDB oracle replays
    it bit-for-bit; no float ever.

    Input: (host, ts, latency_ms, ok) — ts any totally-ordered type.
    Returns (host, n_fetches, avg_latency_ms, consec_fail_tail, delay_ms).

    Scale shape: two groupBys and one join, ALL keyed on host — one
    logical shuffle; AQE reuses the partitioning for the join and second
    aggregate, and map-side partial aggregation shrinks both exchanges to
    one row per host per partition. No window over the raw log (the
    trailing-failure count needs only last_ok_ts, not per-row ranks).
    """
    last_ok = fetch_history.groupBy("host").agg(
        F.max(F.when(F.col("ok"), F.col("ts"))).alias("last_ok_ts")
    )
    agg = (
        fetch_history.join(last_ok, "host")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_fetches"),
            F.expr("sum(latency_ms) div count(*)").alias("avg_latency_ms"),
            F.least(
                F.lit(backoff_cap).cast("bigint"),
                F.count(
                    F.when(
                        F.col("last_ok_ts").isNull()
                        | (F.col("ts") > F.col("last_ok_ts")),
                        True,
                    )
                ),
            ).alias("consec_fail_tail"),
        )
    )
    if robots is not None:
        agg = agg.join(F.broadcast(robots), "host", "left")
        robots_ms = F.coalesce("crawl_delay_ms", F.lit(default_delay_ms))
    else:
        robots_ms = F.lit(default_delay_ms)
    base = F.greatest(
        robots_ms.cast("bigint"),
        F.expr(f"({mult_pct} * avg_latency_ms) div 100"),
    )
    return agg.select(
        "host",
        F.col("n_fetches").cast("bigint").alias("n_fetches"),
        F.col("avg_latency_ms").cast("bigint").alias("avg_latency_ms"),
        F.col("consec_fail_tail").cast("bigint").alias("consec_fail_tail"),
        F.least(
            F.lit(max_delay_ms).cast("bigint"),
            (
                base
                * F.expr(
                    "shiftleft(CAST(1 AS BIGINT),"
                    " CAST(consec_fail_tail AS INT))"
                )
            ).cast("bigint"),
        ).alias("delay_ms"),
    )


def pool_politeness_schedule(
    queued: DataFrame,
    dns: DataFrame | None = None,
    host_delays: DataFrame | None = None,
    default_delay_ms: int = 500,
    max_parallel: int = 8,
) -> DataFrame:
    """Politeness grouped by IP POOL instead of hostname — the
    vhost-collapse rule (IRLbot, WWW'08 §politeness; Mercator's per-server
    queues key on server, not name): thousands of vanity hostnames behind
    one shared IP must share ONE fetch budget, or per-host pacing DDoSes
    the box behind them. select_for_fetch's per-host discipline, re-keyed:

      pool = coalesce(dns.ip, host)        -- unresolved hosts pace alone
      pool_delay_ms = max(member host delay)  -- most conservative member
      top `max_parallel` per pool by (priority DESC, url ASC), slots
      spaced pool_delay_ms apart as integer offsets.

    `dns` is a small (host, ip) dim and `host_delays` a (host, delay_ms)
    dim — e.g. adaptive_crawl_delay's output — both broadcast like
    select_for_fetch's hosts. Returns (url, host, pool, slot,
    fetch_offset_ms); offsets are integers (caller anchors them on the
    round clock) so the whole schedule is integer-exact and
    oracle-matchable.

    Scale shape: both dims broadcast; the ranking window and the
    pool-delay groupBy shuffle on the SAME pool key (one logical
    exchange, AQE reuses it); the per-pool output is capped at
    max_parallel rows so a mega-pool (CDN IP) never sorts more than its
    queue in one task — the select_for_fetch salt-shard trick applies
    unchanged if a pool's QUEUE itself is skewed."""
    if dns is not None:
        q = queued.join(F.broadcast(dns), "host", "left")
    else:
        q = queued.withColumn("ip", F.lit(None).cast("string"))
    q = q.withColumn("pool", F.coalesce("ip", "host")).drop("ip")
    if host_delays is not None:
        q = q.join(F.broadcast(host_delays), "host", "left")
        q = q.withColumn(
            "delay_ms", F.coalesce("delay_ms", F.lit(default_delay_ms))
        )
    else:
        q = q.withColumn("delay_ms", F.lit(default_delay_ms))
    pool_delay = q.groupBy("pool").agg(
        F.max("delay_ms").alias("pool_delay_ms")
    )
    w = Window.partitionBy("pool").orderBy(F.desc("priority"), F.asc("url"))
    return (
        q.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= F.lit(max_parallel))
        .join(pool_delay, "pool")
        .select(
            "url",
            "host",
            "pool",
            F.col("slot").cast("bigint").alias("slot"),
            ((F.col("slot") - 1) * F.col("pool_delay_ms"))
            .cast("bigint")
            .alias("fetch_offset_ms"),
        )
    )


def rendezvous_assign(
    df: DataFrame,
    shards: list[str],
    key_col: str = "host",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each key goes
    to the shard with the maximal hash(key, shard) — Thaler & Ravishankar
    1998, the consistent-placement rule a distributed frontier uses to pin
    hosts to fetcher shards. The HRW property a plain `hash(key) % K`
    lacks: when a shard is added or removed, ONLY the keys whose winning
    shard changed move (expected 1/(K+1) of them) — every other
    (host → fetcher) binding, with its politeness clock, connection pool,
    and robots cache, stays put. Removal is even cleaner: only the dead
    shard's keys move, exactly to their second choice.

    Deterministic and engine-portable: weight = md5(shard || '|' || key)
    compared AS A HEX STRING (uniform, total order, no integer parsing),
    winner = max_by(shard, struct(weight, shard)) — ties (impossible under
    md5 collision resistance, but the rule is total) break to the larger
    shard name. One max_by groupBy... actually no shuffle at all: shard
    count is small and CONSTANT, so the argmax is unrolled as a greatest()
    fold over K column expressions inside whole-stage codegen — zero
    exchange, zero UDF, the broadcast-dim discipline without even a dim
    table.

    Returns df + (shard STRING, weight STRING) — weight kept for audit.
    """
    if not shards:
        raise ValueError("shards must be non-empty")
    if len(set(shards)) != len(shards):
        raise ValueError("shards must be distinct")
    key = F.col(key_col).cast("string")
    pairs = [
        F.struct(
            F.md5(F.concat(F.lit(s), F.lit("|"), key)).alias("weight"),
            F.lit(s).alias("shard"),
        )
        for s in shards
    ]
    win = F.greatest(*pairs) if len(pairs) > 1 else pairs[0]
    return df.withColumn("__win", win).select(
        "*",
        F.col("__win.shard").alias("shard"),
        F.col("__win.weight").alias("weight"),
    ).drop("__win")
