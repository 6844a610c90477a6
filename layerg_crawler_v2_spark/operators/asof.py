"""As-of join and range (interval) join — the time-series join shapes.

Spark has no ASOF JOIN operator (Catalyst's join types are equi/theta);
the standard workaround — a theta join `l.ts >= r.ts` + row_number — is a
disguised O(|L|*|R|) per key. This module implements the real thing as the
UNION + CARRY-FORWARD plan: tag both sides, union, one window per key
ordered by (ts, side), carry the last state row forward with
`last(..., ignorenulls=True)`. ONE shuffle on the key, linear per-key work
after the sort — the plan a time-series engine (kdb, QuestDB, Flink
temporal join) executes natively. The DuckDB oracle runs its NATIVE
`ASOF LEFT JOIN` — two entirely different algorithms, same semantics, so
parity actually certifies the semantics rather than the implementation.

Boundary semantics pinned: a probe at ts matches state rows with
state.ts <= probe.ts (inclusive) — encoded by sorting state (side=0)
before probes (side=1) at equal ts; duplicate state timestamps per key
are pre-deduped by the caller-named tie rule (latest wins here means max
by the dedup ordering), because "two states at the same instant" has no
as-of answer.

The range join is the other brief-named shape: probe rows joined to
interval rows containing them. Small interval side -> broadcast theta
join (each probe scans only broadcast intervals); large interval side at
scale -> bucket both sides by floor(ts / bucket) and equi-join on the
bucket key first (interval spans <= bucket width touch <= 2 buckets) —
`range_join_bucketed` implements that co-partitioned form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    states: DataFrame,
    key_col: str,
    ts_col: str,
    state_cols: list[str],
) -> DataFrame:
    """For each probe row: the latest state row of the same key with
    state.ts <= probe.ts. Returns the probe columns + `asof_<c>` for each
    state column (+ `asof_ts`), NULL when no state precedes the probe."""
    carried = [f"asof_{c}" for c in state_cols]
    s = states.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.col(ts_col).alias("asof_ts"),
        *[F.col(c).alias(a) for c, a in zip(state_cols, carried)],
        *[
            F.lit(None).cast(probes.schema[c].dataType).alias(f"__p_{c}")
            for c in probes.columns
        ],
    )
    p = probes.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.lit(None).cast(states.schema[ts_col].dataType).alias("asof_ts"),
        *[
            F.lit(None).cast(states.schema[c].dataType).alias(a)
            for c, a in zip(state_cols, carried)
        ],
        *[F.col(c).alias(f"__p_{c}") for c in probes.columns],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = s.unionByName(p)
    filled = unioned.select(
        "__side",
        *[F.col(f"__p_{c}").alias(c) for c in probes.columns],
        F.last("asof_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


def range_join_broadcast(
    probes: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """probe rows ⋈ intervals with start <= ts < end, interval side
    broadcast — the small-dim form (maintenance windows, experiment
    phases). Inclusive start, exclusive end (half-open, composable)."""
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return probes.join(F.broadcast(intervals), on=cond, how="inner")


def range_join_bucketed(
    probes: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """The at-scale form: both sides bucketed by floor(epoch/bucket), an
    EQUI-join on (bucket) prunes the cross product to co-resident rows,
    then the interval predicate filters exactly. The sequence-explode
    replicates each interval to EVERY bucket it touches, so any span is
    correct; the replication factor is span/bucket_seconds — pick the
    bucket near the typical span so most intervals land in 1-2 buckets."""
    b = F.lit(bucket_seconds)
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(start_col) / b),
                F.floor((F.unix_timestamp(end_col) - F.lit(1)) / b),
            )
        ),
    )
    probed = probes.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / b)
    )
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return (
        probed.join(ivals, on="__bucket", how="inner")
        .filter(cond)
        .drop("__bucket")
    )
