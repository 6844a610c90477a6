"""Scalable deterministic global sequence numbers.

A total order is required for the fetch log (golden crawl-order fixtures) but
`row_number().over(Window.orderBy(...))` collapses to ONE partition — fatal at
10^10-URL scale. This is the standard two-pass parallel ranking instead:

  1. range-repartition + sort within partitions on the sort keys
     (parallel total sort — same machinery as `df.orderBy`),
  2. count rows per partition (tiny driver-side collect of P integers),
  3. broadcast cumulative offsets; each partition assigns
     seq = offset[pid] + local_index inside one Arrow pass.

Deterministic for any input partitioning because the order is fully defined
by the sort keys (SURVEY.md §7 hard-item (e)); ties must not exist (callers
include a unique key such as url)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_global_seq(
    df: DataFrame,
    sort_cols: list[Column],
    seq_col: str = "seq",
    num_partitions: int | None = None,
    start: int = 0,
    cleanup: list | None = None,
    total_out: list | None = None,
) -> DataFrame:
    """`total_out`: optional list the TOTAL row count is appended to — the
    per-partition count pass already computes it, so callers that need
    |df| (e.g. the round's checkpoint bookkeeping) get it for free instead
    of running a separate count job.

    `cleanup`: optional registry the internal cached frame is appended to;
    the CALLER unpersists entries after materializing the result (the cache
    must outlive the assign pass — unpersisting early would re-run the range
    partitioner, whose sampling need not reproduce the counted layout). When
    no registry is passed the cache is left pinned (leaks one plan per call —
    long-running round loops must pass one)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    # cache so the count pass and the assign pass see the identical partitioning
    with_pid = ordered.withColumn("__pid", F.spark_partition_id()).cache()
    if cleanup is not None:
        cleanup.append(with_pid)
    # AQE may coalesce; use the observed pids. This is a small aggregate
    # (P rows), not a data collect.
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if total_out is not None:
        total_out.append(acc - start)

    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(seq_col, T.LongType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for b in batches:
            if len(b) == 0:
                continue
            pid = int(b["__pid"].iloc[0])
            b = b.drop(columns=["__pid"])
            b[seq_col] = range(offsets[pid] + local, offsets[pid] + local + len(b))
            local += len(b)
            yield b

    # NOTE: mapInPandas preserves the within-partition sort order and the
    # partition's pid column tells us our global offset.
    return with_pid.mapInPandas(assign, schema=out_schema)


def with_global_cumsum(
    df: DataFrame,
    value_col: str,
    sort_cols: list[Column],
    out_col: str = "cum",
    num_partitions: int | None = None,
    cleanup: list | None = None,
) -> DataFrame:
    """Inclusive global prefix sum of `value_col` over the total order given
    by `sort_cols` — the same two-pass parallel scheme as with_global_seq
    (range-partition + per-partition SUM -> broadcast offsets -> one Arrow
    pass adds offset + local cumsum), because `sum().over(Window.orderBy())`
    without a partitionBy collapses to ONE partition exactly like
    row_number does. NULL values count as 0. Same `cleanup` contract as
    with_global_seq."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    with_pid = ordered.withColumn("__pid", F.spark_partition_id()).cache()
    if cleanup is not None:
        cleanup.append(with_pid)
    sums = {
        r["__pid"]: r["s"]
        for r in with_pid.groupBy("__pid")
        .agg(F.sum(F.coalesce(F.col(value_col), F.lit(0))).alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid] or 0)

    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(out_col, T.LongType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = 0
        for b in batches:
            if len(b) == 0:
                continue
            pid = int(b["__pid"].iloc[0])
            b = b.drop(columns=["__pid"])
            vals = b[value_col].fillna(0).astype("int64")
            b[out_col] = vals.cumsum() + (offsets[pid] + run)
            run += int(vals.sum())
            yield b

    return with_pid.mapInPandas(assign, schema=out_schema)


def pack_contiguous(
    df: DataFrame,
    value_col: str,
    sort_cols: list[Column],
    budget: int,
    pack_col: str = "pack_id",
    num_partitions: int | None = None,
    cleanup: list | None = None,
) -> DataFrame:
    """Deterministic contiguous sequence packing for pretraining batches:
    documents in `sort_cols` order are assigned pack_id =
    floor(exclusive-prefix-sum(value_col) / budget). Docs are never split;
    each pack's token total is <= budget + (its final doc's tokens), packs
    are contiguous runs of the global order, and the assignment is exact
    integer arithmetic — identical under any input partitioning and in any
    engine (the DuckDB oracle reproduces it with one window cumsum). This is
    the scalable analog of greedy first-fit packing: the sequential
    recurrence ("close the bin when the next doc overflows") cannot be
    expressed as a prefix sum, so large-scale pipelines use exactly this
    bounded-overflow contiguous form."""
    out = with_global_cumsum(
        df, value_col, sort_cols, out_col="__cum",
        num_partitions=num_partitions, cleanup=cleanup,
    )
    excl = F.col("__cum") - F.coalesce(F.col(value_col), F.lit(0))
    return out.withColumn(
        pack_col, F.floor(excl / F.lit(budget)).cast("long")
    ).drop("__cum")


def chop_spans(
    df: DataFrame,
    value_col: str,
    sort_cols: list[Column],
    capacity: int,
    num_partitions: int | None = None,
    cleanup: list | None = None,
) -> DataFrame:
    """Concat-and-chop sequence packing — the OTHER pretraining packing
    discipline, complementing pack_contiguous: documents are concatenated
    in `sort_cols` order into one global token stream and cut at EXACT
    `capacity` boundaries, so every bin holds exactly `capacity` tokens
    (except the last) and a document crossing a boundary is SPLIT across
    bins (the GPT/Llama pretraining convention: zero padding, attention
    masks handle the seams). pack_contiguous trades exactness for
    never-splitting; this trades splitting for exactness.

    Output: one row per (document, bin) SPAN —
      (df columns..., bin_id, doc_offset, bin_offset, n_tokens)
    with doc_offset/bin_offset 0-based; a doc spanning k boundaries emits
    k+1 rows. Zero/NULL-token docs emit nothing.

    Exact integer arithmetic over the global prefix sum
    (with_global_cumsum's two-pass scheme — no single-partition window),
    then one bounded explode per doc (span count = tokens/capacity + 1);
    identical on any partitioning and any engine (the oracle replays it
    with a window cumsum + generate_series)."""
    out = with_global_cumsum(
        df, value_col, sort_cols, out_col="__cum",
        num_partitions=num_partitions, cleanup=cleanup,
    )
    v = F.coalesce(F.col(value_col), F.lit(0))
    out = (
        out.withColumn("__start", F.col("__cum") - v)
        .filter(v > 0)
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("__start") / capacity),
                    F.floor((F.col("__cum") - 1) / capacity),
                )
            ),
        )
    )
    seg_lo = F.greatest(F.col("__start"), F.col("__bin") * capacity)
    seg_hi = F.least(F.col("__cum"), (F.col("__bin") + 1) * capacity)
    return (
        out.withColumn("bin_id", F.col("__bin").cast("long"))
        .withColumn(
            "doc_offset", (seg_lo - F.col("__start")).cast("long")
        )
        .withColumn(
            "bin_offset", (seg_lo - F.col("__bin") * capacity).cast("long")
        )
        .withColumn("n_tokens", (seg_hi - seg_lo).cast("long"))
        .drop("__cum", "__start", "__bin")
    )
