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
