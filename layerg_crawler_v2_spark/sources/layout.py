"""Z-order data layout + file-level min/max skipping — the Iceberg
manifest analog for multi-column locality.

At 100 TB the fastest scan is the one that never opens the file: engines
skip whole files whose footer min/max cannot satisfy the predicate. A
single-column sort gives that for ONE column; a time+key box query over a
time-sorted table still opens every file. Interleaving the bits of both
columns (Morton / Z-order) makes each file cover a small RECTANGLE of the
(x, y) domain, so min/max pruning works on both columns at once.

The reference stores events keyed by (block height, tx index) — one
physical order serving both height-range and address lookups via indexes
(db/migrations/..._events.sql); a columnar lake gets the same two-axis
locality from layout, not indexes.

Pieces (each independently testable):
  zorder_quantize  — min/max-scale a column to `bits`-bit fixed point
                     (integer arithmetic, bounds from one tiny agg — the
                     analog of Iceberg's partition-bounds metadata)
  morton_interleave— unrolled bit-interleave OR-chain, whole-stage codegen
                     (the same explicit chain runs on DuckDB, so the code
                     is oracle-certifiable bit-for-bit)
  write_zordered   — repartitionByRange on the z-code + sortWithinPartitions
                     → each parquet file covers one z-range rectangle
  parquet_file_stats / pruned_paths / pruned_read
                   — read footers (manifest-scale driver work: one row per
                     FILE, never per data row), intersect with the query
                     box, read only surviving files

Pruning is advisory-only for correctness: pruned_read re-applies the box
filter, so a wrong stats row could only cost performance... except a file
wrongly pruned OUT loses rows — which is why the driver oracle for
`layout_zorder_prune` is the box query over the RAW table: equality proves
no file was wrongly skipped.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_quantize(col: str, lo: int, hi: int, bits: int = 16) -> Column:
    """Scale an integer column with known [lo, hi] bounds to [0, 2^bits-1]
    fixed point, in BIGINT arithmetic (no float rounding)."""
    span = max(int(hi) - int(lo), 1)
    top = (1 << bits) - 1
    return F.expr(f"cast((({col} - {int(lo)}) * {top}) div {span} as bigint)")


def morton_sql(x: str, y: str, bits: int = 16) -> str:
    """The unrolled Z-order bit-interleave as portable SQL text: x's bit i
    lands at position 2i, y's at 2i+1. Runs identically on Spark (inside
    whole-stage codegen) and DuckDB (the oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def morton_interleave(x: str, y: str, bits: int = 16) -> Column:
    return F.expr(morton_sql(x, y, bits))


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    """One tiny agg for quantization bounds — the partition-bounds metadata
    an Iceberg table carries for free."""
    row = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    return {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 16,
) -> dict[str, tuple[int, int]]:
    """Write `df` as ~n_files parquet files clustered by the Z-order code
    of (x_col, y_col). repartitionByRange samples the z distribution so
    files hold contiguous z-ranges (rectangles of the domain);
    sortWithinPartitions tightens every OTHER column's min/max too.
    Returns the quantization bounds (persist them beside the table in a
    real deployment). Both cluster columns must be integral (cast
    timestamps to epoch seconds first)."""
    bounds = column_bounds(df, [x_col, y_col])
    xq = zorder_quantize(x_col, *bounds[x_col], bits=bits)
    yq = zorder_quantize(y_col, *bounds[y_col], bits=bits)
    z = (
        df.withColumn("__xq", xq)
        .withColumn("__yq", yq)
        .withColumn("__z", morton_interleave("__xq", "__yq", bits))
        .drop("__xq", "__yq")
    )
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds


def parquet_file_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-FILE min/max from parquet footers — the manifest read. Driver
    cost is one footer per file (a 100 TB table at 512 MB/file is ~200k
    footer rows; Iceberg stores exactly these in manifest avros so the
    planner never touches the data files). Missing stats for a column mean
    the file cannot be pruned on it (None bounds)."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = os.path.join(path, name)
        md = pq.ParquetFile(f).metadata
        lo: dict[str, object] = {c: None for c in cols}
        hi: dict[str, object] = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                c = col.path_in_schema
                if c not in lo:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        out.append({"path": f, "min": lo, "max": hi})
    return out


def pruned_paths(stats: list[dict], ranges: dict[str, tuple]) -> list[str]:
    """Files whose [min, max] intersects EVERY queried range. A file with
    missing stats on a queried column is kept (prune only on proof)."""
    keep = []
    for s in stats:
        ok = True
        for c, (qlo, qhi) in ranges.items():
            flo, fhi = s["min"].get(c), s["max"].get(c)
            if flo is None or fhi is None:
                continue
            if fhi < qlo or flo > qhi:
                ok = False
                break
        if ok:
            keep.append(s["path"])
    return keep


def pruned_read(
    spark: SparkSession, path: str, ranges: dict[str, tuple]
) -> DataFrame:
    """Box query with file skipping: plan from footer stats, read only
    surviving files, re-apply the exact predicate (pruning is a superset
    guarantee, the filter is the contract)."""
    stats = parquet_file_stats(path, list(ranges))
    paths = pruned_paths(stats, ranges)
    if not paths:
        df = spark.read.parquet(path).limit(0)
    else:
        df = spark.read.parquet(*paths)
    for c, (qlo, qhi) in ranges.items():
        df = df.filter(F.col(c).between(qlo, qhi))
    return df
