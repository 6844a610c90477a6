"""Exact distribution statistics over corpus-scale tables.

Corpus curation decisions ("drop the bottom decile by length", "cap at the
p99 token count") are made against length/score distributions, and the
reference's query surface resolves every aggregate exactly (no sampling
anywhere in its generated query service — SURVEY.md §2.4). approx_percentile
answers these with a sketch whose error bound moves the cut line; these
operators compute the EXACT discrete percentile (the value an ORDER BY ...
OFFSET would return) without ever globally sorting the data.

Scale shape: the only thing shuffled is the VALUE HISTOGRAM — one row per
distinct (group, value), built with a map-side-combined groupBy — never the
corpus rows themselves. Cumulative counts run in a window PARTITIONED BY
group (each group's histogram is processed in parallel across groups; no
single-partition global window). The assumption is per-group distinct-value
cardinality fits a partition — true for lengths/scores/counts (bounded
domains); a boundless-domain column would swap the window for the
range-partitioned two-pass prefix sum `operators/sequence.py` already uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_percentiles_disc(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pcts: Sequence[int] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """Exact discrete percentiles of `value_col` per `group_col`.

    Semantics are percentile_disc / DuckDB quantile_disc: the element at
    1-indexed rank max(1, ceil(q*n)) in the group's sorted order — an
    actual data value, never an interpolation. Ranks are resolved in BIGINT
    arithmetic (`(pct*n + 99) div 100`), so parity with the oracle is exact
    where a float `q*n` drifts at rank boundaries (0.9*500 in doubles is
    450.0000000000000111).

    One shuffle total: the histogram groupBy and both window passes (cum
    count and group total n) share the group-hash partitioning. The tiny
    pct list is exploded per histogram row inside codegen — no join, no
    driver round-trip. Returns (group, pct, val) with val = the percentile
    value, one row per (group, pct).
    """
    hist = df.groupBy(group_col, value_col).agg(F.count("*").alias("cnt"))
    by_group = Window.partitionBy(group_col)
    running = by_group.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        group_col,
        value_col,
        F.sum("cnt").over(running).alias("cum"),
        F.sum("cnt").over(by_group).alias("n"),
    )
    fanned = cum.select(
        group_col,
        value_col,
        "cum",
        "n",
        F.explode(F.array(*[F.lit(int(p)) for p in pcts])).alias("pct"),
    )
    target = F.greatest(
        F.lit(1).cast("bigint"),
        F.expr("(pct * n + 99) div 100").cast("bigint"),
    )
    return (
        fanned.filter(F.col("cum") >= target)
        .groupBy(group_col, "pct")
        .agg(F.min(value_col).alias("val"))
        .select(
            group_col,
            F.col("pct").cast("bigint").alias("pct"),
            F.col("val").cast("bigint").alias("val"),
        )
    )


def analyze_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """ANALYZE-TABLE statistics: one row per column with
    (col_name, row_count, n_nulls, n_distinct, min_value, max_value) —
    the catalog stats a cost-based optimizer (and a data-layout chooser
    like sources/layout.py's z-order) consumes. min/max are emitted as
    strings so one schema serves every column type.

    ONE pass over the table: a single agg computes every column's stats
    (Catalyst expands multi-distinct aggregates internally), then the wide
    1-row result unpivots in-row with posexplode — no per-column scans, no
    driver loop. NDV here is EXACT (count_distinct) to keep the operator
    oracle-checkable; at 100 TB swap in approx_count_distinct (HLL) per
    column — same plan shape, one pass, sketch-sized state."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(c).alias(f"__nd_{c}"),
            # min/max in the column's NATIVE order, cast to string after —
            # casting first would make numeric min/max lexicographic
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__rows").alias("row_count"),
                (F.col("__rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("s")).select("s.*")


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str = "doc_id",
    threshold: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier scoring: the Iglewicz-Hoaglin modified
    z-score 0.6745 * (x - median) / MAD, where MAD is the median absolute
    deviation — both medians EXACT (percentile(0.5), linear interpolation
    at even counts, matching DuckDB's `median`). Unlike mean/stddev
    z-scores, one pathological host can't drag the cut line: median and
    MAD have a 50% breakdown point, which is the property a corpus
    anomaly gate needs when the anomalies are exactly what's being hunted
    (a host serving 100x-size pages moves a mean z-score's own baseline).

    Emits ONE row per input row: (id, group, value, med, mad, mz,
    is_outlier) with mz NULL when the group's MAD is 0 (a degenerate
    constant group scores nobody) and is_outlier = |mz| > threshold.
    med/mad/mz are rounded to 6 for cross-engine float parity.

    Scale shape: two map-side-combined grouped aggregations over the
    VALUES (the percentile buffer per group, never the corpus rows
    re-sorted) + two joins of the corpus against group-sized dims. The
    broadcast hint is explicit and therefore PINNED (AQE does not demote
    an explicit hint): correct for bounded group domains (hosts, sources,
    languages — always dim-sized). A boundless group domain would need
    the hint dropped so both joins plan as hash-exchanges on the group
    key; that variant is one argument away, not automatic.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    withmed = df.join(F.broadcast(med), group_col)
    mad = (
        withmed.select(
            group_col, F.abs(F.col(value_col) - F.col("med")).alias("absdev")
        )
        .groupBy(group_col)
        .agg(F.expr("percentile(absdev, 0.5)").alias("mad"))
    )
    mz = F.when(
        F.col("mad") > 0,
        F.round(
            F.lit(0.6745) * (F.col(value_col) - F.col("med")) / F.col("mad"), 6
        ),
    )
    return (
        withmed.join(F.broadcast(mad), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(value_col),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            mz.alias("mz"),
        )
        .withColumn(
            "is_outlier",
            F.when(F.col("mz").isNotNull(), F.abs("mz") > threshold).otherwise(
                F.lit(False)
            ),
        )
    )
