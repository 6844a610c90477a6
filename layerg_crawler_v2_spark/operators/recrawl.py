"""Freshness-aware recrawl scheduling: adaptive revisit intervals from the
observed change history of each URL.

A crawler that refetches everything at one cadence wastes most of its fetch
budget on static pages (Cho & Garcia-Molina, "Effective Page Refresh
Policies" TODS'03). The standard adaptive policy: halve the revisit
interval when content changed since the last fetch, double it when it
didn't (exponential backoff), clamped to [base, max]. The reference's
analog is its fixed block_time poll pacing (cmd/crawler_cmd.go:84) — this
operator is the content-sensitive generalization a web frontier needs.

Implementation: the backoff state is NOT iterated per fetch — the interval
after k consecutive unchanged observations is base·2^k, so the whole policy
reduces to gaps-and-islands over each key's history (change flag via lag →
island id via running sum → streak via row_number), one shuffle on the key,
everything window functions in the JVM. Output is one row per key with the
next fetch time; feed it back as frontier priorities or a scheduler filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    observations: DataFrame,
    key_col: str = "url",
    ts_col: str = "fetch_ts",
    content_col: str = "content_hash",
    tiebreak_col: str | None = None,
    base_interval_s: int = 3600,
    max_interval_s: int = 30 * 86400,
) -> DataFrame:
    """One row per key: (key, last_fetch_epoch, n_obs, n_changes,
    next_interval_s, next_fetch_epoch).

    `n_changes` counts observations whose content differs from the previous
    one (the first observation counts as a change). Epochs are emitted as
    BIGINT seconds so results are engine-portable."""
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)

    prev = F.lag(content_col).over(w)
    changed = F.when(
        prev.isNull() | (prev != F.col(content_col)), 1
    ).otherwise(0)
    flagged = observations.withColumn("__chg", changed)
    flagged = flagged.withColumn(
        "__island",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w_isl = Window.partitionBy(key_col, "__island").orderBy(*order)
    flagged = flagged.withColumn(
        "__unchanged", F.row_number().over(w_isl) - 1
    )

    w_key = Window.partitionBy(key_col)
    w_desc = Window.partitionBy(key_col).orderBy(*[c.desc() for c in order])
    latest = (
        flagged.withColumn("__rn", F.row_number().over(w_desc))
        .withColumn("n_obs", F.count("*").over(w_key))
        .withColumn("n_changes", F.sum("__chg").over(w_key))
        .filter(F.col("__rn") == 1)
    )

    # clamp the exponent before pow so the double never goes inf; the
    # least() below re-clamps to max_interval_s anyway
    interval = F.least(
        F.lit(float(base_interval_s))
        * F.pow(F.lit(2.0), F.least(F.col("__unchanged"), F.lit(40))),
        F.lit(float(max_interval_s)),
    ).cast("long")
    last_epoch = F.unix_timestamp(F.col(ts_col))
    return latest.select(
        F.col(key_col).alias("key"),
        last_epoch.alias("last_fetch_epoch"),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("n_changes").cast("long").alias("n_changes"),
        interval.alias("next_interval_s"),
        (last_epoch + interval).alias("next_fetch_epoch"),
    )
