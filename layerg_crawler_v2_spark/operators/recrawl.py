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


def change_rate(
    observations: DataFrame,
    key_col: str = "url",
    ts_col: str = "fetch_ts",
    content_col: str = "content_hash",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key Poisson change-rate estimation (Cho & Garcia-Molina,
    "Estimating Frequency of Change", TOIT 2003): from n observation
    INTERVALS of which X showed a changed fingerprint, the naive X/n
    systematically underestimates lambda (two changes inside one interval
    are observed as one) and explodes at X == n. The paper's improved
    estimator is finite and consistent:

        lambda = -ln((n - X + 0.5) / (n + 0.5)) / mean_interval

    This is the MEASUREMENT half the adaptive backoff (`recrawl_schedule`)
    doesn't give: backoff reacts per-key step-by-step; the rate estimate
    feeds budget allocation (expected changes per day per host), staleness
    SLAs (P(change before next fetch) = 1 - exp(-lambda * delta)), and the
    revisit-frequency optimizer of the TODS'03 companion paper.

    Returns one row per key with >= 1 interval: (key, n_intervals,
    n_changes, mean_interval_s, lambda_per_day) — floats rounded 6 for
    cross-engine parity; lambda NULL when the key's observations carry no
    time span. X counts TRANSITIONS whose fingerprint differs from the
    previous observation (the first observation is a baseline, not a
    change — unlike recrawl_schedule's n_changes, which counts it).

    Scale shape: one exchange on the key; the transition flags are one
    window pass and the rest is a map-side-combined aggregation — the
    gaps-and-islands physics recrawl_schedule already pays, minus the
    islands."""
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(content_col).over(w)
    flagged = observations.select(
        F.col(key_col),
        # whole-second epochs (unix_timestamp; TIMESTAMP_NTZ has no direct
        # double cast) — the oracle mirrors with floor(epoch(ts))
        F.unix_timestamp(F.col(ts_col)).cast("double").alias("epoch_s"),
        F.when(
            prev.isNotNull() & ~prev.eqNullSafe(F.col(content_col)), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    agg = (
        flagged.groupBy(key_col)
        .agg(
            (F.count("*") - 1).cast("bigint").alias("n_intervals"),
            F.sum("chg").cast("bigint").alias("n_changes"),
            (F.max("epoch_s") - F.min("epoch_s")).alias("span_s"),
        )
        .filter(F.col("n_intervals") >= 1)
    )
    mean_i = F.col("span_s") / F.col("n_intervals")
    lam_day = F.when(
        F.col("span_s") > 0,
        F.round(
            -F.log(
                (F.col("n_intervals") - F.col("n_changes") + 0.5)
                / (F.col("n_intervals") + 0.5)
            )
            / mean_i
            * 86400.0,
            6,
        ),
    )
    return agg.select(
        F.col(key_col),
        "n_intervals",
        "n_changes",
        F.round(mean_i, 6).alias("mean_interval_s"),
        lam_day.alias("lambda_per_day"),
    )


def revalidation_savings(
    fetches: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    round_col: str = "round",
    fp_col: str = "content_fp",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Conditional-GET economy per host: how much transfer a crawler saves
    by sending If-None-Match/If-Modified-Since on refetches.

    HTTP revalidation (RFC 9110 §13.1): a refetch whose validator (ETag ≈
    content fingerprint) matches the server's current entity comes back
    304 Not Modified with NO body — the crawler pays one round trip, not
    the transfer. Given a fetch history (url, round, content_fp, bytes),
    a refetch is a 304 exactly when its fingerprint equals the previous
    fetch's fingerprint for the same URL; first fetches and changed pages
    are full 200 transfers. This operator classifies every fetch and
    rolls the economy up per host — the planning input for enabling
    conditional requests per host and for the recrawl scheduler above
    (hosts with high 304 rates are over-visited: stretch their intervals).

    All-integer output (counts + byte sums), so the SQL oracle matches
    bit-for-bit; rates are left to the consumer (n_304 / n_refetch).

    Scale shape: one shuffle on url for the lag (per-url partitions are
    history-length sized, never corpus-sized), then a map-side-combined
    groupBy(host) whose exchange is #hosts rows. No driver state, no UDF.

    Returns (host, n_fetch, n_refetch, n_304, bytes_transferred,
    bytes_saved): bytes_saved = body bytes of 304 refetches (not
    transferred); bytes_transferred = body bytes of 200 responses.
    """
    w = Window.partitionBy(url_col).orderBy(F.col(round_col).asc())
    classified = fetches.select(
        F.col(host_col),
        F.col(bytes_col).cast("bigint").alias("__b"),
        F.lag(F.col(fp_col)).over(w).alias("__prev_fp"),
        F.col(fp_col).alias("__fp"),
    ).select(
        host_col,
        "__b",
        F.col("__prev_fp").isNotNull().alias("__is_refetch"),
        (F.col("__prev_fp").isNotNull() & (F.col("__prev_fp") == F.col("__fp"))).alias(
            "__is_304"
        ),
    )
    return classified.groupBy(host_col).agg(
        F.count("*").cast("bigint").alias("n_fetch"),
        F.sum(F.col("__is_refetch").cast("bigint")).alias("n_refetch"),
        F.sum(F.col("__is_304").cast("bigint")).alias("n_304"),
        F.sum(F.when(~F.col("__is_304"), F.col("__b")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("bytes_transferred"),
        F.sum(F.when(F.col("__is_304"), F.col("__b")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("bytes_saved"),
    )


def staleness_report(
    frontier: DataFrame,
    now_epoch: int,
    url_col: str = "url",
    host_col: str = "host",
    last_fetch_col: str = "last_fetch_epoch",
    rate_col: str = "changes_per_kday",
) -> DataFrame:
    """Per-host staleness SLA: how much of the indexed frontier is older
    than its change-rate-derived revisit target.

    The freshness contract (Cho & Garcia-Molina TODS'03): a page changing
    λ times/day should be revisited about every 1/λ days; a page whose age
    exceeds that target is STALE — its indexed copy has likely diverged.
    All arithmetic is INTEGER so the report is engine-exact: the change
    rate arrives as changes-per-1000-days (the integer form change_rate's
    consumers use), target_age_s = 86_400_000 div rate (seconds per
    expected change), age_s = now - last_fetch, stale ⇔ age_s >
    target_age_s. Rates <= 0 or NULL mean "never observed changing":
    target = +inf, never stale (documented; pair with a hard max-age
    policy upstream if unbounded staleness is unacceptable).

    Scale shape: pure projection + one map-side-combined groupBy(host) —
    the exchange carries #hosts integer rows. Compose: change_rate() →
    this report → allocate_budget(weights = stale counts) closes the
    measure→plan→fetch loop.

    Returns (host, n_urls, n_stale, max_age_s, sum_age_s,
    max_overdue_s): overdue = age - target, 0 floor, for SLA alerting.
    """
    age = (F.lit(now_epoch) - F.col(last_fetch_col).cast("bigint")).cast("bigint")
    rate = F.col(rate_col).cast("bigint")
    target = F.when(rate > 0, F.expr("86400000 div " + rate_col).cast("bigint"))
    stale = F.when(target.isNotNull() & (age > target), F.lit(1)).otherwise(
        F.lit(0)
    )
    overdue = F.when(
        target.isNotNull() & (age > target), age - target
    ).otherwise(F.lit(0))
    rows = frontier.select(
        F.col(host_col),
        age.alias("__age"),
        stale.cast("bigint").alias("__stale"),
        overdue.cast("bigint").alias("__overdue"),
    )
    return rows.groupBy(host_col).agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.sum("__stale").cast("bigint").alias("n_stale"),
        F.max("__age").cast("bigint").alias("max_age_s"),
        F.sum("__age").cast("bigint").alias("sum_age_s"),
        F.max("__overdue").cast("bigint").alias("max_overdue_s"),
    )
