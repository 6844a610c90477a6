"""DSIR — Data Selection with Importance Resampling (Xie et al., 2023,
arXiv:2302.03169) over hashed n-gram features, the standard recipe for
steering a raw web crawl toward a curated target distribution.

Three stages, each with an explicit 100-TB shape:

  1. FEATURES — every document maps to hashed n-gram buckets: lowercase
     alpha tokens, unigrams + space-joined bigrams, bucket =
     first-8-hex-chars of md5 mod B. One whole-stage-codegen projection
     per row (split + transform + pmod), zero shuffle, no Python. The md5
     family (not xxhash64) is deliberate: it is the module-wide
     cross-engine determinism discipline (operators/sampling.py) — DuckDB
     computes the identical bucket via ('0x'||substr(md5(g),1,8))::BIGINT,
     so the whole pipeline is SQL-oracle-checkable bit-for-bit.

  2. FIT — bag-of-buckets unigram models for the target corpus and the
     raw corpus are two counts per bucket: ONE map-side-combined groupBy
     whose exchange carries at most B rows (B = 4096 default), collected
     to the driver. The model is ≤ B integers — the one structure in this
     module that is driver-resident, and it is O(B), never O(data). The
     per-bucket importance log-ratio is Laplace-smoothed and stored as
     integer micro-nats (round(ln-ratio * 1e6)), so every downstream sum
     is exact integer arithmetic with no float-summation-order hazard.

  3. SCORE + RESAMPLE — the fitted model re-enters the plan as ONE
     literal array<long> (32 KB at B=4096): per-doc log-weight is an
     F.aggregate fold over the bucket array with element_at into the
     literal — zero shuffle, zero join, pure codegen. Resampling uses the
     Gumbel-top-k theorem (top-k of log w_i + G_i samples k docs without
     replacement with probability proportional to w_i); the Gumbel noise
     is derived from md5(doc_id) so the SAME documents win on any engine,
     any partitioning, any run — the property that makes data-mixture
     ablations comparable (same discipline as sampling.hash_keep). The
     global top-k is a TakeOrderedAndProject, not a full sort.

At a 10^10-doc crawl the only aggregations are the B-row fit (once) and
the final top-k; scoring is embarrassingly parallel. Nothing is ever
O(corpus) on the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 4096
SCALE = 1_000_000
_U32 = float(1 << 32)


def gram_buckets(text_col: str, n_buckets: int = N_BUCKETS) -> Column:
    """array<bigint> of hashed n-gram buckets (unigrams + bigrams) for a
    text column. Pure codegen projection; the sequence() guard matters
    because Spark's sequence(1, 0) runs DESCENDING instead of empty."""
    toks = f"filter(split(lower({text_col}), '[^a-z]+'), t -> t <> '')"
    return F.expr(
        f"""
        transform(
          concat(
            {toks},
            CASE WHEN size({toks}) >= 2
                 THEN transform(sequence(1, size({toks}) - 1),
                                i -> concat(element_at({toks}, i), ' ',
                                            element_at({toks}, i + 1)))
                 ELSE array() END),
          g -> pmod(cast(conv(substr(md5(g), 1, 8), 16, 10) AS bigint),
                    {int(n_buckets)}))
        """
    )


def fit_logratio_micro(
    df: DataFrame,
    target_col: Column,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> list[int]:
    """Fit the DSIR importance model: per-bucket integer micro-nat
    log-ratio ln(p_target[b] / p_raw[b]) with Laplace(1) smoothing.

    `target_col` is a boolean column marking the curated subset; the raw
    model is fitted on ALL rows of `df`. Returns a Python list of length
    `n_buckets` — the ≤B-integer model that re-enters the plan as one
    literal array (the collect here is bounded by B, never by |df|)."""
    counts = (
        df.select(F.explode(gram_buckets(text_col, n_buckets)).alias("bkt"),
                  target_col.alias("__is_t"))
        .groupBy("bkt")
        .agg(
            F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("ct"),
            F.count(F.lit(1)).alias("cr"),
        )
        .collect()
    )
    total_t = sum(r["ct"] for r in counts)
    total_r = sum(r["cr"] for r in counts)
    ct = [0] * n_buckets
    cr = [0] * n_buckets
    for r in counts:
        ct[r["bkt"]] = r["ct"]
        cr[r["bkt"]] = r["cr"]
    denom_t = float(total_t + n_buckets)
    denom_r = float(total_r + n_buckets)
    return [
        int(round((math.log((ct[b] + 1.0) / denom_t)
                   - math.log((cr[b] + 1.0) / denom_r)) * SCALE))
        for b in range(n_buckets)
    ]


def importance_weights(
    df: DataFrame,
    logratio_micro: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, n_grams, logw_micro): per-doc DSIR log importance weight in
    exact integer micro-nats — the fold over the bucket array against the
    ONE literal model array runs entirely in whole-stage codegen with
    zero shuffle. Docs with no alpha tokens score 0 over 0 grams."""
    if len(logratio_micro) != n_buckets:
        raise ValueError(
            f"model has {len(logratio_micro)} buckets, expected {n_buckets}"
        )
    model = F.lit([int(x) for x in logratio_micro])
    bkts = gram_buckets(text_col, n_buckets)
    return df.select(
        F.col(id_col),
        F.size(bkts).cast("bigint").alias("n_grams"),
        F.aggregate(
            bkts,
            F.lit(0).cast("bigint"),
            lambda acc, b: acc
            + F.element_at(model, (b + 1).cast("int")).cast("bigint"),
        ).alias("logw_micro"),
    )


def gumbel_key_micro(id_col: str, logw_col: str) -> Column:
    """logw_micro + round(Gumbel(0,1) * 1e6) where the Gumbel draw is
    -ln(-ln(u)) with u derived deterministically from md5(id) — the
    Gumbel-top-k construction, reproducible on any engine/partitioning."""
    return F.expr(
        f"""
        {logw_col} + cast(round(-ln(-ln(
            (cast(conv(substr(md5(concat(cast({id_col} AS string), ':gumbel')),
                       1, 8), 16, 10) AS double) + 0.5) / {_U32!r}
        )) * {SCALE}) AS bigint)
        """
    )


def dsir_resample_topk(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "logw_micro",
) -> DataFrame:
    """Sample k documents WITHOUT replacement with probability
    proportional to their importance weight w = exp(logw): keep the top-k
    of logw + Gumbel noise (Gumbel-top-k theorem). Deterministic (noise
    is md5-derived), global top-k only (TakeOrderedAndProject — no full
    sort, no per-partition state)."""
    keyed = weights.withColumn("key_micro", gumbel_key_micro(id_col, logw_col))
    return (
        keyed.orderBy(F.desc("key_micro"), id_col)
        .limit(k)
        .select(id_col, logw_col, "key_micro")
    )
