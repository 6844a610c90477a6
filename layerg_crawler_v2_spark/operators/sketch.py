"""Heavy hitters without a full shuffle: count-min sketch + candidate pass.

Hot-key detection is the crawl scheduler's skew problem (SURVEY.md §4
salting row; operators/scheduler.py splits hot hosts with deterministic
salt): before you can salt a hot host you must FIND it, and the obvious
`groupBy(key).count()` shuffles one row per distinct key — at 10^10 URLs
the distinct-host exchange is exactly the thing a monitoring pass cannot
afford every round. A count-min sketch (Cormode & Muthukrishnan, J.Alg'05)
gives upper-bound counts in d*w BIGINT cells, mergeable by addition.

Spark-first construction — NO sketch library, no per-row Python:
  * hash positions are JVM columns: pos_i = pmod(xxhash64(key, i), w) —
    one codegen projection, so the "sketch build" is d tiny groupBys over
    a BOUNDED domain (w cells): map-side partial aggregation means each
    task emits <= d*w rows REGARDLESS of input size; the exchange is
    sketch-sized, not data-sized, which is the entire point;
  * candidates come from ONE Arrow pass (mapInPandas value_counts head-m
    per partition, counter dict pruned to a fixed cap — SpaceSaving
    discipline, O(cap) memory at any key cardinality) — no shuffle; a
    global heavy hitter is by construction locally heavy in at least one
    partition on average, and the m overshoot (m = 4k default) absorbs
    adversarial splits (property-tested on Zipf data in
    tests/test_sketch.py);
  * estimates: broadcast-join the d*w-row sketch onto the candidates,
    take the min over the d rows per candidate (CMS upper bound), top-k
    by (estimate desc, key).

Guarantees kept honest: estimate >= true count always (upper bound);
estimate <= true + eps*N w.h.p. with eps = e/w; the candidate pass is the
probabilistic part (a hitter split perfectly flat across thousands of
partitions while staying under every local top-m is possible), so the
EXACT twin — one groupBy — remains the verification path at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_WIDTH = 2048
CMS_DEPTH = 4


def cms_sketch(
    df: DataFrame, key_col: str, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> DataFrame:
    """(i, pos, cnt): the count-min cell counts for df[key_col].

    d bounded-domain aggregations; each task's partial-agg output is
    <= width rows per hash row, so the exchange is sketch-sized."""
    key = F.col(key_col).cast("string")
    parts = [
        df.select(
            F.lit(i).alias("i"),
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(width)).alias("pos"),
        )
        .groupBy("i", "pos")
        .agg(F.count("*").alias("cnt"))
        for i in range(depth)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _local_candidates(
    df: DataFrame, key_col: str, m: int, max_counters: int = 65_536
) -> DataFrame:
    """Distinct union of each partition's top-m keys by local count — one
    Arrow pass, no shuffle.

    Bounded memory (the SpaceSaving discipline): the per-partition counter
    dict is pruned back to the current top `max_counters` whenever it
    doubles past the cap, so a partition with 10^9 distinct keys costs
    O(max_counters), not O(distinct). Pruning can only drop keys whose
    running count is below the pruned frontier — a key that is actually
    heavy in the partition re-accumulates immediately and cannot be
    starved across batches (its per-batch increments exceed the frontier's
    by definition). The overall candidate pass stays probabilistic either
    way; the exact groupBy twin is the verification path
    (tests/test_sketch.py)."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    src = df.select(F.col(key_col).cast("string").alias("k"))

    def top_m(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            for k, c in pdf["k"].value_counts().items():
                counts[k] = counts.get(k, 0) + int(c)
            if len(counts) > 2 * max_counters:
                keep = sorted(
                    counts.items(), key=lambda kv: (-kv[1], kv[0])
                )[:max_counters]
                counts = dict(keep)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        import pandas as pd

        yield pd.DataFrame({"k": [k for k, _ in top]})

    return src.mapInPandas(top_m, "k string").distinct()


def heavy_hitters_topk(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    candidate_factor: int = 4,
) -> DataFrame:
    """Top-k keys by CMS-estimated count: (key, est_count) ordered by
    (est desc, key). est_count >= the true count, always."""
    sketch = cms_sketch(df, key_col, width, depth)
    cands = _local_candidates(df, key_col, m=max(k * candidate_factor, k))
    probes = cands.select(
        "k",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("i"),
                    F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(width)).alias(
                        "pos"
                    ),
                )
                for i in range(depth)
            ])
        ).alias("h"),
    ).select("k", "h.i", "h.pos")
    return (
        probes.join(F.broadcast(sketch), ["i", "pos"])
        .groupBy("k")
        .agg(F.min("cnt").alias("est_count"))
        .orderBy(F.col("est_count").desc(), "k")
        .limit(k)
        .select(F.col("k").alias(key_col), "est_count")
    )


# ---------------------------------------------------------------------------
# HyperLogLog registers — distinct-URL cardinality as a mergeable sketch
# ---------------------------------------------------------------------------
# The frontier's own seen-set (operators/seen.py, cuckoo.py) answers "have I
# crawled THIS url" exactly; what it cannot answer cheaply is "how many
# DISTINCT urls has the crawl touched" per host / per segment / overall —
# the monitoring counter every crawl dashboard wants, and the one a
# count(distinct url) shuffle (one row per distinct key, 10^10 at frontier
# scale) cannot afford every round.  HyperLogLog (Flajolet et al., AofA'07)
# stores the whole answer in 2^b small integers, mergeable by element-wise
# MAX — so per-partition partial aggregation makes the exchange exactly
# 2^b rows per task regardless of input size, and registers from different
# crawl segments / days / clusters merge by the same MAX after the fact.
#
# Spark-first & oracle-portable: the hash is the repo's portable 60-bit
# md5 prefix (conv(substr(md5(key),1,15),16,10) — bit-identical in DuckDB
# as CAST('0x'||substr(md5(key),1,15) AS BIGINT)), bucket = top b bits,
# register = leading-zero rank of the remaining 60-b bits, all in
# whole-stage codegen (bin()-length arithmetic, no UDF).  Registers are
# duplicate-insensitive by construction (MAX), so the operator never needs
# a distinct() pass.  The float estimate stays OUT of the distributed plan:
# estimate() folds <= 2^b collected register rows on the driver (bounded,
# like the IVF centroid sample) with the standard alpha_m bias correction
# and the linear-counting small-range regime.
#
# Production note (100 TB): with b=12 the exchange is 4096 rows/task and
# the standard error ~1.04/sqrt(4096) = 1.6%; Spark's own
# approx_count_distinct is HLL++ and is the right call when only the final
# scalar is needed — THIS operator exists for when the registers themselves
# are the artifact (mergeable across snapshots, diffable, storable in the
# store's counters table), which approx_count_distinct never exposes.

HLL_B = 10  # 2^10 = 1024 registers; std error ~3.3%


def hll_registers(df: DataFrame, key_col: str, b: int = HLL_B) -> DataFrame:
    """(bucket, register) — non-empty HyperLogLog registers for
    df[key_col], portable-hash form.  Mergeable: union two outputs and
    groupBy(bucket).max(register).  Empty buckets are implicit zeros
    (estimate() accounts for them)."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16]: {b}")
    nbits = 60 - b
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    src = df.select(
        (h - F.pmod(h, F.lit(1 << nbits))).alias("hi"),
        F.pmod(h, F.lit(1 << nbits)).alias("suffix"),
    )
    # rho = 1 + leading zeros of the nbits-wide suffix; bin() strips
    # leading zeros on both engines, so rho = nbits + 1 - len(bin(suffix))
    # for suffix > 0 and nbits + 1 when the suffix is all zeros.
    return (
        src.select(
            # integer div: hi is a multiple of 2^nbits by construction
            F.expr(f"hi div {1 << nbits}").cast("bigint").alias("bucket"),
            F.when(F.col("suffix") == 0, F.lit(nbits + 1))
            .otherwise(F.lit(nbits + 1) - F.length(F.bin(F.col("suffix"))))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_registers_by(
    df: DataFrame, group_col: str, key_col: str, b: int = HLL_B
) -> DataFrame:
    """(group, bucket, register) — one HLL register table PER GROUP, the
    grouped distinct counter ("distinct URLs per host/day/segment"). The
    identical integer pipeline as hll_registers with the group key
    joining the aggregation key: the exchange is <= 2^b rows PER GROUP
    regardless of group row counts (an exact per-group distinct shuffles
    one row per distinct key — 10^8 rows for a big host). Two snapshots'
    outputs merge by groupBy(group, bucket).max(register), same as the
    ungrouped form."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16]: {b}")
    nbits = 60 - b
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    src = df.select(
        F.col(group_col).alias("group"),
        (h - F.pmod(h, F.lit(1 << nbits))).alias("hi"),
        F.pmod(h, F.lit(1 << nbits)).alias("suffix"),
    )
    return (
        src.select(
            "group",
            F.expr(f"hi div {1 << nbits}").cast("bigint").alias("bucket"),
            F.when(F.col("suffix") == 0, F.lit(nbits + 1))
            .otherwise(F.lit(nbits + 1) - F.length(F.bin(F.col("suffix"))))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("group", "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(registers: DataFrame, b: int = HLL_B) -> float:
    """Driver-side cardinality estimate from hll_registers() output.
    Collects <= 2^b rows (bounded by construction).  Standard HLL:
    alpha_m * m^2 / sum(2^-M) with the linear-counting small-range
    correction (Flajolet et al. AofA'07 fig. 3)."""
    import math

    m = 1 << b
    regs = {int(r["bucket"]): int(r["register"]) for r in registers.collect()}
    if not 0 <= min(regs, default=0) and max(regs, default=0) < m:
        raise ValueError("bucket out of range for b")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = m - len(regs)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Element-wise MAX merge of hll_registers() outputs — EXACT for
    union (max of per-set maxima == maxima of the union, per register),
    which is what makes the registers a mergeable artifact across crawl
    segments / days / snapshots. One union + one map-side-combined
    groupBy over <= 2^b rows per input."""
    if not register_dfs:
        raise ValueError("need at least one register table")
    out = register_dfs[0]
    for r in register_dfs[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("register").alias("register"))


def hll_intersect_estimate(
    a: DataFrame, b_regs: DataFrame, b: int = HLL_B
) -> float:
    """|A ∩ B| by inclusion-exclusion over three HLL estimates
    (|A| + |B| - |A ∪ B|, union via the exact register merge) — the
    standard sketch answer to 'how many URLs do these two crawls
    share?'. Error compounds to a few sigma of the union's cardinality,
    so it is a TELEMETRY number, not a dedup decision — the repo's exact
    intersections (anti/semi joins) exist for the latter. Driver cost:
    three <= 2^b register folds."""
    return (
        hll_estimate(a, b)
        + hll_estimate(b_regs, b)
        - hll_estimate(hll_merge(a, b_regs), b)
    )
