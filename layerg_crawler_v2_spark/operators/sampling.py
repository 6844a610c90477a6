"""Deterministic corpus sampling and epoch weighting for training-data
assembly.

A pretraining mixture is specified as per-stratum rates ("keep 50% of en,
25% of de, 12.5% of the rest") plus integer oversampling ("2 epochs of
books"). Random sampling is not reproducible across engines or runs; these
operators decide per document from md5(doc_id) so the SAME documents are
selected on any engine, any partitioning, any run — the property that makes
ablations comparable. (The reference pins determinism the same way for
crawl ordering: content-derived ids instead of uuid.New(), SURVEY.md F6.)

Scale shape: the keep decision is one md5 + substring per row inside
whole-stage codegen — no shuffle, no sampleBy() (whose Bernoulli draws are
seed- and partitioning-dependent), no driver state. Rates are sixteenths of
the first hex nibble, so the hex-string comparison is exact, portable SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def hash_keep(id_col: Column, sixteenths: int) -> Column:
    """True for exactly `sixteenths`/16 of the id space, deterministically:
    first hex nibble of md5(id) < threshold."""
    if not 0 <= sixteenths <= 16:
        raise ValueError(f"sixteenths must be in [0, 16], got {sixteenths}")
    if sixteenths == 16:
        return F.lit(True)
    if sixteenths == 0:
        return F.lit(False)
    nibble = F.substring(F.md5(id_col.cast("string")), 1, 1)
    return nibble < F.lit(_HEX[sixteenths])


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    default_sixteenths: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction (in sixteenths) of rows.

    Adds a `sampled` boolean; filter on it or aggregate it. Unknown strata
    use `default_sixteenths`."""
    keep: Column = hash_keep(F.col(id_col), default_sixteenths)
    for value, sx in rates.items():
        keep = F.when(
            F.col(strata_col) == value, hash_keep(F.col(id_col), sx)
        ).otherwise(keep)
    return df.withColumn("sampled", keep)


def oversample(df: DataFrame, epochs_col: Column, id_col: str = "doc_id") -> DataFrame:
    """Integer epoch weighting: emit each row `epochs` times with an
    `epoch` index column (0-based) — the explode is the only fan-out and it
    is row-local (no shuffle). Fractional epochs compose as
    oversample(floor) + stratified_sample(remainder).

    epochs <= 0 emits nothing; the guard matters because Spark's
    sequence(0, n-1) runs DESCENDING when n-1 < 0 instead of empty."""
    n = epochs_col.cast("int")
    return df.withColumn(
        "epoch",
        F.explode(
            F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ),
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the k
    rows with the smallest min-hash priority, where a row of integer
    weight w gets w independent hash draws — so selection probability
    rises monotonically with w, the same draw happens on ANY engine /
    partitioning / run (the module's md5 determinism discipline, extended
    from per-row keep decisions to weighted competition), and ablations
    stay comparable. This is hash-priority sampling, not exact
    probability-proportional-to-size: the draw count is the weight, the
    competition is exact; at pretraining-mixture granularity (integer
    quality buckets as weights) the distinction is irrelevant and
    determinism is everything.

    Plan shape: sequence-explode (w draws per row, inside codegen), one
    md5 per draw, min per id (map-side combined), global top-k
    (TakeOrderedAndProject). Rows with weight < 1 never win (excluded
    before the explode). Total draw count = sum(w) — keep weights small
    integers (buckets, not raw byte counts).

    Returns (id, weight, priority) for the k winners, priority ascending.
    """
    drawn = (
        df.filter(F.col(weight_col).cast("bigint") >= 1)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("bigint").alias("__w"),
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.col(weight_col).cast("bigint") - 1,
                )
            ).alias("__j"),
        )
    )
    prio = (
        drawn.select(
            id_col,
            "__w",
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit("#"),
                    F.col("__j").cast("string"),
                )
            ).alias("__p"),
        )
        .groupBy(id_col, "__w")
        .agg(F.min("__p").alias("priority"))
    )
    return (
        prio.orderBy("priority", id_col)
        .limit(k)
        .select(id_col, F.col("__w").alias("weight"), "priority")
    )


def host_disjoint_split(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "split-v1",
) -> DataFrame:
    """Leakage-aware train/val/test assignment: the split key is the HOST,
    not the document. Near-duplicates concentrate within a host (templates,
    mirrors, alternate URLs of one page), so a doc-level random split
    leaks train content into eval; host-disjoint splitting is the standard
    guard (and the same idea behind group-k-fold). Deterministic: bucket =
    crc32(salt || host) % 100, val = first val_pct buckets, test = next
    test_pct, train = the rest — same assignment on any engine, any
    partitioning, any run; changing `salt` re-rolls the assignment without
    touching data.

    Emits one row per input row: (id, host, split). Pure projection —
    zero shuffle, zero UDF; the split column is what a writer partitions
    by. The hash is the repo's portable md5-nibble trick (hash_keep /
    stratified_sample): bucket = the first three hex nibbles of
    md5(salt || host) as an integer (0..4095) mod 100 — identical on any
    engine. 4096 buckets mod 100 is off-uniform by <= 1/4096 per bucket
    (documented, deterministic)."""
    if not (0 <= val_pct and 0 <= test_pct and val_pct + test_pct <= 100):
        raise ValueError(f"bad split percentages: {val_pct}/{test_pct}")
    if "'" in salt:
        raise ValueError("salt must not contain single quotes")
    h = f"md5(concat('{salt}', {host_col}))"

    def _nib(i: int):
        # F.locate requires a literal needle, so the nibble lookup is an
        # expr; both engines share locate/strpos semantics (1-based, 0 miss)
        return F.expr(f"locate(substring({h}, {i}, 1), '0123456789abcdef') - 1")

    bucket = (_nib(1) * 256 + _nib(2) * 16 + _nib(3)) % 100
    split = (
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.select(F.col(id_col), F.col(host_col), split.alias("split"))


def temperature_resample(
    df: DataFrame,
    total_budget: int,
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Language-temperature corpus balancing: allocate a document budget
    across languages proportionally to n_lang^alpha and select that many
    documents per language deterministically.

    The standard multilingual-pretraining mixture rule (XLM / mBERT /
    XLM-R): raw web corpora are head-heavy (en dominates), so sampling
    p_l ∝ n_l^alpha with alpha < 1 flattens the distribution — rare
    languages are upsampled relative to their share, the head is capped.
    alpha is FIXED at 1/2 here because n^(1/2) is IEEE-754 sqrt — correctly
    rounded, hence bit-identical on every engine — which keeps the whole
    operator integer/exact-float arithmetic and lets a SQL oracle match
    bit-for-bit (floor(sqrt(n)) is exact for n < 2^52; a general-alpha
    pow() differs in the last ulp across libm implementations and would
    make the apportionment knife-edge). Production variant: swap the
    weight expression for pow(n, alpha) and accept float tie risk.

    Mechanics, all reused from this module's determinism discipline:
      * per-language counts: one map-side-combined groupBy (#langs rows);
      * integer budget: Hamilton largest-remainder apportionment over
        weight = floor(sqrt(n)) (operators/scheduler.py:allocate_budget —
        quotas sum to EXACTLY total_budget);
      * selection: per-language hash-order top-quota — row_number over
        (md5(id), id) within the language, the uniform-without-replacement
        draw that picks the SAME documents on any engine / partitioning /
        run. A quota larger than n_lang keeps all n_lang rows (sampling is
        without replacement; the shortfall is documented, not silently
        reassigned — pair with oversample() for epoch weighting).

    Scale shape: groupBy(lang) exchanges #langs rows; the apportionment
    windows over #langs rows; selection is one shuffle on lang with a
    per-partition top-quota. Language cardinality is O(10^2-10^3) — every
    driver-visible structure here is model-sized, never corpus-sized. The
    selection rank is per-language and the head language is a skewed
    partition (en = O(10^9) rows at web scale): swap the row_number for
    operators/sequence.py's two-pass range-partitioned rank when one
    language outgrows an executor partition; quota semantics are
    unchanged.

    Returns (id, lang, lang_n, lang_quota) for the selected documents.
    """
    from layerg_crawler_v2_spark.operators.scheduler import allocate_budget

    langs = df.select(
        F.col(id_col),
        F.coalesce(F.col(lang_col), F.lit("und")).alias("__lang"),
    )
    counts = langs.groupBy("__lang").agg(F.count("*").alias("lang_n"))
    weights = counts.select(
        "__lang",
        "lang_n",
        F.floor(F.sqrt(F.col("lang_n").cast("double"))).cast("bigint").alias("w"),
    )
    quotas = allocate_budget(
        weights.select("__lang", "w"), total_budget, key_col="__lang", weight_col="w"
    ).select("__lang", F.col("quota").alias("lang_quota"))
    ranked = langs.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("__lang").orderBy(
                F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
            )
        ),
    )
    return (
        ranked.join(F.broadcast(quotas), "__lang")
        .join(F.broadcast(counts), "__lang")
        .filter(F.col("__rn") <= F.col("lang_quota"))
        .select(
            F.col(id_col),
            F.col("__lang").alias(lang_col),
            F.col("lang_n").cast("bigint").alias("lang_n"),
            F.col("lang_quota").cast("bigint").alias("lang_quota"),
        )
    )
