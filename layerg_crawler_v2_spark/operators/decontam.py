"""Benchmark decontamination: flag training docs sharing word n-grams with
an evaluation/benchmark set.

The reference's analog is its allowlist gate — drop rows whose key appears
in a curated set before processing (cmd/onchain.go:68-72) — generalized to
content overlap the way LLM training pipelines decontaminate against eval
benchmarks (n-gram collision, the GPT-3/PaLM recipe): a training document is
contaminated when any of its n-word grams appears verbatim in any benchmark
document.

Scale shape (100 TB corpus, fixed-size benchmark):
  * grams are built with the shifted-slice zip_with trick (see
    functions/text.py:word_shingles) — O(len) JVM work per doc, no Python;
  * the benchmark side is reduced to DISTINCT xxhash64(gram) — benchmarks
    are small by nature (MBs of eval sets vs TBs of training text), so this
    side is broadcast and the training scan never shuffles its gram fan-out;
  * per-doc hit counting is the only exchange: groupBy(doc_id) AFTER the
    broadcast semi-join, i.e. proportional to contaminated grams, not to
    the corpus gram count.
With a benchmark too large to broadcast, pass broadcast_bench=False and the
join falls back to a hash-partitioned semi-join on the 8-byte gram hash —
still never on raw text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_grams(text: Column, n: int) -> Column:
    """Array of n-word grams over raw single-space tokens (split(text, ' '),
    matching DuckDB string_split semantics for oracle parity — the
    normalized variant lives in functions/text.py:word_shingles).

    Built from n shifted slices zip_with'd together so the split expression
    is evaluated a constant number of times per row."""
    toks = F.split(text, " ")
    k = F.size(toks) - F.lit(n - 1)
    parts = [F.slice(toks, j + 1, k) for j in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda x, y: F.concat_ws(" ", x, y))
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(acc)


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per training doc: how many of its DISTINCT n-grams appear in the
    benchmark set, plus a contaminated flag.

    Returns (id_col, n_contaminated_grams: long, contaminated: boolean) with
    one row per `train` row (zero-hit docs included)."""
    grams = F.array_distinct(word_grams(F.col(text_col), n))

    bench_hashes = (
        benchmark.select(F.explode(grams).alias("gram"))
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
    )
    if broadcast_bench:
        bench_hashes = F.broadcast(bench_hashes)

    train_grams = train.select(
        F.col(id_col), F.explode(grams).alias("gram")
    ).select(id_col, F.xxhash64("gram").alias("gh"))

    hits = (
        train_grams.join(bench_hashes, "gh", "left_semi")
        # grams were array_distinct'd per doc before hashing, so a plain
        # count is already a distinct-gram count — no countDistinct state
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )

    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_grams", F.lit(0)).alias(
                "n_contaminated_grams"
            ),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
