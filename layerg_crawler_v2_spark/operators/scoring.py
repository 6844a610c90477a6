"""Corpus-statistics quality scoring: unigram log-probability.

The CCNet recipe scores documents by language-model perplexity and keeps
the low-perplexity head; with no external LM available (and none allowed),
the corpus's own unigram distribution is the deterministic stand-in — the
score still separates typical text from outliers (rare-word soup, boiler
noise), which is what the downstream keep/drop gate consumes.

Two-pass shape, both passes linear:
  1. global word frequencies — one groupBy(word) over the exploded corpus
     (map-side partial aggregation does the heavy lifting; the exchange
     carries one row per DISTINCT word, not per token);
  2. per-doc mean -ln p(word) — join tokens to the frequency table on the
     word key, then groupBy(doc). At 100 TB the frequency table is ~vocab
     sized (millions of rows, MBs) — broadcastable, making pass 2
     shuffle-free except the per-doc aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(id_col, n_tokens, avg_neg_logprob): mean -ln(corpus unigram prob)
    per document, lower = more typical of the corpus."""
    tokens = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    total = tokens.count()
    freq = tokens.groupBy("w").agg(F.count("*").alias("c"))
    if broadcast_vocab:
        freq = F.broadcast(freq)
    return (
        tokens.join(freq, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("c").cast("double") / F.lit(float(total)))),
                6,
            ).alias("avg_neg_logprob"),
        )
    )
