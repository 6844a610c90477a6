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


# --- CCNet-style quality bucketing (head / middle / tail) -------------------

QUALITY_SCALE = 1_000_000
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on")


def stopword_density_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, score_scaled BIGINT): stopword density in parts-per-million.

    Stopword density is the classic cheap quality signal (Gopher rule G4 in
    operators/traps.py's sibling gate uses the same intuition): natural
    prose carries function words at a stable rate; keyword soup and
    boilerplate don't. Integer parts-per-million ((n_stop * 1e6) div
    n_tokens) keeps the score — and therefore every downstream ORDER BY —
    bit-identical across engines, which float scores (unigram_logprob's
    ln()) cannot guarantee; that is why the BUCKETING oracle keys on this
    score and not on avg_neg_logprob.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("tok").isin(*STOPWORDS).cast("bigint")).alias("n_stop"),
        )
        .select(
            id_col,
            F.expr(f"(n_stop * {QUALITY_SCALE}) div n_tokens").alias("score_scaled"),
        )
    )


def quality_buckets_exact(
    scores: DataFrame, id_col: str = "doc_id", n_buckets: int = 3
) -> DataFrame:
    """CCNet's head/middle/tail split, exact: ntile over the unique total
    order (score desc, id). This is the ORACLE path — a global sort whose
    single-partition window is fine at validation scale but is NOT the
    10^10-doc plan; that is quality_buckets_approx below.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score_scaled").desc(), F.col(id_col))
    names = F.when(F.ntile(n_buckets).over(w) == 1, "head").when(
        F.ntile(n_buckets).over(w) == 2, "middle"
    ).otherwise("tail")
    return scores.select(id_col, "score_scaled", names.alias("bucket"))


def quality_buckets_approx(
    scores: DataFrame,
    id_col: str = "doc_id",
    probs: tuple[float, ...] = (1 / 3, 2 / 3),
    rel_err: float = 0.001,
) -> DataFrame:
    """The scale path: approxQuantile thresholds (Greenwald-Khanna sketch,
    one pass, driver gets len(probs) doubles) broadcast into a shuffle-free
    per-row CASE — no global sort, no single-partition window. CCNet itself
    buckets by precomputed percentile cutoffs the same way. At small data
    the sketch is exact, so test_scoring.py asserts agreement with
    quality_buckets_exact away from threshold ties.
    """
    lo, hi = scores.approxQuantile("score_scaled", list(probs), rel_err)
    return scores.select(
        id_col,
        "score_scaled",
        F.when(F.col("score_scaled") > F.lit(hi), "head")
        .when(F.col("score_scaled") > F.lit(lo), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# --- bigram LM with unigram backoff ----------------------------------------

def bigram_backoff_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_mod: int = 2,
    scale: int = QUALITY_SCALE,
    backoff_div: int = 4,
) -> DataFrame:
    """Integer-exact bigram-LM fluency scoring with unigram backoff.

    The CCNet/Gopher pipelines score crawl text against a language model
    trained on a REFERENCE corpus and keep the most model-typical head;
    the sandbox stand-in trains the LM on the deterministic doc_id %
    train_mod == 0 half and scores every document, so the held-out half
    genuinely exercises the backoff path (a same-corpus LM would contain
    every bigram it scores and backoff would be dead code). Per adjacent
    pair (w1, w2):

        seen bigram:    (c12 * scale) div c1        -- P(w2|w1), scaled
        unseen, w2 in V:(c2  * scale) div (T * backoff_div)
                                                    -- alpha*P(w2), scaled
        OOV w2:         0

    all in BIGINT floor arithmetic — the integer twin of stupid-backoff
    (Brants et al., EMNLP'07: score, not probability; no normalization),
    chosen over Katz precisely so the DuckDB oracle matches bit-for-bit
    where a float log-prob would drift in the last ulp. A real perplexity
    ranking is monotone in this score per bigram count, and production
    would take logs after parity is proven.

    Scale shape: adjacency never leaves the row (one codegen array
    transform builds in-row bigrams, the collocations_pmi_topk idiom);
    the LM tables are vocab-sized and BROADCAST into the score join (a
    10^12-token LM would bucket both sides on w1 instead); one map-side-
    combined groupBy per doc closes it. Returns
    (id, n_bigrams, score_scaled, avg_score_scaled) with NULL avg for
    docs under 2 tokens.
    """
    toks = df.select(
        F.col(id_col),
        F.expr(f"filter(split(lower({text_col}), '[^a-z]+'), x -> x != '')").alias(
            "t"
        ),
    )
    train = toks.filter((F.col(id_col) % train_mod) == 0)
    uni = train.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    big = (
        train.select(
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    total = train.select(F.explode("t").alias("w")).count()

    pairs = toks.select(
        F.col(id_col),
        # same empty-safe slice formulation as the train-side `big` build:
        # sequence(0, size-2) is DESCENDING for size<2 and t[i+1] would
        # throw under ANSI mode on single-token docs
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select(id_col, "b.w1", "b.w2")
    scored = (
        pairs.join(F.broadcast(big), ["w1", "w2"], "left")
        .join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))),
            "w1",
            "left",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))),
            "w2",
            "left",
        )
        .select(
            F.col(id_col),
            F.when(
                F.col("c12").isNotNull(),
                F.expr(f"(c12 * {scale}) div c1"),
            )
            .when(
                F.col("c2").isNotNull(),
                F.expr(f"(c2 * {scale}) div ({total} * {backoff_div})"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("contrib"),
        )
    )
    return (
        toks.select(id_col)
        .join(scored.groupBy(id_col).agg(
            F.count("*").alias("n_bigrams"),
            F.sum("contrib").alias("score_scaled"),
        ), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("score_scaled", F.lit(0)).cast("bigint").alias("score_scaled"),
            F.expr("CASE WHEN n_bigrams > 0 THEN score_scaled div n_bigrams END")
            .cast("bigint")
            .alias("avg_score_scaled"),
        )
    )
