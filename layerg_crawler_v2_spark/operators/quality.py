"""C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning", §2.2) — the third of the classic webtext quality gates
next to Gopher (functions/text.py:gopher_quality) and CCNet
(operators/scoring.py): line-level retention rules plus page-level drops,
and the corpus-level three-sentence-span dedup.

Beyond-reference LLM-pipeline operator (the Go reference crawls and stores;
it does not clean): included because a 100-TB webtext corpus is unusable
for training without this pass.

Scale shape:
  * `c4_page_filter` is one JVM higher-order-function pass per document —
    split / filter / rlike inside whole-stage codegen, zero shuffle, zero
    Python. At 100 TB it is embarrassingly parallel.
  * `c4_span_dedup_drops` is the corpus-level rule ("remove all but one of
    any three-sentence span occurring more than once") expressed as ONE
    window over (doc_id, line index) to build spans — partition-local after
    the per-doc shuffle — and ONE groupBy on the span hash whose exchange
    carries (hash, doc_id, idx) triples, never the text. The keep-first
    winner is min_by over (doc_id, idx), i.e. map-side combinable. Nothing
    is all-pairs; nothing is driver-resident.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Terminal-punctuation rule: C4 keeps lines ending in . ! ? or closing
# quote; the quote variant is left out so the byte-identical pattern runs
# on both engines without quote-escaping games in the oracle SQL.
TERMINAL_PUNCT_RE = "[.!?]$"
MIN_WORDS_PER_LINE = 3
MIN_KEPT_SENTENCES = 5


def _kept_lines(text_col):
    """array<string> of retained lines, all-JVM.

    A line survives when it (a) ends in terminal punctuation, (b) has at
    least MIN_WORDS_PER_LINE space-separated words, (c) does not mention
    javascript (case-insensitive) — the three line-level C4 rules."""
    lines = F.split(text_col, "\n")
    return F.filter(
        lines,
        lambda ln: ln.rlike(TERMINAL_PUNCT_RE)
        & (F.size(F.split(ln, " ")) >= MIN_WORDS_PER_LINE)
        & ~F.contains(F.lower(ln), F.lit("javascript")),
    )


def c4_page_filter(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document C4 verdicts: line stats, page-level drop flags, the
    combined keep bit, and the cleaned text (kept lines re-joined).

    Page-level rules: drop when 'lorem ipsum' appears (template spam),
    when a curly brace appears (leaked code), or when fewer than
    MIN_KEPT_SENTENCES lines survive the line rules.
    """
    text = F.col(text_col)
    kept = _kept_lines(text)
    has_lorem = F.contains(F.lower(text), F.lit("lorem ipsum"))
    has_brace = F.contains(text, F.lit("{"))
    n_kept = F.size(kept)
    return df.select(
        F.col(id_col),
        F.size(F.split(text, "\n")).alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            (n_kept >= MIN_KEPT_SENTENCES) & ~has_lorem & ~has_brace
        ).alias("keep"),
        F.array_join(kept, "\n").alias("cleaned_text"),
    )


def c4_span_dedup_drops(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_sentences: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, span_idx, span_hash) rows to REMOVE under C4's corpus-level
    rule: of every `span_sentences`-consecutive-sentence span occurring more
    than once in the corpus, exactly one occurrence (the smallest
    (doc_id, span_idx)) is retained; all others are listed here.

    Sentences = lines retained by the line rules (the paper dedups after
    line filtering). Span construction is a lead() window partitioned by
    document — one exchange on doc_id, then linear per-doc work; the global
    dedup groupBy shuffles only (hash, id, idx).

    hash_fn: 'xxhash64' (production 64-bit, JVM) or 'md5' (slower, but the
    byte-identical function exists in DuckDB — the oracle family, same split
    as dedup.lsh_candidate_pairs vs its _xx twin)."""
    sents = df.select(
        F.col(id_col), F.posexplode(_kept_lines(F.col(text_col)))
    ).withColumnsRenamed({"pos": "span_idx", "col": "sent"})
    w = Window.partitionBy(id_col).orderBy("span_idx")
    parts = [F.col("sent")] + [
        F.lead("sent", k).over(w) for k in range(1, span_sentences)
    ]
    glue: list = []
    for p in parts:
        glue.extend((p, F.lit("\n")))
    span_text = F.concat(*glue[:-1])  # concat (not concat_ws): NULL-strict
    hasher = F.xxhash64 if hash_fn == "xxhash64" else F.md5
    spans = sents.select(
        F.col(id_col),
        F.col("span_idx").cast("long").alias("span_idx"),
        hasher(span_text).alias("span_hash"),
        parts[-1].isNotNull().alias("complete"),
    ).filter("complete")
    keeper = spans.groupBy("span_hash").agg(
        F.count("*").alias("occurrences"),
        F.min(F.struct(F.col(id_col), F.col("span_idx"))).alias("first"),
    )
    return (
        spans.join(keeper.filter(F.col("occurrences") > 1), "span_hash")
        .filter(
            (F.col(id_col) != F.col(f"first.{id_col}"))
            | (F.col("span_idx") != F.col("first.span_idx"))
        )
        .select(id_col, "span_idx", "span_hash")
    )


def justext_blocks(
    pages: DataFrame,
    html_col: str = "html",
    id_col: str = "url",
    min_len: int = 40,
    max_link_density_num: int = 1,
    max_link_density_den: int = 3,
) -> DataFrame:
    """Per-PAGE main-content classification of text blocks — the
    context-free core of jusText (Pomikalek 2011) / Readability: a block
    that is long and mostly non-anchor text is CONTENT; short blocks and
    blocks dominated by link text are BOILERPLATE (navigation, footers,
    related-story rails). Complements the corpus-frequency approach
    (boilerplate chunk removal above), which needs many pages per host;
    this works on a single page, the way browser reader modes do.

    Segmentation + link accounting come from the tree
    (functions/extract.py _BlockExtractor, one Arrow pass); the
    classification itself is pure integer arithmetic in codegen:

        is_content = n_chars >= min_len
                     AND link_chars * den < n_chars * num_inv

    i.e. link density < num/den with no float division (the repo's
    integer-threshold discipline; defaults: len >= 40, density < 1/3).
    Context-sensitive smoothing (jusText's near-good promotion) is a
    declared non-goal — it needs the neighbor pass and buys little on
    the synthetic corpus; the hook is the block ordering this returns.

    Returns (id, block_idx, text, n_chars, link_chars, is_content);
    explode_outer + post-filter keeps ONE ArrowEvalPython in the plan
    (the jsonld precedent). No exchange anywhere — per-page work only.
    """
    from layerg_crawler_v2_spark.functions.extract import extract_blocks_udf

    return (
        pages.select(
            F.col(id_col).alias("id"),
            extract_blocks_udf(F.col(html_col)).alias("blocks"),
        )
        .select("id", F.explode_outer("blocks").alias("b"))
        .filter(F.col("b").isNotNull())
        .select(
            "id",
            F.col("b.block_idx").alias("block_idx"),
            F.col("b.text").alias("text"),
            F.length(F.col("b.text")).cast("bigint").alias("n_chars"),
            F.col("b.link_chars").cast("bigint").alias("link_chars"),
        )
        .withColumn(
            "is_content",
            (F.col("n_chars") >= min_len)
            & (
                F.col("link_chars") * max_link_density_den
                < F.col("n_chars") * max_link_density_num
            ),
        )
    )


def compression_ratio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deflate compression ratio per document, scaled-integer form:
    ratio_bp = compressed_bytes * 10000 div raw_bytes (basis points).
    The classic redundancy signal quality classifiers use next to the
    Gopher repetition rules (template spam and keyword-stuffed pages
    compress far better than prose; cf. Ngram-and-entropy features in
    spam-detection literature): low ratio => highly repetitive. zlib
    level is pinned (6) so the measure is deterministic for a given
    zlib build; emitted as exact integers (no float division).

    One vectorized Arrow pass (a C zlib call per doc — the decode_image
    discipline); zero shuffle. Returns (id, raw_bytes, deflate_bytes,
    ratio_bp); empty/NULL docs emit ratio_bp NULL."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<raw_bytes: long, deflate_bytes: long>")
    def _sizes(texts: pd.Series) -> pd.DataFrame:
        import zlib

        raws, comps = [], []
        for t in texts:
            if t is None:
                raws.append(None)
                comps.append(None)
                continue
            b = t.encode("utf-8")
            raws.append(len(b))
            comps.append(len(zlib.compress(b, 6)))
        return pd.DataFrame({"raw_bytes": raws, "deflate_bytes": comps})

    return (
        df.select(F.col(id_col), _sizes(F.col(text_col)).alias("s"))
        .select(
            id_col,
            F.col("s.raw_bytes").alias("raw_bytes"),
            F.col("s.deflate_bytes").alias("deflate_bytes"),
        )
        .withColumn(
            "ratio_bp",
            F.when(
                F.col("raw_bytes") > 0,
                F.expr("deflate_bytes * 10000 div raw_bytes"),
            ),
        )
    )
