"""Text-analysis functions for a large-scale training-data pipeline.

All hot-path expressions are native pyspark.sql.functions (JVM, whole-stage
codegen) — the same discipline the reference enforces by keeping per-row work
inside generated typed Go functions (generated/eventhandlers/). Each function
has an ANSI-SQL twin in __spark_entry__.oracle_sql() so the DuckDB oracle can
verify it.

Stopword list is fixed and tiny (deterministic; no external models)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]
_PUNCT_CLASS = "[.,!?;:]"


def token_count(text: Column) -> Column:
    """Whitespace-token count (BPE-ish proxy: \\S+ runs)."""
    return F.regexp_count(text, F.lit(r"\S+")).cast("long")


# GPT-2-style pretokenizer shape, RE2-compatible (no lookahead, so the DuckDB
# oracle runs the byte-identical pattern): optional leading space + a run of
# letters, digits, or other non-space symbols — each match ≈ one BPE
# pretoken; actual BPE merges only ever split within these, so this is the
# standard fast token-count estimator.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def subword_token_count(text: Column) -> Column:
    """BPE-ish pretoken count (letters/digits/symbol runs), JVM-native."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    return (
        F.regexp_count(text, F.lit(_PUNCT_CLASS)).cast("double")
        / F.greatest(F.length(text), F.lit(1)).cast("double")
    )


def stopword_ratio(text: Column) -> Column:
    toks = F.split(text, " ")
    stop = F.filter(toks, lambda w: w.isin(STOPWORDS))
    return F.size(stop).cast("double") / F.greatest(F.size(toks), F.lit(1)).cast(
        "double"
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length + stopword signals,
    penalized by punctuation density. Deterministic closed form."""
    len_score = F.least(F.length(text).cast("double") / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * len_score
        + F.lit(0.5) * F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
        - F.lit(0.25) * F.least(punct_ratio(text) * 10.0, F.lit(1.0)),
        6,
    )


def lang_guess(text: Column) -> Column:
    """N-gram/stopword language heuristic (en/de/vi fallback unk).

    A deterministic toy model: counts language-marker tokens. Real models
    would run in an Arrow UDF; the Spark-side plumbing is identical."""
    toks = F.split(F.lower(text), " ")
    en = F.size(F.filter(toks, lambda w: w.isin(["the", "and", "of", "is"])))
    de = F.size(F.filter(toks, lambda w: w.isin(["der", "und", "das", "ist"])))
    vi = F.size(F.filter(toks, lambda w: w.isin(["và", "của", "là", "không"])))
    return (
        F.when((en >= de) & (en >= vi) & (en > 0), "en")
        .when((de >= vi) & (de > 0), "de")
        .when(vi > 0, "vi")
        .otherwise("unk")
    )


def normalize_text(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    md5 (not xxhash64) so the DuckDB oracle computes the identical value;
    replaces the reference's uuid.New() row ids (cmd/crawler_cmd.go:99) with
    reproducible content-derived ids (SURVEY.md F6)."""
    return F.md5(normalize_text(text))


# --- PII scrubbing -----------------------------------------------------------
# Patterns stay in the RE2 ∩ Java-regex dialect (no lookaround, no backrefs)
# so the DuckDB oracle runs the byte-identical pattern. Scrub order is fixed
# (emails first, then phones) and both redactions are global.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b[0-9]{3}-[0-9]{4}\b"


def email_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_PATTERN)).cast("long")


def phone_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PHONE_PATTERN)).cast("long")


def scrub_pii(text: Column) -> Column:
    """Redact emails then phone numbers with typed placeholder tokens —
    the standard pre-training privacy pass, all JVM regexp (no Python)."""
    scrubbed = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(scrubbed, PHONE_PATTERN, "<PHONE>")


# --- repetition / diversity quality signals (Gopher-style) --------------------

def dup_word_fraction(text: Column) -> Column:
    """1 - |distinct words| / |words| — array-native, zero shuffle."""
    w = F.split(text, " ")
    return F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / F.greatest(
        F.size(w), F.lit(1)
    ).cast("double")


def mean_word_length(text: Column) -> Column:
    """Mean token length via a fold over the token array (JVM aggregate)."""
    w = F.split(text, " ")
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of n-word shingles — all JVM higher-order functions, no Python.

    Shape matters: shingles are built by zip_with over n SHIFTED SLICES of
    the token array, so the expensive normalize+split expression is
    evaluated a constant number of times per row (codegen subexpression
    elimination collapses the identical copies) and each lambda touches only
    its two elements. Referencing `toks` INSIDE a transform lambda instead
    (via slice(toks, i, n) or element_at(toks, i+j)) re-evaluates the regex
    split per produced element — O(len²) per document, which dominated the
    whole minhash pipeline on long documents."""
    toks = F.split(normalize_text(text), " ")
    k = F.size(toks) - F.lit(n - 1)
    parts = [F.slice(toks, j + 1, k) for j in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda x, y: F.concat_ws(" ", x, y))
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(acc)


def gopher_quality(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> Column:
    """Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1), as a
    struct of per-rule verdicts plus the combined pass bit — the form a
    filtering pipeline needs to report WHY a document was dropped.

    All JVM higher-order functions over one split; no Python, no shuffle:
      n_words         — token count within [min_words, max_words]
      mean_word_len   — within [min_mean_word_len, max_mean_word_len]
      alpha_frac      — fraction of words containing a letter >= min_alpha_frac
      n_stopwords     — distinct stopword hits >= min_stopwords
    """
    ws = F.split(text, " ")
    nw = F.size(ws)
    nwd = nw.cast("double")
    total_chars = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_wl = F.round(total_chars.cast("double") / F.greatest(nwd, F.lit(1.0)), 6)
    alpha = F.round(
        F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("double")
        / F.greatest(nwd, F.lit(1.0)),
        6,
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(ws), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    )
    ok_words = (nw >= min_words) & (nw <= max_words)
    ok_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    ok_alpha = alpha >= min_alpha_frac
    ok_stop = n_stop >= min_stopwords
    return F.struct(
        nw.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha.alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        ok_words.alias("ok_word_count"),
        ok_wl.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha_frac"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_wl & ok_alpha & ok_stop).alias("keep"),
    )


# --- Unicode normalization (pretraining cleaning pass) -----------------------
#
# Web text arrives in mixed normalization forms: decomposed accents from Mac
# filesystems, compatibility ligatures from PDFs, zero-width joiners from
# CMSes. Tokenizers treat "Café" (NFC) and "Café" (NFD) as different
# strings, so a corpus must be normalized BEFORE dedup/tokenize or near-dups
# hide behind codepoint form. Python's unicodedata implements the same
# Unicode-standard NFC as DuckDB's utf8proc `nfc_normalize` — the oracle
# entry (text_nfc_normalize) therefore certifies two independent
# implementations against each other. Arrow-batched pandas UDF: one
# `str.normalize` C call per batch column, no per-row Python.


def nfc_normalize_udf():
    """Deferred construction (pandas_udf needs no active session with type
    objects, but keep the import local to the function like langid does)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    # no type hints: the module's `from __future__ import annotations`
    # stringifies them and the local pd import is invisible to the
    # hint resolver — the un-hinted form defaults to SCALAR eval
    @pandas_udf(StringType())
    def _nfc(texts):
        # vectorized: pandas .str.normalize wraps unicodedata.normalize
        return texts.str.normalize("NFC")

    return _nfc


# --- RAG / embedding-window chunking ------------------------------------------

def token_window_chunks(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 40,
    stride: int = 30,
):
    """Sliding token-window chunking — the RAG/embedding-pipeline
    segmentation (chunk size `window` tokens, overlap `window - stride`):
    chunk k covers tokens [k*stride, k*stride + window), chunks start
    while k*stride < n_tokens, the tail chunk may be short. Distinct
    from word_shingles (stride-1 fingerprint grams) and chop_spans
    (corpus-stream packing): this is per-document retrieval segmentation
    with text reconstruction.

    All whole-stage codegen: tokenize (\\s+ runs, the token_count
    convention), ONE bounded explode of chunk starts (rows ∝ n/stride),
    slice + array_join per chunk — no window function, no shuffle,
    embarrassingly parallel at 100 TB.

    Returns (id, chunk_idx, n_tokens, chunk_text); empty/NULL docs emit
    nothing.
    """
    if window < 1 or stride < 1 or stride > window:
        raise ValueError("need 1 <= stride <= window")
    toks = F.expr(f"filter(split({text_col}, '\\\\s+'), x -> x != '')")
    return (
        df.select(F.col(id_col), toks.alias("__t"))
        .filter(F.size("__t") > 0)
        .select(
            F.col(id_col),
            F.col("__t"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("__t") - 1) / stride).cast("int"),
                )
            ).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.least(
                F.lit(window),
                F.size("__t") - F.col("chunk_idx") * stride,
            ).cast("long").alias("n_tokens"),
            F.array_join(
                F.slice(
                    F.col("__t"),
                    F.col("chunk_idx") * stride + 1,
                    F.lit(window),
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
