"""Corpus keyword search: BM25 top-k over the documents table.

A training-data pipeline needs keyword retrieval constantly — "show me the
documents that mention X", decontamination spot-checks, targeted corpus
slices for ablations. The reference's query service answers point lookups
by key (`internal/services/query_service.go` routes eq-filters to sqlc);
ranked full-text retrieval is the webtext analog, and BM25 is its
standard scoring.

Cross-engine exactness: textbook BM25 is log- and float-heavy; ln() is not
guaranteed bit-identical between the JVM and DuckDB's libm, and a 1-ulp
disagreement flips a DuckDB-oracle hash. This variant keeps BM25's shape —
an inverse-document-frequency weight times the saturating tf kernel with
length normalization (k1=1.2, b=0.75) — but computes it entirely in BIGINT
rationals:

    w(t)       = (N * 10_000) div df(t)            # rational idf
    score(d)   = sum_t  (w(t) * tf * 44 * T)
                 div (20 * tf * T  +  6 * T  +  18 * dl * N)

which is exactly w * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
avgdl = T/N substituted and every fraction cleared (k1 = 6/5, b = 3/4,
so (k1+1)=11/5 and the common denominator is 20*T): integer-exact on any
engine, any partitioning.

Int64 envelope: the widest intermediate is w * tf * 44 * T with
w <= N * IDF_SCALE (df=1 worst case). It fits comfortably through the
sf0.1 validation corpus (test_search.py::test_int64_headroom pins the
bound); past ~10^6 docs with singleton terms, drop IDF_SCALE a decade per
corpus decade (idf precision is relative, so the ranking is unchanged) —
the same guard discipline as dedup.py's bloom_max_seen handoff.

Scale shape:
  * tokenization + tf are one explode + groupBy((doc, term)) with map-side
    partial aggregation; the postings exchange carries distinct (doc,term)
    rows, not raw tokens;
  * df and the corpus scalars (N docs, T tokens) are tiny aggregates
    broadcast into the scoring join — the per-doc pass is shuffle-free
    except the final per-doc sum;
  * only postings for the query terms are scored (filter pushed below the
    groupBy), so cost is proportional to the query terms' posting lists,
    not the corpus — the property that makes this an index-shaped scan. At
    10^10 docs you would materialize `postings(term, doc, tf)` bucketed by
    term once and reuse it across queries; `build_postings` is that
    materialization step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDF_SCALE = 10_000


def tokenize(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, tok) rows: lowercase a-z runs, the portable tokenizer both
    engines split identically (`[^a-z]+` is the same regex in Java and
    RE2)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )


def build_postings(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(tok, id, tf): the inverted-index rows. At scale, write this out
    bucketed by tok and reuse across queries."""
    return (
        tokenize(df, id_col, text_col)
        .groupBy("tok", id_col)
        .agg(F.count("*").alias("tf"))
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by integer-exact BM25 for the given query terms.

    Returns (id, score_scaled BIGINT) ordered by (score desc, id) — the
    unique tie-break that keeps LIMIT deterministic on every engine.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokenize(df, id_col, text_col)
    # corpus scalars: N docs (from the source table, so token-less docs
    # still count), T total tokens, per-doc length dl
    n_docs = df.agg(F.count("*").alias("n_docs"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    t_total = dl.agg(F.sum("dl").alias("t_total"))

    qtoks = toks.filter(F.col("tok").isin(terms))
    tf = qtoks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    dfreq = (
        qtoks.select(id_col, "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )

    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(t_total))
        .select(
            F.col(id_col),
            F.expr(
                f"((n_docs * {IDF_SCALE}) div df) * tf * 44 * t_total"
                " div (20 * tf * t_total + 6 * t_total + 18 * dl * n_docs)"
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.sum("term_score").alias("score_scaled"))
        .orderBy(F.col("score_scaled").desc(), F.col(id_col))
        .limit(k)
    )


def anchor_text_index(
    anchors: DataFrame, url_col: str = "dst", anchor_col: str = "anchor"
) -> DataFrame:
    """Per target URL: in-link count + sorted distinct non-empty anchor
    texts — the classic web-retrieval signal (anchor text describes the
    TARGET better than the target's own page; every search stack since
    WWW7's anatomy paper indexes it) and a labeling signal for training
    data. Input is (url, anchor) rows, one per resolved+canonicalized link;
    one groupBy on the target key, map-side-combined; collect_set is
    bounded by distinct anchor phrasings per target, and array_sort makes
    the output order partitioning-independent."""
    return anchors.groupBy(url_col).agg(
        F.count("*").alias("n_inlinks"),
        F.array_sort(
            F.collect_set(
                F.when(F.col(anchor_col) != "", F.col(anchor_col))
            )
        ).alias("anchors"),
    )
