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


def phrase_occurrences(
    df: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search: documents containing the query words
    CONSECUTIVELY, with occurrence count and first token position — the
    positional-postings query BM25's bag-of-words scoring cannot answer
    (quote-queries, decontamination exact-phrase checks, boilerplate
    phrase audits). Classic positional-index semantics (Manning IR §2.4)
    without materializing positions: phrases are verified per row.

    Scale shape: the match is ONE whole-stage-codegen expression per
    document — tokenize (the bm25 `[^a-z]+` portable tokenizer), then
    filter the positions array `transform(t, (x,i) -> i+1)` by
    `slice(t, i, k) = array(phrase)` — no explode, no window, no shuffle
    of any kind; the plan is a narrow scan + filter, embarrassingly
    parallel at 100 TB. (A positional-postings self-join shuffles the
    whole token stream k times; per-row slice comparison reads each doc
    once and moves nothing.) transform-with-index is used instead of
    `sequence(1, n-k+1)` because Spark's sequence(1, 0) yields the
    DESCENDING [1,0], not [].

    Returns (id, n_matches BIGINT, first_pos BIGINT [1-based]) for docs
    with >= 1 occurrence.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    for w in phrase:
        if not w.isascii() or not w.isalpha() or w != w.lower():
            raise ValueError(f"phrase words must be lowercase a-z: {w!r}")
    k = len(phrase)
    lit = "array(" + ", ".join(f"'{w}'" for w in phrase) + ")"
    return (
        df.select(
            F.col(id_col),
            F.expr(
                f"filter(split(lower({text_col}), '[^a-z]+'), x -> x != '')"
            ).alias("t"),
        )
        .select(
            F.col(id_col),
            F.expr(
                "filter(transform(t, (x, i) -> i + 1),"
                f" i -> i <= size(t) - {k - 1} AND slice(t, i, {k}) = {lit})"
            ).alias("hits"),
        )
        .filter(F.size("hits") > 0)
        .select(
            F.col(id_col),
            F.size("hits").cast("bigint").alias("n_matches"),
            F.element_at("hits", 1).cast("bigint").alias("first_pos"),
        )
    )


PMI_SCALE = 1_000_000


def collocations_pmi_topk(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations (adjacent word pairs) by pointwise mutual
    information — the standard corpus-analytics pass for phrase discovery
    (tokenizer vocab candidates, named-entity seeds, boilerplate phrase
    mining; Church & Hanks, CL'90). PMI's exp form
    P(xy) / (P(x)P(y)) = c_xy * T1^2 / (T2 * c_x * c_y) is computed as the
    STAGED integer expression

        ((((c_xy * T1) div c_x) * T1) div c_y) * PMI_SCALE div T2

    — staging keeps every intermediate bounded (after `div c_x` the value
    is <= T1 because c_x >= c_xy), and both engines evaluate the IDENTICAL
    staging, so the score is bit-exact cross-engine; the floors cost
    relative precision ~1/c_xy — noise for a RANKING statistic at
    min_count >= 5, which also kills PMI's classic singleton explosion
    before the join. Int64 envelope: T1^2 * PMI_SCALE / c_y-ish worst case
    holds through ~1e6-token corpora per the same headroom discipline as
    bm25_topk; a 10^12-token corpus computes unigram/bigram counts
    per-shard first (counts compose additively) before one global score
    pass.

    Scale shape: bigrams come from ONE whole-stage-codegen array transform
    (slice + indexed lambda) — adjacency never leaves the row, no
    posexplode self-join, no window; the bigram groupBy is map-side
    combined; unigram counts are vocab-sized and broadcast into the score
    join; the only global sort is the final TakeOrderedAndProject top-k.
    """
    docs = df.select(
        F.expr(
            f"filter(split(lower({text_col}), '[^a-z]+'), x -> x != '')"
        ).alias("t")
    )
    uni = (
        docs.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    t1 = uni.agg(F.sum("c").alias("t1"))
    t2 = docs.agg(
        F.sum(F.greatest(F.expr("size(t) - 1"), F.lit(0))).alias("t2")
    )
    bigrams = docs.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bc = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    ux = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    return (
        bc.join(F.broadcast(ux), "w1")
        .join(F.broadcast(uy), "w2")
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("bigint").alias("pair_count"),
            F.expr(
                "((((c_xy * t1) div c_x) * t1) div c_y)"
                f" * {PMI_SCALE} div t2"
            ).cast("bigint").alias("pmi_ratio_scaled"),
        )
        .orderBy(F.col("pmi_ratio_scaled").desc(), "w1", "w2")
        .limit(k)
    )
