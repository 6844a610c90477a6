"""URL query-parameter noise mining: learn, from crawl data, which query
parameters do not affect page content (utm_* trackers, session ids,
affiliate tags) and which do (pagination, sort, real resource ids).

Crawlers that don't learn this re-fetch and re-store the same page under
thousands of tracking-tag aliases; production systems (Heritrix/Nutch URL
canonicalizers, Common Crawl's dedup) strip a HAND-KEPT list. This
operator derives the list from evidence instead: for every (host, param),
group the URLs that become IDENTICAL once that one param is removed; if a
group holds >1 distinct URL but exactly 1 distinct content hash, the param
provably didn't matter for those fetches.

Output per (host, param): how often the hypothesis was testable
(n_multi_groups: groups with >1 URL), how often it held (n_collapsible),
and noise_score = collapsible/multi (NULL when never testable). A
downstream canonicalizer strips params with score ~1.0 — feeding
functions/canon.py's normalization with crawl-learned rules.

Scale shape, all JVM: params parse with split/substring_index in-row; the
one posexplode fans each URL by its param count (bounded, ~3-10); the
group election shuffles on (host, param, md5(residual-url)) — a fixed-
width key, the residual string never leaves the map side after hashing;
two map-side-combined aggregations. No self-join, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_param_noise(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "content_hash",
) -> DataFrame:
    """df: one row per DISTINCT fetched url with a content hash. Returns
    (host, param, n_urls, n_multi_groups, n_collapsible, noise_score)."""
    url = F.col(url_col)
    after = F.substring_index(F.substring_index(url, "://", -1), "?", 1)
    host = F.substring_index(after, "/", 1)
    base = F.substring_index(url, "?", 1)
    query = F.when(
        F.instr(url, "?") > 0, F.substring_index(url, "?", -1)
    ).otherwise(F.lit(""))
    params = F.filter(F.split(query, "&"), lambda p: p != "")

    # one row per (url, param): the residual key is the url with THAT param
    # removed (other params kept in sorted order, so '?a=1&b=2' and
    # '?b=2&a=1' collapse); hashed before it shuffles
    exploded = df.select(
        host.alias("host"),
        base.alias("__base"),
        params.alias("__params"),
        F.col(content_col).alias("__content"),
        F.explode(params).alias("__p"),
    ).select(
        "host",
        F.substring_index(F.col("__p"), "=", 1).alias("param"),
        F.md5(
            F.concat_ws(
                "?",
                F.col("__base"),
                F.array_join(
                    F.array_sort(
                        F.array_remove(F.col("__params"), F.col("__p"))
                    ),
                    "&",
                ),
            )
        ).alias("__residual"),
        "__content",
    )
    groups = exploded.groupBy("host", "param", "__residual").agg(
        F.count("*").alias("n_urls_g"),
        F.count_distinct("__content").alias("n_contents_g"),
    )
    multi = F.col("n_urls_g") > 1
    return (
        groups.groupBy("host", "param")
        .agg(
            F.sum("n_urls_g").alias("n_urls"),
            F.sum(multi.cast("long")).alias("n_multi_groups"),
            F.sum((multi & (F.col("n_contents_g") == 1)).cast("long")).alias(
                "n_collapsible"
            ),
        )
        .withColumn(
            "noise_score",
            F.when(
                F.col("n_multi_groups") > 0,
                F.round(
                    F.col("n_collapsible")
                    / F.col("n_multi_groups").cast("double"),
                    6,
                ),
            ),
        )
    )


def dust_rules(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "content_hash",
    min_support: int = 2,
) -> DataFrame:
    """DUST rule mining (Bar-Yossef et al. WWW'07, "Do not crawl in the
    DUST"): learn substring REWRITE rules — `index.html` -> '',
    `/print/` -> '/', session-path aliases — from evidence, i.e. pairs of
    same-host URLs that served identical content. The path-structure
    complement of url_param_noise (which only learns query params); a
    crawler applies high-support rules in the canonicalizer to stop
    re-fetching alias families.

    Per same-(host, content) URL pair u1 < u2: strip the longest common
    prefix and the longest common suffix (clamped to not overlap); the
    residual middles (a, b) form candidate rule a -> b, canonicalized so
    the SHORTER (then lexicographically smaller) side is the rewrite
    TARGET (the paper's preference for the shorter canonical form). Rules
    are scored by support (pair count) and host spread.

    LCP/LCS are pure codegen: size(filter(sequence(1, n), i ->
    substr(u1,1,i) = substr(u2,1,i))) — prefix equality is monotone, so
    the filter size IS the LCP; O(len^2) char compares per pair on <200-
    char URLs, all whole-stage, no UDF. Pairing shuffles on
    (host, content_fp) — duplicate-cluster-bounded, never all-pairs; the
    rule rollup is one map-side-combined groupBy.

    Returns (rule_from, rule_to, support, n_hosts), support-filtered.
    """
    url = F.col(url_col)
    after = F.substring_index(F.substring_index(url, "://", -1), "?", 1)
    host = F.substring_index(after, "/", 1)
    u = df.select(
        host.alias("host"),
        F.col(content_col).alias("fp"),
        url.alias("u"),
    ).distinct()
    a = u.select("host", "fp", F.col("u").alias("u1"))
    b = u.select("host", "fp", F.col("u").alias("u2"))
    pairs = a.join(b, ["host", "fp"]).filter(F.col("u1") < F.col("u2"))
    lcp = F.expr(
        "size(filter(sequence(1, least(length(u1), length(u2))),"
        " i -> substr(u1, 1, i) = substr(u2, 1, i)))"
    )
    lcs = F.expr(
        "size(filter(sequence(1, least(length(u1), length(u2))),"
        " i -> substr(u1, length(u1) - i + 1, i)"
        "    = substr(u2, length(u2) - i + 1, i)))"
    )
    mids = (
        pairs.withColumn("lcp", lcp)
        .withColumn(
            "ov",
            F.least(
                lcs,
                F.length("u1") - F.col("lcp"),
                F.length("u2") - F.col("lcp"),
            ),
        )
        .select(
            "host",
            F.expr(
                "substr(u1, lcp + 1, length(u1) - lcp - ov)"
            ).alias("m1"),
            F.expr(
                "substr(u2, lcp + 1, length(u2) - lcp - ov)"
            ).alias("m2"),
        )
    )
    to_first = (F.length("m1") < F.length("m2")) | (
        (F.length("m1") == F.length("m2")) & (F.col("m1") < F.col("m2"))
    )
    rules = mids.select(
        "host",
        F.when(to_first, F.col("m2")).otherwise(F.col("m1")).alias(
            "rule_from"
        ),
        F.when(to_first, F.col("m1")).otherwise(F.col("m2")).alias(
            "rule_to"
        ),
    )
    return (
        rules.groupBy("rule_from", "rule_to")
        .agg(
            F.count("*").alias("support"),
            F.countDistinct("host").alias("n_hosts"),
        )
        .filter(F.col("support") >= min_support)
    )
