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
