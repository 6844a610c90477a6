"""Site-template mining from DOM structure.

Pages a CMS renders from one template share their tag-path skeleton even
though every article's text differs; grouping pages by (host, structural
fingerprint) recovers the site's templates — the DOM-structure dual of
mirror detection's content-shingle profiles (operators/dedup.py), and the
corpus-statistics complement of per-page jusText blocks: once a host's
dominant templates are known, per-template boilerplate/extraction rules
amortize over every page that matches (RoadRunner/wrapper-induction
lineage, Crescenzi et al. VLDB'01).

Scale shape: the signature is ONE Arrow pass per page (the extract.py
family); the fingerprint is a JVM hash of the canonical signature string
(md5 for the DuckDB-oracle family, xxhash64 for production — the
lsh_candidate_pairs precedent); clustering is one map-side-combined
groupBy on (host, fingerprint) whose exchange carries fixed-width hashes,
never the signature text. Nothing all-pairs, nothing driver-side."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def page_structure_sigs(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(url, host, struct_sig, struct_fp): canonical tag-path signature +
    its fingerprint per page."""
    from layerg_crawler_v2_spark.functions.extract import (
        structure_signature_udf,
    )

    url = F.col(url_col)
    after = F.substring_index(F.substring_index(url, "://", -1), "?", 1)
    hasher = F.xxhash64 if hash_fn == "xxhash64" else F.md5
    return pages.select(
        url.alias("url"),
        F.substring_index(after, "/", 1).alias("host"),
        structure_signature_udf(F.col(html_col)).alias("struct_sig"),
    ).withColumn("struct_fp", hasher(F.col("struct_sig")))


def template_clusters(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_pages: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(host, struct_fp, n_pages, example_url) per template with at least
    min_pages members — a host's template inventory, biggest first is one
    orderBy away; example_url (the min) pins a deterministic
    representative for downstream rule mining."""
    sigs = page_structure_sigs(pages, url_col, html_col, hash_fn)
    return (
        sigs.filter(F.col("struct_sig").isNotNull())
        .groupBy("host", "struct_fp")
        .agg(
            F.count("*").alias("n_pages"),
            F.min("url").alias("example_url"),
        )
        .filter(F.col("n_pages") >= min_pages)
    )
