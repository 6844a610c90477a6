"""Soft-404 detection: HTTP-200 pages that are really error pages.

Hosts that answer every dead URL with a styled "not found" page and
status 200 poison a crawl twice — the frontier keeps scheduling their
dead links, and the corpus fills with thousands of copies of one error
template. The classic detector (Bar-Yossef, Broder, Kumar, Tomkins,
"Sic transit gloria telae", WWW'04) probes each host with a known-random
URL and compares responses; the batch form used here needs no extra
fetches: a host's error template IS the body fingerprint it serves for
MANY DISTINCT URLs (real content is url-specific; templates repeat), and
error phrasing confirms the template is an error, not a legitimate
shared page (consent walls, parking pages score the marker but matter
too — the two bits are returned separately so policy can differ).

Scale shape: one md5 per row, ONE map-side-combined groupBy on
(host, fingerprint) whose exchange carries group keys + counts (never
bodies), and one join of pages against the group-size dim — at web scale
the dim is `urls-per-template` sized, far below page count, and skew-safe
(the fingerprint spreads a hot host across its templates). The marker
test is a single JVM rlike inside codegen. No Python, no all-pairs, no
driver state. Reference analog: the router drops events whose address
fails the allowlist before any handler runs (cmd/onchain.go:68-72) — the
soft-404 bit is the same pre-handler gate for fetched bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Marker phrasing: deliberately narrow — title-grade error phrases, not
# body words like 'error' that legitimate pages use constantly.
SOFT404_MARKER = (
    r"(?i)(page |file )?not found\b|does not exist"
    r"|no longer (available|exists)"
    r"|404 error|error 404|page unavailable|been removed"
)


def soft404_flags(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    body_col: str = "text",
    min_template_urls: int = 3,
) -> DataFrame:
    """Per page: (host, url, template_urls, has_marker, is_soft404).

    `template_urls` = how many DISTINCT urls on the host serve this exact
    body; `is_soft404` = the body repeats across >= min_template_urls
    urls AND carries error phrasing. Single-url error pages stay
    unflagged (a real article titled 'Page Not Found' exists; without
    repetition there is no template evidence), and repeated NON-error
    templates (consent walls) keep is_soft404 false but are visible via
    template_urls for a separate boilerplate policy."""
    fp = F.md5(F.trim(F.col(body_col)))
    keyed = pages.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        fp.alias("__fp"),
        F.col(body_col).rlike(SOFT404_MARKER).alias("has_marker"),
    )
    templates = keyed.groupBy("host", "__fp").agg(
        F.count_distinct("url").alias("template_urls")
    )
    return (
        keyed.join(templates, on=["host", "__fp"])
        .select(
            "host",
            "url",
            "template_urls",
            "has_marker",
            (
                F.col("has_marker")
                & (F.col("template_urls") >= F.lit(int(min_template_urls)))
            ).alias("is_soft404"),
        )
    )
