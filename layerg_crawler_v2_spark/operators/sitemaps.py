"""Sitemap ingestion: XML sitemaps / sitemap indexes → frontier seeds.

Graft analog of the reference's dynamic source registration — a new chain
row makes the crawler start polling it (cmd/crawler_cmd.go:60-101); here a
host's sitemap.xml enumerates the URLs the site *asks* to be crawled, the
standard seed feed next to robots.txt (sitemaps are advertised by robots.txt
`Sitemap:` lines and <https://www.sitemaps.org/protocol.html>).

Scale shape: sitemap bodies are per-host strings, so everything stays
JVM-side — `regexp_extract_all` pulls the <url>/<sitemap> blocks, per-field
regexes pull loc/lastmod/changefreq/priority, a replace chain undoes the five
XML entities. No Python UDF, no shuffle until the caller aggregates; a
10^7-host sitemap table is embarrassingly parallel. The non-greedy block
regexes are exact for well-formed sitemaps (the protocol forbids nested
<url>/<sitemap> elements); malformed bodies degrade to zero rows, never to
an error (total like the reference's generated decoders,
generated/eventhandlers/event_handlers.go:48-245).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# &amp; LAST, so '&amp;lt;' round-trips to '&lt;' and not '<'
_XML_UNESCAPES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def xml_unescape(col: Column) -> Column:
    """Undo the five predefined XML entities (amp last — escaped escapes
    must not double-unescape)."""
    for ent, ch in _XML_UNESCAPES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def xml_escape(col: Column) -> Column:
    """Escape text for embedding in XML (amp FIRST, mirror of unescape)."""
    for ent, ch in reversed(_XML_UNESCAPES):
        col = F.replace(col, F.lit(ch), F.lit(ent))
    return col


def _field(block: Column, name: str) -> Column:
    """<name>…</name> content: trimmed, CDATA-unwrapped, entity-decoded,
    '' → NULL (absent optional field)."""
    raw = F.regexp_extract(block, f"(?s)<{name}>\\s*(.*?)\\s*</{name}>", 1)
    uncdata = F.regexp_replace(raw, r"^<!\[CDATA\[(.*)\]\]>$", "$1")
    return F.when(uncdata == "", F.lit(None)).otherwise(xml_unescape(uncdata))


def parse_sitemaps(
    fetched: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) sitemap fetches → (host, kind, loc, lastmod, changefreq,
    priority) rows.

    kind = 'url' for <urlset><url> page entries, 'sitemap' for
    <sitemapindex><sitemap> child-sitemap refs (feed those back through the
    fetch loop — sitemap recursion is just another crawl round). lastmod
    stays the raw W3C-datetime string (date-only and full RFC3339 both
    occur in the wild; `lastmod_ts` lifts it when a timestamp is wanted).
    Entries without a <loc> are dropped (the only required field)."""

    def _blocks(tag: str, kind: str) -> DataFrame:
        block = F.explode(
            F.expr(
                f"regexp_extract_all({body_col}, '(?s)<{tag}>(.*?)</{tag}>', 1)"
            )
        ).alias("block")
        df = fetched.select(F.col(host_col).alias("host"), block)
        return df.select(
            "host",
            F.lit(kind).alias("kind"),
            _field(F.col("block"), "loc").alias("loc"),
            _field(F.col("block"), "lastmod").alias("lastmod"),
            _field(F.col("block"), "changefreq").alias("changefreq"),
            _field(F.col("block"), "priority").try_cast("double").alias(
                "priority"
            ),
        ).filter(F.col("loc").isNotNull())

    return _blocks("url", "url").unionByName(_blocks("sitemap", "sitemap"))


def lastmod_ts(col: Column) -> Column:
    """W3C-datetime lastmod string → timestamp (date-only rendered as
    midnight UTC; unparseable → NULL)."""
    return F.coalesce(
        F.try_to_timestamp(col),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")),
    )


def sitemap_refs(parsed: DataFrame) -> DataFrame:
    """Child sitemaps advertised by sitemapindex files — the next fetch
    list for the sitemap-expansion loop."""
    return parsed.filter(F.col("kind") == "sitemap").select(
        "host", F.col("loc").alias("url"), "lastmod"
    ).distinct()


def seeds_from_sitemaps(parsed: DataFrame) -> DataFrame:
    """Page entries → canonical seed URLs (url, host, lastmod_ts, priority),
    ready for rounds.add_seeds. Canonicalization runs in the same Arrow
    batch pass the frontier uses (functions.canon), so a sitemap seed and a
    crawled link to the same page hash identically in the URL-seen set."""
    from ..functions.canon import canonicalize_udf, host_udf

    urls = parsed.filter(F.col("kind") == "url")
    canon = urls.withColumn("url_canon", canonicalize_udf(F.col("loc")))
    return (
        canon.filter(F.col("url_canon").isNotNull())
        .select(
            F.col("url_canon").alias("url"),
            host_udf(F.col("url_canon")).alias("host"),
            lastmod_ts(F.col("lastmod")).alias("lastmod_ts"),
            "priority",
        )
        .dropDuplicates(["url"])
    )
