"""RSS 2.0 / Atom 1.0 feed ingestion: feed bodies → frontier seeds.

The third standard seed feed next to robots.txt Sitemap: lines and
sitemap.xml (operators/sitemaps.py): news/blog hosts advertise new URLs
through feeds long before a recrawl would find them, so a production
crawler polls feeds for discovery freshness (the reference's analog is the
head-poll source — cmd/onchain.go's per-chain latest-block poll — new items
appear at the head, the poller turns them into work).

Scale shape (same discipline as sitemaps.py): feed bodies are per-host
strings, so the whole parse is JVM regex inside whole-stage codegen —
`regexp_extract_all` pulls <item>/<entry> blocks, per-field regexes pull
link/id/timestamp/title, the shared xml_unescape chain undoes entities.
No Python UDF, no shuffle until the caller aggregates; a 10^7-host feed
table is embarrassingly parallel. Malformed bodies degrade to zero rows,
never to an error (total, like the generated decoders the reference uses —
generated/eventhandlers/event_handlers.go:48-245).

Format notes the parser is pinned to (tests/test_feeds.py):
  * RSS item links are element text (<link>https://…</link>); Atom entry
    links are an ATTRIBUTE (<link href="https://…"/>) — the two formats'
    one structural difference, and the classic bug when one regex is
    reused for both.
  * RSS pubDate is RFC 822/5322 (weekday optional, numeric zone or 'GMT');
    Atom updated is RFC 3339. `published_epoch` normalizes both to epoch
    seconds so downstream freshness math is engine-exact integers.
  * <guid>/<id> fall back to the link when absent (the de-facto rule feed
    readers apply for dedup keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.sitemaps import xml_unescape


def _field(block: Column, name: str) -> Column:
    """<name …attrs…>…</name> content: trimmed, CDATA-unwrapped,
    entity-decoded, '' → NULL. Attribute-tolerant (RSS guids carry
    isPermaLink=…)."""
    raw = F.regexp_extract(
        block, f"(?s)<{name}(?:\\s[^>]*)?>\\s*(.*?)\\s*</{name}>", 1
    )
    uncdata = F.regexp_replace(raw, r"^<!\[CDATA\[(.*)\]\]>$", "$1")
    return F.when(uncdata == "", F.lit(None)).otherwise(xml_unescape(uncdata))


def _atom_href(block: Column) -> Column:
    """First <link … href="…"> attribute value in an Atom entry block
    (rel="alternate" or unadorned both match; the href is what seeds)."""
    raw = F.regexp_extract(block, r"""(?s)<link[^>]*?\shref\s*=\s*"([^"]*)\"""", 1)
    return F.when(raw == "", F.lit(None)).otherwise(xml_unescape(raw))


def published_epoch(col: Column) -> Column:
    """RFC 822 (RSS pubDate, weekday optional, 'GMT' or numeric zone) or
    RFC 3339 (Atom updated) → epoch seconds BIGINT; unparseable → NULL.
    Integer seconds keep freshness arithmetic exact across engines."""
    # Spark >= 3 refuses day-of-week letters in PARSE patterns ('E' is
    # format-only), so the optional RFC 822 weekday prefix is stripped
    # before the zone-offset / zone-name parse attempts.
    nowd = F.regexp_replace(col, r"^[A-Za-z]{3},\s*", "")
    ts = F.coalesce(
        F.try_to_timestamp(nowd, F.lit("dd MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(nowd, F.lit("dd MMM yyyy HH:mm:ss z")),
        F.try_to_timestamp(col),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    )
    return F.unix_timestamp(ts).alias("published_epoch")


def parse_feeds(
    fetched: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) feed fetches → (host, kind, link, entry_id,
    published_epoch, title) rows; kind = 'rss' | 'atom' per block origin.

    Both block kinds are extracted from every body and unioned — a body is
    whichever format its blocks are (feeds never mix <item> and <entry>,
    but a parser that dispatches on the root tag breaks on leading
    comments/doctypes; extracting both is total and costs one more regex
    pass). Entries without a link are dropped (the only field that can
    seed a frontier)."""
    items = F.explode(
        F.expr(f"regexp_extract_all({body_col}, '(?s)<item>(.*?)</item>', 1)")
    ).alias("block")
    entries = F.explode(
        F.expr(f"regexp_extract_all({body_col}, '(?s)<entry>(.*?)</entry>', 1)")
    ).alias("block")

    rss = (
        fetched.select(F.col(host_col).alias("host"), items)
        .select(
            "host",
            F.lit("rss").alias("kind"),
            _field(F.col("block"), "link").alias("link"),
            _field(F.col("block"), "guid").alias("entry_id"),
            published_epoch(_field(F.col("block"), "pubDate")).alias(
                "published_epoch"
            ),
            _field(F.col("block"), "title").alias("title"),
        )
    )
    atom = (
        fetched.select(F.col(host_col).alias("host"), entries)
        .select(
            "host",
            F.lit("atom").alias("kind"),
            _atom_href(F.col("block")).alias("link"),
            _field(F.col("block"), "id").alias("entry_id"),
            published_epoch(_field(F.col("block"), "updated")).alias(
                "published_epoch"
            ),
            _field(F.col("block"), "title").alias("title"),
        )
    )
    return (
        rss.unionByName(atom)
        .filter(F.col("link").isNotNull())
        .withColumn("entry_id", F.coalesce("entry_id", "link"))
    )


def seeds_from_feeds(parsed: DataFrame) -> DataFrame:
    """Feed entries → canonical seed URLs (url, host, published_epoch,
    n_feed_refs), ready for rounds.add_seeds — one row per canonical url
    with the FRESHEST publish time (feeds across hosts republish the same
    story URL; the latest signal is what recrawl scheduling wants).
    Canonicalization runs in the same Arrow pass the frontier uses
    (functions.canon), so a feed seed and a crawled link to the same page
    hash identically in the URL-seen set — the seeds_from_sitemaps
    contract, kept for every seed source."""
    from ..functions.canon import canonicalize_udf, host_udf

    canon = parsed.withColumn("url_canon", canonicalize_udf(F.col("link")))
    return (
        canon.filter(F.col("url_canon").isNotNull())
        .groupBy(F.col("url_canon").alias("url"))
        .agg(
            F.max("published_epoch").alias("published_epoch"),
            F.count(F.lit(1)).alias("n_feed_refs"),
        )
        .withColumn("host", host_udf(F.col("url")))
    )
