"""RSS/Atom feed-parser edge cases (operators/feeds.py). The relational
round-trip vs DuckDB lives in the entry registry (feed_parse_seeds,
tests/test_oracle_parity.py); these pin the format quirks the round trip
can't generate: CDATA, weekday/zone-name pubDates, attribute-vs-text
links, guid fallback, malformed bodies."""

from __future__ import annotations

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.feeds import (
    parse_feeds,
    published_epoch,
    seeds_from_feeds,
)

RSS = """<?xml version="1.0"?><rss version="2.0"><channel><title>T</title>
<item><title>A &amp; B</title><link>https://h1.example.org/a?x=1&amp;y=2</link>
<guid isPermaLink="true">g-1</guid>
<pubDate>Mon, 02 Mar 1992 10:30:00 +0000</pubDate></item>
<item><title><![CDATA[Raw <b>]]></title><link>https://h1.example.org/b</link>
<pubDate>02 Mar 1992 11:00:00 GMT</pubDate></item>
<item><title>no link: dropped</title></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>
<entry><title>E1</title>
<link rel="alternate" href="https://h2.example.org/p?a=1&amp;b=2"/>
<id>tag:1</id><updated>1992-03-02T10:30:00Z</updated></entry>
<entry><title>E2</title><link href="https://h2.example.org/q"/>
<updated>bogus</updated></entry>
</feed>"""


def _parse(spark, rows):
    df = spark.createDataFrame(rows, "host string, body string")
    return {
        (r["host"], r["link"]): r
        for r in parse_feeds(df).collect()
    }


def test_rss_items(spark):
    out = _parse(spark, [("h1", RSS)])
    assert len(out) == 2  # linkless item dropped
    a = out[("h1", "https://h1.example.org/a?x=1&y=2")]  # entities undone
    assert a["kind"] == "rss"
    assert a["entry_id"] == "g-1"
    assert a["title"] == "A & B"
    assert a["published_epoch"] == 699532200  # weekday prefix stripped
    b = out[("h1", "https://h1.example.org/b")]
    assert b["entry_id"] == "https://h1.example.org/b"  # guid falls back
    assert b["title"] == "Raw <b>"  # CDATA unwrapped
    assert b["published_epoch"] == 699534000  # GMT zone name, no weekday


def test_atom_entries(spark):
    out = _parse(spark, [("h2", ATOM)])
    e1 = out[("h2", "https://h2.example.org/p?a=1&b=2")]  # href ATTRIBUTE
    assert e1["kind"] == "atom"
    assert e1["entry_id"] == "tag:1"
    assert e1["published_epoch"] == 699532200  # RFC 3339
    e2 = out[("h2", "https://h2.example.org/q")]
    assert e2["published_epoch"] is None  # unparseable -> NULL, not error


def test_malformed_bodies_yield_zero_rows(spark):
    rows = [("h3", "<html>not a feed</html>"), ("h4", ""), ("h5", "<rss><channel><item>truncated")]
    assert _parse(spark, rows) == {}


def test_seeds_dedupe_keep_freshest(spark):
    two = """<rss><channel>
    <item><link>https://h.example.org/x</link>
    <pubDate>02 Mar 1992 10:00:00 +0000</pubDate></item>
    </channel></rss>"""
    newer = """<feed><entry><link href="https://h.example.org/x"/>
    <updated>1992-03-02T12:00:00Z</updated></entry></feed>"""
    df = spark.createDataFrame(
        [("a", two), ("b", newer)], "host string, body string"
    )
    seeds = seeds_from_feeds(parse_feeds(df)).collect()
    assert len(seeds) == 1
    assert seeds[0]["n_feed_refs"] == 2
    assert seeds[0]["published_epoch"] == 699537600  # 12:00 wins
    assert seeds[0]["host"] == "h.example.org"


def test_seeds_are_canonical_for_the_seen_set(spark):
    # the seeds_from_sitemaps contract: a feed link and a crawled link to
    # the same page must hash identically in the URL-seen set, so seeds
    # come out canonicalized (default port dropped, fragment dropped,
    # percent-case folded) and junk links come out not at all
    body = """<rss><channel>
    <item><link>HTTPS://H.Example.org:443/A%2fb#frag</link></item>
    <item><link>not a url at all</link></item>
    </channel></rss>"""
    df = spark.createDataFrame([("h", body)], "host string, body string")
    seeds = seeds_from_feeds(parse_feeds(df)).collect()
    from layerg_crawler_v2_spark.functions.canon import canonicalize

    assert len(seeds) == 1 or all(
        s["url"] == canonicalize(s["url"]) for s in seeds
    )
    for s in seeds:
        assert s["url"] == canonicalize(s["url"])  # canonical fixed point
        assert "#" not in s["url"]


def test_published_epoch_offsets(spark):
    df = spark.createDataFrame(
        [("Tue, 03 Mar 1992 01:00:00 +0200",), ("1992-03-02T23:00:00+00:00",)],
        "s string",
    )
    got = [r[0] for r in df.select(published_epoch(F.col("s"))).collect()]
    assert got == [699577200, 699577200]  # both are the same instant


def test_parser_total_on_fuzz_soup(spark):
    """Batch fuzz: one Spark job over seeded random feed-ish soup —
    the parser must be total (zero rows or valid rows, never an error),
    every emitted link non-null with kind in {rss, atom}, and
    published_epoch either NULL or a plausible epoch integer."""
    import random

    rng = random.Random(822)
    frags = [
        "<item>", "</item>", "<entry>", "</entry>", "<link>", "</link>",
        '<link href="', '"/>', "<guid>", "</guid>", "<pubDate>", "</pubDate>",
        "<updated>", "</updated>", "https://h.example.org/", "x", "&amp;",
        "&lt;", "<![CDATA[", "]]>", "02 Mar 1992 11:00:00 GMT", "bogus",
        "1992-03-02T10:30:00Z", "\n", "<", ">", '"', "Mon, ",
    ]
    rows = [
        (f"h{i}", "".join(rng.choice(frags) for _ in range(rng.randrange(0, 40))))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "host string, body string")
    out = parse_feeds(df).collect()  # totality: never raises
    for r in out:
        assert r["link"] is not None
        assert r["kind"] in ("rss", "atom")
        assert r["entry_id"] is not None  # guid/id falls back to link
        if r["published_epoch"] is not None:
            assert -5_000_000_000 < r["published_epoch"] < 10_000_000_000


def test_feed_seeds_flow_into_a_crawl_round(spark, tmp_path):
    """Integration: feed → seeds_from_feeds → rounds.add_seeds → one crawl
    round — the new seed source composes with the frontier exactly like
    hand-listed seeds, and a feed seed already fetched is deduped by the
    URL-seen set rather than refetched."""
    from layerg_crawler_v2_spark.datagen import build_pages_synthetic
    from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
    from layerg_crawler_v2_spark.streaming.rounds import (
        CrawlConfig,
        add_seeds,
        canonical_pages,
        run_crawl,
    )
    from layerg_crawler_v2_spark import schema as S

    pages = canonical_pages(build_pages_synthetic(spark, 400)).cache()
    some = [r["url_canon"] for r in pages.select("url_canon").limit(6).collect()]
    body = "<rss><channel>" + "".join(
        f"<item><link>{u}</link></item>" for u in some
    ) + "</channel></rss>"
    feeds = spark.createDataFrame([("f", body)], "host string, body string")
    seed_urls = [r["url"] for r in seeds_from_feeds(parse_feeds(feeds)).collect()]
    assert sorted(seed_urls) == sorted(some)  # already-canonical round trip

    store = SnapshotStore(str(tmp_path))
    cfg = CrawlConfig(rounds=1)
    run_crawl(spark, pages, seed_urls[:3], store, cfg, pages_are_canonical=True)
    first = {
        r["url"] for r in store.read(spark, "fetch_log", S.FETCH_LOG).collect()
    }
    assert set(seed_urls[:3]) <= first

    # re-seeding fetched urls + new ones: only the new ones join the frontier
    res = add_seeds(spark, store, seed_urls, cfg)
    assert res["seeds_added"] == len(seed_urls[3:])
    pages.unpersist()
