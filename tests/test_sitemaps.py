"""Sitemap parse edge cases the oracle round-trip can't exercise: CDATA,
entity escapes, whitespace, missing optional fields, sitemapindex recursion,
malformed bodies, and seed canonicalization parity with the frontier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.sitemaps import (
    parse_sitemaps,
    seeds_from_sitemaps,
    sitemap_refs,
)


def _parse(spark, body, host="h.example.org"):
    df = spark.createDataFrame([(host, body)], "host string, body string")
    return parse_sitemaps(df).collect()


URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://h.example.org/a?x=1&amp;y=2 </loc>
    <lastmod>2026-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[https://h.example.org/cdata?a=1&b=2]]></loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc>https://h.example.org/min</loc><priority>bogus</priority></url>
</urlset>"""


def test_urlset_fields_cdata_and_entities(spark):
    rows = {r["loc"]: r for r in _parse(spark, URLSET)}
    assert set(rows) == {
        "https://h.example.org/a?x=1&y=2",   # trimmed + &amp; decoded
        "https://h.example.org/cdata?a=1&b=2",  # CDATA: raw & preserved
        "https://h.example.org/min",
    }  # loc-less entry dropped
    full = rows["https://h.example.org/a?x=1&y=2"]
    assert full["kind"] == "url"
    assert full["lastmod"] == "2026-01-05"
    assert full["changefreq"] == "daily"
    assert full["priority"] == 0.8
    minimal = rows["https://h.example.org/min"]
    assert minimal["lastmod"] is None and minimal["changefreq"] is None
    assert minimal["priority"] is None  # bogus -> try_cast NULL


def test_sitemapindex_refs(spark):
    body = (
        "<sitemapindex>"
        "<sitemap><loc>https://h.example.org/s1.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>"
        "<sitemap><loc>https://h.example.org/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = parse_sitemaps(
        spark.createDataFrame([("h", body)], "host string, body string")
    )
    refs = {r["url"]: r["lastmod"] for r in sitemap_refs(df).collect()}
    assert refs == {
        "https://h.example.org/s1.xml": "2026-02-01",
        "https://h.example.org/s2.xml": None,
    }
    assert df.filter(F.col("kind") == "url").count() == 0


@pytest.mark.parametrize(
    "body", ["", "not xml at all", "<urlset><url></url></urlset>", None]
)
def test_malformed_bodies_yield_no_rows(spark, body):
    assert _parse(spark, body) == []


def test_seeds_canonicalized_and_deduped(spark):
    body = (
        "<urlset>"
        "<url><loc>HTTPS://H.Example.org:443/p/1</loc>"
        "<lastmod>2026-01-05</lastmod><priority>0.5</priority></url>"
        "<url><loc>https://h.example.org/p/1</loc></url>"  # same after canon
        "<url><loc>https://h.example.org/p/2#frag</loc></url>"
        "</urlset>"
    )
    df = parse_sitemaps(
        spark.createDataFrame([("h", body)], "host string, body string")
    )
    seeds = seeds_from_sitemaps(df)
    got = sorted(r["url"] for r in seeds.collect())
    assert got == [
        "https://h.example.org/p/1",  # scheme/host lowered, :443 dropped, deduped
        "https://h.example.org/p/2",  # fragment stripped
    ]
    assert all(r["host"] == "h.example.org" for r in seeds.collect())


def test_sitemap_seeds_drive_a_crawl(spark, tmp_path, sf_dir):
    """End-to-end discovery chain: a sitemap advertising real page URLs is
    parsed into seeds and fed to run_crawl as a DataFrame (raw_url column) —
    every advertised page ends up in the fetch log."""
    from layerg_crawler_v2_spark.datagen import build_pages
    from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
    from layerg_crawler_v2_spark.streaming.rounds import CrawlConfig, run_crawl
    from layerg_crawler_v2_spark import schema as S

    pages = build_pages(spark, sf_dir).cache()
    urls = [r["url"] for r in pages.select("url").limit(3).collect()]
    body = (
        "<urlset>"
        + "".join(f"<url><loc>{u}</loc><priority>0.7</priority></url>" for u in urls)
        + "</urlset>"
    )
    parsed = parse_sitemaps(
        spark.createDataFrame([("h", body)], "host string, body string")
    )
    seeds = seeds_from_sitemaps(parsed).select(F.col("url").alias("raw_url"))

    store = SnapshotStore(str(tmp_path / "smcrawl"))
    run_crawl(spark, pages, seeds, store, CrawlConfig(rounds=1))
    fetched = {
        r["url"] for r in store.read(spark, "fetch_log", S.FETCH_LOG).collect()
    }
    from layerg_crawler_v2_spark.functions.canon import canonicalize

    for u in urls:
        assert canonicalize(u) in fetched, u
