"""robots.txt parsing + compiled-trie filtering.

The reference's analog is the per-chain monitored-address allowlist
(cmd/onchain.go:68-72, 95-100); the crawl engine generalizes it to RFC 9309
robots semantics: longest-prefix wins, allow beats deny on ties, no match =
allowed, Crawl-delay feeds the per-host politeness dim."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.robots import (
    apply_robots,
    compile_robots,
    crawl_delays,
    merge_host_config,
    parse_robots_txt,
    path_rules,
)
from tests.reference_sim import robots_allowed


def test_apply_robots_matches_python_reference_randomized(spark):
    """Property check: compiled-trie filter == the sequential reference
    resolver over randomized rule tables and URL paths."""
    rng = random.Random(20260818)
    hosts = [f"h{i}.com" for i in range(6)]
    prefixes = ["/", "/a", "/a/b", "/a/bc", "/x", "/x/y/z", "/q?k=v"]
    rules = []
    for h in hosts[:5]:  # h5 gets no rules at all
        for _ in range(rng.randint(1, 5)):
            rules.append(
                (h, rng.choice(["allow", "deny"]), rng.choice(prefixes))
            )
    paths = prefixes + ["/a/b/c", "/ab", "/x/y", "/other", "/q?k=v2"]
    cand_rows = [
        (f"http://{h}{p}", h, i)
        for i, (h, p) in enumerate(
            (rng.choice(hosts), rng.choice(paths)) for _ in range(200)
        )
    ]
    cand = spark.createDataFrame(cand_rows, "url string, host string, idx int")
    rules_df = spark.createDataFrame(
        rules, "host string, rule_type string, path_prefix string"
    )
    got = sorted(r.idx for r in apply_robots(cand, rules_df).collect())
    want = sorted(
        i for (u, h, i) in cand_rows if robots_allowed(u, h, rules)
    )
    assert got == want


def test_compile_robots_precompiled_reuse(spark):
    """apply_robots accepts a compile_robots output directly (run_crawl
    compiles once per crawl and reuses the cached rows every round)."""
    rules = spark.createDataFrame(
        [("a.com", "deny", "/private"), ("a.com", "allow", "/private/ok")],
        "host string, rule_type string, path_prefix string",
    )
    compiled = compile_robots(rules)
    assert set(compiled.columns) == {"host", "rules"}
    cand = spark.createDataFrame(
        [
            ("http://a.com/private/x", "a.com"),
            ("http://a.com/private/ok/y", "a.com"),
            ("http://a.com/pub", "a.com"),
        ],
        "url string, host string",
    )
    got = sorted(r.url for r in apply_robots(cand, compiled).collect())
    assert got == ["http://a.com/private/ok/y", "http://a.com/pub"]


ROBOTS_TXT = """\
# global section
User-agent: *
Disallow: /tmp
Allow: /tmp/public
Crawl-delay: 1.5

User-agent: layerg
User-agent: otherbot
Disallow: /layerg-only
Crawl-delay: 2

User-agent: unrelated
Disallow: /
"""


def test_parse_robots_txt_wildcard_section(spark):
    fetched = spark.createDataFrame(
        [("a.com", ROBOTS_TXT)], "host string, body string"
    )
    rows = sorted(
        (r.rule_type, r.path_prefix)
        for r in parse_robots_txt(fetched).collect()
    )
    assert rows == [
        ("allow", "/tmp/public"),
        ("crawl_delay", "1500"),
        ("deny", "/tmp"),
    ]


def test_parse_robots_txt_specific_agent_and_grouped_uas(spark):
    """Most specific matching User-agent group wins; consecutive User-agent
    lines share one rule group (RFC 9309)."""
    fetched = spark.createDataFrame(
        [("a.com", ROBOTS_TXT)], "host string, body string"
    )
    rows = sorted(
        (r.rule_type, r.path_prefix)
        for r in parse_robots_txt(fetched, user_agent="layerg-crawler").collect()
    )
    assert rows == [("crawl_delay", "2000"), ("deny", "/layerg-only")]


def test_parse_robots_txt_edge_cases(spark):
    fetched = spark.createDataFrame(
        [
            ("empty.com", ""),
            ("null.com", None),
            ("norules.com", "User-agent: *\n\n# nothing else\n"),
            ("orphan.com", "Disallow: /before-any-agent\nUser-agent: *\nDisallow: /ok\n"),
            ("badnum.com", "User-agent: *\nCrawl-delay: soon\nDisallow: /x\n"),
        ],
        "host string, body string",
    )
    rows = sorted(
        (r.host, r.rule_type, r.path_prefix)
        for r in parse_robots_txt(fetched).collect()
    )
    assert rows == [
        ("badnum.com", "deny", "/x"),
        ("orphan.com", "deny", "/ok"),
    ]


def test_crawl_delays_and_path_rules_split(spark):
    fetched = spark.createDataFrame(
        [("a.com", ROBOTS_TXT)], "host string, body string"
    )
    parsed = parse_robots_txt(fetched).cache()
    delays = crawl_delays(parsed).collect()
    assert [(r.host, r.delay_ms, r.max_parallel) for r in delays] == [
        ("a.com", 1500, None)
    ]
    kinds = {r.rule_type for r in path_rules(parsed).collect()}
    assert kinds == {"allow", "deny"}
    parsed.unpersist()


def test_merge_host_config_precedence(spark):
    """Explicit hosts-config rows beat robots Crawl-delay hints; hosts only
    the robots hint knows about are appended; None hosts passes through."""
    fetched = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 3\n"),
            ("b.com", "User-agent: *\nCrawl-delay: 7\n"),
        ],
        "host string, body string",
    )
    rules = parse_robots_txt(fetched)
    hosts = spark.createDataFrame(
        [("a.com", 100, 4)], "host string, delay_ms int, max_parallel int"
    )
    got = {
        r.host: (r.delay_ms, r.max_parallel)
        for r in merge_host_config(hosts, rules).collect()
    }
    assert got == {"a.com": (100, 4), "b.com": (7000, None)}
    got_none = {
        r.host: r.delay_ms for r in merge_host_config(None, rules).collect()
    }
    assert got_none == {"a.com": 3000, "b.com": 7000}


def test_parsed_rules_drive_a_crawl(spark):
    """End-to-end: raw robots.txt text → parse → filter; the denied prefix
    is dropped, crawl_delay carrier rows don't leak into path filtering."""
    fetched = spark.createDataFrame(
        [("site.com", "User-agent: *\nDisallow: /private\nCrawl-delay: 1\n")],
        "host string, body string",
    )
    rules = path_rules(parse_robots_txt(fetched))
    cand = spark.createDataFrame(
        [
            ("http://site.com/private/a", "site.com"),
            ("http://site.com/open/b", "site.com"),
        ],
        "url string, host string",
    )
    got = [r.url for r in apply_robots(cand, rules).collect()]
    assert got == ["http://site.com/open/b"]


def test_sitemap_directive_group_independent(spark):
    from layerg_crawler_v2_spark.operators.robots import sitemap_urls

    body = (
        "Sitemap: https://a.org/before-any-group.xml\n"  # before User-agent
        "User-agent: other-bot\n"
        "Disallow: /only-for-other\n"
        "Sitemap: https://a.org/inside-foreign-group.xml\n"
        "User-agent: *\n"
        "Disallow: /x\n"
        "Sitemap: https://a.org/s2.xml\n"
        "Sitemap:\n"  # empty value: ignored
    )
    fetched = spark.createDataFrame([("a.org", body)], "host string, body string")
    parsed = parse_robots_txt(fetched).cache()
    # sitemap rows are agent-independent: ALL are kept, even the one inside
    # the other-bot group and the one before any group
    assert sorted(r["url"] for r in sitemap_urls(parsed).collect()) == [
        "https://a.org/before-any-group.xml",
        "https://a.org/inside-foreign-group.xml",
        "https://a.org/s2.xml",
    ]
    # and they don't leak into the path-rule / compile stages
    assert sorted(
        (r["rule_type"], r["path_prefix"]) for r in path_rules(parsed).collect()
    ) == [("deny", "/x")]
    compiled = compile_robots(parsed)  # raw table with carrier rows: safe
    rules = compiled.collect()[0]["rules"]
    assert [(r["rule_type"], r["path_prefix"]) for r in rules] == [("deny", "/x")]


def test_sitemap_only_body_with_no_matching_agent(spark):
    from layerg_crawler_v2_spark.operators.robots import sitemap_urls

    body = "User-agent: somebody-else\nDisallow: /\nSitemap: https://b.org/s.xml\n"
    fetched = spark.createDataFrame([("b.org", body)], "host string, body string")
    parsed = parse_robots_txt(fetched, user_agent="layerg-crawler")
    assert [r["url"] for r in sitemap_urls(parsed).collect()] == [
        "https://b.org/s.xml"
    ]
    assert path_rules(parsed).count() == 0


def test_robots_to_sitemap_to_seeds_pipeline(spark):
    """robots.txt advertises a sitemap -> fetch its body -> parse -> seeds:
    the full discovery chain, ending in add_seeds-ready canonical urls."""
    from layerg_crawler_v2_spark.operators.robots import sitemap_urls
    from layerg_crawler_v2_spark.operators.sitemaps import (
        parse_sitemaps,
        seeds_from_sitemaps,
    )

    robots_body = "User-agent: *\nDisallow: /private/\nSitemap: https://c.org/sm.xml\n"
    parsed = parse_robots_txt(
        spark.createDataFrame([("c.org", robots_body)], "host string, body string")
    )
    ads = sitemap_urls(parsed)
    assert ads.collect()[0]["url"] == "https://c.org/sm.xml"

    # simulate fetching the advertised sitemap body
    sm_body = (
        "<urlset><url><loc>HTTPS://C.ORG/p/1</loc><priority>0.9</priority></url>"
        "<url><loc>https://c.org/p/2</loc></url></urlset>"
    )
    fetched = ads.withColumn("body", F.lit(sm_body))
    seeds = seeds_from_sitemaps(parse_sitemaps(fetched))
    got = sorted((r["url"], r["host"]) for r in seeds.collect())
    assert got == [
        ("https://c.org/p/1", "c.org"),
        ("https://c.org/p/2", "c.org"),
    ]


# --- RFC 9309 §2.2.3 wildcard / end-anchor patterns --------------------------

def _allowed(spark, rules, url_paths, host="w.com"):
    cand = spark.createDataFrame(
        [(f"http://{host}{p}", host, p) for p in url_paths],
        "url string, host string, p string",
    )
    rules_df = spark.createDataFrame(
        [(host, t, pat) for t, pat in rules],
        "host string, rule_type string, path_prefix string",
    )
    return {r.p for r in apply_robots(cand, rules_df).collect()}


def test_wildcard_star_matches_any_sequence(spark):
    # Google robots-spec example: /fish* == /fish prefix; /*.php matches any
    # path containing .php after any prefix.
    got = _allowed(
        spark,
        [("deny", "/fish*"), ("deny", "/*.php")],
        ["/fish", "/fishheads/yummy", "/fis", "/index.php",
         "/folder/any.php.x", "/windows.PHP", "/"],
    )
    assert got == {"/fis", "/windows.PHP", "/"}


def test_end_anchor_dollar(spark):
    got = _allowed(
        spark,
        [("deny", "/fish$")],
        ["/fish", "/fishheads", "/fish/", "/fish.html"],
    )
    assert got == {"/fishheads", "/fish/", "/fish.html"}


def test_star_with_end_anchor(spark):
    got = _allowed(
        spark,
        [("deny", "/*.php$")],
        ["/filename.php", "/folder/filename.php", "/filename.php5",
         "/filename.php/"],
    )
    assert got == {"/filename.php5", "/filename.php/"}


def test_specificity_wildcard_vs_prefix(spark):
    # Google example: Allow /page (5 octets) vs Disallow /*.htm (6 octets):
    # the longer wildcard rule wins for /page.htm; /page stays allowed.
    got = _allowed(
        spark,
        [("allow", "/page"), ("deny", "/*.htm")],
        ["/page", "/page.htm"],
    )
    assert got == {"/page"}


def test_dollar_mid_pattern_is_literal(spark):
    got = _allowed(
        spark,
        [("deny", "/price$usd*")],
        ["/price$usd/x", "/priceusd/x", "/price"],
    )
    assert got == {"/priceusd/x", "/price"}


def test_regex_metachars_in_patterns_are_literal(spark):
    got = _allowed(
        spark,
        [("deny", "/a(b)+c*"), ("deny", "/d.e$")],
        ["/a(b)+c/x", "/abbc", "/d.e", "/dxe"],
    )
    assert got == {"/abbc", "/dxe"}


def test_wildcard_rules_match_python_reference_randomized(spark):
    """The randomized parity property, re-run over a pattern pool that
    includes '*' and '$' forms (engine regexp path vs the simulator's
    independent re-based twin)."""
    rng = random.Random(20260819)
    hosts = [f"wh{i}.com" for i in range(4)]
    patterns = ["/", "/a", "/a/*/c", "/*.php", "/fish$", "/a*b$", "/q?*=v",
                "/x", "/*z*"]
    rules = []
    for h in hosts[:3]:
        for _ in range(rng.randint(2, 6)):
            rules.append((h, rng.choice(["allow", "deny"]), rng.choice(patterns)))
    paths = ["/", "/a", "/a/b/c", "/a/x/c/d", "/i.php", "/fish", "/fish/",
             "/axyb", "/axybz", "/q?k=v", "/xz", "/zebra", "/x"]
    cand_rows = [
        (f"http://{h}{p}", h, i)
        for i, (h, p) in enumerate(
            (rng.choice(hosts), rng.choice(paths)) for _ in range(300)
        )
    ]
    cand = spark.createDataFrame(cand_rows, "url string, host string, idx int")
    rules_df = spark.createDataFrame(
        rules, "host string, rule_type string, path_prefix string"
    )
    got = sorted(r.idx for r in apply_robots(cand, rules_df).collect())
    want = sorted(i for (u, h, i) in cand_rows if robots_allowed(u, h, rules))
    assert got == want
