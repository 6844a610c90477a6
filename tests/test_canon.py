"""Canonicalization goldens (SURVEY.md P1; reference lowercase-key discipline
cmd/onchain.go:98, topic-hash dispatch cmd/handler_registry.go:41-43)."""

from __future__ import annotations

import pytest

from layerg_crawler_v2_spark.functions.canon import (
    canonicalize,
    host_of,
    resolve,
    surt,
)

CASES = [
    ("http://Example.COM/a", "http://example.com/a"),
    ("HTTP://EXAMPLE.com:80/a", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a/../b/./c", "http://example.com/b/c"),
    ("http://example.com/a/..", "http://example.com/"),
    ("http://example.com/%7Euser/%41%2F", "http://example.com/~user/A%2F"),
    ("http://example.com/%64/1", "http://example.com/d/1"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com./a", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?", "http://example.com/a"),
    ("http://user:pw@example.com/a", "http://example.com/a"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("ftp://example.com/a", None),
    ("mailto:x@example.com", None),
    ("not a url", None),
    ("", None),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize(raw, expected):
    assert canonicalize(raw) == expected


def test_idempotent():
    for raw, expected in CASES:
        if expected is not None:
            assert canonicalize(expected) == expected


def test_surt():
    assert surt("http://www.example.com/a/b?q=1") == "com,example,www)/a/b?q=1"
    assert surt("http://example.com:8080/x") == "com,example:8080)/x"
    assert surt("http://example.com/") == "com,example)/"


def test_host_of():
    assert host_of("http://example.com:8080/x") == "example.com:8080"
    assert host_of("http://example.com/x") == "example.com"


def test_resolve():
    assert resolve("http://example.com/a/b", "/c") == "http://example.com/c"
    assert resolve("http://example.com/a/b", "c") == "http://example.com/a/c"
    assert resolve("http://example.com/a/b", "../c") == "http://example.com/c"
    assert resolve("http://e.com/a", "HTTP://X.COM/p#f") == "http://x.com/p"
    assert resolve("http://e.com/a", "//other.com/p") == "http://other.com/p"


def test_adversarial_urls_are_canonical():
    from layerg_crawler_v2_spark.datagen import adversarial_urls

    for u in adversarial_urls():
        assert canonicalize(u) == u, u


def test_host_col_native_parity(spark):
    """Native JVM host expression == Python host_of on hostile canonical URLs
    (the '://'-in-query class from VERDICT r1 #1)."""
    import pyspark.sql.functions as F

    from layerg_crawler_v2_spark.datagen import adversarial_urls
    from layerg_crawler_v2_spark.functions.canon import host_col_native

    urls = adversarial_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["h"]
        for r in df.select("url", host_col_native("url").alias("h")).collect()
    }
    for u in urls:
        assert got[u] == host_of(u), u
    assert got["http://a.com/r?next=http://b.com/x"] == "a.com"


def test_robots_path_expr_parity(spark):
    """Native path expression anchors on the FIRST '://' — path of
    http://a.com/r?next=http://b.com/x is /r?next=..., not /x."""
    from layerg_crawler_v2_spark.datagen import adversarial_urls
    from layerg_crawler_v2_spark.operators.robots import _path_expr

    def py_path(u: str) -> str:
        rest = u.split("://", 1)[1]
        return rest[rest.index("/"):] if "/" in rest else "/"

    urls = adversarial_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["p"]
        for r in df.select("url", _path_expr("url").alias("p")).collect()
    }
    for u in urls:
        assert got[u] == py_path(u), u
    assert got["http://a.com/r?next=http://b.com/x"] == "/r?next=http://b.com/x"


def test_resolve_fast_col_parity(spark):
    """Wherever the JVM fast path is non-NULL it must equal resolve(); and it
    must actually COVER the generator's native-eligible variants (0,1,2,5),
    protocol-relative and host-relative hrefs — else the fast path silently
    degrades to never-eligible and the crawl quietly slows down."""
    from layerg_crawler_v2_spark.datagen import (
        adversarial_urls,
        canonical_url,
        url_variant,
    )
    from layerg_crawler_v2_spark.functions.canon import resolve_fast_col

    n = 200
    pairs: list[tuple[str, str]] = []
    # every generator variant as an absolute href, many docs
    for did in range(0, n, 7):
        base = canonical_url((did * 5 + 3) % n, n)
        for v in range(6):
            pairs.append((base, url_variant(did, n, v)))
    # host-relative / protocol-relative / relative-path / hostile shapes
    base = "http://example.com/a/b"
    pairs += [
        (base, "/c"),
        (base, "/c/d e"),          # space in path (kept by canonicalize)
        (base, "//other.com/p"),
        (base, "//OTHER.com:80/p"),
        (base, "c"),               # relative path -> slow
        (base, "../c"),            # dot segment -> slow
        (base, "/c/./d"),          # dot segment -> slow
        (base, "/c?b=2&a=1"),      # query sort -> slow
        (base, "/c%41"),           # pct -> slow
        (base, "HTTPS://H.com:443/x"),
        (base, "http://h.com:8080/x"),   # non-default port -> slow
        (base, "http://h.com.:80/x"),    # dot before port
        (base, "http://h..com/x"),       # inner double dot (fast ok: kept)
        (base, "http://h.com../x"),      # multi trailing dot -> slow
        (base, "http://h.com/x#a#b"),    # first-# split
        (base, "http://h.com#f"),        # no path + fragment
        (base, "http://h.com"),          # no path
        (base, "ftp://h.com/x"),         # unsupported scheme -> slow (None)
        (base, "mailto:x@h.com"),
        (base, ""),
        (base, "  http://h.com/y  "),    # needs trim
    ]
    for u in adversarial_urls():
        pairs.append((base, u))

    df = spark.createDataFrame(pairs, "base string, href string")
    rows = df.select(
        "base", "href", resolve_fast_col("base", "href").alias("fast")
    ).collect()
    fast_hits = 0
    for r in rows:
        expected = resolve(r["base"], r["href"])
        if r["fast"] is not None:
            assert r["fast"] == expected, (r["base"], r["href"], r["fast"], expected)
            fast_hits += 1
    # coverage: variants 0,1,2,5 (4 of 6) of the absolute hrefs + the
    # host/protocol-relative cases must take the fast path
    n_variant_pairs = len(range(0, n, 7)) * 6
    assert fast_hits >= n_variant_pairs * 4 // 6 + 4, fast_hits


def test_resolve_fast_col_variant_coverage(spark):
    """Pin exactly WHICH generator variants are native-eligible."""
    from layerg_crawler_v2_spark.datagen import url_variant
    from layerg_crawler_v2_spark.functions.canon import resolve_fast_col

    n = 100
    rows = spark.createDataFrame(
        [(v, "http://example.com/", url_variant(17, n, v)) for v in range(6)],
        "v int, base string, href string",
    ).select("v", resolve_fast_col("base", "href").alias("fast")).collect()
    got = {r["v"]: r["fast"] is not None for r in rows}
    assert got == {0: True, 1: True, 2: True, 3: False, 4: False, 5: True}


def test_spark_udf_matches_pure(spark):
    import pyspark.sql.functions as F

    from layerg_crawler_v2_spark.functions.canon import canonicalize_udf

    raws = [r for r, _ in CASES]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonicalize_udf(F.col("url")).alias("c")).collect()
    }
    for raw, expected in CASES:
        if raw.strip() != raw:
            continue  # createDataFrame keys on exact string
        assert got[raw] == expected
