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
