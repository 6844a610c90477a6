"""Public-suffix-list semantics (operators/domains.py) against the
publicsuffix.org algorithm's published checkPublicSuffix test vectors
(the subset our PSL_SNAPSHOT covers), plus plan discipline: the lookup is
a zero-shuffle per-row expression."""

from __future__ import annotations

import pytest

from layerg_crawler_v2_spark.operators.domains import with_registrable_domain

# (host, public_suffix, registrable_domain) — exercises every rule kind.
VECTORS = [
    ("example.com", "com", "example.com"),
    ("www.example.com", "com", "example.com"),
    ("deep.a.b.example.com", "com", "example.com"),
    ("com", "com", None),
    ("example.co.uk", "co.uk", "example.co.uk"),
    ("www.example.co.uk", "co.uk", "example.co.uk"),
    ("co.uk", "co.uk", None),
    ("parliament.uk", "uk", "parliament.uk"),  # 'uk' plain, not under co.uk
    # wildcard *.ck: any single label under ck is itself a public suffix
    ("bar.ck", "bar.ck", None),
    ("foo.bar.ck", "bar.ck", "foo.bar.ck"),
    # exception !www.ck beats the wildcard
    ("www.ck", "ck", "www.ck"),
    ("sub.www.ck", "ck", "www.ck"),
    # *.kawasaki.jp with !city.kawasaki.jp: the exception's public suffix
    # is the rule minus its leftmost label, i.e. kawasaki.jp
    ("city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
    ("a.city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
    ("other.kawasaki.jp", "other.kawasaki.jp", None),
    ("a.other.kawasaki.jp", "other.kawasaki.jp", "a.other.kawasaki.jp"),
    # private-section hosting platforms
    ("u1.blogspot.com", "blogspot.com", "u1.blogspot.com"),
    ("x.u1.blogspot.com", "blogspot.com", "u1.blogspot.com"),
    ("bkt.s3.amazonaws.com", "s3.amazonaws.com", "bkt.s3.amazonaws.com"),
    # implicit '*' rule: unknown TLD
    ("example.zz", "zz", "example.zz"),
    ("zz", "zz", None),
    (None, None, None),
]


@pytest.fixture(scope="module")
def resolved(spark):
    df = spark.createDataFrame(
        [(h,) for h, _, _ in VECTORS], "host string"
    )
    return {
        r.host: (r.public_suffix, r.registrable_domain)
        for r in with_registrable_domain(df).collect()
    }


@pytest.mark.parametrize("host,ps,reg", VECTORS)
def test_psl_vector(resolved, host, ps, reg):
    assert resolved[host] == (ps, reg)


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([("a.example.com",)], "host string")
    plan = with_registrable_domain(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
