"""URL tracking-parameter mining (operators/urlparams.py) on hand-built
evidence sets; the registry entry's oracle parity lives in
test_oracle_parity.py."""

from __future__ import annotations

from layerg_crawler_v2_spark.operators.urlparams import url_param_noise


def _mine(spark, rows):
    df = spark.createDataFrame(rows, "url string, content_hash string")
    return {
        (r.host, r.param): (
            r.n_urls,
            r.n_multi_groups,
            r.n_collapsible,
            r.noise_score,
        )
        for r in url_param_noise(df).collect()
    }


def test_tracker_vs_meaningful_param(spark):
    rows = [
        ("https://a.com/x?id=1&utm=p", "c1"),
        ("https://a.com/x?id=1&utm=q", "c1"),  # utm varies, content same
        ("https://a.com/x?id=2&utm=p", "c2"),  # id varies, content differs
    ]
    got = _mine(spark, rows)
    assert got[("a.com", "utm")] == (3, 1, 1, 1.0)
    assert got[("a.com", "id")] == (3, 1, 0, 0.0)


def test_param_order_insensitive_grouping(spark):
    # same residual after stripping utm, despite different param order
    rows = [
        ("https://a.com/x?utm=1&id=7", "c"),
        ("https://a.com/x?id=7&utm=2", "c"),
    ]
    got = _mine(spark, rows)
    assert got[("a.com", "utm")] == (2, 1, 1, 1.0)


def test_untestable_param_scores_null(spark):
    # 'id' only ever appears with one url per residual: never testable
    rows = [
        ("https://a.com/x?id=1", "c1"),
        ("https://a.com/y?id=1", "c2"),
    ]
    got = _mine(spark, rows)
    assert got[("a.com", "id")] == (2, 0, 0, None)


def test_no_query_urls_contribute_nothing(spark):
    rows = [
        ("https://a.com/plain", "c0"),
        ("https://a.com/x?s=1", "c1"),
    ]
    got = _mine(spark, rows)
    assert set(got) == {("a.com", "s")}


def test_hosts_isolated(spark):
    rows = [
        ("https://a.com/x?t=1", "c"),
        ("https://a.com/x?t=2", "c"),
        ("https://b.com/x?t=1", "d1"),
        ("https://b.com/x?t=2", "d2"),
    ]
    got = _mine(spark, rows)
    assert got[("a.com", "t")][3] == 1.0
    assert got[("b.com", "t")][3] == 0.0
