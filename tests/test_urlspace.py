"""URL-space path-prefix rollup (operators/urlspace.py)."""

from __future__ import annotations

from layerg_crawler_v2_spark.operators.urlspace import url_path_prefix_rollup


def _rows(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_prefix_counts_leaves_and_fanout(spark):
    urls = [
        "https://a.org/x/p1",
        "https://a.org/x/p2",
        "https://a.org/x",           # leaf at depth 1
        "https://a.org/y/q/deep",    # depth 3: only 2 prefix levels emitted
        "https://b.org/x/p1",
    ]
    out = {
        (r.host, r.depth, r.prefix): (r.n_urls, r.n_leaf, r.n_children)
        for r in url_path_prefix_rollup(_rows(spark, urls), max_depth=2).collect()
    }
    # /x on a.org: 3 urls, one terminates there, children {p1, p2}
    assert out[("a.org", 1, "/x")] == (3, 1, 2)
    assert out[("a.org", 1, "/y")] == (1, 0, 1)
    assert out[("a.org", 2, "/x/p1")] == (1, 1, 0)
    assert out[("a.org", 2, "/x/p2")] == (1, 1, 0)
    # /y/q has one url continuing to 'deep': not a leaf, fan-out 1
    assert out[("a.org", 2, "/y/q")] == (1, 0, 1)
    assert out[("b.org", 1, "/x")] == (1, 0, 1)
    # depth never exceeds max_depth
    assert all(d <= 2 for (_, d, _) in out)


def test_empty_and_root_paths_contribute_nothing(spark):
    urls = ["https://a.org", "https://a.org/", "https://a.org/only"]
    out = url_path_prefix_rollup(_rows(spark, urls), max_depth=3).collect()
    assert {(r.host, r.depth, r.prefix) for r in out} == {("a.org", 1, "/only")}


def test_partitioning_invariant(spark):
    urls = [f"https://h{i % 3}.org/s{i % 4}/p{i}" for i in range(60)]
    a = sorted(map(tuple, url_path_prefix_rollup(
        _rows(spark, urls).repartition(1)).collect()))
    b = sorted(map(tuple, url_path_prefix_rollup(
        _rows(spark, urls).repartition(11)).collect()))
    assert a == b


def test_max_depth_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        url_path_prefix_rollup(_rows(spark, ["https://a.org/x"]), max_depth=0)
