"""pool_politeness_schedule (operators/scheduler.py): vhost-collapse
politeness — hosts sharing an IP share ONE budget."""

from __future__ import annotations

from layerg_crawler_v2_spark.operators.scheduler import (
    pool_politeness_schedule,
)

QUEUED = [
    # host, url, priority — h1+h2 share ip9; h3 resolves alone; h4 is
    # unresolved (paces alone under its own name)
    ("h1", "https://h1/a", 10), ("h1", "https://h1/b", 9),
    ("h2", "https://h2/a", 8), ("h2", "https://h2/b", 7),
    ("h3", "https://h3/a", 5),
    ("h4", "https://h4/a", 4), ("h4", "https://h4/b", 3),
]
DNS = [("h1", "ip9"), ("h2", "ip9"), ("h3", "ip3")]
DELAYS = [("h1", 1000), ("h2", 3000), ("h3", 200)]


def _run(spark, max_parallel=8, with_dims=True):
    q = spark.createDataFrame(QUEUED, "host string, url string, priority long")
    dns = hd = None
    if with_dims:
        dns = spark.createDataFrame(DNS, "host string, ip string")
        hd = spark.createDataFrame(DELAYS, "host string, delay_ms long")
    out = pool_politeness_schedule(q, dns, hd, max_parallel=max_parallel)
    return {r["url"]: (r["pool"], r["slot"], r["fetch_offset_ms"])
            for r in out.collect()}


def test_shared_ip_shares_one_budget(spark):
    got = _run(spark, max_parallel=2)
    # pool ip9 holds h1+h2's four urls but only 2 slots survive, in
    # (priority DESC, url ASC) order across BOTH hosts
    ip9 = {u: v for u, v in got.items() if v[0] == "ip9"}
    assert set(ip9) == {"https://h1/a", "https://h1/b"}
    assert got["https://h1/a"][1] == 1 and got["https://h1/b"][1] == 2


def test_pool_delay_is_max_member_delay(spark):
    got = _run(spark)
    # ip9's delay = max(h1 1000, h2 3000) = 3000; slots spaced by it
    assert got["https://h1/a"][2] == 0
    assert got["https://h1/b"][2] == 3000
    assert got["https://h2/a"][2] == 2 * 3000
    assert got["https://h2/b"][2] == 3 * 3000
    assert got["https://h3/a"] == ("ip3", 1, 0)


def test_unresolved_host_paces_alone_with_default(spark):
    got = _run(spark)
    assert got["https://h4/a"] == ("h4", 1, 0)
    assert got["https://h4/b"] == ("h4", 2, 500)  # default_delay_ms


def test_no_dims_degenerates_to_per_host(spark):
    got = _run(spark, with_dims=False)
    pools = {v[0] for v in got.values()}
    assert pools == {"h1", "h2", "h3", "h4"}
    assert got["https://h1/b"][2] == 500
