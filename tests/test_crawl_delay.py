"""adaptive_crawl_delay (operators/scheduler.py): sequential-reference
parity, trailing-failure backoff, robots floor, clamps."""

from __future__ import annotations

from layerg_crawler_v2_spark.operators.scheduler import adaptive_crawl_delay


def py_delay(rows, robots=None, default=500, mult_pct=1000, cap=6,
             max_ms=60_000):
    """The same integer recurrence, sequentially (reference_sim style)."""
    out = {}
    hosts = {h for h, *_ in rows}
    for h in sorted(hosts):
        hs = [(ts, lat, ok) for (hh, ts, lat, ok) in rows if hh == h]
        n = len(hs)
        avg = sum(lat for _, lat, _ in hs) // n
        ok_ts = [ts for ts, _, ok in hs if ok]
        last = max(ok_ts) if ok_ts else None
        tail = min(cap, sum(1 for ts, _, _ in hs if last is None or ts > last))
        rb = (robots or {}).get(h, default)
        base = max(rb, mult_pct * avg // 100)
        out[h] = (n, avg, tail, min(max_ms, base << tail))
    return out


ROWS = [
    # host, ts, latency_ms, ok
    ("a", 1, 100, True), ("a", 2, 300, True), ("a", 3, 200, False),
    ("b", 1, 50, False), ("b", 2, 60, False),          # never succeeded
    ("c", 1, 10, True), ("c", 2, 10, True),            # healthy fast host
    ("d", 1, 9000, True),                              # slow host
]


def _spark_delay(spark, rows, robots=None, **kw):
    df = spark.createDataFrame(
        rows, "host string, ts long, latency_ms long, ok boolean"
    )
    rdf = None
    if robots is not None:
        rdf = spark.createDataFrame(
            list(robots.items()), "host string, crawl_delay_ms long"
        )
    return {
        r["host"]: (
            r["n_fetches"], r["avg_latency_ms"],
            r["consec_fail_tail"], r["delay_ms"],
        )
        for r in adaptive_crawl_delay(df, rdf, **kw).collect()
    }


def test_matches_python_reference(spark):
    assert _spark_delay(spark, ROWS) == py_delay(ROWS)


def test_robots_floor_and_missing_host_default(spark):
    robots = {"c": 4000}  # declared crawl-delay dominates the fast host
    got = _spark_delay(spark, ROWS, robots=robots)
    assert got == py_delay(ROWS, robots=robots)
    assert got["c"][3] == 4000          # floor wins over 10x 10ms
    assert got["a"][3] == py_delay(ROWS)["a"][3]  # absent host: default


def test_trailing_failures_double_delay(spark):
    got = _spark_delay(spark, ROWS)
    # host a: one trailing failure -> one doubling of max(500, 2000)
    assert got["a"] == (3, 200, 1, 4000)
    # host b: never succeeded -> tail = n = 2 -> 4x max(500, 550)
    assert got["b"] == (2, 55, 2, 2200)


def test_backoff_cap_and_max_clamp(spark):
    rows = [("z", t, 100, False) for t in range(1, 11)]  # 10 straight fails
    got = _spark_delay(spark, rows)
    assert got == py_delay(rows)
    assert got["z"][2] == 6                       # capped doublings
    assert got["z"][3] == 60_000                  # 1000<<6 clamped to max
    # slow host d: 10x 9000ms = 90s -> clamped even with zero failures
    assert _spark_delay(spark, ROWS)["d"][3] == 60_000
