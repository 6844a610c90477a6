"""Crawl-trap detection: planted shapes + composition as a round hook."""

from __future__ import annotations

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.traps import reject_traps, url_trap_flags


def _flags(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(url_trap_flags(F.col("url")).alias("f")).collect()[0]["f"]


def test_clean_url_is_not_a_trap(spark):
    f = _flags(spark, "https://example.com/docs/guide/intro.html?v=2")
    assert f["is_trap"] is False


def test_segment_repetition_trap(spark):
    f = _flags(spark, "https://example.com/a/b/a/b/a/page.html")
    assert f["max_seg_repeat"] == 3 and f["is_trap"] is True


def test_depth_trap(spark):
    url = "https://example.com/" + "/".join(f"s{i}" for i in range(13)) + "/p.html"
    f = _flags(spark, url)
    assert f["depth"] == 13 and f["is_trap"] is True


def test_session_param_trap(spark):
    f = _flags(spark, "https://example.com/p.html?PHPSESSID=abc123")
    assert f["has_session_param"] is True and f["is_trap"] is True


def test_query_explosion_trap(spark):
    qs = "&".join(f"k{i}=v" for i in range(9))
    f = _flags(spark, f"https://example.com/p.html?{qs}")
    assert f["n_query_params"] == 9 and f["is_trap"] is True


def test_reject_traps_preserves_schema_and_rows(spark):
    df = spark.createDataFrame(
        [
            ("https://example.com/ok/page.html", 1),
            ("https://example.com/a/a/a/loop.html", 2),
        ],
        "url string, priority int",
    )
    out = reject_traps(df)
    assert out.columns == ["url", "priority"]
    assert [r["priority"] for r in out.collect()] == [1]


def test_reject_traps_as_discovered_hook_keeps_crawl_green(spark, tmp_path):
    """reject_traps plugs into CrawlConfig.discovered_hook (U4) and the
    crawl still matches the no-hook fetch log on a trap-free corpus."""
    from layerg_crawler_v2_spark import schema as S
    from layerg_crawler_v2_spark.datagen import build_pages, seed_urls
    from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
    from layerg_crawler_v2_spark.streaming.rounds import CrawlConfig, run_crawl

    pages = build_pages(spark, "/root/testdata/sf0.001")
    seeds = seed_urls(pages.count(), n_seeds=5)

    def log(tmp, cfg):
        store = SnapshotStore(tmp)
        run_crawl(spark, pages, seeds, store, cfg)
        return [
            tuple(r)
            for r in store.read(spark, "fetch_log", S.FETCH_LOG)
            .orderBy("round", "seq")
            .collect()
        ]

    a = log(str(tmp_path / "plain"), CrawlConfig(rounds=2))
    b = log(
        str(tmp_path / "hooked"),
        CrawlConfig(rounds=2, discovered_hook=reject_traps),
    )
    assert a == b and len(a) > 0


def test_block_hosts_matches_simulator(spark, tmp_path):
    """Engine block_hosts == simulator block_hosts, golden fetch-log parity
    (the host_quality_rollup blocklist sink)."""
    from layerg_crawler_v2_spark import schema as S
    from layerg_crawler_v2_spark.datagen import build_pages, seed_urls
    from layerg_crawler_v2_spark.functions.canon import canonicalize
    from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
    from layerg_crawler_v2_spark.streaming.rounds import CrawlConfig, run_crawl
    from tests.reference_sim import simulate

    pages = build_pages(spark, "/root/testdata/sf0.001")
    rows = pages.select("url", "html").collect()
    pages_dict = {canonicalize(r["url"]): bytes(r["html"]) for r in rows}
    seeds = seed_urls(len(pages_dict), n_seeds=5)

    # block the busiest host of the unrestricted sim so the block bites
    base = simulate(pages_dict, seeds, 2)
    hosts = [t[3] for t in base.fetch_log]
    blocked = max(set(hosts), key=hosts.count)
    sim = simulate(pages_dict, seeds, 2, block_hosts={blocked})

    store = SnapshotStore(str(tmp_path / "blk"))
    run_crawl(
        spark, pages, seeds, store,
        CrawlConfig(rounds=2, block_hosts=[blocked]),
    )
    got = [
        (r["round"], r["seq"], r["url"], r["host"], r["depth"])
        for r in store.read(spark, "fetch_log", S.FETCH_LOG)
        .orderBy("round", "seq").collect()
    ]
    want = [(t[0], t[1], t[2], t[3], t[4]) for t in sim.fetch_log]
    assert len(base.fetch_log) > len(want)  # the block actually removed work
    assert blocked not in {g[3] for g in got}
    assert got == want
