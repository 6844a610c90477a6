"""Merkle integrity tree (operators/integrity.py): order/partitioning
invariance, tamper localization, and the production-scale form of the
resume-identical-seen-set check (SURVEY.md §5.4) — root comparison instead
of full-table collect."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.integrity import (
    SENTINEL,
    SEP,
    merkle_diff,
    merkle_tree,
)


def _df(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, "k bigint, v string"
    ).repartition(parts)


ROWS = [(i, f"val{i}" if i % 7 else None) for i in range(500)]


def _py_root(rows, n_buckets=256):
    """Sequential reference for the whole tree fold."""
    buckets: dict[int, list[str]] = {}
    for k, v in rows:
        rh = hashlib.md5(
            (SEP.join([str(k), v if v is not None else SENTINEL])).encode()
        ).hexdigest()
        buckets.setdefault(int(rh[:15], 16) % n_buckets, []).append(rh)
    nodes = {
        b: hashlib.md5("".join(sorted(hs)).encode()).hexdigest()
        for b, hs in buckets.items()
    }
    root = hashlib.md5(
        "".join(nodes[b] for b in sorted(nodes)).encode()
    ).hexdigest()
    return nodes, root


def test_tree_matches_sequential_reference(spark):
    got = merkle_tree(_df(spark, ROWS), ["k", "v"]).collect()
    nodes, root = _py_root(ROWS)
    got_nodes = {
        int(r["bucket"]): r["node_hash"] for r in got if r["level"] == 1
    }
    [got_root] = [r for r in got if r["level"] == 0]
    assert got_nodes == nodes
    assert got_root["node_hash"] == root
    assert got_root["n_rows"] == len(ROWS)


def test_order_and_partitioning_invariance(spark):
    a = merkle_tree(_df(spark, ROWS, parts=1), ["k", "v"]).collect()
    b = merkle_tree(
        _df(spark, list(reversed(ROWS)), parts=32), ["k", "v"]
    ).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


def test_null_vs_sentinel_string_distinct(spark):
    # a NULL column and a column holding the literal sentinel string must
    # hash differently only if the projection disambiguates -- pinned here:
    # the sentinel IS the null marker, so these collide by design and the
    # caller must not store \x00 as data. What must NOT collide: null vs
    # empty string.
    a = merkle_tree(_df(spark, [(1, None)]), ["k", "v"]).collect()
    b = merkle_tree(_df(spark, [(1, "")]), ["k", "v"]).collect()
    ra = [r["node_hash"] for r in a if r["level"] == 0]
    rb = [r["node_hash"] for r in b if r["level"] == 0]
    assert ra != rb


def test_tamper_localized_by_diff(spark):
    base = merkle_tree(_df(spark, ROWS), ["k", "v"])
    tampered_rows = [(k, "TAMPERED" if k == 123 else v) for k, v in ROWS]
    tampered = merkle_tree(_df(spark, tampered_rows), ["k", "v"])
    d = merkle_diff(base, tampered).collect()
    # one row changed: its old and new hashes land in <= 2 buckets
    assert 1 <= len(d) <= 2
    # and the roots disagree
    root = lambda t: [
        r["node_hash"] for r in t.collect() if r["level"] == 0
    ][0]
    assert root(base) != root(tampered)


def test_identical_tables_empty_diff(spark):
    a = merkle_tree(_df(spark, ROWS, parts=2), ["k", "v"])
    b = merkle_tree(_df(spark, ROWS, parts=16), ["k", "v"])
    assert merkle_diff(a, b).count() == 0


def test_resume_seen_set_root_equality(spark, tmp_path):
    """The §5.4 resume check at production shape: one-shot vs kill/resume
    stores' url_seen tables compared by Merkle ROOT, no row collect."""
    from layerg_crawler_v2_spark import schema as S
    from layerg_crawler_v2_spark.datagen import build_pages, seed_urls
    from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
    from layerg_crawler_v2_spark.streaming.rounds import CrawlConfig, run_crawl

    pages = build_pages(spark, "/root/testdata/sf0.001").cache()
    seeds = seed_urls(pages.count(), n_seeds=5)
    full_store = SnapshotStore(str(tmp_path / "full"))
    run_crawl(spark, pages, seeds, full_store, CrawlConfig(rounds=3))
    part_store = SnapshotStore(str(tmp_path / "part"))
    run_crawl(spark, pages, seeds, part_store, CrawlConfig(rounds=2))
    run_crawl(
        spark, pages, seeds, part_store, CrawlConfig(rounds=3), resume=True
    )
    tree = lambda st: merkle_tree(
        st.read(spark, "url_seen", S.URL_SEEN).select("url"), ["url"]
    )
    assert merkle_diff(tree(full_store), tree(part_store)).count() == 0
    pages.unpersist()
