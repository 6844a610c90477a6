"""Snapshot time travel + rollback (Iceberg VERSION AS OF / rollback parity
for SnapshotStore): as-of reads reproduce each committed round's exact table
state, agree with that round's checkpoint row, and a rollback followed by a
resumed crawl replays to an identical fetch log."""

from __future__ import annotations

import pytest

from layerg_crawler_v2_spark import schema as S
from layerg_crawler_v2_spark.datagen import build_pages, seed_urls
from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
from layerg_crawler_v2_spark.streaming.rounds import CrawlConfig, run_crawl

ROUNDS = 3


@pytest.fixture(scope="module")
def crawled(spark, sf_dir, tmp_path_factory):
    pages = build_pages(spark, sf_dir).cache()
    n = pages.count()
    store = SnapshotStore(str(tmp_path_factory.mktemp("tt") / "store"))
    run_crawl(spark, pages, seed_urls(n, n_seeds=5), store, CrawlConfig(rounds=ROUNDS))
    return pages, store


def _seen_set(spark, store, as_of=None):
    df = store.read(spark, "url_seen", S.URL_SEEN, as_of_round=as_of)
    return {r.url_hash for r in df.collect()}


def test_as_of_matches_checkpoint_every_round(spark, crawled):
    _, store = crawled
    for snap in store.snapshots():
        r = snap["round"]
        ckpt = (
            store.read(spark, "checkpoints", S.CHECKPOINTS, as_of_round=r)
            .orderBy("round", ascending=False)
            .first()
        )
        seen = store.read(spark, "url_seen", S.URL_SEEN, as_of_round=r).count()
        fetched = store.read(spark, "fetch_log", S.FETCH_LOG, as_of_round=r).count()
        assert seen == ckpt.seen_count, f"round {r}"
        assert fetched == ckpt.fetched_count, f"round {r}"


def test_as_of_is_monotone_prefix(spark, crawled):
    """Each round's as-of seen set is a superset of the previous round's, and
    the final as-of state equals the current read (no as_of)."""
    _, store = crawled
    rounds = [s["round"] for s in store.snapshots()]
    prev: set = set()
    for r in rounds:
        cur = _seen_set(spark, store, as_of=r)
        assert prev <= cur
        prev = cur
    assert prev == _seen_set(spark, store)


def test_as_of_unaffected_by_later_compaction(spark, crawled):
    """A replace (compaction) in a later snapshot must not leak into an
    earlier as-of read."""
    from layerg_crawler_v2_spark.streaming.rounds import compact_store

    _, store = crawled
    mid = store.snapshots()[1]["round"]
    before = _seen_set(spark, store, as_of=mid)
    compact_store(spark, store, CrawlConfig(rounds=ROUNDS))
    assert _seen_set(spark, store, as_of=mid) == before


def test_rollback_then_resume_replays_identically(spark, crawled, tmp_path):
    """Rollback to round R, resume the crawl: the final fetch_log equals the
    never-rolled-back one — the resumed run re-derives rounds R+1.. from the
    identical URL-seen state (north rule resumability, exercised through the
    time-travel machinery rather than a process kill)."""
    pages, store = crawled
    want = sorted(
        (r["round"], r["seq"], r["url"])
        for r in store.read(spark, "fetch_log", S.FETCH_LOG).collect()
    )
    n = pages.count()

    replay = SnapshotStore(str(tmp_path / "replay"))
    run_crawl(spark, pages, seed_urls(n, n_seeds=5), replay, CrawlConfig(rounds=ROUNDS))
    mid = replay.snapshots()[1]["round"]
    replay.rollback_to(mid)
    assert replay.last_round() == mid
    run_crawl(
        spark, pages, seed_urls(n, n_seeds=5), replay,
        CrawlConfig(rounds=ROUNDS), resume=True,
    )
    got = sorted(
        (r["round"], r["seq"], r["url"])
        for r in replay.read(spark, "fetch_log", S.FETCH_LOG).collect()
    )
    assert got == want


def test_time_travel_registry_entry(spark, sf_dir):
    import __spark_entry__ as em

    df = em.queries()["frontier_time_travel"](spark, sf_dir)
    rows = df.orderBy("round").collect()
    assert len(rows) >= ROUNDS  # seed commit + crawl rounds
    for r in rows:
        assert r.seen_as_of == r.ckpt_seen
        assert r.fetched_as_of == r.ckpt_fetched


# --- snapshot expiration (Iceberg expire_snapshots + remove_orphan_files) ----

def _state(spark, store):
    out = {}
    for name, sch in (
        ("url_seen", S.URL_SEEN),
        ("fetch_log", S.FETCH_LOG),
        ("frontier", S.FRONTIER),
        ("checkpoints", S.CHECKPOINTS),
    ):
        out[name] = sorted(
            map(tuple, store.read(spark, name, sch).collect())
        )
    return out


def test_expire_preserves_current_state_and_bounds_manifest(
    spark, sf_dir, tmp_path
):
    import os

    pages = build_pages(spark, sf_dir).cache()
    n = pages.count()
    store = SnapshotStore(str(tmp_path / "exp"))
    run_crawl(spark, pages, seed_urls(n, n_seeds=5), store, CrawlConfig(rounds=4))
    n_snaps = len(store.snapshots())
    assert n_snaps >= 4
    before = _state(spark, store)
    seen_counter = store.last_counter("seen_total", -1)

    # plant a crashed-commit orphan dir that no manifest entry references
    orphan = os.path.join(store.base, "tables", "fetch_log", "snap-dead-append")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("x")

    res = store.expire_snapshots(keep_last=2)
    assert res["expired"] == n_snaps - 2
    assert res["orphans_deleted"] >= 1
    assert not os.path.exists(orphan)
    snaps = store.snapshots()
    assert len(snaps) == 3 and snaps[0]["base"] is True

    assert _state(spark, store) == before  # byte-identical current reads
    assert store.last_counter("seen_total", -1) == seen_counter

    # idempotent: nothing further to fold
    res2 = store.expire_snapshots(keep_last=3)
    assert res2["expired"] == 0
    assert _state(spark, store) == before


def test_expire_horizon_raises_below_base(spark, sf_dir, tmp_path):
    import pytest as _pytest

    pages = build_pages(spark, sf_dir).cache()
    n = pages.count()
    store = SnapshotStore(str(tmp_path / "exph"))
    run_crawl(spark, pages, seed_urls(n, n_seeds=5), store, CrawlConfig(rounds=3))
    rounds = [s["round"] for s in store.snapshots()]
    store.expire_snapshots(keep_last=1)
    base_round = store.snapshots()[0]["round"]
    # at or after the horizon: fine
    store.read(spark, "url_seen", S.URL_SEEN, as_of_round=base_round)
    with _pytest.raises(ValueError, match="expire horizon"):
        store.read(spark, "url_seen", S.URL_SEEN, as_of_round=rounds[0] - 1)


def test_expired_store_resumes_a_crawl(spark, sf_dir, tmp_path):
    """Expiration must not disturb resume: crawl 2 rounds, expire to the
    latest snapshot only, resume 2 more — fetch log equals an unexpired
    4-round crawl's."""
    pages = build_pages(spark, sf_dir).cache()
    n = pages.count()
    seeds = seed_urls(n, n_seeds=5)

    a = SnapshotStore(str(tmp_path / "a"))
    run_crawl(spark, pages, seeds, a, CrawlConfig(rounds=2))
    a.expire_snapshots(keep_last=1)
    run_crawl(spark, pages, seeds, a, CrawlConfig(rounds=4), resume=True)

    b = SnapshotStore(str(tmp_path / "b"))
    run_crawl(spark, pages, seeds, b, CrawlConfig(rounds=4))

    fa = sorted(
        map(tuple, a.read(spark, "fetch_log", S.FETCH_LOG).collect())
    )
    fb = sorted(
        map(tuple, b.read(spark, "fetch_log", S.FETCH_LOG).collect())
    )
    assert fa == fb


def test_snapshot_diff_changelog(spark, tmp_path):
    """diff() = Iceberg table_changes analog: inserts between rounds equal
    the later rounds' fetch_log rows; reversed bounds yield deletes."""
    from layerg_crawler_v2_spark import schema as S
    from layerg_crawler_v2_spark.datagen import build_pages, seed_urls
    from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
    from layerg_crawler_v2_spark.streaming.rounds import CrawlConfig, run_crawl

    pages = build_pages(spark, "/root/testdata/sf0.001")
    seeds = seed_urls(pages.count(), n_seeds=5)
    store = SnapshotStore(str(tmp_path / "cdc"))
    run_crawl(spark, pages, seeds, store, CrawlConfig(rounds=3))

    first = store.snapshots()[0]["round"]
    last = store.last_round()
    d = store.diff(spark, "fetch_log", S.FETCH_LOG, first, last)
    rows = d.collect()
    assert rows and all(r["change_type"] == "insert" for r in rows)

    expected = (
        store.read(spark, "fetch_log", S.FETCH_LOG, as_of_round=last).count()
        - store.read(spark, "fetch_log", S.FETCH_LOG, as_of_round=first).count()
    )
    assert len(rows) == expected

    rev = store.diff(spark, "fetch_log", S.FETCH_LOG, last, first).collect()
    assert len(rev) == expected
    assert all(r["change_type"] == "delete" for r in rev)
