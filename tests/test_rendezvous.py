"""Rendezvous/HRW shard assignment (operators/scheduler.py
rendezvous_assign): determinism, python-reference parity, and the
minimal-disruption properties that justify HRW over hash-mod-K."""

from __future__ import annotations

import hashlib

import pytest

from layerg_crawler_v2_spark.operators.scheduler import rendezvous_assign

SHARDS4 = ["shard-a", "shard-b", "shard-c", "shard-d"]
SHARDS5 = SHARDS4 + ["shard-e"]


def _py_assign(key: str, shards: list[str]) -> str:
    # (weight, shard) max — the struct-lexicographic rule
    return max(shards, key=lambda s: (hashlib.md5(f"{s}|{key}".encode()).hexdigest(), s))


def _hosts(spark, n=200):
    return spark.createDataFrame([(f"host{i}.org",) for i in range(n)], "host string")


def test_matches_python_reference(spark):
    got = {r.host: r.shard for r in rendezvous_assign(_hosts(spark), SHARDS4).collect()}
    for h, s in got.items():
        assert s == _py_assign(h, SHARDS4), h
    # every shard gets a reasonable share of 200 keys (uniformity smoke)
    from collections import Counter
    c = Counter(got.values())
    assert len(c) == 4 and min(c.values()) > 20


def test_add_shard_moves_only_to_new_shard(spark):
    """THE HRW property: growing K only moves keys TO the new shard —
    no key ever moves between surviving shards (each key's max over the
    old set is unchanged)."""
    before = {r.host: r.shard for r in rendezvous_assign(_hosts(spark), SHARDS4).collect()}
    after = {r.host: r.shard for r in rendezvous_assign(_hosts(spark), SHARDS5).collect()}
    moved = {h for h in before if before[h] != after[h]}
    assert all(after[h] == "shard-e" for h in moved)
    # expected move fraction 1/5; generous bounds for n=200
    assert 0.05 < len(moved) / len(before) < 0.4


def test_remove_shard_moves_only_its_keys_to_second_choice(spark):
    before = {r.host: r.shard for r in rendezvous_assign(_hosts(spark), SHARDS5).collect()}
    reduced = [s for s in SHARDS5 if s != "shard-b"]
    after = {r.host: r.shard for r in rendezvous_assign(_hosts(spark), reduced).collect()}
    for h in before:
        if before[h] != "shard-b":
            assert after[h] == before[h], h  # survivors never move
        else:
            assert after[h] == _py_assign(h, reduced), h  # exact 2nd choice


def test_single_shard_and_validation(spark):
    got = rendezvous_assign(_hosts(spark, 5), ["only"]).collect()
    assert all(r.shard == "only" for r in got)
    with pytest.raises(ValueError):
        rendezvous_assign(_hosts(spark, 1), [])
    with pytest.raises(ValueError):
        rendezvous_assign(_hosts(spark, 1), ["a", "a"])
