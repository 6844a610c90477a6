"""allocate_budget: Hamilton largest-remainder apportionment — exact sum,
determinism, proportionality bounds, degenerate inputs."""

from __future__ import annotations

from layerg_crawler_v2_spark.operators.scheduler import allocate_budget


def _alloc(spark, rows, total):
    df = spark.createDataFrame(rows, "host string, weight long")
    return {r["host"]: r["quota"] for r in allocate_budget(df, total).collect()}


def test_exact_sum_and_known_split(spark):
    got = _alloc(spark, [("a", 5), ("b", 3), ("c", 2)], 101)
    # floors 50/30/20, remainders 5/3/2 of 10 -> leftover 1 goes to a
    assert got == {"a": 51, "b": 30, "c": 20}
    assert sum(got.values()) == 101


def test_quota_within_one_of_exact_share(spark):
    rows = [(f"h{i}", (i * 7919) % 101 + 1) for i in range(50)]
    total = 997
    got = _alloc(spark, rows, total)
    assert sum(got.values()) == total
    W = sum(w for _, w in rows)
    for h, w in rows:
        exact = total * w / W
        assert exact - 1 < got[h] < exact + 1  # Hamilton stays within 1


def test_zero_null_weights_get_nothing(spark):
    got = _alloc(spark, [("a", 10), ("z", 0), ("n", None)], 7)
    assert got["z"] == 0 and got["n"] == 0 and got["a"] == 7


def test_all_zero_weights_allocate_nothing(spark):
    got = _alloc(spark, [("a", 0), ("b", 0)], 9)
    assert got == {"a": 0, "b": 0}


def test_tie_breaks_to_smaller_key(spark):
    # equal weights, budget 5 over 4 keys: floors 1 each, leftover 1,
    # all remainders equal -> smallest key wins the extra
    got = _alloc(spark, [("d", 2), ("c", 2), ("b", 2), ("a", 2)], 5)
    assert got == {"a": 2, "b": 1, "c": 1, "d": 1}
