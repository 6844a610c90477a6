"""snapshot_diff (operators/diff.py): CDC classification between two crawl
snapshots — presence from flags (not fingerprint nullness), changed via
null-safe compare, unchanged suppressed unless asked for."""

from __future__ import annotations

from layerg_crawler_v2_spark.operators.diff import snapshot_diff


def _mk(spark, rows):
    return spark.createDataFrame(rows, "url string, fp string")


def test_snapshot_diff_classification(spark):
    old = _mk(spark, [("a", "1"), ("b", "2"), ("c", None), ("d", "4"), ("e", None)])
    new = _mk(spark, [("b", "2x"), ("c", None), ("d", "4"), ("f", "6"), ("g", None)])
    got = {
        r["url"]: (r["change"], r["old_fp"], r["new_fp"])
        for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        "a": ("removed", "1", None),
        "e": ("removed", None, None),  # NULL fp but present -> removed, not noise
        "b": ("changed", "2", "2x"),
        "f": ("added", None, "6"),
        "g": ("added", None, None),  # NULL fp but new -> added
    }
    # c (NULL == NULL null-safe) and d (identical) are unchanged -> suppressed


def test_snapshot_diff_emit_unchanged(spark):
    old = _mk(spark, [("c", None), ("d", "4")])
    new = _mk(spark, [("c", None), ("d", "4"), ("f", "6")])
    got = {
        r["url"]: r["change"]
        for r in snapshot_diff(old, new, emit_unchanged=True).collect()
    }
    assert got == {"c": "unchanged", "d": "unchanged", "f": "added"}


def test_snapshot_diff_custom_columns(spark):
    old = spark.createDataFrame([(1, "x")], "doc_id bigint, h string")
    new = spark.createDataFrame([(1, "y")], "doc_id bigint, h string")
    rows = snapshot_diff(old, new, key_col="doc_id", fingerprint_col="h").collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["change"] == "changed"
    assert rows[0].asDict().keys() == {"doc_id", "change", "old_fp", "new_fp"}
