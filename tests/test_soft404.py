"""Soft-404 detector invariants (operators/soft404.py). The DuckDB
cross-check lives in the entry registry (frontier_soft404_detect,
tests/test_oracle_parity.py); these pin the decision table the SQL
round-trip only samples."""

from __future__ import annotations

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.soft404 import soft404_flags

ERR = "<h1>404 Error - Page Not Found</h1>"
WALL = "Please accept our cookies to continue"


def _flags(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, url string, text string")
    return {r["url"]: r for r in soft404_flags(df, **kw).collect()}


def test_decision_table(spark):
    rows = (
        # repeated error template on h1: flagged
        [("h1", f"u{i}", ERR) for i in range(4)]
        # repeated non-error template on h1: visible, not flagged
        + [("h1", f"w{i}", WALL) for i in range(4)]
        # single error-looking page on h1 (a real article): not flagged
        + [("h1", "article", "Essay: why Page Not Found pages matter")]
        # unique real content: not flagged
        + [("h1", "real", "unique page body about crawling")]
    )
    out = _flags(spark, rows)
    assert all(out[f"u{i}"]["is_soft404"] for i in range(4))
    assert all(out[f"u{i}"]["template_urls"] == 4 for i in range(4))
    assert not any(out[f"w{i}"]["is_soft404"] for i in range(4))
    assert all(out[f"w{i}"]["template_urls"] == 4 for i in range(4))
    assert not out[f"w{0}"]["has_marker"]
    assert out["article"]["has_marker"] and not out["article"]["is_soft404"]
    assert not out["real"]["has_marker"] and not out["real"]["is_soft404"]


def test_templates_scoped_per_host(spark):
    # the SAME error body on 3 different hosts is 3 single-url templates —
    # no host reaches the repetition threshold, nothing is flagged
    rows = [(f"h{i}", f"h{i}/dead", ERR) for i in range(3)]
    out = _flags(spark, rows)
    assert all(not r["is_soft404"] for r in out.values())
    assert all(r["template_urls"] == 1 for r in out.values())


def test_threshold_and_space_padding_fingerprint(spark):
    # trim() folds leading/trailing SPACE padding into one template (ANSI
    # trim is space-only — a template differing by a newline is a
    # different template, consistently in both engines);
    # min_template_urls=2 flags a pair
    rows = [("h", "a", ERR), ("h", "b", "  " + ERR + "  ")]
    out = _flags(spark, rows, min_template_urls=2)
    assert out["a"]["is_soft404"] and out["b"]["is_soft404"]


def test_marker_phrases(spark):
    hits = [
        "Sorry, page not found",
        "FILE NOT FOUND",
        "this page does not exist",
        "content no longer available",
        "Error 404 - gone",
        "the document has been removed",
    ]
    misses = ["an error occurred", "404 likes on this post", "not foundational"]
    rows = [("h", f"hit{i}", t) for i, t in enumerate(hits)]
    rows += [("h", f"miss{i}", t) for i, t in enumerate(misses)]
    out = _flags(spark, rows)
    assert all(out[f"hit{i}"]["has_marker"] for i in range(len(hits)))
    assert not any(out[f"miss{i}"]["has_marker"] for i in range(len(misses)))
