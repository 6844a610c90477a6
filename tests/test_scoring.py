"""Quality bucketing (operators/scoring.py): score values, exact ntile
split shape, and exact-vs-approx agreement (the 10^10-doc plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.scoring import (
    QUALITY_SCALE,
    quality_buckets_approx,
    quality_buckets_exact,
    stopword_density_score,
)

DOCS = [
    (1, "the cat sat on the mat and the dog"),  # stopword-rich prose
    (2, "buy cheap widgets widgets widgets deals deals"),  # keyword soup
    (3, "a of to and in is on the"),  # pure stopwords
    (4, "alpha beta gamma delta"),  # zero stopwords
    (5, "the alpha of beta"),
    (6, "one two three the four"),
]


def _scores(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return stopword_density_score(df)


def test_score_values(spark):
    got = {r["doc_id"]: r["score_scaled"] for r in _scores(spark).collect()}
    # doc 3: 8/8 stopwords; doc 4: 0/4; doc 1: 5 of 9
    assert got[3] == QUALITY_SCALE
    assert got[4] == 0
    assert got[1] == (5 * QUALITY_SCALE) // 9


def test_exact_buckets_are_thirds(spark):
    rows = quality_buckets_exact(_scores(spark)).collect()
    sizes = {b: 0 for b in ("head", "middle", "tail")}
    for r in rows:
        sizes[r["bucket"]] += 1
    assert sizes == {"head": 2, "middle": 2, "tail": 2}
    by_doc = {r["doc_id"]: r["bucket"] for r in rows}
    assert by_doc[3] == "head" and by_doc[4] == "tail"


def test_exact_head_scores_dominate(spark):
    rows = quality_buckets_exact(_scores(spark)).collect()
    head = [r["score_scaled"] for r in rows if r["bucket"] == "head"]
    tail = [r["score_scaled"] for r in rows if r["bucket"] == "tail"]
    assert min(head) >= max(tail)


def test_approx_agrees_with_exact_away_from_ties(spark):
    # 60 docs with distinct integer scores: the GK sketch is exact at this
    # size, so approx == exact everywhere except possible threshold-tie
    # rows; with all-distinct scores there are no ties to disagree on
    docs = [
        (i, " ".join(["the"] * (i + 1) + ["w%d" % k for k in range(61 - i)]))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    scores = stopword_density_score(df).cache()
    exact = {r["doc_id"]: r["bucket"] for r in quality_buckets_exact(scores).collect()}
    approx = {
        r["doc_id"]: r["bucket"] for r in quality_buckets_approx(scores).collect()
    }
    distinct_scores = scores.select("score_scaled").distinct().count()
    assert distinct_scores == 60  # precondition: no ties
    disagree = [d for d in exact if exact[d] != approx[d]]
    assert disagree == []
    scores.unpersist()


def test_approx_no_global_sort(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = quality_buckets_approx(
        stopword_density_score(df)
    )._jdf.queryExecution().executedPlan().toString()
    # the scale path must not contain a single-partition window sort
    assert "Window" not in plan
