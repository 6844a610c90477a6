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


def test_bigram_backoff_branches(spark):
    from layerg_crawler_v2_spark.operators.scoring import bigram_backoff_scores

    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),        # train: bigrams (the,cat) (cat,sat)
            (2, "the cat ran"),        # train
            (1, "the cat sat"),        # held-out, all bigrams seen
            (3, "cat the"),            # held-out: unseen bigram, w2 in vocab
            (5, "zzz qqq"),            # held-out: OOV everywhere -> 0
            (7, "x"),                  # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in
           bigram_backoff_scores(docs, train_mod=2, scale=1000, backoff_div=4).collect()}
    # train tokens: the cat sat the cat ran -> T=6, c(the)=2 c(cat)=2 c(sat)=1 c(ran)=1
    # doc 1: (the,cat) c12=2,c1=2 -> 1000; (cat,sat) c12=1,c1=2 -> 500
    assert got[1]["score_scaled"] == 1500 and got[1]["n_bigrams"] == 2
    assert got[1]["avg_score_scaled"] == 750
    # doc 3: (cat,the) unseen bigram, backoff c(the)=2 -> (2*1000)//(6*4) = 83
    assert got[3]["score_scaled"] == 83
    assert got[5]["score_scaled"] == 0 and got[5]["n_bigrams"] == 1
    assert got[7]["n_bigrams"] == 0 and got[7]["avg_score_scaled"] is None
    # train docs score themselves through the seen branch
    assert got[0]["score_scaled"] == 1500
