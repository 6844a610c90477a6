"""Planted-case tests for benchmark decontamination and chunk-exact dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.decontam import decontaminate, word_grams
from layerg_crawler_v2_spark.operators.dedup import chunk_exact_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_grams_count_and_content(spark):
    df = spark.range(1).select(
        word_grams(F.lit("a b c d e"), 3).alias("g")
    )
    assert df.collect()[0]["g"] == ["a b c", "b c d", "c d e"]
    short = spark.range(1).select(word_grams(F.lit("a b"), 3).alias("g"))
    assert short.collect()[0]["g"] == []


def test_decontaminate_planted_overlap(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _docs(
        spark,
        [
            # contains the benchmark 4-gram "beta gamma delta epsilon"
            (1, "xx beta gamma delta epsilon yy"),
            # no 4-gram overlap (words shuffled)
            (2, "epsilon delta gamma beta alpha"),
            # exact copy of a benchmark doc -> 3 distinct 4-grams hit
            (3, "alpha beta gamma delta epsilon zeta"),
        ],
    )
    out = {
        r["doc_id"]: (r["n_contaminated_grams"], r["contaminated"])
        for r in decontaminate(train, bench, n=4).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (3, True)


def test_decontaminate_counts_distinct_grams_once(spark):
    bench = _docs(spark, [(9, "p q r s")])
    # the hit gram "p q r s" occurs twice in the training doc -> counted once
    train = _docs(spark, [(1, "p q r s z p q r s")])
    row = decontaminate(train, bench, n=4).collect()[0]
    assert row["n_contaminated_grams"] == 1


def test_chunk_dedup_first_occurrence_wins(spark):
    a = " ".join(f"w{i}" for i in range(10))  # one exact 10-word chunk
    b = " ".join(f"v{i}" for i in range(10))
    df = _docs(
        spark,
        [
            (1, a + " " + b),  # chunks [a, b] — both first occurrences
            (2, a),            # chunk [a] — loses to doc 1
            (3, b + " " + a),  # both chunks lose
        ],
    )
    out = {r["doc_id"]: r for r in chunk_exact_dedup(df, 10).collect()}
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 2)
    assert out[1]["dedup_text"] == a + " " + b
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (1, 0)
    assert out[2]["dedup_text"] is None
    assert (out[3]["n_chunks"], out[3]["n_kept"]) == (2, 0)


def test_chunk_dedup_reassembles_in_document_order(spark):
    words = " ".join(f"u{i}" for i in range(25))  # chunks of 10/10/5
    df = _docs(spark, [(1, words)])
    row = chunk_exact_dedup(df, 10).collect()[0]
    assert (row["n_chunks"], row["n_kept"]) == (3, 3)
    assert row["dedup_text"] == words


def test_gopher_quality_planted_rules(spark):
    from layerg_crawler_v2_spark.functions.text import gopher_quality

    long_good = " ".join(["the"] + ["and"] + ["word"] * 58)  # 60 words, 2 stops
    short = "the and tiny doc"  # fails word count
    no_stop = " ".join(["zzz"] * 60)  # fails stopwords
    digits = " ".join(["the", "and"] + ["12345"] * 58)  # fails alpha_frac
    df = _docs(spark, [(1, long_good), (2, short), (3, no_stop), (4, digits)])
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", gopher_quality(F.col("text")).alias("g")
        ).select("doc_id", "g.*").collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["ok_word_count"] is False
    assert out[3]["keep"] is False and out[3]["ok_stopwords"] is False
    assert out[4]["keep"] is False and out[4]["ok_alpha_frac"] is False


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_broadcasts_benchmark_side(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta")])
    train = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    plan = _plan(decontaminate(train, bench, n=4))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the training gram fan-out must not shuffle into the semi-join
    semi = plan.split("LeftSemi")[0] if "LeftSemi" in plan else plan
    assert semi  # join present


def test_gopher_quality_plan_has_no_exchange(spark):
    from layerg_crawler_v2_spark.functions.text import gopher_quality

    df = _docs(spark, [(1, "the and word " * 20)])
    plan = _plan(df.select("doc_id", gopher_quality(F.col("text")).alias("g")))
    assert "Exchange" not in plan


def test_trap_flags_plan_has_no_exchange(spark):
    from layerg_crawler_v2_spark.operators.traps import url_trap_flags

    df = spark.createDataFrame(
        [("https://example.com/a/b/p.html",)], "url string"
    )
    plan = _plan(df.select(url_trap_flags(F.col("url")).alias("f")))
    assert "Exchange" not in plan


def test_hash_keep_plan_has_no_exchange(spark):
    from layerg_crawler_v2_spark.operators.sampling import hash_keep

    plan = _plan(spark.range(10).select(hash_keep(F.col("id"), 4)))
    assert "Exchange" not in plan


def test_boilerplate_removal_drops_all_copies(spark):
    from layerg_crawler_v2_spark.operators.dedup import boilerplate_chunk_removal

    header = " ".join(f"nav{i}" for i in range(10))
    bodies = {i: " ".join(f"b{i}w{j}" for j in range(10)) for i in range(4)}
    rows = [(i, "hostA", f"{header} {bodies[i]}") for i in range(3)]
    # hostB: single doc — its header chunk must NOT be boilerplate (df=1)
    rows.append((9, "hostB", f"{header} {bodies[3]}"))
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {r["doc_id"]: r for r in boilerplate_chunk_removal(df, chunk_words=10).collect()}
    for i in range(3):  # header dropped from EVERY hostA doc, body kept
        assert (out[i]["n_chunks"], out[i]["n_boiler"]) == (2, 1)
        assert out[i]["clean_text"] == bodies[i]
    assert out[9]["n_boiler"] == 0 and out[9]["clean_text"].startswith("nav0")


def test_unigram_logprob_rare_words_score_higher(spark):
    from layerg_crawler_v2_spark.operators.scoring import unigram_logprob_scores

    common = " ".join(["the"] * 10)
    rare = " ".join(f"zq{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, common), (2, common), (3, rare)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["avg_neg_logprob"] for r in
           unigram_logprob_scores(df).collect()}
    assert out[3] > out[1] and out[1] == out[2]
