"""Deterministic sampling / epoch-weighting invariants."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.sampling import (
    hash_keep,
    oversample,
    stratified_sample,
)


def test_hash_keep_matches_python_md5(spark):
    df = spark.range(200).select(
        "id", hash_keep(F.col("id"), 4).alias("keep")
    )
    for r in df.collect():
        expected = hashlib.md5(str(r["id"]).encode()).hexdigest()[0] < "4"
        assert r["keep"] is expected


def test_hash_keep_rate_is_exact_in_expectation(spark):
    # 4/16 of the nibble space: large-n frequency must be near 0.25
    n = 20_000
    kept = (
        spark.range(n)
        .select(hash_keep(F.col("id"), 4).alias("k"))
        .agg(F.sum(F.col("k").cast("long")))
        .collect()[0][0]
    )
    assert abs(kept / n - 0.25) < 0.02


def test_hash_keep_partitioning_invariant(spark):
    a = (
        spark.range(1000).repartition(1)
        .select("id", hash_keep(F.col("id"), 8).alias("k"))
        .collect()
    )
    b = (
        spark.range(1000).repartition(16)
        .select("id", hash_keep(F.col("id"), 8).alias("k"))
        .collect()
    )
    assert {(r["id"], r["k"]) for r in a} == {(r["id"], r["k"]) for r in b}


def test_hash_keep_edges(spark):
    row = spark.range(5).select(
        hash_keep(F.col("id"), 16).alias("all"),
        hash_keep(F.col("id"), 0).alias("none"),
    ).collect()
    assert all(r["all"] for r in row) and not any(r["none"] for r in row)


def test_stratified_sample_respects_strata_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zz") for i in range(2000)],
        "doc_id long, lang string",
    )
    out = stratified_sample(df, "lang", {"en": 16}, default_sixteenths=0)
    agg = {
        r["lang"]: r["n"]
        for r in out.filter("sampled").groupBy("lang").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert agg.get("en") == 1000 and "zz" not in agg


def test_oversample_epochs(spark):
    df = spark.createDataFrame(
        [(1, 3), (2, 1), (3, 0)], "doc_id long, epochs int"
    )
    out = oversample(df, F.col("epochs")).collect()
    got = sorted((r["doc_id"], r["epoch"]) for r in out)
    # epochs=0 emits nothing (empty sequence explode drops the row)
    assert got == [(1, 0), (1, 1), (1, 2), (2, 0)]


def test_weighted_sample_deterministic_and_monotone(spark):
    from layerg_crawler_v2_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(i, 1 + (i % 5) * 3) for i in range(400)], "id long, w long"
    )
    a = [tuple(r) for r in weighted_sample_topk(df.coalesce(1), "id", "w", 40).collect()]
    b = [tuple(r) for r in weighted_sample_topk(df.repartition(7), "id", "w", 40).collect()]
    assert a == b and len(a) == 40  # partitioning-invariant, exact k

    # monotone in weight: across many disjoint trials, heavier ids win
    # far more often — here: expected win share of the w=13 stratum is
    # 13/(1+4+7+10+13)=37%; with 40 winners the count should dominate w=1
    by_w = {}
    for _, w, _ in a:
        by_w[w] = by_w.get(w, 0) + 1
    assert by_w.get(13, 0) > by_w.get(1, 0)


def test_weighted_sample_zero_weight_never_wins(spark):
    from layerg_crawler_v2_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(1, 0), (2, 5), (3, -2), (4, 1)], "id long, w long"
    )
    got = [r["id"] for r in weighted_sample_topk(df, "id", "w", 10).collect()]
    assert sorted(got) == [2, 4]


def test_host_disjoint_split(spark):
    from layerg_crawler_v2_spark.operators.sampling import host_disjoint_split

    rows = [(i, f"h{i % 37}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    got = host_disjoint_split(df, val_pct=10, test_pct=10).collect()
    assert len(got) == 500
    # the split is a HOST property: every doc of a host lands in ONE split
    by_host: dict[str, set] = {}
    for r in got:
        by_host.setdefault(r["host"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_host.values())
    # deterministic across invocations
    again = {r["doc_id"]: r["split"] for r in
             host_disjoint_split(df, val_pct=10, test_pct=10).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in got)
    # a different salt re-rolls at least one host (37 hosts: overwhelming)
    rerolled = {
        r["host"]: r["split"]
        for r in host_disjoint_split(df, salt="split-v2").collect()
    }
    base = {r["host"]: r["split"] for r in got}
    assert any(rerolled[h] != base[h] for h in base)
    # all three splits present and train dominates
    from collections import Counter
    c = Counter(base.values())
    assert set(c) <= {"train", "val", "test"} and c["train"] > c["val"]


def test_temperature_resample_quotas_sum_and_flatten(spark):
    import pyspark.sql.functions as F

    from layerg_crawler_v2_spark.operators.sampling import temperature_resample

    # head-heavy corpus: 160 en, 40 de, 10 fr
    rows = (
        [(i, "en") for i in range(160)]
        + [(1000 + i, "de") for i in range(40)]
        + [(2000 + i, "fr") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = temperature_resample(df, total_budget=60).toPandas()
    # quotas sum exactly to the budget and selection honors them
    assert len(out) == 60
    by_lang = out.groupby("lang")["doc_id"].count().to_dict()
    assert sum(by_lang.values()) == 60
    quota = out.groupby("lang")["lang_quota"].first().to_dict()
    assert by_lang == {k: int(v) for k, v in quota.items()}
    # alpha=1/2 flattening: en's output share < its input share,
    # fr's output share > its input share
    assert by_lang["en"] / 60 < 160 / 210
    assert by_lang["fr"] / 60 > 10 / 210
    # weights floor(sqrt): 12/6/3 of budget 60 -> quotas ~ 34/17/9
    assert quota["en"] == 34 and quota["de"] == 17 and quota["fr"] == 9


def test_temperature_resample_partitioning_invariant(spark):
    from layerg_crawler_v2_spark.operators.sampling import temperature_resample

    rows = [(i, ["en", "de", "fr", "zh"][i % 4]) for i in range(120)]
    df1 = spark.createDataFrame(rows, "doc_id bigint, lang string").repartition(1)
    df2 = spark.createDataFrame(rows, "doc_id bigint, lang string").repartition(13)
    a = sorted(map(tuple, temperature_resample(df1, 37).collect()))
    b = sorted(map(tuple, temperature_resample(df2, 37).collect()))
    assert a == b and len(a) == 37


def test_temperature_resample_quota_exceeding_lang_keeps_all(spark):
    from layerg_crawler_v2_spark.operators.sampling import temperature_resample

    # 2-doc language with a budget of 10: sampling is without replacement,
    # so at most n_lang rows come back per language (shortfall documented)
    rows = [(1, "xx"), (2, "xx"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = temperature_resample(df, total_budget=10).toPandas()
    by_lang = out.groupby("lang")["doc_id"].count().to_dict()
    assert by_lang.get("xx", 0) <= 2
    assert set(out["lang"]) <= {"xx", "und"}  # NULL lang folds to 'und'
