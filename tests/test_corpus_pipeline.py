"""End-to-end corpus build: crawl -> extract -> quality gate -> dedup ->
pack -> tar shards -> read back. The 'a user could switch' integration:
every stage is an individually-oracled operator; this test pins that they
COMPOSE — counts conserve, text survives byte-identically, and the final
trainer artifact contains exactly the surviving documents."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark import schema as S
from layerg_crawler_v2_spark.datagen import build_pages, seed_urls
from layerg_crawler_v2_spark.functions.canon import canonicalize_udf
from layerg_crawler_v2_spark.functions.extract import extract_text_udf
from layerg_crawler_v2_spark.functions.text import token_count
from layerg_crawler_v2_spark.operators.sequence import chop_spans
from layerg_crawler_v2_spark.sources.shards import (
    read_tar_shards,
    write_tar_shards,
)
from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
from layerg_crawler_v2_spark.streaming.rounds import CrawlConfig, run_crawl


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """Crawl sf0.001 pages for 2 rounds; return (store dir ctx, fetched
    docs with extracted text)."""
    pages = build_pages(spark, sf_dir).cache()
    seeds = seed_urls(pages.count(), n_seeds=5)
    tmp = tempfile.TemporaryDirectory()
    store = SnapshotStore(tmp.name)
    run_crawl(spark, pages, seeds, store, CrawlConfig(rounds=2))
    fetched = (
        store.read(spark, "fetch_log", S.FETCH_LOG)
        .filter(F.col("status") == "OK")
        .select("url")
    )
    canon = pages.select(
        canonicalize_udf("url").alias("url"), "html"
    )
    docs = (
        fetched.join(canon, "url")
        .select("url", extract_text_udf(F.col("html")).alias("text"))
        .withColumn("doc_id", F.xxhash64("url"))
        .cache()
    )
    yield docs
    tmp.cleanup()


def test_crawl_extract_nonempty(corpus):
    assert corpus.count() > 0
    assert corpus.filter(F.col("text").isNull()).count() == 0


def test_quality_dedup_pack_shard_composition(spark, corpus):
    docs = corpus
    n_fetched = docs.count()

    # quality gate: keep docs with >= 1 token (the generator corpus is
    # clean; the gate is the composition point where c4/gopher plug in)
    kept = docs.filter(token_count(F.col("text")) >= 1)

    # exact dedup on content fingerprint, keep smallest doc_id per group
    fp = kept.withColumn("fp", F.md5("text"))
    winners = (
        fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    )
    surviving = fp.join(
        winners, ["fp", "doc_id"], "left_semi"
    ).select("doc_id", "text")
    n_surviving = surviving.count()
    assert 0 < n_surviving <= n_fetched

    # pack: every surviving token lands in exactly one span
    sized = surviving.withColumn("n", token_count(F.col("text")))
    spans = chop_spans(sized, "n", [F.col("doc_id")], capacity=128)
    total_tokens = sized.agg(F.sum("n")).collect()[0][0]
    packed_tokens = spans.agg(F.sum("n_tokens")).collect()[0][0]
    assert packed_tokens == total_tokens

    # shard: the trainer artifact holds exactly the surviving docs,
    # text byte-identical
    with tempfile.TemporaryDirectory() as d:
        man = write_tar_shards(
            surviving, d, max_docs_per_shard=50
        ).collect()
        assert len(man) == n_surviving
        back = read_tar_shards(spark, d)
        survived = {
            r["doc_id"]: r["text"] for r in surviving.collect()
        }
        got = {int(r["key"]): r["text"] for r in back.collect()}
        # keys are %012d of the doc_id which may be negative (xxhash64);
        # compare via the manifest's key mapping instead
        man_keys = {r["key"] for r in man}
        assert len(man_keys) == n_surviving
        assert sorted(got.values()) == sorted(survived.values())


def test_dedup_is_idempotent_on_pipeline_output(spark, corpus):
    fp = corpus.withColumn("fp", F.md5("text"))
    winners = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    surviving = fp.join(winners, ["fp", "doc_id"], "left_semi")
    again = (
        surviving.groupBy("fp").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert again.count() == 0
