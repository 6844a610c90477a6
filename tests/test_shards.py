"""Tar-shard export: round trip, shard size bound, ranged-read offsets,
byte determinism."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.sources.shards import (
    read_tar_shards,
    write_tar_shards,
)


def _docs(spark, n=25):
    return spark.createDataFrame(
        [(i, f"text of document {i} " * (i % 4 + 1), f'{{"lang":"l{i%3}"}}')
         for i in range(n)],
        "doc_id long, text string, meta string",
    )


def test_round_trip(spark):
    with tempfile.TemporaryDirectory() as d:
        docs = _docs(spark).repartition(3)
        man = write_tar_shards(
            docs, d, max_docs_per_shard=5, meta_col="meta"
        ).collect()
        assert len(man) == 25
        back = read_tar_shards(spark, d).collect()
        got = {int(r["key"]): (r["text"], r["meta"]) for r in back}
        exp = {
            r["doc_id"]: (r["text"], r["meta"]) for r in _docs(spark).collect()
        }
        assert got == exp


def test_shard_size_bound(spark):
    with tempfile.TemporaryDirectory() as d:
        man = write_tar_shards(
            _docs(spark, 23).coalesce(1), d, max_docs_per_shard=5
        ).collect()
        per_shard = {}
        for r in man:
            per_shard[r["shard_file"]] = per_shard.get(r["shard_file"], 0) + 1
        assert max(per_shard.values()) <= 5
        assert sum(per_shard.values()) == 23
        assert len(glob.glob(os.path.join(d, "*.tar"))) == len(per_shard)


def test_manifest_offsets_ranged_read(spark):
    with tempfile.TemporaryDirectory() as d:
        docs = _docs(spark, 10).coalesce(1)
        man = write_tar_shards(docs, d, max_docs_per_shard=100).collect()
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        for r in man:
            with open(os.path.join(d, r["shard_file"]), "rb") as f:
                f.seek(r["offset"])
                data = f.read(r["length"])
            assert data.decode("utf-8") == texts[int(r["key"])]


def test_byte_deterministic(spark):
    outs = []
    for _ in range(2):
        with tempfile.TemporaryDirectory() as d:
            write_tar_shards(
                _docs(spark, 12).coalesce(1), d, max_docs_per_shard=100
            ).collect()
            [f] = glob.glob(os.path.join(d, "*.tar"))
            outs.append(open(f, "rb").read())
    assert outs[0] == outs[1]


def test_empty_partitions_write_nothing(spark):
    with tempfile.TemporaryDirectory() as d:
        man = write_tar_shards(
            _docs(spark, 4).repartition(16), d, max_docs_per_shard=5
        ).collect()
        assert len(man) == 4
        files = glob.glob(os.path.join(d, "*.tar"))
        assert len(files) == len({r["shard_file"] for r in man})
