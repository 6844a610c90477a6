"""Multimodal plumbing: schemas, batch shapes, determinism. The codecs are
declared stubs (decode_image raises); the deterministic fake paths exercise
the REAL Spark-side plumbing — binary columns, Arrow batches, explode-shaped
frame output — end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.datagen import build_pages
from layerg_crawler_v2_spark.operators.multimodal import (
    build_media_from_pages,
    decode_image,
    extract_features,
    resize_image,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    pages = build_pages(spark, sf_dir).limit(50)
    m = build_media_from_pages(pages)
    # give frames something to sample: synthesize a duration from the id
    return m.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime"),
            F.col("meta.width"),
            F.col("meta.height"),
            (F.pmod(F.col("media_id"), F.lit(5)) * 1000 + 1000)
            .cast("int")
            .alias("duration_ms"),
        ),
    ).cache()


def test_decode_image_is_declared_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        extract_features(None, fake=False)


def test_features_shape_and_determinism(spark, media):
    a = extract_features(media, fake=True).orderBy("media_id").collect()
    b = extract_features(media.repartition(7), fake=True).orderBy("media_id").collect()
    assert len(a) == media.count()
    for ra, rb in zip(a, b):
        assert ra["media_id"] == rb["media_id"]
        assert ra["content_hash"] == rb["content_hash"]
        assert list(ra["feat"]) == list(rb["feat"])
        assert len(ra["feat"]) == 8
        assert ra["n_bytes"] > 0


def test_resize_fixed_output_size(spark, media):
    rows = resize_image(media, width=4, height=4).collect()
    assert len(rows) == media.count()
    for r in rows:
        assert (r["width"], r["height"]) == (4, 4)
        assert len(bytes(r["pixels"])) == 16


def test_sample_frames_rows_proportional_to_duration(spark, media):
    frames = sample_frames(media, every_ms=1000)
    per = {r["media_id"]: r["n"] for r in
           frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    durs = {r["media_id"]: r["d"] for r in
            media.select("media_id", F.col("meta.duration_ms").alias("d")).collect()}
    assert set(per) == set(durs)
    for mid, n in per.items():
        assert n == max(1, durs[mid] // 1000)
    # frame offsets are the sampling grid
    one = frames.filter(F.col("media_id") == min(per)).orderBy("frame_no").collect()
    assert [r["offset_ms"] for r in one] == [i * 1000 for i in range(len(one))]
