"""DCT perceptual hash + exact hamming near-dup pairs: invariance
properties, pigeonhole-blocking EXACT recall vs brute force, real-decode
pipeline end-to-end."""

from __future__ import annotations

import random

import numpy as np
import pytest

from layerg_crawler_v2_spark.operators.multimodal import (
    build_phash_media,
    image_phash,
    mixed_pixels_for,
    perturb_pixels,
    phash64,
    phash_near_dup_pairs,
)


def ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_identical_images_identical_hash():
    assert phash64(mixed_pixels_for(7)) == phash64(mixed_pixels_for(7))


def test_upscale_invariant():
    px = mixed_pixels_for(3)
    up = px.repeat(2, axis=0).repeat(2, axis=1)
    assert ham(phash64(px), phash64(up)) == 0


def test_brightness_perturbation_close():
    for i in range(10):
        px = mixed_pixels_for(i)
        assert ham(phash64(px), phash64(perturb_pixels(px))) <= 6


def test_distinct_content_far():
    hashes = [phash64(mixed_pixels_for(i)) for i in range(10)]
    for i in range(10):
        for j in range(i + 1, 10):
            assert ham(hashes[i], hashes[j]) > 10


def test_signed_long_range():
    for i in range(20):
        h = phash64(mixed_pixels_for(i))
        assert -(2**63) <= h < 2**63


@pytest.mark.parametrize("max_hamming", [2, 6])
def test_pigeonhole_exact_recall(spark, max_hamming):
    """Bucketed pairs == brute-force pairs, exactly (pigeonhole: any pair
    within hamming d agrees on one of the d+1 blocks)."""
    rng = random.Random(42)
    hashes = [rng.getrandbits(64) - 2**63 for _ in range(40)]
    # plant close pairs: flip <= max_hamming random bits
    for base in range(0, 30, 5):
        h = hashes[base]
        for k in range(1, max_hamming + 1):
            flipped = h
            for _ in range(k):
                flipped ^= 1 << rng.randrange(64)
            hashes.append(((flipped + 2**63) % 2**64) - 2**63)
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "media_id long, phash long"
    )
    got = {
        (r["media_id_a"], r["media_id_b"], r["hamming"])
        for r in phash_near_dup_pairs(df, max_hamming=max_hamming).collect()
    }
    exp = {
        (i, j, ham(hashes[i], hashes[j]))
        for i in range(len(hashes))
        for j in range(i + 1, len(hashes))
        if ham(hashes[i], hashes[j]) <= max_hamming
    }
    assert got == exp and len(exp) > 0


def test_end_to_end_real_decode(spark):
    media = build_phash_media(spark, 30, dup_every=10)
    hashes = image_phash(media, fake=False)
    pairs = phash_near_dup_pairs(hashes, max_hamming=10)
    got = {
        (r["media_id_a"], r["media_id_b"])
        for r in pairs.collect()
    }
    # exactly the planted twins (0,10,20 + 1e6 offsets), nothing else
    assert got == {(0, 1_000_000), (10, 1_000_010), (20, 1_000_020)}


def test_fake_path_total_on_arbitrary_bytes(spark):
    df = spark.createDataFrame(
        [(1, b"xyz" * 100), (2, b""), (3, None)],
        "media_id long, payload binary",
    )
    rows = image_phash(df, fake=True).collect()
    assert len(rows) == 3


def test_plan_shuffles_on_blocks_only(spark):
    df = spark.createDataFrame([(1, 5), (2, 9)], "media_id long, phash long")
    plan = (
        phash_near_dup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
