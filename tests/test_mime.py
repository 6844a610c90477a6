"""Magic-byte MIME sniffing: fixture payloads per format, precedence,
NULL totality, and plan shape (pure codegen, no Python)."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.functions.mime import sniff_mime

CASES = [
    (b"\x89PNG\r\n\x1a\n" + b"\x00" * 8, "image/png"),
    (b"GIF89a" + b"\x00" * 8, "image/gif"),
    (b"GIF87a" + b"\x00" * 8, "image/gif"),
    (b"\xff\xd8\xff\xe0fake-jpeg", "image/jpeg"),
    (b"%PDF-1.7 ...", "application/pdf"),
    (b"PK\x03\x04zipzip", "application/zip"),
    (b"\x1f\x8b\x08rest", "application/gzip"),
    (b"BM" + b"\x00" * 12, "image/bmp"),
    (b"P6\n2 2\n255\n" + b"\x00" * 12, "image/x-portable-pixmap"),
    (b"OggSvorbis", "application/ogg"),
    (b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
    (b"\x00\x00\x00\x18ftypisom", "video/mp4"),
    (b"<!DOCTYPE html><p>x</p>", "text/html"),
    (b"  \n\t<html lang='en'>", "text/html"),
    (b"\xef\xbb\xbf<HTML>", "text/html"),
    (b"<head><title>t</title>", "text/html"),
    (b"<!-- comment -->", "text/html"),
    (b'<?xml version="1.0"?><r/>', "application/xml"),
    (b"just some plain text", "application/octet-stream"),
    (b"\x00\x01\x02\x03", "application/octet-stream"),
    (b"", "application/octet-stream"),
]


def test_fixture_payloads(spark):
    df = spark.createDataFrame(
        [(i, b) for i, (b, _) in enumerate(CASES)], "id int, payload binary"
    )
    got = {
        r["id"]: r["mime"]
        for r in df.select(
            "id", sniff_mime(F.col("payload")).alias("mime")
        ).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, CASES[i], got[i])


def test_real_encoders_agree(spark):
    from layerg_crawler_v2_spark.operators.multimodal import (
        bmp_pixels_for,
        encode_bmp,
        encode_png,
    )

    px = bmp_pixels_for(5)
    df = spark.createDataFrame(
        [(1, encode_bmp(px)), (2, encode_png(px)),
         (3, zlib.compress(b"x") and b"\x1f\x8b" + zlib.compress(b"x"))],
        "id int, payload binary",
    )
    got = {
        r["id"]: r["mime"]
        for r in df.select("id", sniff_mime(F.col("payload")).alias("mime")).collect()
    }
    assert got[1] == "image/bmp" and got[2] == "image/png"


def test_null_payload(spark):
    df = spark.createDataFrame([(1, None)], "id int, payload binary")
    assert (
        df.select(sniff_mime(F.col("payload")).alias("m")).collect()[0]["m"]
        is None
    )


def test_plan_pure_codegen(spark):
    df = spark.createDataFrame([(1, b"x")], "id int, payload binary")
    plan = (
        df.select(sniff_mime(F.col("payload")).alias("m"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
