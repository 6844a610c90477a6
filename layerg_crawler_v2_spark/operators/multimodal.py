"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque `binary` columns + typed metadata structs — the
same strategy the reference uses for raw log payloads (`Data []byte` sliced
by generated decoders, generated/eventhandlers/event_handlers.go:99-104).

The Spark side — schemas, Arrow batch shapes, mapInPandas partitioning — is
real and tested; the codec calls are STUBS (this container has no image/
audio libraries): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (header-derived
dims, content hash) stands in so the pipeline shape is exercisable
end-to-end."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_hash long, "
    "feat array<float>"
)


def _fake_decode(payload: bytes, n_feat: int = 8) -> np.ndarray:
    """Deterministic fake 'decoder': 8 moments of the byte histogram."""
    if payload is None or len(payload) == 0:
        return np.zeros(n_feat, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    chunks = np.array_split(arr, n_feat)
    return np.array([c.mean() / 255.0 if len(c) else 0.0 for c in chunks], dtype=np.float32)


def decode_image(payload: bytes):
    """REAL decoder stub — requires an image library not in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; run with fake=True for the "
        "deterministic stand-in (same Spark plumbing, fake pixels)"
    )


def extract_features(df: DataFrame, fake: bool = True, n_feat: int = 8) -> DataFrame:
    """media rows -> feature rows, one vectorized Arrow pass per batch.

    Partitioning note: payloads are large; keep
    spark.sql.execution.arrow.maxRecordsPerBatch low enough that a batch of
    payloads fits executor memory (session.py sets 10k; at 1 MB media use
    ~256)."""
    if not fake:
        decode_image(None)  # raises: real codecs unavailable here

    def per_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, hashes, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                feats.append(_fake_decode(b, n_feat))
                h = 0xCBF29CE484222325
                for byte in b[:4096]:
                    h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                hashes.append(h - 2**63)
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "content_hash": hashes,
                    "feat": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        per_batch, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "media_id long, width int, height int, pixels binary"


def resize_image(df: DataFrame, width: int = 8, height: int = 8, fake: bool = True) -> DataFrame:
    """media rows -> fixed-size thumbnails. REAL path needs an image codec
    (stubbed, like decode_image); the fake path treats the payload bytes as a
    row-major gray image and area-averages into width×height — deterministic,
    same Arrow batch shape and output schema as a real resampler."""
    if not fake:
        decode_image(None)  # raises: real codecs unavailable here

    def per_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                if not b:
                    out.append(bytes(width * height))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                cells = np.array_split(arr, width * height)
                thumb = np.array(
                    [int(c.mean()) if len(c) else 0 for c in cells], dtype=np.uint8
                )
                out.append(thumb.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "pixels": out,
                }
            )

    return df.select("media_id", "payload").mapInPandas(per_batch, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_no int, offset_ms int, frame_hash long"


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_no,
    offset_ms, frame_hash). REAL decode is stubbed; the fake path slices the
    payload evenly across meta.duration_ms and hashes each slice — the
    explode-shaped output (rows ∝ duration) and batch sizing are exactly the
    real pipeline's."""
    if not fake:
        decode_image(None)  # raises: real codecs unavailable here

    def per_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, fnos, offs, hashes = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                b = bytes(payload) if payload is not None else b""
                d = int(dur) if dur is not None and dur == dur else 0
                n = max(1, d // every_ms) if b else 0
                for f in range(n):
                    lo = len(b) * f // n
                    hi = len(b) * (f + 1) // n
                    h = 0xCBF29CE484222325
                    for byte in b[lo : min(hi, lo + 1024)]:
                        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                    mids.append(mid)
                    fnos.append(f)
                    offs.append(f * every_ms)
                    hashes.append(h - 2**63)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_no": pd.Series(fnos, dtype="int32"),
                    "offset_ms": pd.Series(offs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    flat = df.select("media_id", "payload", "meta.duration_ms")
    return flat.mapInPandas(per_batch, schema=FRAME_SCHEMA)


def build_media_from_pages(pages: DataFrame) -> DataFrame:
    """Derive a media table from pages.html payloads (kind=image stand-in) —
    exercises the binary-column pipeline with real bytes."""
    from pyspark.sql import functions as F

    return pages.select(
        F.xxhash64("url").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("html").alias("payload"),
        F.struct(
            F.lit("text/html").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
