"""Content-defined chunking (gear-hash CDC, the FastCDC family) — chunk
boundaries chosen by content, not offset, so inserting or deleting bytes
early in a document shifts only the chunks that actually changed. This is
the dedup primitive fixed-window chunking can't provide: chunk_exact_dedup
(operators/dedup.py) misses every duplicate that sits at a different word
offset after an edit; CDC re-synchronizes within one chunk.

Boundary rule: position i ends a chunk when (H(i) & mask) == 0, where H is
the gear rolling hash h = (h << 1) + gear[byte]. Because the mask keeps
only the low K bits, H(i) & mask depends on ONLY the last K bytes
(gear contributions shifted left by >= K vanish under the mask), which is
what makes the scan fully vectorizable: K shifted adds over the whole byte
array in numpy, no per-byte Python. min_size suppresses early cut points;
max_size forces a cut — both enforced in a loop over the (sparse)
candidate positions, never over bytes.

Scale shape: embarrassingly parallel — mapInPandas over (id, payload),
zero shuffle; the gear table regenerates from splitmix64 on every executor
(the operators/similarity.py plane discipline), nothing broadcast. The
downstream dedup (groupBy chunk_hash) shuffles fixed-width hashes only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GEAR_SEED = 20260819


def _gear_table(seed: int = _GEAR_SEED) -> np.ndarray:
    """256 deterministic uint64 gear values (splitmix64 stream)."""
    from .similarity import _mix64_scalar

    return np.array(
        [_mix64_scalar(seed * 1_000_003 + b) for b in range(256)],
        dtype=np.uint64,
    )


_GEAR = _gear_table()


def chunk_offsets(
    data: bytes, min_size: int = 64, mask_bits: int = 8, max_size: int = 1024
) -> list[tuple[int, int]]:
    """(offset, length) chunk list covering `data` exactly; average chunk
    ~2^mask_bits bytes between min_size and max_size."""
    n = len(data)
    if n == 0:
        return []
    if n <= min_size:
        return [(0, n)]
    mask = np.uint64((1 << mask_bits) - 1)
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b] & mask  # only low bits survive the final mask anyway
    acc = np.zeros(n, dtype=np.uint64)
    for k in range(mask_bits):
        # gear[b[i-k]] << k contributes to H(i): shift the SERIES right by k
        acc[k:] += g[: n - k] << np.uint64(k)
    cand = np.nonzero((acc & mask) == 0)[0]
    cuts = []
    start = 0
    while n - start > min_size:
        lo = start + min_size - 1  # earliest eligible cut (len >= min_size)
        hi = min(start + max_size - 1, n - 1)  # forced cut at len == max_size
        ci = int(np.searchsorted(cand, lo))
        end = (int(cand[ci]) + 1) if ci < len(cand) and cand[ci] < hi else hi + 1
        cuts.append((start, end - start))
        start = end
    if start < n:
        cuts.append((start, n - start))
    return cuts


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    min_size: int = 64,
    mask_bits: int = 8,
    max_size: int = 1024,
) -> DataFrame:
    """(id, chunk_idx, offset, length, chunk_hash): content-defined chunks
    of a binary payload column; chunk_hash is md5 hex of the chunk bytes
    (fixed-width downstream dedup key)."""
    import hashlib

    out_schema = (
        f"{id_col} long, chunk_idx long, offset long, length long, "
        "chunk_hash string"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                for idx, (off, ln) in enumerate(
                    chunk_offsets(data, min_size, mask_bits, max_size)
                ):
                    rows.append(
                        (
                            did,
                            idx,
                            off,
                            ln,
                            hashlib.md5(data[off : off + ln]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "chunk_idx", "offset", "length", "chunk_hash"],
            )

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)


def cdc_shared_chunks(chunks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(chunk_hash, n_docs, n_occurrences) for chunks appearing in more
    than one document — the CDC dedup ledger; shuffles hashes only."""
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count_distinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") > 1)
    )
