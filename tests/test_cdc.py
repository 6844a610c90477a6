"""Content-defined chunking (operators/cdc.py): coverage/limits invariants,
the re-synchronization property that justifies CDC over fixed windows, and
the distributed shared-chunk ledger."""

from __future__ import annotations

import random

import pytest

from layerg_crawler_v2_spark.operators.cdc import (
    cdc_chunks,
    cdc_shared_chunks,
    chunk_offsets,
)

MIN, BITS, MAX = 64, 8, 1024


def _rand_bytes(seed, n):
    rng = random.Random(seed)
    return bytes(rng.getrandbits(8) for _ in range(n))


def test_chunks_cover_exactly_and_respect_limits():
    data = _rand_bytes(1, 20_000)
    cuts = chunk_offsets(data, MIN, BITS, MAX)
    assert cuts[0][0] == 0
    assert sum(ln for _, ln in cuts) == len(data)
    for (o1, l1), (o2, _) in zip(cuts, cuts[1:]):
        assert o1 + l1 == o2
    assert all(ln <= MAX for _, ln in cuts)
    assert all(ln >= MIN for _, ln in cuts[:-1])  # only the tail may be short
    # average chunk size in the right ballpark for random bytes
    # (content target 2^8, min-gated to >= MIN, so expect ~MIN..4*2^BITS)
    avg = len(data) / len(cuts)
    assert MIN <= avg <= 4 * (1 << BITS)


def test_deterministic():
    data = _rand_bytes(2, 5_000)
    assert chunk_offsets(data, MIN, BITS, MAX) == chunk_offsets(data, MIN, BITS, MAX)


def test_resync_after_insertion():
    """Insert bytes near the front: all but the first few chunks realign —
    the content-defined property a fixed-window chunker cannot have."""
    base = _rand_bytes(3, 30_000)
    edited = base[:100] + _rand_bytes(4, 37) + base[100:]
    import hashlib

    def hashes(d):
        return [
            hashlib.md5(d[o : o + ln]).hexdigest()
            for o, ln in chunk_offsets(d, MIN, BITS, MAX)
        ]

    h1, h2 = hashes(base), hashes(edited)
    # common suffix of chunk hash sequences covers almost everything
    k = 0
    while k < min(len(h1), len(h2)) and h1[-1 - k] == h2[-1 - k]:
        k += 1
    assert k >= len(h1) - 4, f"only {k}/{len(h1)} tail chunks realigned"


def test_empty_and_tiny_payloads():
    assert chunk_offsets(b"", MIN, BITS, MAX) == []
    assert chunk_offsets(b"xy", MIN, BITS, MAX) == [(0, 2)]
    assert chunk_offsets(_rand_bytes(5, MIN), MIN, BITS, MAX) == [(0, MIN)]


def test_distributed_chunks_match_local_and_ledger(spark):
    docs = [
        (1, _rand_bytes(10, 9_000)),
        (2, _rand_bytes(11, 7_000)),
        (3, None),
    ]
    # doc 4 shares doc 1's middle at a DIFFERENT byte offset
    docs.append((4, _rand_bytes(12, 501) + docs[0][1][2000:8000]))
    df = spark.createDataFrame(docs, "doc_id long, payload binary")
    out = cdc_chunks(df).cache()
    got = {
        d: sorted(
            (r.chunk_idx, r.offset, r.length, r.chunk_hash)
            for r in out.filter(f"doc_id = {d}").collect()
        )
        for d in (1, 2, 3, 4)
    }
    import hashlib

    for d, payload in docs:
        data = payload or b""
        want = [
            (i, o, ln, hashlib.md5(data[o : o + ln]).hexdigest())
            for i, (o, ln) in enumerate(chunk_offsets(data, MIN, BITS, MAX))
        ]
        assert got[d] == sorted(want), f"doc {d}"
    shared = {r.chunk_hash for r in cdc_shared_chunks(out).collect()}
    doc1 = {h for (_, o, ln, h) in got[1] if 2000 < o and o + ln < 8000}
    # the offset-shifted shared region re-synchronizes into common chunks
    assert len(shared & doc1) >= len(doc1) - 2 and doc1
