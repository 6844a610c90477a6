"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) — parity against
a pure-Python reference, the paper's coverage guarantee, tie-break rule,
and the candidate-pair join."""

from __future__ import annotations

import hashlib
import random

import pytest

from layerg_crawler_v2_spark.operators.dedup import (
    winnow_candidate_pairs,
    winnow_fingerprints,
)

K, W = 8, 4


def _ref_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, str]]:
    """Sequential robust winnowing: min hash per window, ties rightmost,
    selected set deduped. Positions 1-based."""
    grams = [
        (hashlib.md5(text[i : i + k].encode()).hexdigest(), i + 1)
        for i in range(len(text) - k + 1)
    ]
    if not grams:
        return set()
    n_win = max(len(grams) - w + 1, 1)
    sel = set()
    for j in range(n_win):
        window = grams[j : j + w]
        best = window[0]
        for h, pos in window[1:]:
            if h < best[0] or (h == best[0] and pos > best[1]):
                best = (h, pos)
        sel.add((best[1], best[0]))
    return sel


def _spark_winnow(spark, texts: list[str]) -> dict[int, set[tuple[int, str]]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = winnow_fingerprints(df, k=K, w=W).collect()
    out: dict[int, set[tuple[int, str]]] = {i: set() for i in range(len(texts))}
    for r in rows:
        out[r["doc_id"]].add((r["pos"], r["fp"]))
    return out


def test_matches_sequential_reference(spark):
    rng = random.Random(20260819)
    texts = [
        "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 60)))
        for _ in range(40)
    ]
    got = _spark_winnow(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == _ref_winnow(t), f"doc {i}: {t!r}"


def test_short_doc_edges(spark):
    # < k chars: no grams, no fingerprints; k <= len < k+w-1: ONE window
    got = _spark_winnow(spark, ["abc", "abcdefgh", "abcdefghij"])
    assert got[0] == set()
    assert len(got[1]) == 1  # exactly one gram -> one selected
    assert got[2] == _ref_winnow("abcdefghij")  # 3 grams < w -> one window


def test_tie_breaks_rightmost(spark):
    # identical grams everywhere: every window's min is its RIGHTMOST gram
    text = "a" * 20  # 13 grams, windows j=1..10 select pos j+3
    got = _spark_winnow(spark, [text])[0]
    assert {pos for pos, _ in got} == {j + W - 1 for j in range(1, 11)}


def test_shared_substring_guarantee(spark):
    # any shared run of >= w+k-1 chars yields >= 1 common fingerprint HASH
    rng = random.Random(7)
    shared = "".join(rng.choice("xyzuvw") for _ in range(K + W - 1))
    a = "AAAA" + shared + "BBBBBBB"
    b = "CCCCCCCCCC" + shared + "DD"
    got = _spark_winnow(spark, [a, b])
    fps_a = {h for _, h in got[0]}
    fps_b = {h for _, h in got[1]}
    shared_grams = {
        hashlib.md5(shared[i : i + K].encode()).hexdigest()
        for i in range(len(shared) - K + 1)
    }
    assert fps_a & fps_b & shared_grams


def test_candidate_pairs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, base),
        (1, "PREFIX " + base),  # same content at a shifted offset
        (2, "completely different words here that overlap with nothing"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in winnow_candidate_pairs(df, k=K, w=W, min_shared=2).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert all(2 not in p for p in pairs)


# --- production-hash twin (winnow_fingerprints_xx) --------------------------

def _ref_winnow_xx(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Sequential reference for the xx family: same rolling polynomial +
    splitmix64, pure-Python 64-bit ints."""
    M = (1 << 64) - 1

    def mix64(x: int) -> int:
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & M
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & M
        x ^= x >> 31
        return x

    b = text.encode("utf-8")
    n_g = len(b) - k + 1
    if n_g < 1:
        return set()
    hs = []
    from layerg_crawler_v2_spark.operators.dedup import _WINNOW_FNV

    for i in range(n_g):
        acc = 0
        for j in range(k):
            acc = (acc * _WINNOW_FNV + b[i + j]) & M
        hs.append(mix64(acc))
    n_win = max(n_g - w + 1, 1)
    sel = set()
    for j in range(n_win):
        window = list(enumerate(hs[j : j + w]))
        best = window[0]
        for off, h in window[1:]:
            if h < best[1] or (h == best[1] and off > best[0]):
                best = (off, h)
        signed = best[1] - (1 << 64) if best[1] >= (1 << 63) else best[1]
        sel.add((j + best[0] + 1, signed))
    return sel


def test_xx_matches_sequential_reference(spark):
    from layerg_crawler_v2_spark.operators.dedup import winnow_fingerprints_xx

    rng = random.Random(42)
    texts = [
        "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 60)))
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set] = {i: set() for i in range(len(texts))}
    for r in winnow_fingerprints_xx(df, k=K, w=W).collect():
        got[r["doc_id"]].add((r["pos"], r["fp"]))
    for i, t in enumerate(texts):
        assert got[i] == _ref_winnow_xx(t), f"doc {i}: {t!r}"


def test_xx_shared_substring_guarantee(spark):
    from layerg_crawler_v2_spark.operators.dedup import winnow_fingerprints_xx

    rng = random.Random(99)
    shared = "".join(rng.choice("xyzuvw") for _ in range(K + W - 1))
    df = spark.createDataFrame(
        [(0, "AAAA" + shared + "BBBBBBB"), (1, "CCCCCCCCCC" + shared + "DD")],
        "doc_id long, text string",
    )
    fps: dict[int, set] = {0: set(), 1: set()}
    for r in winnow_fingerprints_xx(df, k=K, w=W).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[0] & fps[1]


# --- mirror-host detection ---------------------------------------------------

def test_mirror_hosts_planted(spark):
    from layerg_crawler_v2_spark.operators.dedup import mirror_host_pairs

    corpus = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long winter trip",
        "sphinx of black quartz judge my vow before the morning bell rings",
    ]
    rows = []
    # m1/m2: full mirrors (identical docs); solo: disjoint content
    for i, t in enumerate(corpus):
        rows.append((i, "m1", t))
        rows.append((100 + i, "m2", t))
    rows.append((200, "solo", "totally unrelated words live here in peace"))
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_host_pairs(df, max_hosts_per_fp=None).collect()
    }
    assert got[("m1", "m2")]["containment"] == 1.0
    assert ("m1", "solo") not in got and ("m2", "solo") not in got


def test_mirror_hosts_stop_filter(spark):
    from layerg_crawler_v2_spark.operators.dedup import mirror_host_pairs

    # every host shares one ubiquitous boilerplate line; only m1/m2 also
    # share real content. With max_hosts_per_fp=2 the boilerplate fps
    # (present on all 4 hosts) drop, so h3/h4 pair with nobody.
    boiler = "copyright footer navigation menu contact about terms of use"
    real = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, "m1", boiler), (1, "m1", real),
        (2, "m2", boiler), (3, "m2", real),
        (4, "h3", boiler), (5, "h3", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (6, "h4", boiler), (7, "h4", "one two three four five six seven eight nine ten eleven"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {
        (r["host_a"], r["host_b"])
        for r in mirror_host_pairs(df, max_hosts_per_fp=2).collect()
    }
    assert ("m1", "m2") in got
    assert all(p == ("m1", "m2") for p in got)
