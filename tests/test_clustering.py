"""k-means (Lloyd) + SemDeDup: numpy-reference parity, determinism across
parallelism, planted-near-dup behavior, and scale-shape invariants.

The SQL-oracle twin is exercised by tests/test_oracle_parity.py
(embedding_kmeans_assign / semantic_dedup_clusters); these tests pin the
semantics the oracle cannot see — blocked gram equivalence, partition-count
independence, and that SemDeDup actually drops planted near-duplicates."""

from __future__ import annotations

import numpy as np
import pytest

from layerg_crawler_v2_spark.operators.clustering import (
    kmeans_assign,
    kmeans_lloyd,
    semantic_dedup,
)

K, ITERS, DIM = 5, 3, 16


def _corpus(n=120, dim=DIM, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(K, dim)) * 2.0
    E = centers[rng.integers(0, K, n)] + rng.normal(size=(n, dim)) * 0.3
    return E.astype(np.float32)


def _ref_kmeans(E64, k=K, iters=ITERS):
    C = E64[:k].copy()
    for _ in range(iters):
        d2 = np.round(
            (E64 * E64).sum(1)[:, None] - 2 * (E64 @ C.T) + (C * C).sum(1), 9
        )
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = np.round(E64[a == c].mean(0), 6)
    d2 = np.round(
        (E64 * E64).sum(1)[:, None] - 2 * (E64 @ C.T) + (C * C).sum(1), 9
    )
    return np.argmin(d2, axis=1), C


def _df(spark, E, parts=4):
    rows = [(i, [float(x) for x in E[i]]) for i in range(len(E))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(parts) if parts else df


def test_kmeans_matches_numpy_reference(spark):
    E = _corpus()
    assign, C = kmeans_lloyd(_df(spark, E), k=K, iters=ITERS)
    got = dict(assign.collect())
    ref_a, ref_C = _ref_kmeans(E.astype(np.float64))
    assert got == {i: int(c) for i, c in enumerate(ref_a)}
    np.testing.assert_allclose(C, ref_C, atol=1e-6)


def test_kmeans_partition_count_invariant(spark):
    """Same assignment at 1 and 8 partitions — centroid rounding absorbs
    partial-sum order noise, so parallelism never changes the model."""
    E = _corpus(seed=11)
    a1, _ = kmeans_lloyd(_df(spark, E, parts=1), k=K, iters=ITERS)
    a8, _ = kmeans_lloyd(_df(spark, E, parts=8), k=K, iters=ITERS)
    assert sorted(a1.collect()) == sorted(a8.collect())


def test_kmeans_clusters_planted_centers(spark):
    """Docs drawn around the same planted center end in the same cluster
    (well-separated centers, tight noise)."""
    rng = np.random.default_rng(3)
    centers = np.eye(K, DIM) * 10.0
    labels = rng.integers(0, K, 100)
    E = (centers[labels] + rng.normal(size=(100, DIM)) * 0.05).astype(np.float32)
    assign, _ = kmeans_lloyd(_df(spark, E), k=K, iters=4)
    got = dict(assign.collect())
    for lab in range(K):
        ids = [i for i in range(100) if labels[i] == lab]
        assert len({got[i] for i in ids}) == 1


def test_semdedup_drops_planted_near_dups(spark):
    """Perturbed copies (cosine ~0.999) are dropped; the lowest id of each
    dup family is kept; unrelated docs survive. The base corpus is
    isotropic-random (NOT the planted-center one) so no natural pair
    reaches tau=0.99."""
    E = np.random.default_rng(5).normal(size=(60, DIM)).astype(np.float32)
    # rows 100.. are tiny perturbations of rows 0..9
    dup = E[:10] + np.random.default_rng(9).normal(size=(10, DIM)).astype(np.float32) * 1e-3
    rows = [(i, [float(x) for x in E[i]]) for i in range(60)]
    rows += [(100 + i, [float(x) for x in dup[i]]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(4)
    assign, _ = kmeans_lloyd(df, k=K, iters=ITERS)
    out = {r["vec_id"]: r for r in semantic_dedup(df, assign, tau=0.99).collect()}
    assert len(out) == 70
    for i in range(10):
        assert out[i]["kept"], f"original {i} must be kept"
        assert not out[100 + i]["kept"], f"perturbed copy {100+i} must drop"
        assert out[i]["cluster"] == out[100 + i]["cluster"]
    # near-orthogonal non-dups all kept
    assert all(out[i]["kept"] for i in range(10, 60))


def test_semdedup_block_size_invariant(spark):
    """Blocked gram (block=3) == one-shot gram (block large): the blocking
    is a memory shape, never a semantics knob."""
    E = _corpus(n=40, seed=13)
    df = _df(spark, E)
    assign, _ = kmeans_lloyd(df, k=K, iters=2)
    small = sorted(semantic_dedup(df, assign, tau=0.8, block=3).collect())
    big = sorted(semantic_dedup(df, assign, tau=0.8, block=4096).collect())
    assert small == big


def test_kmeans_assign_zero_shuffle(spark):
    """The scoring pass plan has no Exchange — one Arrow projection."""
    E = _corpus(n=30)
    _, C = kmeans_lloyd(_df(spark, E), k=K, iters=1)
    flat = _df(spark, E, parts=None)  # repartition would itself be an Exchange
    plan = kmeans_assign(flat, C)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kmeans_needs_k_rows(spark):
    E = _corpus(n=3)
    with pytest.raises(ValueError, match="need >= k"):
        kmeans_lloyd(_df(spark, E), k=K, iters=1)
