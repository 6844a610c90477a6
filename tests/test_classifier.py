"""GD logistic-regression quality classifier: numpy-reference parity,
partition-count independence, and that the trainer actually LEARNS on
linearly-separable planted data (the driver fixture's labels are random
w.r.t. the embeddings, so the driver row certifies cross-engine parity of
the iterative job while this file certifies the statistics).

The SQL-oracle twin (full training run unrolled as CTEs) is exercised by
tests/test_oracle_parity.py (quality_classifier_train)."""

from __future__ import annotations

import numpy as np
import pytest

from layerg_crawler_v2_spark.operators.classifier import logreg_train_gd

DIM = 16


def _planted(n=200, dim=DIM, seed=11, margin=2.0):
    """Linearly separable corpus: y = 1 iff w_true . x > 0, with a margin."""
    rng = np.random.default_rng(seed)
    w_true = rng.normal(size=dim)
    w_true /= np.linalg.norm(w_true)
    X = rng.normal(size=(n, dim))
    z = X @ w_true
    X += np.sign(z)[:, None] * w_true[None, :] * margin  # push off the plane
    y = ((X @ w_true) > 0).astype(np.float64)
    return X.astype(np.float32), y


def _ref_train(X64, y, lr, iters):
    w = np.zeros(X64.shape[1])
    b = 0.0
    for _ in range(iters):
        p = np.round(1.0 / (1.0 + np.exp(-(X64 @ w + b))), 9)
        r = p - y
        w = np.round(w - lr * np.round((X64 * r[:, None]).mean(0), 9), 6)
        b = round(b - lr * round(float(np.round(r.mean(), 9)), 9), 6)
    p = np.round(1.0 / (1.0 + np.exp(-(X64 @ w + b))), 9)
    return w, b, p


def _df(spark, X, y, parts=4):
    rows = [
        (i, [float(v) for v in X[i]], float(y[i]))
        for i in range(len(y))
    ]
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, y: double"
    ).repartition(parts)


def test_matches_numpy_reference(spark):
    X, y = _planted()
    df = _df(spark, X, y)
    scores, w, b = logreg_train_gd(df, lr=4.0, iters=5)
    w_ref, b_ref, p_ref = _ref_train(X.astype(np.float64), y, lr=4.0, iters=5)
    assert np.allclose(w, w_ref, atol=0) and b == b_ref
    got = {r["vec_id"]: (r["prob"], r["pred"]) for r in scores.collect()}
    for i, p in enumerate(p_ref):
        assert got[i] == (round(float(p), 6), bool(p >= 0.5))


def test_learns_separable_data(spark):
    X, y = _planted()
    scores, _, _ = logreg_train_gd(_df(spark, X, y), lr=4.0, iters=8)
    got = {r["vec_id"]: r for r in scores.collect()}
    acc = np.mean([got[i]["pred"] == bool(y[i]) for i in range(len(y))])
    assert acc >= 0.95
    pos = np.mean([got[i]["prob"] for i in range(len(y)) if y[i] == 1.0])
    neg = np.mean([got[i]["prob"] for i in range(len(y)) if y[i] == 0.0])
    assert pos > 0.8 and neg < 0.2


def test_partition_count_independent(spark):
    """Rounded gradients make the model partition-order-free: 2 vs 16
    partitions train the identical model and scores."""
    X, y = _planted(n=80)
    a, wa, ba = logreg_train_gd(_df(spark, X, y, parts=2), lr=2.0, iters=3)
    b, wb, bb = logreg_train_gd(_df(spark, X, y, parts=16), lr=2.0, iters=3)
    assert np.array_equal(wa, wb) and ba == bb
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_empty_input_raises(spark):
    df = _df(spark, np.zeros((1, DIM), dtype=np.float32), np.zeros(1)).filter(
        "vec_id < 0"
    )
    with pytest.raises(ValueError):
        logreg_train_gd(df)
