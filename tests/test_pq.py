"""Product quantization: numpy-reference parity of train+encode, partition
independence, and ADC search quality (self-retrieval + recall vs the exact
uncompressed scan) on a planted clustered corpus.

The SQL-oracle twins (per-subspace Lloyd chains + encode, and ADC top-k)
are exercised by tests/test_oracle_parity.py (pq_encode_codes /
pq_ann_adc_topk)."""

from __future__ import annotations

import numpy as np
import pytest

from layerg_crawler_v2_spark.operators.pq import (
    ivfpq_build,
    ivfpq_topk,
    pq_adc_topk,
    pq_encode,
    pq_train,
)

DIM, M, KSUB, ITERS = 32, 4, 8, 2
DSUB = DIM // M


def _corpus(n=160, seed=3):
    """Clustered per-subspace so PQ codes carry real signal."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(KSUB, DIM)) * 3.0
    labels = rng.integers(0, KSUB, n)
    X = centers[labels] + rng.normal(size=(n, DIM)) * 0.25
    return X.astype(np.float32), labels


def _ref_pq(X64):
    books, codes = [], np.zeros((len(X64), M), dtype=np.int64)
    for s in range(M):
        Xs = X64[:, s * DSUB:(s + 1) * DSUB]
        C = Xs[:KSUB].copy()
        for _ in range(ITERS):
            d2 = (Xs * Xs).sum(1)[:, None] - 2 * (Xs @ C.T) + (C * C).sum(1)
            a = np.argmin(np.round(d2, 9), axis=1)
            newC = C.copy()
            for c in range(KSUB):
                if (a == c).any():
                    newC[c] = np.round(Xs[a == c].mean(0), 6)
            C = newC
        d2 = (Xs * Xs).sum(1)[:, None] - 2 * (Xs @ C.T) + (C * C).sum(1)
        codes[:, s] = np.argmin(np.round(d2, 9), axis=1)
        books.append(C)
    return np.stack(books), codes


def _df(spark, X, parts=4):
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>"
    ).repartition(parts)


def test_train_encode_matches_numpy(spark):
    X, _ = _corpus()
    books = pq_train(_df(spark, X), m=M, ksub=KSUB, iters=ITERS)
    books_ref, codes_ref = _ref_pq(X.astype(np.float64))
    assert np.array_equal(books, books_ref)
    got = {
        r["vec_id"]: tuple(r[f"code{s}"] for s in range(M))
        for r in pq_encode(_df(spark, X), books).collect()
    }
    for i in range(len(X)):
        assert got[i] == tuple(codes_ref[i])


def test_partition_count_independent(spark):
    X, _ = _corpus(n=64)
    b2 = pq_train(_df(spark, X, parts=2), m=M, ksub=KSUB, iters=ITERS)
    b16 = pq_train(_df(spark, X, parts=16), m=M, ksub=KSUB, iters=ITERS)
    assert np.array_equal(b2, b16)


def test_adc_self_retrieval_and_cluster_recall(spark):
    """Corpus vectors as queries: ADC must put the vector itself in its
    top-5 nearly always, and the top-5 must come from the query's planted
    cluster — within-cluster members share codes (ADC ties, broken by id),
    so cluster membership, not exact float rank, is what the 4x8-codeword
    compression guarantees."""
    X, labels = _corpus(n=120)
    df = _df(spark, X)
    books = pq_train(df, m=M, ksub=KSUB, iters=ITERS)
    codes = pq_encode(df, books)
    qids = list(range(0, 40))
    out = pq_adc_topk(codes, X[qids].astype(np.float64), qids, books, k=5)
    top = {}
    for r in out.collect():
        top.setdefault(r["q_id"], []).append(r["vec_id"])
    self_hits, same_cluster = 0, []
    for q in qids:
        assert len(top[q]) == 5
        self_hits += q in top[q]
        same_cluster.append(
            np.mean([labels[v] == labels[q] for v in top[q]])
        )
    assert self_hits >= 36  # >= 90% self-retrieval
    assert float(np.mean(same_cluster)) >= 0.9


def test_dim_not_divisible_raises(spark):
    X = _corpus(n=20)[0][:, : DIM - 1]
    with pytest.raises(ValueError):
        pq_train(_df(spark, X), m=M, ksub=KSUB, iters=1)


# --- IVF-PQ (coarse prune + residual codes) ----------------------------------

def test_ivfpq_prunes_and_retrieves(spark):
    """IVF-PQ: results only come from each query's probed cells (the
    partition-prune contract), self-retrieval holds, and top-5 stays in
    the query's planted cluster."""
    X, labels = _corpus(n=120)
    df = _df(spark, X)
    idx, coarse, books = ivfpq_build(df, n_clusters=8, m=M, ksub=KSUB,
                                     iters=ITERS)
    idx_rows = {r["vec_id"]: r["cluster"] for r in idx.collect()}
    qids = list(range(0, 24))
    out = ivfpq_topk(idx, coarse, books, X[qids].astype(np.float64),
                     qids, k=5, nprobe=3)
    # recompute each query's probed cells the same way the operator does
    CC = coarse
    d2 = ((X[qids].astype(np.float64)[:, None, :] - CC[None]) ** 2).sum(-1)
    probes = {q: set(np.argsort(np.round(d2[i], 9), kind="stable")[:3].tolist())
              for i, q in enumerate(qids)}
    top, self_hits, same = {}, 0, []
    for r in out.collect():
        top.setdefault(r["q_id"], []).append(r["vec_id"])
        assert idx_rows[r["vec_id"]] in probes[r["q_id"]], "unprobed cell leaked"
    for q in qids:
        assert len(top[q]) == 5
        self_hits += q in top[q]
        same.append(np.mean([labels[v] == labels[q] for v in top[q]]))
    assert self_hits >= 22  # >= 90%
    assert float(np.mean(same)) >= 0.9


def test_ivfpq_index_partition_independent(spark):
    X, _ = _corpus(n=80)
    i2, c2, b2 = ivfpq_build(_df(spark, X, parts=2), n_clusters=4, m=M,
                             ksub=KSUB, iters=ITERS)
    i16, c16, b16 = ivfpq_build(_df(spark, X, parts=16), n_clusters=4, m=M,
                                ksub=KSUB, iters=ITERS)
    assert np.array_equal(c2, c16) and np.array_equal(b2, b16)
    assert sorted(map(tuple, i2.collect())) == sorted(map(tuple, i16.collect()))


def test_ivfpq_residuals_beat_plain_pq(spark):
    """Residual encoding must reconstruct better than plain PQ at the same
    code budget: mean ADC distance of each vector to ITSELF (query = the
    vector) is smaller under IVF-PQ — the reason FAISS encodes residuals."""
    X, _ = _corpus(n=100)
    df = _df(spark, X)
    qids = list(range(0, 30))
    Q = X[qids].astype(np.float64)

    idx, coarse, books = ivfpq_build(df, n_clusters=8, m=M, ksub=KSUB,
                                     iters=ITERS)
    ivf_out = ivfpq_topk(idx, coarse, books, Q, qids, k=1, nprobe=8)
    ivf_self = {r["q_id"]: r["adc_dist"] for r in ivf_out.collect()
                if r["vec_id"] == r["q_id"]}

    pbooks = pq_train(df, m=M, ksub=KSUB, iters=ITERS)
    codes = pq_encode(df, pbooks)
    pq_out = pq_adc_topk(codes, Q, qids, pbooks, k=1)
    pq_self = {r["q_id"]: r["adc_dist"] for r in pq_out.collect()
               if r["vec_id"] == r["q_id"]}

    common = set(ivf_self) & set(pq_self)
    assert len(common) >= 15
    assert np.mean([ivf_self[q] for q in common]) < np.mean(
        [pq_self[q] for q in common]
    )
