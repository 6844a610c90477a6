"""Product quantization (PQ) for embedding compression + ADC search.

Jégou et al. 2011 ("Product quantization for nearest neighbor search"):
split each dim-D vector into M subvectors, k-means each subspace to KSUB
codewords, and store every vector as M small integer codes.  At 10^10
vectors this is THE storage story the flat scan cannot tell: 64-dim float32
embeddings are 256 bytes/vector (2.5 TB/10^10); M=4 codes are 4 bytes
(40 GB) — the difference between an ANN scan that fits executor page cache
and one that re-reads a parquet lake every query batch.  Search runs ADC
(asymmetric distance): per query, an M x KSUB table of exact
query-subvector-to-codeword distances; a document's distance is M table
lookups summed — no decode, no float vector ever materialized.

Scale design (the 100-TB story):
  * Training runs per subspace on the SAME map-side-combined explode
    shuffle as operators/clustering.py's Lloyd (<= KSUB*DSUB rows per map
    task per subspace); the codebooks (M x KSUB x DSUB float64 — kilobytes)
    are the only driver state.  At corpus scale you train on a bounded
    sample and encode everything — encode cost dominates and is embarrassed.
  * Encoding is ONE zero-shuffle Arrow pass: all M codebooks ride the UDF
    closure; per batch, M BLAS matmuls produce the argmin code per subspace.
  * ADC search is ONE zero-shuffle Arrow pass over the codes table (the
    NQ x M x KSUB distance tables ride the closure — the broadcast-side
    analog) + one top-k (TakeOrdered — never a global sort).

Cross-engine determinism (oracle parity discipline, __spark_entry__ header):
identical to clustering.py — distances rounded to 9 before argmin (ties to
the LOWEST code), centroid means rounded 6 per iteration, init = the KSUB
smallest ids' subvectors, empty cells keep their codeword, no RNG.  The SQL
twin replays the ENTIRE per-subspace training + encode as M parallel
unrolled-CTE chains, so a parity match certifies the multi-subspace
iterative job end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
)
from pyspark.sql.window import Window


def pq_train(df: DataFrame, m: int = 4, ksub: int = 16, iters: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id") -> np.ndarray:
    """Train M per-subspace codebooks with clustering.py's Lloyd loop on
    each dim/M slice.  Returns codebooks shaped (m, ksub, dsub).

    m * iters jobs of the map-side-combined update shuffle; model-sized
    driver state.  (At corpus scale: call on a bounded .limit() sample.)"""
    from layerg_crawler_v2_spark.operators.clustering import kmeans_lloyd

    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("cannot train on an empty DataFrame")
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    books = []
    for s in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias("sub"),
        )
        _, C = kmeans_lloyd(sub, k=ksub, iters=iters,
                            vec_col="sub", id_col=id_col)
        books.append(C)
    return np.stack(books)


def _encode_udf(codebooks: np.ndarray, dist_decimals: int = 9):
    """embedding -> array of M nearest-codeword ids; M BLAS matmuls per
    Arrow batch, codebooks in closure."""
    from pyspark.sql.functions import pandas_udf

    B = np.ascontiguousarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, _, dsub = B.shape
    b_sq = (B * B).sum(axis=2)  # (m, ksub)

    @pandas_udf(ArrayType(IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        if X.size == 0:
            return pd.Series([], dtype=object)
        codes = np.empty((X.shape[0], m), dtype=np.int32)
        for s in range(m):
            Xs = X[:, s * dsub:(s + 1) * dsub]
            d2 = (Xs * Xs).sum(1)[:, None] - 2.0 * (Xs @ B[s].T) + b_sq[s][None, :]
            codes[:, s] = np.argmin(np.round(d2, dist_decimals), axis=1)
        return pd.Series(list(codes))

    return encode


def pq_encode(df: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, code_0..code_{m-1}) — the zero-shuffle encode pass."""
    m = codebooks.shape[0]
    coded = df.select(
        F.col(id_col),
        _encode_udf(codebooks)(F.col(vec_col)).alias("codes"),
    )
    return coded.select(
        id_col,
        *[F.element_at("codes", s + 1).alias(f"code{s}") for s in range(m)],
    )


def pq_adc_topk(codes_df: DataFrame, queries: np.ndarray, query_ids: list,
                codebooks: np.ndarray, k: int = 5,
                id_col: str = "vec_id") -> DataFrame:
    """ADC top-k: (q_id, id, adc_dist) for each query's k nearest codes.
    Distance tables (NQ x M x KSUB exact query-to-codeword L2^2, summed per
    doc from its codes, rounded 9) ride the Arrow closure; ties break to
    the lowest id.  One zero-shuffle scoring pass + one top-k shuffle."""
    from pyspark.sql.functions import pandas_udf

    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    Q = np.ascontiguousarray(queries, dtype=np.float64)
    # tables[q, s, c] = |Q[q, s*dsub:(s+1)*dsub] - B[s, c]|^2, rounded 9 per
    # entry BEFORE summing — the oracle rounds each subspace distance, then
    # the sum; matching the order keeps the parity exact.
    tables = np.empty((len(Q), m, ksub))
    for s in range(m):
        Qs = Q[:, s * dsub:(s + 1) * dsub]
        tables[:, s, :] = (
            (Qs * Qs).sum(1)[:, None] - 2.0 * (Qs @ B[s].T)
            + (B[s] * B[s]).sum(1)[None, :]
        )
    tables = np.round(tables, 9)

    @pandas_udf(ArrayType(DoubleType()))
    def adc(codes: pd.Series) -> pd.Series:
        C = np.array(codes.tolist(), dtype=np.int64)  # (rows, m)
        if C.size == 0:
            return pd.Series([], dtype=object)
        # d[q, row] = sum_s tables[q, s, C[row, s]]
        d = np.zeros((tables.shape[0], C.shape[0]))
        for s in range(m):
            d += tables[:, s, C[:, s]]
        return pd.Series(list(np.round(d.T, 9)))

    m_cols = [f"code{s}" for s in range(m)]
    scored = codes_df.select(
        F.col(id_col),
        F.posexplode(adc(F.array(*m_cols))).alias("qpos", "adc_dist"),
    )
    qid = F.element_at(
        F.array(*[F.lit(int(q)) for q in query_ids]), F.col("qpos") + 1
    )
    scored = scored.select(qid.alias("q_id"), id_col, "adc_dist")
    rn = F.row_number().over(
        Window.partitionBy("q_id").orderBy(
            F.col("adc_dist").asc(), F.col(id_col).asc()
        )
    )
    return (
        scored.withColumn("rn", rn).filter(F.col("rn") <= k)
        .select("q_id", id_col, "adc_dist")
    )


# --------------------------------------------------------------------------
# IVF-PQ: coarse quantizer prunes, PQ-on-residuals scores (the FAISS IVFPQ
# architecture, composed from clustering.kmeans_lloyd + the codecs above)
# --------------------------------------------------------------------------

def ivfpq_build(df: DataFrame, n_clusters: int = 8, m: int = 4,
                ksub: int = 16, iters: int = 2,
                vec_col: str = "embedding", id_col: str = "vec_id",
                ) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Build the IVF-PQ index: coarse-quantize every vector to its nearest
    L2 centroid, then PQ-encode the RESIDUAL (x - centroid) — residuals
    are what PQ compresses well, because the coarse step has already
    removed the between-cluster variance (Jégou et al. 2011 §III).

    Returns (index_df, coarse_centroids, codebooks) with index_df =
    (id, cluster, code0..code{m-1}).  At 100-TB scale index_df is written
    PARTITIONED BY cluster, so a probe prunes to nprobe partitions of
    4-byte codes.  Index build after training is ONE zero-shuffle Arrow
    pass (coarse centroids + codebooks in closure)."""
    from layerg_crawler_v2_spark.operators.clustering import kmeans_lloyd

    from pyspark.sql.functions import pandas_udf

    _, coarse = kmeans_lloyd(df, k=n_clusters, iters=iters,
                             vec_col=vec_col, id_col=id_col)

    # residuals for PQ training: one Arrow pass; the PQ trainer then runs
    # its per-subspace Lloyd on the residual column.
    CC = np.ascontiguousarray(coarse, dtype=np.float64)
    cc_sq = (CC * CC).sum(axis=1)

    @pandas_udf(ArrayType(DoubleType()))
    def residual(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        if X.size == 0:
            return pd.Series([], dtype=object)
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ CC.T) + cc_sq[None, :]
        a = np.argmin(np.round(d2, 9), axis=1)
        return pd.Series(list(X - CC[a]))

    resid_df = df.select(
        F.col(id_col), residual(F.col(vec_col)).alias("resid")
    )
    books = pq_train(resid_df, m=m, ksub=ksub, iters=iters,
                     vec_col="resid", id_col=id_col)

    # index: cluster + residual codes in ONE pass (both models in closure)
    B = np.ascontiguousarray(books, dtype=np.float64)
    msub, _, dsub = B.shape
    b_sq = (B * B).sum(axis=2)
    out_schema = ArrayType(IntegerType())

    @pandas_udf(out_schema)
    def cluster_and_codes(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        if X.size == 0:
            return pd.Series([], dtype=object)
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ CC.T) + cc_sq[None, :]
        a = np.argmin(np.round(d2, 9), axis=1)
        R = X - CC[a]
        out = np.empty((X.shape[0], msub + 1), dtype=np.int32)
        out[:, 0] = a
        for s in range(msub):
            Rs = R[:, s * dsub:(s + 1) * dsub]
            dd = (Rs * Rs).sum(1)[:, None] - 2.0 * (Rs @ B[s].T) + b_sq[s][None, :]
            out[:, s + 1] = np.argmin(np.round(dd, 9), axis=1)
        return pd.Series(list(out))

    idx = df.select(
        F.col(id_col),
        cluster_and_codes(F.col(vec_col)).alias("cc"),
    ).select(
        id_col,
        F.element_at("cc", 1).alias("cluster"),
        *[F.element_at("cc", s + 2).alias(f"code{s}") for s in range(msub)],
    )
    # the index IS a materialized artifact (built once, probed many times):
    # the lazy barrier also stops a consumer's cluster-prune filter from
    # being pushed below the projection, which would re-run the encode UDF
    # in a second ArrowEvalPython (the r4s11 UDF-duplication sweep)
    idx = idx.localCheckpoint(eager=False)
    return idx, coarse, books


def ivfpq_topk(index_df: DataFrame, coarse: np.ndarray, books: np.ndarray,
               queries: np.ndarray, query_ids: list, k: int = 5,
               nprobe: int = 3, id_col: str = "vec_id") -> DataFrame:
    """IVF-PQ search: per query, probe the nprobe nearest coarse centroids;
    within probed clusters, ADC over the residual codes with PER-(query,
    cluster) distance tables (the residual tables differ per probed
    centroid — that's the price of residual encoding and why nprobe stays
    small).  Scan cost ≈ nprobe/n_clusters of the codes; the cluster filter
    is a partition-prune on a cluster-partitioned index.  Output
    (q_id, id, adc_dist) — approximate L2^2, ties to the lowest id."""
    from pyspark.sql.functions import pandas_udf

    CC = np.ascontiguousarray(coarse, dtype=np.float64)
    B = np.ascontiguousarray(books, dtype=np.float64)
    m, ksub, dsub = B.shape
    Q = np.ascontiguousarray(queries, dtype=np.float64)
    nq = len(Q)

    # probes[q] = the nprobe nearest coarse cells (L2, rounded, ties low)
    d2 = (Q * Q).sum(1)[:, None] - 2.0 * (Q @ CC.T) + (CC * CC).sum(1)[None, :]
    order = np.argsort(np.round(d2, 9), axis=1, kind="stable")
    probes = order[:, :nprobe]                      # (nq, nprobe)
    probed_cells = sorted({int(c) for row in probes for c in row})

    # tables[q, cell, s, c] = |(Q[q]-CC[cell])_s - B[s, c]|^2 for probed
    # cells, rounded; inf rows stay masked out via probe_mask below
    tables = np.full((nq, CC.shape[0], m, ksub), np.inf)
    for qi in range(nq):
        for c in probes[qi]:
            R = Q[qi] - CC[c]
            for s in range(m):
                Rs = R[s * dsub:(s + 1) * dsub]
                tables[qi, c, s, :] = (
                    (Rs * Rs).sum() - 2.0 * (B[s] @ Rs) + (B[s] * B[s]).sum(1)
                )
    tables = np.round(tables, 9)
    probe_mask = np.zeros((nq, CC.shape[0]), dtype=bool)
    for qi in range(nq):
        probe_mask[qi, probes[qi]] = True

    @pandas_udf(ArrayType(DoubleType()))
    def adc(cc: pd.Series) -> pd.Series:
        A = np.array(cc.tolist(), dtype=np.int64)   # (rows, m+1): cluster+codes
        if A.size == 0:
            return pd.Series([], dtype=object)
        cl, codes = A[:, 0], A[:, 1:]
        d = np.zeros((nq, A.shape[0]))
        for s in range(m):
            d += tables[:, cl, s, codes[:, s]]      # (nq, rows) gather
        d = np.round(d, 9)
        d[~probe_mask[:, cl]] = np.nan              # not probed by this query
        return pd.Series(list(d.T))

    m_cols = ["cluster"] + [f"code{s}" for s in range(m)]
    scored = (
        index_df.filter(F.col("cluster").isin(probed_cells))
        .select(
            F.col(id_col),
            F.posexplode(adc(F.array(*m_cols))).alias("qpos", "adc_dist"),
        )
        # the unprobed-cell NaN mask arrives as NULL through Arrow; guard
        # both spellings or NULLs sort FIRST in the ascending rank below
        .filter(F.col("adc_dist").isNotNull() & ~F.isnan("adc_dist"))
    )
    qid = F.element_at(
        F.array(*[F.lit(int(q)) for q in query_ids]), F.col("qpos") + 1
    )
    scored = scored.select(qid.alias("q_id"), id_col, "adc_dist")
    rn = F.row_number().over(
        Window.partitionBy("q_id").orderBy(
            F.col("adc_dist").asc(), F.col(id_col).asc()
        )
    )
    return (
        scored.withColumn("rn", rn).filter(F.col("rn") <= k)
        .select("q_id", id_col, "adc_dist")
    )


# --------------------------------------------------------------------------
# SQL oracles: per-subspace Lloyd chains + encode (+ ADC on top)
# --------------------------------------------------------------------------

def _sub_chain_sql(s: int, ksub: int, iters: int, dsub: int) -> str:
    lo, hi = s * dsub + 1, (s + 1) * dsub
    parts = [f"""emb_{s} AS (
  SELECT vid, list_transform(e[{lo}:{hi}], v -> CAST(v AS DOUBLE)) AS e FROM emb
), cent_{s}_0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS INT) AS c, e AS cent
  FROM (SELECT * FROM emb_{s} ORDER BY vid LIMIT {ksub})
)"""]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""", asg_{s}_{i} AS (
  SELECT vid, e,
         min(struct_pack(d := round(
             list_dot_product(e, e) - 2 * list_dot_product(e, cent)
             + list_dot_product(cent, cent), 9), c := c)) AS best
  FROM emb_{s} CROSS JOIN cent_{s}_{p}
  GROUP BY vid, e
), cent_{s}_{i} AS (
  SELECT c0.c, coalesce(n.cent, c0.cent) AS cent
  FROM cent_{s}_{p} c0 LEFT JOIN (
    SELECT c, list(m ORDER BY pos) AS cent FROM (
      SELECT best.c AS c, pos, round(avg(v), 6) AS m FROM (
        SELECT best, unnest(e) AS v, unnest(range(1, {dsub + 1})) AS pos
        FROM asg_{s}_{i}
      ) GROUP BY best.c, pos
    ) GROUP BY c
  ) n USING (c)
)""")
    parts.append(f""", code_{s} AS (
  SELECT vid, min(struct_pack(d := round(
             list_dot_product(e, e) - 2 * list_dot_product(e, cent)
             + list_dot_product(cent, cent), 9), c := c)).c AS code
  FROM emb_{s} CROSS JOIN cent_{s}_{iters}
  GROUP BY vid
)""")
    return "".join(parts)


def pq_oracle_sql(m: int = 4, ksub: int = 16, iters: int = 2, dim: int = 64,
                  table: str = "embeddings", id_col: str = "vec_id",
                  vec_col: str = "embedding") -> str:
    """Train + encode, all in SQL: M parallel unrolled Lloyd chains on the
    list slices, joined on vid into (id, code0..code{m-1})."""
    dsub = dim // m
    chains = "".join(
        (", " if s else "") + _sub_chain_sql(s, ksub, iters, dsub)
        for s in range(m)
    )
    joins = " ".join(f"JOIN code_{s} c{s} USING (vid)" for s in range(1, m))
    cols = ", ".join(f"c{s}.code AS code{s}" for s in range(m))
    return f"""WITH emb AS (
  SELECT {id_col} AS vid, {vec_col} AS e FROM {table}
), {chains}
SELECT c0.vid AS {id_col}, {cols}
FROM code_0 c0 {joins}"""


def pq_adc_oracle_sql(nq: int = 3, k: int = 5, m: int = 4, ksub: int = 16,
                      iters: int = 2, dim: int = 64,
                      table: str = "embeddings", id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    """pq_oracle_sql's chains + ADC search for the nq smallest-id vectors as
    queries: per (query, doc, subspace) the exact query-slice-to-codeword
    L2^2 via the trained cent_{s}_{iters}, summed and rounded 9, top-k per
    query by (dist, id)."""
    dsub = dim // m
    chains = "".join(
        (", " if s else "") + _sub_chain_sql(s, ksub, iters, dsub)
        for s in range(m)
    )
    per_sub = "\nUNION ALL\n".join(f"""  SELECT q.qid, cd.vid,
         round(list_dot_product(q.e_{s}, q.e_{s})
               - 2 * list_dot_product(q.e_{s}, ct.cent)
               + list_dot_product(ct.cent, ct.cent), 9) AS d
  FROM qry q, code_{s} cd JOIN cent_{s}_{iters} ct ON ct.c = cd.code""" for s in range(m))
    q_slices = ", ".join(
        f"list_transform(e[{s * dsub + 1}:{(s + 1) * dsub}], "
        f"v -> CAST(v AS DOUBLE)) AS e_{s}"
        for s in range(m)
    )
    return f"""WITH emb AS (
  SELECT {id_col} AS vid, {vec_col} AS e FROM {table}
), {chains}, qry AS (
  SELECT vid AS qid, {q_slices}
  FROM emb ORDER BY vid LIMIT {nq}
), dists AS (
{per_sub}
), summed AS (
  SELECT qid AS q_id, vid, round(sum(d), 9) AS adc_dist
  FROM dists GROUP BY qid, vid
)
SELECT q_id, vid AS {id_col}, adc_dist FROM (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY adc_dist, vid) AS rn
  FROM summed
) WHERE rn <= {k}"""
