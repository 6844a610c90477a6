"""Distributed k-means (Lloyd) over embedding columns + SemDeDup-style
semantic dedup.

A training-data curation pipeline clusters its embedding table for two jobs
the flat operators here already feed: IVF-style partitioning of the ANN scan
(similarity.py samples centroids; this module TRAINS them) and SemDeDup
(Abbas et al., 2023): drop documents whose embedding is near-identical to
another member of the same cluster, so the pairwise-cosine cost is bounded
per cluster instead of O(n^2) corpus-wide.

Scale design (the 100-TB story):
  * Assignment is one vectorized Arrow pass — a pandas UDF holding the
    (k x dim) float64 centroid matrix in closure (kilobytes; serialized once
    per executor, the moral equivalent of a broadcast) computes
    argmin_c |e|^2 - 2 e.C^T + |c|^2 by BLAS matmul per batch. No shuffle.
  * The centroid update is posexplode -> groupBy(cluster, pos).avg: Spark's
    partial (map-side) aggregation collapses each partition to at most
    k x dim rows before the shuffle, so the exchange is O(k * dim * P)
    regardless of corpus size — the same treeAggregate discipline MLlib's
    KMeans uses. The driver materializes only the k x dim centroid table per
    iteration (8 x 64 here; bounded by the model size, never the data).
  * SemDeDup's pairwise stage runs per cluster via applyInPandas with a
    BLOCKED gram matrix (block x member matmuls), so executor memory is
    O(block * |cluster| ) not O(|cluster|^2); k is chosen so |cluster| ~ n/k
    stays bounded (the paper uses k ~ sqrt(n) at web scale).

Cross-engine determinism (oracle parity discipline, __spark_entry__ header):
  * distances are rounded to 9 decimals before argmin, centroid means to 6
    decimals at each iteration boundary — float64 partial-sum order noise is
    ~1e-15 relative, so the rounded values are engine- and
    partition-order-independent;
  * argmin ties break to the LOWEST cluster id (np.argmin first-occurrence
    == the SQL oracle's min(struct(dist, c)));
  * empty clusters keep their previous centroid;
  * init = the embeddings of the k smallest ids, cluster ids assigned in
    id order (no RNG anywhere).

Reference analog: the reference maintains no ML ops — this is part of the
brief's LLM-data-pipeline extension (dedup/similarity family, alongside
operators/similarity.py and operators/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, IntegerType, LongType, StructField, StructType


def _assign_udf(centroids: np.ndarray, dist_decimals: int = 9):
    """embedding -> nearest-centroid id; one BLAS matmul per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    @pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        E = np.array(vecs.tolist(), dtype=np.float64)
        if E.size == 0:
            return pd.Series([], dtype="int32")
        d2 = (E * E).sum(axis=1)[:, None] - 2.0 * (E @ C.T) + c_sq[None, :]
        a = np.argmin(np.round(d2, dist_decimals), axis=1)
        return pd.Series(a.astype("int32"))

    return assign


def kmeans_assign(df: DataFrame, centroids: np.ndarray,
                  vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, cluster) under fixed centroids — the zero-shuffle scoring pass."""
    return df.select(
        F.col(id_col),
        _assign_udf(centroids)(F.col(vec_col)).alias("cluster"),
    )


def kmeans_lloyd(df: DataFrame, k: int = 8, iters: int = 4,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 ) -> tuple[DataFrame, np.ndarray]:
    """Lloyd's k-means: `iters` update rounds from the deterministic init,
    then a final assignment pass. Returns (assignment_df, centroids).

    Per iteration: one Arrow assignment pass + one partially-aggregated
    explode shuffle (<= k*dim rows per map task) + one k*dim-row driver
    collect (model-sized, data-independent)."""
    init_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    C = np.array([r[1] for r in init_rows], dtype=np.float64)
    if C.shape[0] < k:
        raise ValueError(f"need >= k={k} rows to init, got {C.shape[0]}")
    dim = C.shape[1]

    vecs = df.select(F.col(id_col), F.col(vec_col).alias("e"))
    for _ in range(iters):
        assigned = vecs.select(
            _assign_udf(C)(F.col("e")).alias("c"),
            F.posexplode("e").alias("pos", "v"),
        )
        stats = (
            assigned.groupBy("c", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        newC = C.copy()
        means: dict[int, np.ndarray] = {}
        for r in stats:
            means.setdefault(r["c"], np.zeros(dim))[r["pos"]] = r["m"]
        for c, vec in means.items():
            newC[c] = np.round(vec, 6)
        C = newC

    return kmeans_assign(df, C, vec_col=vec_col, id_col=id_col), C


def semantic_dedup(df: DataFrame, assignment: DataFrame, tau: float,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   block: int = 1024) -> DataFrame:
    """SemDeDup keep/drop flags: within each cluster, a row is DROPPED iff
    some lower-id member of the same cluster has cosine >= tau with it
    ("keep the first seen" — deterministic, order-free, and exactly the SQL
    EXISTS predicate the oracle runs). Output (id, cluster, kept).

    One shuffle on cluster; per-group cost is a blocked gram matrix —
    O(|cluster|^2) multiplies but O(block * |cluster|) memory."""
    joined = (
        df.select(F.col(id_col), F.col(vec_col).alias("e"))
        .join(assignment.select(F.col(id_col), "cluster"), id_col)
    )
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("cluster", IntegerType()),
        StructField("kept", BooleanType()),
    ])

    def dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        E = np.array(pdf["e"].tolist(), dtype=np.float64)
        n = len(pdf)
        norms = np.sqrt((E * E).sum(axis=1))
        norms[norms == 0.0] = 1.0
        N = E / norms[:, None]
        kept = np.ones(n, dtype=bool)
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            # cosine of rows [lo, hi) against ALL strictly-lower-id rows
            S = np.round(N[lo:hi] @ N[:hi].T, 6)
            for j in range(lo, hi):
                if j > 0 and (S[j - lo, :j] >= tau).any():
                    kept[j] = False
        return pd.DataFrame({
            id_col: pdf[id_col].astype("int64"),
            "cluster": pdf["cluster"].astype("int32"),
            "kept": kept,
        })

    return joined.groupBy("cluster").applyInPandas(dedup_group, out_schema)


def kmeans_oracle_sql(k: int = 8, iters: int = 4, dim: int = 64,
                      table: str = "embeddings", id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    """The DuckDB twin of kmeans_lloyd: Lloyd unrolled as chained CTEs
    (fixed `iters`, so no recursive-CTE reference restrictions), identical
    rounding (dist 9, centroid mean 6) and tie rule (min(struct(d, c)))."""
    parts = [f"""WITH emb AS (
  SELECT {id_col} AS vid, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS e
  FROM {table}
), cent_0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS INT) AS c, e AS cent
  FROM (SELECT * FROM emb ORDER BY vid LIMIT {k})
)"""]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""", asg_{i} AS (
  SELECT vid, e,
         min(struct_pack(d := round(
             list_dot_product(e, e) - 2 * list_dot_product(e, cent)
             + list_dot_product(cent, cent), 9), c := c)) AS best
  FROM emb CROSS JOIN cent_{p}
  GROUP BY vid, e
), cent_{i} AS (
  SELECT c0.c, coalesce(n.cent, c0.cent) AS cent
  FROM cent_{p} c0 LEFT JOIN (
    SELECT c, list(m ORDER BY pos) AS cent FROM (
      SELECT best.c AS c, pos, round(avg(v), 6) AS m FROM (
        SELECT best, unnest(e) AS v, unnest(range(1, {dim + 1})) AS pos
        FROM asg_{i}
      ) GROUP BY best.c, pos
    ) GROUP BY c
  ) n USING (c)
)""")
    parts.append(f""", asg_final AS (
  SELECT vid,
         min(struct_pack(d := round(
             list_dot_product(e, e) - 2 * list_dot_product(e, cent)
             + list_dot_product(cent, cent), 9), c := c)) AS best
  FROM emb CROSS JOIN cent_{iters}
  GROUP BY vid
)""")
    return "".join(parts)


def semdedup_oracle_sql(tau: float, k: int = 8, iters: int = 4, dim: int = 64,
                        id_col: str = "vec_id") -> str:
    """kmeans oracle + the EXISTS-lower-id-cosine predicate on top."""
    return kmeans_oracle_sql(k=k, iters=iters, dim=dim, id_col=id_col) + f""", nrm AS (
  SELECT a.vid, a.best.c AS cluster, e, sqrt(list_dot_product(e, e)) AS nrm
  FROM asg_final a JOIN emb USING (vid)
), dropped AS (
  SELECT b.vid
  FROM nrm a JOIN nrm b ON a.cluster = b.cluster AND a.vid < b.vid
  WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= {tau}
  GROUP BY b.vid
)
SELECT n.vid AS {id_col}, n.cluster, (d.vid IS NULL) AS kept
FROM nrm n LEFT JOIN dropped d USING (vid)"""
