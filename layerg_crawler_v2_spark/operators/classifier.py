"""Distributed quality-classifier training: full-batch gradient-descent
logistic regression over an embedding column.

The classic web-corpus curation step (GPT-3, PaLM, LLaMA data pipelines):
train a linear quality classifier on a labeled sample, then score every
document and keep/downsample by the predicted probability.  The reference
maintains no ML ops — this is part of the brief's LLM-data-pipeline
extension (alongside operators/clustering.py's k-means, whose oracle
discipline this module reuses).

Scale design (the 100-TB story):
  * The model (dim+1 float64 weights) is the ONLY driver-resident state —
    serialized into the scoring UDF's closure per iteration, the moral
    equivalent of a broadcast.  Nothing data-sized ever reaches the driver.
  * Each GD iteration is one vectorized Arrow pass (per-batch BLAS matvec
    computes sigmoid(Xw+b)) followed by one partially-aggregated explode
    shuffle: gradient_j = avg_i(x_ij * r_i) runs as posexplode ->
    groupBy(pos).avg, and Spark's map-side combine collapses every map task
    to <= dim+1 rows before the exchange — the treeAggregate discipline
    MLlib's own LogisticRegression uses.  Exchange cost is O(dim * P) per
    iteration regardless of corpus size.
  * The bias is trained in the SAME shuffle by prepending a constant-1
    feature (pos 0), so an iteration costs exactly one job.

Cross-engine determinism (oracle parity discipline, __spark_entry__ header):
  * probabilities are rounded to 9 decimals straight out of the sigmoid —
    numpy's and DuckDB's libm exp() may differ in the last ulp, and float64
    partial-sum order noise is ~1e-15 relative, so the rounded values are
    engine- and partition-order-independent;
  * per-feature gradients are rounded to 9 decimals, weights to 6 decimals
    at each iteration boundary (the k-means centroid rule);
  * init w = 0, b = 0; no RNG anywhere — same data in, same model out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _prob_udf(w: np.ndarray, b: float, decimals: int = 9):
    """embedding -> round(sigmoid(w.x + b), decimals); one BLAS matvec per
    Arrow batch, current model in closure."""
    from pyspark.sql.functions import pandas_udf

    wv = np.ascontiguousarray(w, dtype=np.float64)

    @pandas_udf(DoubleType())
    def prob(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        if X.size == 0:
            return pd.Series([], dtype="float64")
        p = 1.0 / (1.0 + np.exp(-(X @ wv + b)))
        return pd.Series(np.round(p, decimals))

    return prob


def logreg_train_gd(df: DataFrame, lr: float = 1.0, iters: int = 3,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    label_col: str = "y",
                    ) -> tuple[DataFrame, np.ndarray, float]:
    """Full-batch GD logistic regression: `iters` steps of
    w -= lr * avg_i(x_i * (sigmoid(w.x_i + b) - y_i)) from w = 0, then a
    final scoring pass.  `label_col` must be a 0.0/1.0 double.

    Returns (scores_df, w, b): scores_df = (id, prob, pred) with prob the
    9-decimal sigmoid rounded to 6 for output and pred = prob >= 0.5.

    Per iteration: one Arrow scoring pass + one partially-aggregated explode
    shuffle (<= dim+1 rows per map task) + one dim+1-row driver collect
    (model-sized, data-independent)."""
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("cannot train on an empty DataFrame")
    dim = len(first[0])
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0

    rows = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("x"),
        F.col(label_col).cast("double").alias("y"),
    )
    for _ in range(iters):
        # residual r = p - y once per row; bias rides along as constant
        # feature pos 0 so gradient + bias cost ONE shuffle/job.
        resid = rows.select(
            (_prob_udf(w, b)(F.col("x")) - F.col("y")).alias("r"),
            F.posexplode(F.concat(F.array(F.lit(1.0)), F.col("x"))).alias("pos", "v"),
        )
        grad_rows = (
            resid.groupBy("pos")
            .agg(F.avg(F.col("v") * F.col("r")).alias("g"))
            .collect()
        )
        g = np.zeros(dim + 1)
        for r in grad_rows:
            g[r["pos"]] = r["g"]
        g = np.round(g, 9)
        b = round(b - lr * g[0], 6)
        w = np.round(w - lr * g[1:], 6)

    scores = rows.select(
        F.col(id_col),
        _prob_udf(w, b)(F.col("x")).alias("p9"),
    ).select(
        id_col,
        F.round("p9", 6).alias("prob"),
        (F.col("p9") >= 0.5).alias("pred"),
    )
    return scores, w, b


def logreg_oracle_sql(lr: float = 1.0, iters: int = 3, dim: int = 64,
                      table: str = "embeddings", id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      label_expr: str = "label = 0") -> str:
    """The DuckDB twin of logreg_train_gd: the full iterative training run
    unrolled as chained CTEs with identical rounding (sigmoid 9, gradient 9,
    weights 6) — an end-to-end cross-engine check of a multi-round
    iterative ML job, not just one operator."""
    parts = [f"""WITH emb AS (
  SELECT {id_col} AS vid, list_transform({vec_col}, v -> CAST(v AS DOUBLE)) AS x,
         CAST({label_expr} AS DOUBLE) AS y
  FROM {table}
), w_0 AS (SELECT list_transform(range(1, {dim + 1}), i -> 0.0) AS w, 0.0 AS b)"""]
    for i in range(1, iters + 1):
        parts.append(f""", p_{i} AS (
  SELECT vid, x, y,
         round(1.0 / (1.0 + exp(-(list_dot_product(x, w) + b))), 9) AS p
  FROM emb CROSS JOIN w_{i - 1}
), g_{i} AS (
  SELECT pos, avg(v * (p - y)) AS g FROM (
    SELECT p, y, unnest(x) AS v, unnest(range(1, {dim + 1})) AS pos FROM p_{i}
  ) GROUP BY pos
), w_{i} AS (
  SELECT list(round(w0.w[g.pos] - {lr} * round(g.g, 9), 6) ORDER BY g.pos) AS w,
         round(w0.b - {lr} * round((SELECT avg(p - y) FROM p_{i}), 9), 6) AS b
  FROM g_{i} g CROSS JOIN w_{i - 1} w0
  GROUP BY w0.b
)""")
    parts.append(f"""
SELECT vid AS {id_col}, round(p, 6) AS prob, (p >= 0.5) AS pred FROM (
  SELECT vid, round(1.0 / (1.0 + exp(-(list_dot_product(x, w) + b))), 9) AS p
  FROM emb CROSS JOIN w_{iters}
)""")
    return "".join(parts)
