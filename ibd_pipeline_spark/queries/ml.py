"""Registry entries for the all-DataFrame ML primitives
(operators/ml.py). The logreg gate is HASH-ATTESTED since r11 via
the fixed-point GD unroll (see train_logreg_quality_gate); the two
PCA queries remain rows-only — the Gram eigensolve's output is an
eigenvector (defined only up to sign and, under near-degenerate
eigenvalues, rotation), so no SQL replay pins its bits; their
correctness evidence is the property suite in tests/test_ml.py
(planted-direction recovery, orthogonality, eigenvalue ordering,
path agreement) plus the driver's recorded row counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.operators.ml import (
    logreg_fit_attested,
    pca_top_component,
    pca_top_k,
)
from ibd_pipeline_spark.queries import query


@query("similarity_pca_top_component")
def similarity_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embeddings table (64 dims). At
    this d the operator routes through the r06 Gram fast path: ONE
    Arrow pass of numpy Gram/sum partials + a driver-side eigensolve
    (MLlib RowMatrix design); the covariance-action power iteration
    remains the large-d route (method='power', agreement-tested — see
    operators/ml.py). Output: one row per dimension (dim, loading,
    eigenvalue, n_vectors), loadings rounded for a stable rows-only
    record — the unrounded operator is what the property tests
    exercise."""
    emb = load(spark, sf_dir, "embeddings")
    comp = pca_top_component(emb, vec="embedding", iters=8)
    return comp.select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("eigenvalue", 6).alias("eigenvalue"),
        "n_vectors",
    ).orderBy("dim")


_LR_ITERS, _LR_DIM = 12, 65  # bias + 64 embedding dims


def _logreg_oracle() -> str:
    """DuckDB CTE unroll of the attested GD fixpoint: 12 rounds of
    fixed-point dot products, 1e-7-quantized sigmoids and fixed-point
    gradients — the identical arithmetic
    operators/ml.py:logreg_fit_attested runs, so weights AND metrics
    replay bit-for-bit."""
    p_expr = (
        "GREATEST(FLOOR((1.0 / (1.0 + EXP(-(CAST(z_fp AS DOUBLE)"
        " / 1e12)))) * 1e7) / 1e7, 1e-7)"
    )
    parts = [f"""
WITH ev AS MATERIALIZED (
  SELECT vec_id AS rid,
         CAST(CAST(label < 5 AS INT) AS DOUBLE) AS y,
         list_prepend(1.0, CAST(embedding AS DOUBLE[])) AS x
  FROM embeddings
), xk AS MATERIALIZED (
  SELECT rid, y, i - 1 AS k, x[i] AS xk
  FROM ev, UNNEST(generate_series(1, {_LR_DIM})) t(i)
), cnt AS MATERIALIZED (SELECT COUNT(*) AS n FROM ev),
w0 AS MATERIALIZED (
  SELECT i - 1 AS k, 0.0::DOUBLE AS wk
  FROM UNNEST(generate_series(1, {_LR_DIM})) t(i)
)"""]
    for r in range(1, _LR_ITERS + 1):
        parts.append(f""",
z{r} AS MATERIALIZED (
  SELECT rid, y, SUM(CAST(FLOOR(xk * wk * 1e12) AS BIGINT)) AS z_fp
  FROM xk JOIN w{r - 1} USING (k) GROUP BY rid, y
), p{r} AS MATERIALIZED (
  SELECT rid, y, {p_expr} AS p FROM z{r}
), g{r} AS MATERIALIZED (
  SELECT v.k,
         SUM(CAST(FLOOR((p.p - p.y) * v.xk * 1e12) AS BIGINT)) AS g_fp
  FROM p{r} p JOIN xk v USING (rid) GROUP BY v.k
), w{r} AS MATERIALIZED (
  SELECT w.k, w.wk - CAST(g.g_fp AS DOUBLE) / (1e12 * cnt.n) AS wk
  FROM w{r - 1} w JOIN g{r} g USING (k), cnt
)""")
    R = _LR_ITERS
    parts.append(f""",
zf AS MATERIALIZED (
  SELECT rid, y, SUM(CAST(FLOOR(xk * wk * 1e12) AS BIGINT)) AS z_fp
  FROM xk JOIN w{R} USING (k) GROUP BY rid, y
), pf AS MATERIALIZED (
  SELECT rid, y, {p_expr} AS p FROM zf
), m AS (
  SELECT
    -(CAST(SUM(CAST(FLOOR((y * LN(p) + (1.0 - y) * LN(1.0 - p)) * 1e7)
               AS BIGINT)) AS DOUBLE) / (1e7 * cnt.n)) AS log_loss,
    CAST(SUM(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END)
         AS DOUBLE) / cnt.n AS accuracy,
    CAST(cnt.n AS BIGINT) AS n_rows
  FROM pf, cnt GROUP BY cnt.n
)
SELECT CAST(w.k AS INT) AS dim, ROUND(w.wk, 6) AS weight,
       ROUND(m.log_loss, 6) AS log_loss,
       ROUND(m.accuracy, 6) AS accuracy, m.n_rows
FROM w{R} w CROSS JOIN m ORDER BY dim""")
    return "".join(parts)


@query("train_logreg_quality_gate", oracle=_logreg_oracle)
def train_logreg_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality-gate prototype: binary logistic regression
    (batch GD, 12 rounds, all-DataFrame) on the embeddings table,
    predicting label < 5 from the embedding plus a bias term — the
    shape of 'train a small classifier on labeled snippets, score the
    whole corpus' that curation pipelines use for model-based quality
    filtering. Output: per-dimension weight rows (dim, weight) with
    the final log_loss / accuracy / n_rows alongside (repeated per
    row — scalars, kept out of array columns for the driver's
    canonicalizer).

    HASH-ATTESTED since r11 (previously rows-only): the attested GD
    variant (operators/ml.py:logreg_fit_attested) runs fixed-point
    dot products/gradients and 1e-7-quantized sigmoids, making all
    12 rounds bit-deterministic — the oracle unrolls the identical
    fixpoint as CTEs. The float-math production twin stays
    operators/ml.py:logreg_fit (Arrow treeAggregate partials),
    property-tested in tests/test_ml.py (planted-separation
    recovery, monotone loss, path agreement)."""
    emb = load(spark, sf_dir, "embeddings")
    feats = emb.select(
        F.col("vec_id").alias("rid"),
        F.concat(
            F.array(F.lit(1.0)),
            F.transform("embedding", lambda x: x.cast("double")),
        ).alias("x"),
        (F.col("label") < 5).cast("int").alias("y"),
    )
    return logreg_fit_attested(
        feats, "x", "y", iters=_LR_ITERS, lr=1.0, id_col="rid"
    ).select(
        F.col("dim").cast("int").alias("dim"),
        "weight",
        "log_loss",
        "accuracy",
        "n_rows",
    )


@query("similarity_pca_top_k")
def similarity_pca_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 principal components of the embeddings table
    (operators/ml.py:pca_top_k) — the dimensionality-reduction front
    end for visualization and cheap pre-ANN projection. At d=64 the
    operator routes through the r06 Gram fast path (one Arrow pass +
    driver eigensolve — exact factorization, so components are
    orthogonal and eigenvalues exactly ordered even on this
    near-isotropic fixture); power-iteration-with-deflation remains
    the large-d route (method='power', agreement-tested). Rows-only;
    output one row per (component, dim) with rounded loadings for a
    stable record."""
    emb = load(spark, sf_dir, "embeddings")
    comp = pca_top_k(emb, vec="embedding", k=3, iters=8)
    return comp.select(
        "component",
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("eigenvalue", 6).alias("eigenvalue"),
        "n_vectors",
    ).orderBy("component", "dim")
