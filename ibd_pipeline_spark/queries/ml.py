"""Registry entries for the all-DataFrame ML primitives
(operators/ml.py). Both are rows-only: power iteration and gradient
descent aren't SQL-expressible (iterative fixpoints over data), the
same class as k-means and PageRank — their correctness evidence is
the property suite in tests/test_ml.py (planted-direction recovery,
monotone loss, separable convergence) plus the driver's recorded
row counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.operators.ml import logreg_fit, pca_top_component, pca_top_k
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


@query("train_logreg_quality_gate")
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

    Rows-only by design: iterative gradient descent has no
    SQL-expressible oracle — the fixpoint of 12 float GD rounds can't
    be unrolled exactly the way the integer-ratio Markov chains are
    (every round renormalizes through exp/sigmoid, so a CTE chain
    would just re-implement the operator in SQL floats and attest
    nothing). The checkable claims — planted-separation recovery,
    loss decrease per round, gradient-partial sizes — are
    property-tested (tests/test_ml.py)."""
    emb = load(spark, sf_dir, "embeddings")
    feats = emb.select(
        F.concat(
            F.array(F.lit(1.0)),
            F.transform("embedding", lambda x: x.cast("double")),
        ).alias("x"),
        (F.col("label") < 5).cast("int").alias("y"),
    )
    fit = logreg_fit(feats, "x", "y", iters=12, lr=1.0)
    return fit.select(
        F.posexplode("weights").alias("dim", "weight"),
        "log_loss",
        "accuracy",
        "n_rows",
    ).select(
        "dim",
        F.round("weight", 6).alias("weight"),
        F.round("log_loss", 6).alias("log_loss"),
        F.round("accuracy", 6).alias("accuracy"),
        "n_rows",
    ).orderBy("dim")


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
