"""Privacy queries (round-12 split): Laplace-mechanism differentially
private noisy counts (seeded replay draw; CSPRNG trade documented in
the query docstring). Split out of the former round12.py;
names/semantics unchanged. No reference analog
(`spark_processor.py:153-164`); SURVEY §2.2 rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# Seeded-replay differentially-private counts (Laplace mechanism)
# ---------------------------------------------------------------------------

_DP_EPS = "1.0"

_DP_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1
), u AS (
  SELECT event_type, n,
         CAST(('0x' || substring(md5('dp12:' || event_type), 1, 13))
              AS BIGINT) / 4503599627370496.0 AS uu
  FROM c
), z AS (
  SELECT event_type, n,
         CASE WHEN uu < 0.5
              THEN (1.0 / {_DP_EPS}) * ln(2.0 * uu)
              ELSE -(1.0 / {_DP_EPS}) * ln(2.0 * (1.0 - uu)) END AS noise
  FROM u
)
SELECT event_type, {_DP_EPS} AS epsilon,
       ROUND(CAST(n AS DOUBLE) + noise, 4) AS noisy_count,
       n AS true_count,
       ROUND(noise, 4) AS applied_noise
FROM z ORDER BY event_type
"""


@query("privacy_dp_noisy_counts", oracle=_DP_SQL)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy count release per event type at
    ε = 1.0 (sensitivity 1 for a count): noise = inverse-CDF
    transform of a uniform draw, b = 1/ε. SEEDED-REPLAY variant:
    the uniform comes from the md5 of the release key, which makes
    the whole mechanism deterministic and hence oracle-attested —
    the Spark-side plumbing (per-partition count partials, the
    release projection) is exactly the production shape. A real DP
    release swaps the md5 draw for a fresh CSPRNG draw per release
    (the seeded draw is NOT private against an adversary who knows
    the key — documented trade, the multimodal fake-decode
    pattern); the privacy-relevant columns (true_count,
    applied_noise) exist here only for attestation and would be
    projected out.

    Scale: one 5-key count aggregate; the mechanism runs on the
    catalog-sized release frame."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    eps = float(_DP_EPS)
    two52 = 4503599627370496.0  # 2^52 — 13 hex digits
    uu = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("dp12"), "event_type")), 1, 13
            ),
            16,
            10,
        ).cast("bigint")
        / two52
    )
    noise = F.when(
        uu < 0.5, (1.0 / eps) * F.log(2.0 * uu)
    ).otherwise(-(1.0 / eps) * F.log(2.0 * (1.0 - uu)))
    z = c.select(
        "event_type",
        F.lit(eps).alias("epsilon"),
        F.round(F.col("n").cast("double") + noise, 4).alias("noisy_count"),
        F.col("n").alias("true_count"),
        F.round(noise, 4).alias("applied_noise"),
    )
    return z.orderBy("event_type")
