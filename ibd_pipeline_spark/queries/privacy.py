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


# ---------------------------------------------------------------------------
# Warner randomized response: deniable per-user bit collection (r13)
# ---------------------------------------------------------------------------

_RR_P = "0.75"

_RR_SQL = f"""
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY user_id
), m AS (
  SELECT user_id, b,
         CAST(('0x' || substring(md5('rr13:' || CAST(user_id AS VARCHAR)),
                                 1, 13)) AS BIGINT)
           / 4503599627370496.0 AS uu
  FROM u
), rep AS (
  SELECT user_id,
         CASE WHEN uu < {_RR_P} THEN b ELSE 1 - b END AS y
  FROM m
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_yes,
         (SELECT CAST(SUM(b) AS BIGINT) FROM u) AS n_true
  FROM rep
), s AS (
  SELECT n, n_yes, n_true,
         CAST(n_yes AS DOUBLE) / n AS yhat
  FROM agg
)
SELECT n AS n_users, n_yes AS n_reported_yes,
       ROUND((yhat - (1.0 - {_RR_P})) / (2.0 * {_RR_P} - 1.0), 6)
         AS pi_debiased,
       ROUND(sqrt(yhat * (1.0 - yhat) / n)
             / (2.0 * {_RR_P} - 1.0), 6) AS se_debiased,
       ROUND(CAST(n_true AS DOUBLE) / n, 6) AS pi_true
FROM s
"""


@query("privacy_randomized_response", oracle=_RR_SQL)
def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response over a sensitive per-user bit (made
    a high-value purchase): each user reports the TRUTH with
    probability p = 0.75 and the opposite otherwise, giving every
    individual plausible deniability (ε = ln(p/(1−p)) ≈ 1.1 local
    DP) while the population rate stays estimable:
    π̂ = (ŷ − (1−p))/(2p−1) with SE(π̂) = SE(ŷ)/(2p−1). The
    local-DP sibling of privacy_dp_noisy_counts' central mechanism —
    noise lives on the RESPONSE, not the aggregate.

    SEEDED-REPLAY variant (same documented trade as the Laplace
    query): the coin is md5(user_id)-derived so the whole mechanism
    is deterministic and oracle-attested; a real deployment draws
    fresh client-side randomness, and `pi_true` exists only for
    attestation (it is exactly what the mechanism denies the
    collector) and would never be computed.

    Scale: one groupBy(user) for the bit, per-row hash coin, one
    global count — no shuffle beyond the user aggregate."""
    p = float(_RR_P)
    two52 = 4503599627370496.0
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).alias("b")
    )
    uu = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit("rr13"), F.col("user_id").cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint")
        / two52
    )
    rep = u.select(
        F.col("b"),
        F.when(uu < p, F.col("b")).otherwise(1 - F.col("b")).alias("y"),
    )
    agg = rep.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_yes"),
        F.sum("b").cast("bigint").alias("n_true"),
    )
    yhat = F.col("n_yes").cast("double") / F.col("n")
    return agg.select(
        F.col("n").alias("n_users"),
        F.col("n_yes").alias("n_reported_yes"),
        F.round((yhat - (1.0 - p)) / (2.0 * p - 1.0), 6).alias("pi_debiased"),
        F.round(
            F.sqrt(yhat * (F.lit(1.0) - yhat) / F.col("n")) / (2.0 * p - 1.0),
            6,
        ).alias("se_debiased"),
        F.round(F.col("n_true").cast("double") / F.col("n"), 6).alias(
            "pi_true"
        ),
    )
