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


# ---------------------------------------------------------------------------
# (moved from round9.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# k-anonymity audit (privacy): quasi-identifier group-size profile
# ---------------------------------------------------------------------------

_KANON_SQL = """
WITH qi AS (
  SELECT c_nationkey AS nation, c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
  FROM customer
), g AS (
  SELECT nation, seg, bal_bucket, CAST(COUNT(*) AS BIGINT) AS grp_n
  FROM qi GROUP BY 1, 2, 3
)
SELECT CAST(SUM(grp_n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(grp_n) AS BIGINT) AS k_anonymity,
       CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
         AS rows_below_k5,
       CAST(SUM(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_k5,
       ROUND(CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(grp_n) AS DOUBLE), 6) AS suppress_frac
FROM g
"""


@query("quality_k_anonymity", oracle=_KANON_SQL)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier tuple
    (nation, market segment, account-balance 1k-bucket): the dataset's
    k (smallest QI group), how many rows/groups sit below the k=5
    release threshold, and the suppression fraction a k=5 release
    would pay — the privacy readout next to gdpr_delete_propagation.

    Everything is exact integer arithmetic off ONE group-size
    aggregate (map-side combined, QI-cardinality keys); the only
    division is the final suppress_frac on exact integers.

    Scale: one shuffle at QI cardinality; no windows, no joins."""
    c = load(spark, sf_dir, "customer")
    g = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias(
            "bal_bucket"
        ),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    below = F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(F.lit(0))
    return g.agg(
        F.sum("grp_n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("grp_n").cast("bigint").alias("k_anonymity"),
        F.sum(below).cast("bigint").alias("rows_below_k5"),
        F.sum((F.col("grp_n") < 5).cast("int")).cast("bigint").alias(
            "groups_below_k5"
        ),
        F.round(
            F.sum(below).cast("double") / F.sum("grp_n").cast("double"), 6
        ).alias("suppress_frac"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit (sensitive-attribute diversity within QI groups)
# ---------------------------------------------------------------------------

_LDIV_SQL = """
WITH g AS (
  SELECT c_nationkey AS nation,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
         CAST(COUNT(*) AS BIGINT) AS grp_n,
         CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div
  FROM customer GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(grp_n) AS BIGINT) AS n_rows,
       CAST(MIN(l_div) AS BIGINT) AS l_diversity,
       CAST(SUM(CASE WHEN l_div < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_l2,
       CAST(SUM(CASE WHEN l_div < 2 THEN grp_n ELSE 0 END) AS BIGINT)
         AS rows_below_l2,
       ROUND(CAST(SUM(CASE WHEN l_div < 2 THEN grp_n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(grp_n) AS DOUBLE), 6) AS exposed_frac
FROM g
"""


@query("quality_l_diversity", oracle=_LDIV_SQL)
def quality_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's stronger sibling: within
    each quasi-identifier group (nation, balance bucket), how many
    DISTINCT values of the sensitive attribute (market segment)
    appear? A group can be k-anonymous yet fully exposed if every
    member shares the sensitive value (the homogeneity attack);
    l_diversity = the dataset's minimum, with the row mass sitting in
    l < 2 groups as the exposure readout.

    Exact integers off one aggregate carrying COUNT + COUNT DISTINCT
    per QI group; the only division is the final exposed_frac.

    Scale: one shuffle at QI cardinality; the distinct-count is
    per-group (segment values ≤ 5), never global."""
    c = load(spark, sf_dir, "customer")
    g = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias(
            "bal_bucket"
        ),
    ).agg(
        F.count(F.lit(1)).alias("grp_n"),
        F.countDistinct("c_mktsegment").alias("l_div"),
    )
    exposed = F.when(F.col("l_div") < 2, F.col("grp_n")).otherwise(F.lit(0))
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("grp_n").cast("bigint").alias("n_rows"),
        F.min("l_div").cast("bigint").alias("l_diversity"),
        F.sum((F.col("l_div") < 2).cast("int")).cast("bigint").alias(
            "groups_below_l2"
        ),
        F.sum(exposed).cast("bigint").alias("rows_below_l2"),
        F.round(
            F.sum(exposed).cast("double") / F.sum("grp_n").cast("double"), 6
        ).alias("exposed_frac"),
    )


# ---------------------------------------------------------------------------
# t-closeness audit (distributional privacy, completes the trio)
# ---------------------------------------------------------------------------

_TCLOSE_SQL = """
WITH qi AS (
  SELECT c_nationkey AS nation,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
         c_mktsegment AS seg
  FROM customer
), gseg AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS cv FROM qi GROUP BY seg
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM qi
), grp AS (
  SELECT nation, bal_bucket, CAST(COUNT(*) AS BIGINT) AS n_g FROM qi
  GROUP BY 1, 2
), gc AS (
  SELECT nation, bal_bucket, seg, CAST(COUNT(*) AS BIGINT) AS c_gv FROM qi
  GROUP BY 1, 2, 3
), spine AS (
  SELECT g.nation, g.bal_bucket, g.n_g, gl.seg, gl.cv,
         COALESCE(c.c_gv, 0) AS c_gv
  FROM grp g CROSS JOIN gseg gl
  LEFT JOIN gc c ON c.nation = g.nation AND c.bal_bucket = g.bal_bucket
                AND c.seg = gl.seg
), t AS (
  SELECT nation, bal_bucket, n_g,
         CAST(SUM(ABS(c_gv * (SELECT nn FROM n) - cv * n_g)) AS BIGINT)
           AS num
  FROM spine GROUP BY 1, 2, 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       ROUND(MAX(CAST(num AS DOUBLE)
                 / (2.0 * CAST(n_g AS DOUBLE)
                    * CAST((SELECT nn FROM n) AS DOUBLE))), 6) AS max_t,
       CAST(SUM(CASE WHEN 10 * num > 6 * n_g * (SELECT nn FROM n)
                     THEN 1 ELSE 0 END) AS BIGINT) AS groups_above_t03,
       CAST(SUM(CASE WHEN 10 * num > 6 * n_g * (SELECT nn FROM n)
                     THEN n_g ELSE 0 END) AS BIGINT) AS rows_above_t03,
       ROUND(CAST(SUM(CASE WHEN 10 * num > 6 * n_g * (SELECT nn FROM n)
                           THEN n_g ELSE 0 END) AS DOUBLE)
             / CAST((SELECT nn FROM n) AS DOUBLE), 6) AS exposed_frac
FROM t
"""


@query("quality_t_closeness", oracle=_TCLOSE_SQL)
def quality_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the distributional member of the privacy
    trio (k-anonymity: group size; l-diversity: distinct sensitive
    values; t-closeness: the DISTRIBUTION of the sensitive attribute
    within a QI group must stay close to the global one, or the group
    leaks by skew even when l is high). Distance is the categorical
    EMD (total variation): t_g = ½·Σ_v |c_gv/n_g − C_v/N|.

    All-integer core: per (group, segment) term |c_gv·N − C_v·n_g| is
    an exact BIGINT (groups missing a segment contribute C_v·n_g via
    the group × segment spine), t_g's numerator sums exactly, and the
    t > 0.3 release gate is the cross-multiplied 10·num > 6·n_g·N —
    only the reported max_t touches a float, once, at output.

    Scale: two QI-cardinality aggregates + a broadcast segment spine
    (≤ 5 values); no windows, no data-sized joins."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias(
            "bal_bucket"
        ),
        F.col("c_mktsegment").alias("seg"),
    )
    glob = c.groupBy("seg").agg(F.count(F.lit(1)).alias("cv"))
    n = c.agg(F.count(F.lit(1)).alias("nn"))
    grp = c.groupBy("nation", "bal_bucket").agg(
        F.count(F.lit(1)).alias("n_g")
    )
    gc = c.groupBy("nation", "bal_bucket", "seg").agg(
        F.count(F.lit(1)).alias("c_gv")
    )
    spine = (
        grp.crossJoin(F.broadcast(glob))
        .join(gc, ["nation", "bal_bucket", "seg"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "nation",
            "bal_bucket",
            "n_g",
            "nn",
            F.abs(
                F.coalesce("c_gv", F.lit(0)) * F.col("nn")
                - F.col("cv") * F.col("n_g")
            ).alias("term"),
        )
    )
    t = spine.groupBy("nation", "bal_bucket", "n_g", "nn").agg(
        F.sum("term").alias("num")
    )
    above = F.lit(10) * F.col("num") > F.lit(6) * F.col("n_g") * F.col("nn")
    return t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.round(
            F.max(
                F.col("num").cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_g").cast("double")
                    * F.col("nn").cast("double")
                )
            ),
            6,
        ).alias("max_t"),
        F.sum(above.cast("int")).cast("bigint").alias("groups_above_t03"),
        F.sum(F.when(above, F.col("n_g")).otherwise(0))
        .cast("bigint")
        .alias("rows_above_t03"),
        F.round(
            F.sum(F.when(above, F.col("n_g")).otherwise(0)).cast("double")
            / F.max("nn").cast("double"),
            6,
        ).alias("exposed_frac"),
    )
