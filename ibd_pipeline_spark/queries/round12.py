"""Round-12 capability queries, wave 1: distribution diagnostics and
2×2 experimentation effect measures.

- Jarque–Bera normality test (moments → χ²(2) closed form)
- Cohen's d / Hedges' g standardized effect size
- Grubbs' maximum-studentized-deviate outlier screen
- G-test (log-likelihood ratio) of independence
- 2×2 odds ratio with the Woolf log-interval

No reference analog (the reference computes streaming means/max/stddev
only — `spark_processor.py:153-164`); these are SURVEY §2.2 north-star
rows. All DuckDB-oracle-attested with the shared float discipline:
exact DECIMAL sums rounded in the decimal domain (dsum/davg rules),
double algebra on bit-identical inputs after, ROUND at the end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load, load_wide
from ibd_pipeline_spark.queries import query
from ibd_pipeline_spark.queries.round10_stats import _phi_tail_sql
from ibd_pipeline_spark.queries.round11b import _phi_tail_col

# ---------------------------------------------------------------------------
# Jarque–Bera normality test (events.value)
# ---------------------------------------------------------------------------

_JB_SQL = """
WITH base AS (
  SELECT CAST(value AS DOUBLE) AS x FROM events WHERE value IS NOT NULL
), m1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(ROUND(SUM(CAST(x AS DECIMAL(28,8))), 6) AS DOUBLE)
           / COUNT(*) AS mu
  FROM base
), cm AS (
  SELECT n, mu,
         CAST(ROUND(SUM(CAST((x - mu) * (x - mu) AS DECIMAL(38,8))), 4)
              AS DOUBLE) AS m2s,
         CAST(ROUND(SUM(CAST((x - mu) * (x - mu) * (x - mu)
                             AS DECIMAL(38,8))), 4) AS DOUBLE) AS m3s,
         CAST(ROUND(SUM(CAST((x - mu) * (x - mu) * (x - mu) * (x - mu)
                             AS DECIMAL(38,8))), 4) AS DOUBLE) AS m4s
  FROM base CROSS JOIN m1
  GROUP BY n, mu
), st AS (
  SELECT n,
         (m3s / n) / sqrt((m2s / n) * (m2s / n) * (m2s / n)) AS b1,
         (m4s / n) / ((m2s / n) * (m2s / n)) AS b2
  FROM cm
)
SELECT n AS n_obs,
       ROUND(b1, 6) AS skewness,
       ROUND(b2, 6) AS kurtosis,
       ROUND(n / 6.0 * (b1 * b1 + (b2 - 3.0) * (b2 - 3.0) / 4.0), 4)
         AS jb_stat,
       ROUND(exp(-(n / 6.0 * (b1 * b1 + (b2 - 3.0) * (b2 - 3.0) / 4.0))
                 / 2.0), 8) AS p_value
FROM st
"""


@query("stats_jarque_bera", oracle=_JB_SQL)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test of the event `value` distribution:
    JB = n/6·(b₁² + (b₂−3)²/4) from sample skewness b₁ and kurtosis
    b₂. JB ~ χ²(2) under normality, whose survival has the EXACT
    closed form e^(−x/2) — no approximation enters the p-value. The
    go/no-go gate before any mean-based test in the stats belt (a
    heavy-tailed metric sends you to the rank tests next door).

    Exactness: μ is the davg rule (decimal sum rounded at 6, one
    double division); centered power sums cast each per-row double
    term to DECIMAL(38,8) so the moment sums are order-independent
    and bit-identical cross-engine; everything after is identical
    double algebra rounded at the end.

    Scale: two scan-aggregates (mean pass + moment pass, the second
    with a 1-row broadcast of μ); no shuffle beyond the map-side
    partials. The moment pass would fold into the first at 100 TB
    with a streaming one-pass central-moment formula, traded here
    for the cross-engine-exact two-pass."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(F.col("value").cast("double").alias("x"))
    m1 = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.round(F.sum(F.col("x").cast("decimal(28,8)")), 6).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("mu"),
    )
    d = F.col("x") - F.col("mu")
    cm = (
        base.crossJoin(F.broadcast(m1))
        .groupBy("n", "mu")
        .agg(
            F.round(F.sum((d * d).cast("decimal(38,8)")), 4)
            .cast("double")
            .alias("m2s"),
            F.round(F.sum((d * d * d).cast("decimal(38,8)")), 4)
            .cast("double")
            .alias("m3s"),
            F.round(F.sum((d * d * d * d).cast("decimal(38,8)")), 4)
            .cast("double")
            .alias("m4s"),
        )
    )
    m2 = F.col("m2s") / F.col("n")
    b1 = (F.col("m3s") / F.col("n")) / F.sqrt(m2 * m2 * m2)
    b2 = (F.col("m4s") / F.col("n")) / (m2 * m2)
    jb = F.col("n") / 6.0 * (b1 * b1 + (b2 - 3.0) * (b2 - 3.0) / 4.0)
    return cm.select(
        F.col("n").alias("n_obs"),
        F.round(b1, 6).alias("skewness"),
        F.round(b2, 6).alias("kurtosis"),
        F.round(jb, 4).alias("jb_stat"),
        F.round(F.exp(-jb / 2.0), 8).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Cohen's d / Hedges' g effect size (purchase vs view values)
# ---------------------------------------------------------------------------

_COHEN_SQL = """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE) AS s1,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))
                        * CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE) AS s2
  FROM events WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
  GROUP BY event_type
), w AS (
  SELECT
    MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n_a,
    MAX(CASE WHEN event_type = 'view' THEN n END) AS n_b,
    MAX(CASE WHEN event_type = 'purchase' THEN s1 END) AS s1_a,
    MAX(CASE WHEN event_type = 'view' THEN s1 END) AS s1_b,
    MAX(CASE WHEN event_type = 'purchase' THEN s2 END) AS s2_a,
    MAX(CASE WHEN event_type = 'view' THEN s2 END) AS s2_b
  FROM g
), v AS (
  SELECT n_a, n_b, s1_a / n_a AS m_a, s1_b / n_b AS m_b,
         (s2_a - s1_a * s1_a / n_a) / (n_a - 1) AS v_a,
         (s2_b - s1_b * s1_b / n_b) / (n_b - 1) AS v_b
  FROM w
), d AS (
  SELECT n_a, n_b, m_a, m_b,
         (m_a - m_b)
           / sqrt(((n_a - 1) * v_a + (n_b - 1) * v_b) / (n_a + n_b - 2))
           AS cohens_d
  FROM v
)
SELECT n_a, n_b,
       ROUND(m_a, 6) AS mean_a, ROUND(m_b, 6) AS mean_b,
       ROUND(cohens_d, 6) AS cohens_d,
       ROUND((1.0 - 3.0 / (4.0 * (n_a + n_b) - 9.0)) * cohens_d, 6)
         AS hedges_g
FROM d
"""


@query("stats_cohens_d", oracle=_COHEN_SQL)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size between purchase and view
    event values, with the Hedges' g small-sample correction
    J = 1 − 3/(4N−9). The "is it LARGE, not just significant"
    readout that belongs next to every t-test the belt ships
    (stats_welch_ttest reports p; this reports magnitude on the
    pooled-σ scale).

    Exactness: the Welch-query moment discipline verbatim — exact
    decimal Σx and Σx² per group rounded in the decimal domain, then
    identical double algebra (pooled variance, d, J·d) both engines.

    Scale: one 2-group scan-aggregate with map-side partials."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    )
    dec = F.col("value").cast("decimal(28,8)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum(dec), 4).cast("double").alias("s1"),
        F.round(F.sum(dec * dec), 4).cast("double").alias("s2"),
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("event_type") == t, F.col(c))).alias(
                f"{c}_{s}"
            )
            for t, s in (("purchase", "a"), ("view", "b"))
            for c in ("n", "s1", "s2")
        ]
    )
    m_a = F.col("s1_a") / F.col("n_a")
    m_b = F.col("s1_b") / F.col("n_b")
    v_a = (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    v_b = (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    pooled = F.sqrt(
        ((F.col("n_a") - 1) * v_a + (F.col("n_b") - 1) * v_b)
        / (F.col("n_a") + F.col("n_b") - 2)
    )
    d = (m_a - m_b) / pooled
    j = 1.0 - 3.0 / (4.0 * (F.col("n_a") + F.col("n_b")) - 9.0)
    return w.select(
        "n_a",
        "n_b",
        F.round(m_a, 6).alias("mean_a"),
        F.round(m_b, 6).alias("mean_b"),
        F.round(d, 6).alias("cohens_d"),
        F.round(j * d, 6).alias("hedges_g"),
    )


# ---------------------------------------------------------------------------
# Grubbs' maximum-studentized-deviate outlier screen (order totals)
# ---------------------------------------------------------------------------

_GRUBBS_SQL = f"""
WITH base AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(ROUND(SUM(CAST(x AS DECIMAL(28,8))), 6) AS DOUBLE)
           / COUNT(*) AS mu,
         CAST(ROUND(SUM(CAST(x AS DECIMAL(28,8))), 4) AS DOUBLE) AS s1,
         CAST(ROUND(SUM(CAST(x AS DECIMAL(28,8))
                        * CAST(x AS DECIMAL(28,8))), 4) AS DOUBLE) AS s2
  FROM base
), mx AS (
  SELECT n, mu, sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd,
         MAX(ABS(x - mu)) AS maxdev
  FROM base CROSS JOIN m
  GROUP BY n, mu, s1, s2
), pick AS (
  SELECT mx.n, mx.mu, mx.sd, mx.maxdev,
         MIN(b.x) AS outlier_value
  FROM mx JOIN base b ON ABS(b.x - mx.mu) = mx.maxdev
  GROUP BY mx.n, mx.mu, mx.sd, mx.maxdev
)
SELECT n AS n_obs, ROUND(mu, 6) AS mean_x, ROUND(sd, 6) AS stddev_x,
       ROUND(maxdev / sd, 6) AS g_stat,
       ROUND(outlier_value, 2) AS outlier_value,
       ROUND(LEAST(1.0, n * 2.0 * {_phi_tail_sql('(maxdev / sd)')}), 8)
         AS p_bonferroni_bound
FROM pick
"""


@query("stats_grubbs_outlier", oracle=_GRUBBS_SQL)
def stats_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs-style maximum-studentized-deviate outlier screen over
    order totals: G = max|x−x̄|/s, the offending value, and the
    Bonferroni-bounded normal tail p ≤ n·2·Φ̄(G) (the union bound
    over n candidate outliers — an upper BOUND by construction,
    reported as such; the exact Grubbs critical value needs the t
    quantile, overkill for a screen). The data-quality tripwire run
    before any mean/variance-based monitor trusts a new batch.

    Exactness: μ via the davg rule; s via exact decimal Σx/Σx²; the
    max deviation is a pure MAX over identical doubles (no sum-order
    hazard at all); the offending value is deterministically the
    MINIMUM x among argmax-deviation rows (both engines agree on
    ties by construction).

    Scale: one scan-aggregate + a 1-row broadcast re-scan for the
    argmax; no shuffle beyond partials."""
    base = load(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("x")
    )
    dec = F.col("x").cast("decimal(28,8)")
    m = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.round(F.sum(dec), 6).cast("double") / F.count(F.lit(1))
        ).alias("mu"),
        F.round(F.sum(dec), 4).cast("double").alias("s1"),
        F.round(F.sum(dec * dec), 4).cast("double").alias("s2"),
    )
    mx = (
        base.crossJoin(F.broadcast(m))
        .groupBy("n", "mu", "s1", "s2")
        .agg(F.max(F.abs(F.col("x") - F.col("mu"))).alias("maxdev"))
        .select(
            "n",
            "mu",
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            ).alias("sd"),
            "maxdev",
        )
    )
    pick = (
        base.crossJoin(F.broadcast(mx))
        .filter(F.abs(F.col("x") - F.col("mu")) == F.col("maxdev"))
        .groupBy("n", "mu", "sd", "maxdev")
        .agg(F.min("x").alias("outlier_value"))
    )
    g = F.col("maxdev") / F.col("sd")
    return pick.select(
        F.col("n").alias("n_obs"),
        F.round("mu", 6).alias("mean_x"),
        F.round("sd", 6).alias("stddev_x"),
        F.round(g, 6).alias("g_stat"),
        F.round("outlier_value", 2).alias("outlier_value"),
        F.round(
            F.least(F.lit(1.0), F.col("n") * 2.0 * _phi_tail_col(g)), 8
        ).alias("p_bonferroni_bound"),
    )


# ---------------------------------------------------------------------------
# G-test (log-likelihood ratio) of independence — event_type × ISO dow
# ---------------------------------------------------------------------------

_GTEST_SQL = f"""
WITH o AS (
  SELECT event_type, ISODOW(CAST(ts AS TIMESTAMP)) AS dow,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2
), rt AS (SELECT event_type, SUM(obs) AS row_tot FROM o GROUP BY 1),
ct AS (SELECT dow, SUM(obs) AS col_tot FROM o GROUP BY 1),
nt AS (SELECT SUM(obs) AS n, CAST(COUNT(DISTINCT event_type) AS BIGINT)
              AS n_types,
              CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_dows
       FROM o),
t AS (
  SELECT CAST(obs AS DOUBLE) AS od,
         CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
           / CAST(n AS DOUBLE) AS e,
         n_types, n_dows
  FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN nt
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         MAX((n_types - 1) * (n_dows - 1)) AS df,
         CAST(ROUND(SUM(CAST(od * ln(od / e) AS DECIMAL(28,8))), 4)
              AS DOUBLE) * 2.0 AS g_stat
  FROM t
), wh AS (
  SELECT n_cells, CAST(df AS INT) AS df, g_stat,
         (exp(ln(g_stat / df) / 3.0) - (1.0 - 2.0 / (9.0 * df)))
           * sqrt(9.0 * df / 2.0) AS z
  FROM s
)
SELECT n_cells, df, ROUND(g_stat, 4) AS g_stat,
       ROUND({_phi_tail_sql('z')}, 8) AS p_wilson_hilferty
FROM wh
"""


@query("stats_g_test_independence", oracle=_GTEST_SQL)
def stats_g_test_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio) of independence between event_type
    and ISO day-of-week: G = 2·Σ o·ln(o/e) over the contingency
    cells — the information-theoretic twin of the chi-square query
    (G = 2N·MI in nats; additive across partitions of the table,
    which Pearson's X² is not). p via the Wilson–Hilferty cube-root
    normal approximation at df = (r−1)(c−1), evaluated by the IDENTICAL
    formula both engines (exp(ln(x)/3) for the cube root), so the
    hash never depends on the approximation's quality.

    Exactness: margins by aggregate-and-broadcast (the r12
    chi-square form — no windows); each o·ln(o/e) term decimal-cast
    per cell so the 35-term sum is order-independent.

    Scale: one count shuffle on ~35 keys; margins are broadcast
    joins; everything after runs on the cell frame."""
    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.weekday("ts") + F.lit(1)).alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rt = obs.groupBy("event_type").agg(F.sum("obs").alias("row_tot"))
    ct = obs.groupBy("dow").agg(F.sum("obs").alias("col_tot"))
    nt = obs.agg(
        F.sum("obs").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.countDistinct("dow").cast("bigint").alias("n_dows"),
    )
    t = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(nt))
        .select(
            F.col("obs").cast("double").alias("od"),
            (
                F.col("row_tot").cast("double")
                * F.col("col_tot").cast("double")
                / F.col("n").cast("double")
            ).alias("e"),
            "n_types",
            "n_dows",
        )
    )
    s = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max((F.col("n_types") - 1) * (F.col("n_dows") - 1)).alias("df"),
        (
            F.round(
                F.sum(
                    (F.col("od") * F.log(F.col("od") / F.col("e"))).cast(
                        "decimal(28,8)"
                    )
                ),
                4,
            ).cast("double")
            * 2.0
        ).alias("g_stat"),
    )
    dfc = F.col("df").cast("double")
    z = (
        F.exp(F.log(F.col("g_stat") / dfc) / 3.0)
        - (1.0 - 2.0 / (9.0 * dfc))
    ) * F.sqrt(9.0 * dfc / 2.0)
    return s.select(
        "n_cells",
        F.col("df").cast("int").alias("df"),
        F.round("g_stat", 4).alias("g_stat"),
        F.round(_phi_tail_col(z), 8).alias("p_wilson_hilferty"),
    )


# ---------------------------------------------------------------------------
# 2×2 odds ratio with the Woolf log-interval (md5 arm × converted)
# ---------------------------------------------------------------------------

_OR_SQL = f"""
WITH u AS (
  SELECT user_id,
         CAST(('0x' || substring(md5('or12:' || CAST(user_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 2 AS arm,
         CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS BIGINT) AS conv
  FROM events GROUP BY user_id
), c AS (
  SELECT
    CAST(SUM(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(SUM(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(SUM(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM u
), orr AS (
  SELECT a, b, c, d,
         ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c)) AS lor,
         sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d) AS se
  FROM c
)
SELECT a, b, c, d,
       ROUND(exp(lor), 6) AS odds_ratio,
       ROUND(exp(lor - 1.959963984540054 * se), 6) AS ci_low,
       ROUND(exp(lor + 1.959963984540054 * se), 6) AS ci_high,
       ROUND(2.0 * {_phi_tail_sql('ABS(lor / se)')}, 8) AS p_value
FROM orr
"""


@query("ab_odds_ratio_woolf", oracle=_OR_SQL)
def ab_odds_ratio_woolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-level 2×2 odds ratio between the md5 experiment arms on
    user conversion (any high-value purchase, value > 200 — "any
    purchase" is degenerate on this corpus: every user has one), with the Woolf logit
    interval exp(lnOR ± z·√(1/a+1/b+1/c+1/d)) and its two-sided
    normal p. The effect measure case-control convention reports —
    and on an A/A hash split the expected readout is OR ≈ 1 with the
    CI straddling it, making this double as a split-health audit
    beside ab_srm_check.

    Exactness: the 2×2 cells are exact integer counts off the
    engine-portable md5 split (seed 'or12'); everything after is one
    chain of identical double algebra (ln, sqrt, exp) rounded at the
    end — no sums of doubles anywhere.

    Scale: one user-key shuffle (the conversion reduce), then a
    4-integer readout."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 200),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("conv")
    ).select(
        md5_bucket(F.col("user_id"), F.lit("or12"), 2).alias("arm"), "conv"
    )
    c = u.agg(
        *[
            F.sum(
                F.when((F.col("arm") == arm) & (F.col("conv") == cv), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias(name)
            for name, arm, cv in (
                ("a", 0, 1),
                ("b", 0, 0),
                ("c", 1, 1),
                ("d", 1, 0),
            )
        ]
    )
    lor = F.log(
        (F.col("a").cast("double") * F.col("d"))
        / (F.col("b").cast("double") * F.col("c"))
    )
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    z975 = 1.959963984540054
    return c.select(
        "a",
        "b",
        "c",
        "d",
        F.round(F.exp(lor), 6).alias("odds_ratio"),
        F.round(F.exp(lor - z975 * se), 6).alias("ci_low"),
        F.round(F.exp(lor + z975 * se), 6).alias("ci_high"),
        F.round(2.0 * _phi_tail_col(F.abs(lor / se)), 8).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# McNemar's paired test (conversion flip between window halves)
# ---------------------------------------------------------------------------

_MCNEMAR_SQL = f"""
WITH bnd AS (
  SELECT (epoch_us(MIN(CAST(ts AS TIMESTAMP)))
          + epoch_us(MAX(CAST(ts AS TIMESTAMP)))) // 2 AS mid
  FROM events
), u AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'purchase' AND value > 200
             AND epoch_us(CAST(ts AS TIMESTAMP)) < mid
             THEN 1 ELSE 0 END) AS c1,
    MAX(CASE WHEN event_type = 'purchase' AND value > 200
             AND epoch_us(CAST(ts AS TIMESTAMP)) >= mid
             THEN 1 ELSE 0 END) AS c2
  FROM events CROSS JOIN bnd GROUP BY user_id
), cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN c1 = 1 AND c2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(SUM(CASE WHEN c1 = 0 AND c2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM u
), s AS (
  SELECT n_pairs, b, c,
         (ABS(CAST(b AS DOUBLE) - c) - 1.0)
           * (ABS(CAST(b AS DOUBLE) - c) - 1.0) / (b + c) AS chi2_cc
  FROM cells
)
SELECT n_pairs, b, c, ROUND(chi2_cc, 6) AS chi2_cc,
       ROUND(LEAST(1.0, 2.0 * {_phi_tail_sql('sqrt(chi2_cc)')}), 8)
         AS p_value
FROM s
"""


@query("ab_mcnemar_paired", oracle=_MCNEMAR_SQL)
def ab_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on PAIRED binary outcomes: per user, did the
    high-value-purchase flag flip between the first and second half
    of the observation window? Only the discordant cells matter
    (b = early-only, c = late-only); χ² = (|b−c|−1)²/(b+c) with
    continuity correction, p from the exact χ²(1) ↔ normal identity
    P(χ²₁ > x) = 2·Φ̄(√x). The within-subject before/after test a
    two-sample z-test gets WRONG (it ignores the pairing).

    Exactness: the midpoint is integer-µs floor-division arithmetic
    on min/max event times (bigint — both engines identical); cells
    are exact integer counts; one double chain after.

    Scale: one user-key shuffle (the per-user flag reduce) after a
    1-row broadcast of the midpoint; the test runs on 3 integers."""
    ev = load(spark, sf_dir, "events")
    bnd = ev.agg(
        F.expr(
            "(unix_micros(MIN(ts)) + unix_micros(MAX(ts))) DIV 2"
        ).alias("mid")
    )
    hv = (F.col("event_type") == "purchase") & (F.col("value") > 200)
    u = (
        ev.crossJoin(F.broadcast(bnd))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(hv & (F.expr("unix_micros(ts)") < F.col("mid")), 1)
                .otherwise(0)
            ).alias("c1"),
            F.max(
                F.when(hv & (F.expr("unix_micros(ts)") >= F.col("mid")), 1)
                .otherwise(0)
            ).alias("c2"),
        )
    )
    cells = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when((F.col("c1") == 1) & (F.col("c2") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("c1") == 0) & (F.col("c2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    ad = F.abs(F.col("b").cast("double") - F.col("c"))
    chi2 = (ad - 1.0) * (ad - 1.0) / (F.col("b") + F.col("c"))
    return cells.select(
        "n_pairs",
        "b",
        "c",
        F.round(chi2, 6).alias("chi2_cc"),
        F.round(
            F.least(F.lit(1.0), 2.0 * _phi_tail_col(F.sqrt(chi2))), 8
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Mood's median test (k-group, exact global median)
# ---------------------------------------------------------------------------

_MOOD_SQL = """
WITH s AS (
  SELECT value AS v, event_type AS g FROM events WHERE value IS NOT NULL
), pv AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY v
), cum AS (
  SELECT v, SUM(t) OVER (ORDER BY v) AS cw,
         (SELECT SUM(t) FROM pv) AS n
  FROM pv
), med AS (
  SELECT MIN(v) AS m FROM cum WHERE cw >= (n + 1) // 2
), cells AS (
  SELECT g,
         CAST(COUNT(CASE WHEN v >  (SELECT m FROM med) THEN 1 END)
              AS BIGINT) AS o_above,
         CAST(COUNT(CASE WHEN v <= (SELECT m FROM med) THEN 1 END)
              AS BIGINT) AS o_le
  FROM s GROUP BY g
), tot AS (
  SELECT CAST(SUM(o_above) AS BIGINT) AS ta,
         CAST(SUM(o_le) AS BIGINT) AS tl,
         CAST(SUM(o_above + o_le) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM cells
), terms AS (
  SELECT
    CAST((CAST(o_above AS DOUBLE)
          - CAST(ta AS DOUBLE) * (o_above + o_le) / n)
         * (CAST(o_above AS DOUBLE)
            - CAST(ta AS DOUBLE) * (o_above + o_le) / n)
         / (CAST(ta AS DOUBLE) * (o_above + o_le) / n)
         AS DECIMAL(28,8)) AS t1,
    CAST((CAST(o_le AS DOUBLE)
          - CAST(tl AS DOUBLE) * (o_above + o_le) / n)
         * (CAST(o_le AS DOUBLE)
            - CAST(tl AS DOUBLE) * (o_above + o_le) / n)
         / (CAST(tl AS DOUBLE) * (o_above + o_le) / n)
         AS DECIMAL(28,8)) AS t2,
    n, k
  FROM cells CROSS JOIN tot
), agg AS (
  SELECT n, CAST(k AS INT) AS n_groups, CAST(k - 1 AS INT) AS df,
         CAST(ROUND(SUM(t1 + t2), 6) AS DOUBLE) AS chi2
  FROM terms GROUP BY n, k
), med2 AS (SELECT m FROM med)
SELECT n AS n_total, n_groups, df,
       ROUND((SELECT m FROM med2), 6) AS grand_median,
       ROUND(chi2, 6) AS chi2,
       ROUND(exp(-chi2 / 2.0) * (1.0 + chi2 / 2.0), 8) AS p_value
FROM agg
"""


@query("stats_mood_median", oracle=_MOOD_SQL)
def stats_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: does each event type put the same share of
    its values above the EXACT grand median? The blunt-but-robust
    k-group location test (only counts above/≤ the pooled median —
    immune to any monotone transform and to outliers that wreck
    ANOVA; Kruskal-Wallis is its sharper rank sibling next door).

    The grand median is EXACT and distributed: per-value counts +
    the global prefix-sum spine (no unpartitioned window), lower
    median = least v with cum ≥ ⌈N/2⌉. Cells are integer counts
    against the broadcast median; the 2×k chi-square folds
    decimal-quantized per-cell terms; p at df = k−1 = 4 via the
    even-df closed-form survival (asserted like Kruskal-Wallis).

    Scale: one value-key shuffle + one range exchange for the
    median, one 5-group scan aggregate for the cells."""
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(F.col("value").alias("v"), F.col("event_type").alias("g"))
    pv = s.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    cum = with_global_prefix_sums(pv, ["v"], ["t"])
    med = cum.filter(
        F.col("_cum_t") >= F.expr("(_tot_t + 1) DIV 2")
    ).agg(F.min("v").alias("m"))
    cells = (
        s.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.count(F.when(F.col("v") > F.col("m"), 1))
            .cast("bigint")
            .alias("o_above"),
            F.count(F.when(F.col("v") <= F.col("m"), 1))
            .cast("bigint")
            .alias("o_le"),
            F.max("m").alias("m"),
        )
    )
    tot = cells.agg(
        F.sum("o_above").cast("bigint").alias("ta"),
        F.sum("o_le").cast("bigint").alias("tl"),
        F.sum(F.col("o_above") + F.col("o_le")).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    col_n = F.col("o_above") + F.col("o_le")
    e_a = F.col("ta").cast("double") * col_n / F.col("n")
    e_l = F.col("tl").cast("double") * col_n / F.col("n")
    t1 = (
        (F.col("o_above").cast("double") - e_a)
        * (F.col("o_above").cast("double") - e_a)
        / e_a
    ).cast("decimal(28,8)")
    t2 = (
        (F.col("o_le").cast("double") - e_l)
        * (F.col("o_le").cast("double") - e_l)
        / e_l
    ).cast("decimal(28,8)")
    agg = j.groupBy("n", "k", "m").agg(
        F.round(F.sum(t1 + t2), 6).cast("double").alias("chi2")
    )
    # df = k-1 must be even for the closed-form survival (the
    # Kruskal-Wallis contract); the corpus has k = 5 event types.
    return agg.select(
        F.col("n").alias("n_total"),
        F.col("k").cast("int").alias("n_groups"),
        (F.col("k") - 1).cast("int").alias("df"),
        F.round("m", 6).alias("grand_median"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.exp(-F.col("chi2") / 2.0) * (1.0 + F.col("chi2") / 2.0), 8
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Two-sample Cramér–von Mises (purchase vs view values)
# ---------------------------------------------------------------------------

_CVM_SQL = """
WITH s AS (
  SELECT value AS v, event_type = 'purchase' AS is_a
  FROM events WHERE event_type IN ('purchase', 'view')
    AND value IS NOT NULL
), pv AS (
  SELECT v,
         CAST(COUNT(CASE WHEN is_a THEN 1 END) AS BIGINT) AS c1,
         CAST(COUNT(CASE WHEN NOT is_a THEN 1 END) AS BIGINT) AS c2
  FROM s GROUP BY v
), cum AS (
  SELECT v, c1, c2,
         SUM(c1) OVER (ORDER BY v) AS f1,
         SUM(c2) OVER (ORDER BY v) AS f2,
         (SELECT SUM(c1) FROM pv) AS n,
         (SELECT SUM(c2) FROM pv) AS m
  FROM pv
), terms AS (
  SELECT n, m,
         CAST((c1 + c2)
              * (CAST(f1 AS DOUBLE) / n - CAST(f2 AS DOUBLE) / m)
              * (CAST(f1 AS DOUBLE) / n - CAST(f2 AS DOUBLE) / m)
              AS DECIMAL(28,10)) AS term
  FROM cum
), agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n1, CAST(MAX(m) AS BIGINT) AS n2,
         CAST(ROUND(SUM(term), 6) AS DOUBLE) AS ssum
  FROM terms
)
SELECT n1, n2,
       ROUND(CAST(n1 AS DOUBLE) * n2
             / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2))
             * ssum, 6) AS cvm_t
FROM agg
"""


@query("stats_cramer_von_mises", oracle=_CVM_SQL)
def stats_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic between purchase and
    view values: T = nm/N² · Σ over all pooled observations of
    (F_n(x) − G_m(x))². Where KS reads only the single worst ECDF
    gap, CvM integrates EVERY gap — far more sensitive to
    distributed (scale/shape) differences that never produce one
    large vertical gap. Statistic-only readout (its limiting law is
    nonstandard; thresholds come from published tables — T ≳ 0.46
    ≈ 5%), which is how the monitoring belt consumes it.

    Exactness: rides the SAME distinct-value prefix-sum spine as the
    KS query (exact integer cumulative counts under the value
    order); per-value terms t_v·(F−G)² decimal-quantized so the sum
    is order-independent; one closed-form double at output.

    Scale: one value-key shuffle + one range exchange — identical
    plan shape to stats_ks_two_sample; everything after runs on the
    distinct-value frame."""
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    )
    s = ev.select(
        F.col("value").alias("v"),
        (F.col("event_type") == "purchase").alias("is_a"),
    )
    pv = s.groupBy("v").agg(
        F.count(F.when(F.col("is_a"), 1)).cast("bigint").alias("c1"),
        F.count(F.when(~F.col("is_a"), 1)).cast("bigint").alias("c2"),
    )
    cum = with_global_prefix_sums(pv, ["v"], ["c1", "c2"])
    gap = (
        F.col("_cum_c1").cast("double") / F.col("_tot_c1")
        - F.col("_cum_c2").cast("double") / F.col("_tot_c2")
    )
    term = ((F.col("c1") + F.col("c2")) * gap * gap).cast("decimal(28,10)")
    agg = cum.agg(
        F.max("_tot_c1").cast("bigint").alias("n1"),
        F.max("_tot_c2").cast("bigint").alias("n2"),
        F.round(F.sum(term), 6).cast("double").alias("ssum"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    return agg.select(
        "n1",
        "n2",
        F.round(
            n1d * F.col("n2") / ((n1d + F.col("n2")) * (n1d + F.col("n2")))
            * F.col("ssum"),
            6,
        ).alias("cvm_t"),
    )


# ---------------------------------------------------------------------------
# Mantel–Haenszel stratified odds ratio + CMH test (strata = ISO dow)
# ---------------------------------------------------------------------------

_MH_SQL = f"""
WITH e AS (
  SELECT ISODOW(CAST(ts AS TIMESTAMP)) AS stratum,
         CAST(('0x' || substring(md5('mh12:' || CAST(user_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 2 AS arm,
         CASE WHEN event_type = 'purchase' AND value > 200
              THEN 1 ELSE 0 END AS succ
  FROM events
), cells AS (
  SELECT stratum,
    CAST(SUM(CASE WHEN arm = 0 AND succ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN arm = 0 AND succ = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(SUM(CASE WHEN arm = 1 AND succ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(SUM(CASE WHEN arm = 1 AND succ = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM e GROUP BY stratum
), t AS (
  SELECT CAST(a + b + c + d AS BIGINT) AS n, a, b, c, d,
    CAST(CAST(a AS DOUBLE) * d / (a + b + c + d) AS DECIMAL(28,10)) AS rr,
    CAST(CAST(b AS DOUBLE) * c / (a + b + c + d) AS DECIMAL(28,10)) AS ss,
    CAST(CAST(a AS DOUBLE) AS DECIMAL(28,10)) AS ai,
    CAST(CAST(a + b AS DOUBLE) * (a + c) / (a + b + c + d)
         AS DECIMAL(28,10)) AS ei,
    CAST(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
         / (CAST(a + b + c + d AS DOUBLE) * (a + b + c + d)
            * (a + b + c + d - 1)) AS DECIMAL(28,10)) AS vi
  FROM cells
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(ROUND(SUM(rr), 6) AS DOUBLE) AS num,
         CAST(ROUND(SUM(ss), 6) AS DOUBLE) AS den,
         CAST(ROUND(SUM(ai), 6) AS DOUBLE) AS sa,
         CAST(ROUND(SUM(ei), 6) AS DOUBLE) AS se,
         CAST(ROUND(SUM(vi), 6) AS DOUBLE) AS sv
  FROM t
), s AS (
  SELECT n_strata, n_total, num / den AS or_mh,
         (ABS(sa - se) - 0.5) * (ABS(sa - se) - 0.5) / sv AS cmh_chi2
  FROM agg
)
SELECT n_strata, n_total,
       ROUND(or_mh, 6) AS or_mh,
       ROUND(cmh_chi2, 6) AS cmh_chi2,
       ROUND(LEAST(1.0, 2.0 * {_phi_tail_sql('sqrt(cmh_chi2)')}), 8)
         AS p_value
FROM s
"""


@query("ab_mantel_haenszel", oracle=_MH_SQL)
def ab_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel–Haenszel stratified 2×2 analysis across ISO-dow strata:
    the pooled odds ratio OR_MH = Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ) and the
    continuity-corrected Cochran–Mantel–Haenszel χ²(1). THE fix for
    Simpson's paradox in experiment readouts — a day-of-week mix
    shift can reverse a crude 2×2 (ab_odds_ratio_woolf); MH pools
    the per-stratum evidence instead. On an A/A md5 split the
    expected readout is OR_MH ≈ 1, quiet p.

    Exactness: per-stratum cells are exact integers; each stratum's
    MH numerator/denominator and CMH E/V terms are decimal-quantized
    doubles so the 7-term sums are order-independent; χ²(1) p via
    the exact identity 2·Φ̄(√x).

    Scale: one (stratum × arm × succ) count shuffle (28 keys), then
    7-row algebra."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    ev = load(spark, sf_dir, "events")
    e = ev.select(
        (F.weekday("ts") + F.lit(1)).alias("stratum"),
        md5_bucket(F.col("user_id"), F.lit("mh12"), 2).alias("arm"),
        F.when(
            (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
        )
        .otherwise(0)
        .alias("succ"),
    )
    cells = e.groupBy("stratum").agg(
        *[
            F.sum(
                F.when((F.col("arm") == arm) & (F.col("succ") == sc), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias(nm)
            for nm, arm, sc in (
                ("a", 0, 1),
                ("b", 0, 0),
                ("c", 1, 1),
                ("d", 1, 0),
            )
        ]
    )
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("bigint")
    nd = n.cast("double")
    t = cells.select(
        n.alias("n"),
        (F.col("a").cast("double") * F.col("d") / n).cast(
            "decimal(28,10)"
        ).alias("rr"),
        (F.col("b").cast("double") * F.col("c") / n).cast(
            "decimal(28,10)"
        ).alias("ss"),
        F.col("a").cast("double").cast("decimal(28,10)").alias("ai"),
        (
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("a") + F.col("c"))
            / n
        ).cast("decimal(28,10)").alias("ei"),
        (
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("c") + F.col("d"))
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("d"))
            / (nd * n * (n - 1))
        ).cast("decimal(28,10)").alias("vi"),
    )
    agg = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.round(F.sum("rr"), 6).cast("double").alias("num"),
        F.round(F.sum("ss"), 6).cast("double").alias("den"),
        F.round(F.sum("ai"), 6).cast("double").alias("sa"),
        F.round(F.sum("ei"), 6).cast("double").alias("se"),
        F.round(F.sum("vi"), 6).cast("double").alias("sv"),
    )
    chi2 = (
        (F.abs(F.col("sa") - F.col("se")) - 0.5)
        * (F.abs(F.col("sa") - F.col("se")) - 0.5)
        / F.col("sv")
    )
    return agg.select(
        "n_strata",
        "n_total",
        F.round(F.col("num") / F.col("den"), 6).alias("or_mh"),
        F.round(chi2, 6).alias("cmh_chi2"),
        F.round(
            F.least(F.lit(1.0), 2.0 * _phi_tail_col(F.sqrt(chi2))), 8
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Friedman test (blocks = ISO dow, treatments = event types)
# ---------------------------------------------------------------------------

_FRIEDMAN_SQL = """
WITH cell AS (
  SELECT ISODOW(CAST(ts AS TIMESTAMP)) AS blk, event_type AS trt,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 6) AS DOUBLE)
           / COUNT(value) AS m
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), rk AS (
  SELECT a.blk, a.trt,
         CAST(COUNT(*) AS BIGINT) AS r
  FROM cell a JOIN cell b
    ON a.blk = b.blk
   AND (b.m < a.m OR (b.m = a.m AND b.trt <= a.trt))
  GROUP BY a.blk, a.trt
), rs AS (
  SELECT trt, CAST(SUM(r) AS BIGINT) AS rj FROM rk GROUP BY trt
), dims AS (
  SELECT CAST(COUNT(DISTINCT blk) AS BIGINT) AS b,
         CAST(COUNT(DISTINCT trt) AS BIGINT) AS k
  FROM cell
), q AS (
  SELECT b, k,
         12.0 / (CAST(b AS DOUBLE) * k * (k + 1))
           * (SELECT SUM(CAST(rj AS DOUBLE) * rj) FROM rs)
           - 3.0 * b * (k + 1) AS qstat
  FROM dims
)
SELECT CAST(b AS INT) AS n_blocks, CAST(k AS INT) AS n_treatments,
       CAST(k - 1 AS INT) AS df,
       ROUND(qstat, 6) AS q_stat,
       ROUND(exp(-qstat / 2.0) * (1.0 + qstat / 2.0), 8) AS p_value
FROM q
"""


@query("stats_friedman_test", oracle=_FRIEDMAN_SQL)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman two-way rank test: ranking the five event types'
    mean values WITHIN each ISO-dow block, do the treatments differ
    once the block (day-of-week) effect is removed? The repeated-
    measures ANOVA-on-ranks — Kruskal-Wallis would confound the dow
    effect; Friedman blocks it out. Q = 12/(bk(k+1))·ΣRⱼ² − 3b(k+1),
    p at df = k−1 = 4 via the even-df closed-form survival.

    Exactness: per-cell means use the davg rule (decimal sum rounded
    at 6, one double division — bit-identical both engines); ranks
    within a block come from a TRIANGULAR COUNT over the 5-row block
    under the (m, treatment-name) total order — deterministic
    tie-break, no window operator anywhere; rank sums are exact
    integers. Complete blocks verified by construction (every type
    occurs every dow at all fixture scales).

    Scale: one 35-key count shuffle, then a 35×35 broadcast
    triangular join on the cell frame — everything past the first
    aggregate is metadata-sized."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cell = ev.groupBy(
        (F.weekday("ts") + F.lit(1)).alias("blk"),
        F.col("event_type").alias("trt"),
    ).agg(
        (
            F.round(F.sum(F.col("value").cast("decimal(28,8)")), 6).cast(
                "double"
            )
            / F.count("value")
        ).alias("m")
    )
    a = cell.select(
        F.col("blk"), F.col("trt"), F.col("m")
    )
    b = cell.select(
        F.col("blk").alias("blk2"),
        F.col("trt").alias("trt2"),
        F.col("m").alias("m2"),
    )
    rk = (
        a.join(
            F.broadcast(b),
            (F.col("blk") == F.col("blk2"))
            & (
                (F.col("m2") < F.col("m"))
                | ((F.col("m2") == F.col("m")) & (F.col("trt2") <= F.col("trt")))
            ),
        )
        .groupBy("blk", "trt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    rs = rk.groupBy("trt").agg(F.sum("r").cast("bigint").alias("rj"))
    dims = cell.agg(
        F.countDistinct("blk").cast("bigint").alias("b"),
        F.countDistinct("trt").cast("bigint").alias("k"),
    )
    ssq = rs.agg(
        F.sum(F.col("rj").cast("double") * F.col("rj")).alias("s2")
    )
    q = dims.crossJoin(F.broadcast(ssq)).select(
        "b",
        "k",
        (
            12.0
            / (F.col("b").cast("double") * F.col("k") * (F.col("k") + 1))
            * F.col("s2")
            - 3.0 * F.col("b") * (F.col("k") + 1)
        ).alias("qstat"),
    )
    return q.select(
        F.col("b").cast("int").alias("n_blocks"),
        F.col("k").cast("int").alias("n_treatments"),
        (F.col("k") - 1).cast("int").alias("df"),
        F.round("qstat", 6).alias("q_stat"),
        F.round(
            F.exp(-F.col("qstat") / 2.0) * (1.0 + F.col("qstat") / 2.0), 8
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch + intersection estimate
# ---------------------------------------------------------------------------

_KMV_K = 200

_KMV_SQL = f"""
WITH ua AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
), ub AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
), ha AS (
  SELECT CAST(('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR)),
                                 1, 15)) AS BIGINT) AS h
  FROM ua
), hb AS (
  SELECT CAST(('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR)),
                                 1, 15)) AS BIGINT) AS h
  FROM ub
), ka AS (
  SELECT (SELECT list(h ORDER BY h) FROM ha)[1:{_KMV_K}] AS ks,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ha) AS n_exact
), kb AS (
  SELECT (SELECT list(h ORDER BY h) FROM hb)[1:{_KMV_K}] AS ks,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM hb) AS n_exact
), un AS (
  SELECT list_sort(list_distinct(ka.ks || kb.ks))[1:{_KMV_K}] AS ks
  FROM ka, kb
), est AS (
  SELECT ka.n_exact AS n_exact_a, kb.n_exact AS n_exact_b,
         CAST(len(ka.ks) AS BIGINT) AS k_a,
         CAST(len(kb.ks) AS BIGINT) AS k_b,
         CAST(len(un.ks) AS BIGINT) AS k_u,
         ka.ks[len(ka.ks)] AS hk_a,
         kb.ks[len(kb.ks)] AS hk_b,
         un.ks[len(un.ks)] AS hk_u,
         CAST(len(list_filter(un.ks,
              x -> list_contains(ka.ks, x) AND list_contains(kb.ks, x)))
              AS BIGINT) AS n_both
  FROM ka, kb, un
)
SELECT n_exact_a, n_exact_b,
       ROUND((k_a - 1) / (CAST(hk_a AS DOUBLE)
                          / 1152921504606846976.0), 4) AS est_a,
       ROUND((k_b - 1) / (CAST(hk_b AS DOUBLE)
                          / 1152921504606846976.0), 4) AS est_b,
       ROUND(CAST(n_both AS DOUBLE) / k_u
             * ((k_u - 1) / (CAST(hk_u AS DOUBLE)
                             / 1152921504606846976.0)), 4)
         AS est_intersection,
       ROUND(CAST(n_both AS DOUBLE) / k_u, 6) AS est_jaccard
FROM est
"""


@query("sketch_kmv_distinct_intersect", oracle=_KMV_SQL)
def sketch_kmv_distinct_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketches for the viewer
    and purchaser user sets, with the SET-INTERSECTION estimate HLL
    cannot give directly: est(|A|) = (k−1)/h₍ₖ₎ from the k-th
    smallest normalized hash, and est(|A∩B|) = ρ·est(|A∪B|) where ρ
    is the share of the union sketch present in both per-set
    sketches (Beyer et al. 2007). Deterministic end-to-end (md5
    order statistics — no RNG), so the sketch itself is
    hash-attested, and the exact distinct counts ride along as the
    accuracy readout.

    Scale: the sketch is MERGEABLE — each partition contributes its
    own ≤k smallest (groupBy over (set, partition-id) partials,
    state ≤ k·P rows), then one k-sized merge; the full hash set is
    never collected anywhere. Union/intersection run on three
    k-sized arrays.

    Exactness: hashes are exact 60-bit integers; order statistics
    and membership are integer operations; the only doubles are the
    three closed-form estimates, rounded."""
    ev = load(spark, sf_dir, "events")

    def kset(tp: str) -> DataFrame:
        h = (
            ev.filter(F.col("event_type") == tp)
            .select("user_id")
            .distinct()
            .select(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit("kmv"), "user_id")), 1, 15
                    ),
                    16,
                    10,
                )
                .cast("bigint")
                .alias("h")
            )
        )
        # mergeable min-k: per-partition partials (<= k each), then one
        # k-sized merge — exact k smallest, no data-sized state
        part = h.groupBy(F.spark_partition_id().alias("p")).agg(
            F.slice(F.array_sort(F.collect_list("h")), 1, _KMV_K).alias("ks")
        )
        return part.select(F.explode("ks").alias("h")).agg(
            F.slice(F.array_sort(F.collect_list("h")), 1, _KMV_K).alias("ks"),
        ).crossJoin(
            F.broadcast(h.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact")))
        )

    ka = kset("view").select(
        F.col("ks").alias("ks_a"), F.col("n_exact").alias("n_exact_a")
    )
    kb = kset("purchase").select(
        F.col("ks").alias("ks_b"), F.col("n_exact").alias("n_exact_b")
    )
    j = ka.crossJoin(F.broadcast(kb)).withColumn(
        "ks_u",
        F.slice(
            F.array_sort(F.array_distinct(F.concat("ks_a", "ks_b"))),
            1,
            _KMV_K,
        ),
    )
    two60 = 1152921504606846976.0  # 2^60 — hash normalization
    est = j.select(
        "n_exact_a",
        "n_exact_b",
        F.size("ks_a").cast("bigint").alias("k_a"),
        F.size("ks_b").cast("bigint").alias("k_b"),
        F.size("ks_u").cast("bigint").alias("k_u"),
        F.element_at("ks_a", -1).alias("hk_a"),
        F.element_at("ks_b", -1).alias("hk_b"),
        F.element_at("ks_u", -1).alias("hk_u"),
        F.size(
            F.filter(
                F.col("ks_u"),
                lambda x: F.array_contains(F.col("ks_a"), x)
                & F.array_contains(F.col("ks_b"), x),
            )
        )
        .cast("bigint")
        .alias("n_both"),
    )
    return est.select(
        "n_exact_a",
        "n_exact_b",
        F.round(
            (F.col("k_a") - 1) / (F.col("hk_a").cast("double") / two60), 4
        ).alias("est_a"),
        F.round(
            (F.col("k_b") - 1) / (F.col("hk_b").cast("double") / two60), 4
        ).alias("est_b"),
        F.round(
            F.col("n_both").cast("double")
            / F.col("k_u")
            * ((F.col("k_u") - 1) / (F.col("hk_u").cast("double") / two60)),
            4,
        ).alias("est_intersection"),
        F.round(F.col("n_both").cast("double") / F.col("k_u"), 6).alias(
            "est_jaccard"
        ),
    )


# ---------------------------------------------------------------------------
# Global transitivity (triangles vs wedges) of the co-activity graph
# ---------------------------------------------------------------------------

_TRANS_SQL = """
WITH b AS (
  SELECT DISTINCT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         user_id
  FROM events WHERE user_id < 100
), e AS (
  SELECT DISTINCT a.user_id AS u, c.user_id AS v
  FROM b a JOIN b c
    ON a.event_type = c.event_type AND a.h = c.h AND a.user_id < c.user_id
), sym AS (
  SELECT u, v FROM e UNION ALL SELECT v, u FROM e
), deg AS (
  SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u
), tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
), wed AS (
  SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges,
         CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM deg
)
SELECT n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       n_tri AS n_triangles, n_wedges,
       ROUND(3.0 * n_tri / n_wedges, 6) AS transitivity
FROM wed CROSS JOIN tri
"""


@query("graph_transitivity_global", oracle=_TRANS_SQL)
def graph_transitivity_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global transitivity (a.k.a. the global clustering coefficient)
    of the user co-activity graph: C = 3·triangles / wedges, where
    wedges = Σ_n C(deg n, 2). The one-number "how clique-like is
    this graph" summary — the graph-level companion of the per-node
    clustering coefficient (graph_clustering_coefficient reports
    WHERE the dense tissue is; this reports HOW MUCH there is, the
    number random-graph nulls are compared against).

    Exactness: pure integer counting (edge dedup, oriented-wedge
    triangle closure, exact degree binomials); one double division
    at output.

    Scale: identical bounds to the CC query — the oriented wedge
    join is Σ deg², probed linear under volume replication and
    quadratic-by-construction under density replication
    (SCALE.md round-12, the named degradation mode); the triangle
    closure is an edge-list equi-join. user_id < 100 bounds the
    bench, not the shape."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    b = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    e = (
        a.join(
            c,
            (F.col("a.event_type") == F.col("c.event_type"))
            & (F.col("a.h") == F.col("c.h"))
            & (F.col("a.user_id") < F.col("c.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)  # reused by degrees + triangles
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")),
        )
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    wed = deg.agg(
        F.sum(F.expr("(deg * (deg - 1)) DIV 2"))
        .cast("bigint")
        .alias("n_wedges"),
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
    )
    ecount = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        wed.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(ecount))
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_tri").alias("n_triangles"),
            "n_wedges",
            F.round(3.0 * F.col("n_tri") / F.col("n_wedges"), 6).alias(
                "transitivity"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman revenue concentration per market segment
# ---------------------------------------------------------------------------

_HHI_SQL = """
WITH cr AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,8))), 2)
              AS DOUBLE) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), seg AS (
  SELECT segment, CAST(ROUND(SUM(CAST(rev AS DECIMAL(28,8))), 2) AS DOUBLE)
           AS total_rev,
         CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM cr GROUP BY segment
), sh AS (
  SELECT cr.segment,
         CAST(10000.0 * (cr.rev / seg.total_rev) * (cr.rev / seg.total_rev)
              AS DECIMAL(28,10)) AS s2
  FROM cr JOIN seg USING (segment)
)
SELECT seg.segment, seg.n_customers,
       ROUND(seg.total_rev, 2) AS total_rev,
       CAST(ROUND(SUM(sh.s2), 4) AS DOUBLE) AS hhi
FROM sh JOIN seg USING (segment)
GROUP BY seg.segment, seg.n_customers, seg.total_rev
ORDER BY seg.segment
"""


@query("analytics_hhi_concentration", oracle=_HHI_SQL)
def analytics_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman revenue concentration per market segment:
    HHI = 10000·Σᵢ sᵢ² over customer revenue shares — the antitrust
    yardstick repurposed as "is this segment's revenue one whale or
    a long tail" (10000 = monopoly; <1500 ≈ unconcentrated). The
    concentration complement of quality_activity_gini: Gini reads
    inequality of the distribution, HHI reads dominance mass.

    Exactness: per-customer and per-segment revenue use exact
    decimal sums rounded in the decimal domain; each squared share
    is one identical double chain cast to decimal per customer so
    the segment fold is order-independent.

    Scale: one (segment, customer) aggregate (the corpus-sized
    shuffle), a segment-sized broadcast back, and a segment-keyed
    fold; no windows, no data-sized state."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cr = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("rev")
        )
    )
    seg = cr.groupBy("segment").agg(
        F.round(F.sum(F.col("rev").cast("decimal(28,8)")), 2)
        .cast("double")
        .alias("total_rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
    )
    sh = cr.join(F.broadcast(seg), "segment").select(
        "segment",
        "n_customers",
        "total_rev",
        (
            10000.0
            * (F.col("rev") / F.col("total_rev"))
            * (F.col("rev") / F.col("total_rev"))
        )
        .cast("decimal(28,10)")
        .alias("s2"),
    )
    return (
        sh.groupBy("segment", "n_customers", "total_rev")
        .agg(F.round(F.sum("s2"), 4).cast("double").alias("hhi"))
        .select(
            "segment",
            "n_customers",
            F.round("total_rev", 2).alias("total_rev"),
            "hhi",
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Durbin–Watson autocorrelation of detrended daily volume
# ---------------------------------------------------------------------------

_DW_SQL = """
WITH dd AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
              AS BIGINT) AS di,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(di) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(di * di) AS BIGINT) AS sxx,
         CAST(SUM(di * y) AS BIGINT) AS sxy
  FROM dd
), fit AS (
  SELECT n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS beta,
         sx, sy
  FROM m
), fit2 AS (
  SELECT n, beta,
         (CAST(sy AS DOUBLE) - beta * sx) / n AS alpha
  FROM fit
), resid AS (
  SELECT di, CAST(y AS DOUBLE) - (alpha + beta * di) AS e, n
  FROM dd CROSS JOIN fit2
), dw AS (
  SELECT MAX(a.n) AS n_days,
         CAST(ROUND(SUM(CAST((a.e - b.e) * (a.e - b.e)
                             AS DECIMAL(28,8))), 4) AS DOUBLE) AS num
  FROM resid a JOIN resid b ON b.di = a.di - 1
), den AS (
  SELECT CAST(ROUND(SUM(CAST(e * e AS DECIMAL(28,8))), 4) AS DOUBLE) AS den
  FROM resid
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       ROUND(num / den, 6) AS dw_stat,
       ROUND(1.0 - (num / den) / 2.0, 6) AS rho1_approx
FROM dw CROSS JOIN den
"""


@query("stats_durbin_watson", oracle=_DW_SQL)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson test statistic on the residuals of the daily
    event-volume linear trend: DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² ∈ [0,4], ≈ 2
    for white noise, → 0 under positive serial correlation. THE
    regression-residual autocorrelation check — a trending daily
    metric fit by OLS with autocorrelated errors has understated
    standard errors, and DW is the tripwire (rho1_approx ≈ 1−DW/2
    gives the implied lag-1 correlation).

    Exactness: the OLS fit uses ALL-INTEGER moment sums (Σdi, Σy,
    Σdi², Σdi·y are exact BIGINTs — no float aggregation anywhere in
    the fit), so α/β are one identical double division each;
    residuals are identical doubles; the two quadratic sums are
    decimal-quantized per term. Adjacent-day pairs come from a
    di−1 self-join (the Ljung-Box lag-spine convention — calendar
    gaps pair only truly adjacent days).

    Scale: one day-key count shuffle; the fit, residuals, and DW
    fold all run on the days-sized frame with a 1-row broadcast."""
    ev = load(spark, sf_dir, "events")
    dd = ev.groupBy(
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")), F.lit("2024-01-01").cast("date")
        ).alias("di")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    m = dd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("di").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("di") * F.col("di")).cast("bigint").alias("sxx"),
        F.sum(F.col("di") * F.col("y")).cast("bigint").alias("sxy"),
    )
    beta = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    fit = m.select(
        "n", beta.alias("beta"), "sx", "sy"
    ).select(
        "n",
        "beta",
        ((F.col("sy").cast("double") - F.col("beta") * F.col("sx")) / F.col("n")).alias(
            "alpha"
        ),
    )
    resid = dd.crossJoin(F.broadcast(fit)).select(
        "di",
        (F.col("y").cast("double") - (F.col("alpha") + F.col("beta") * F.col("di"))).alias(
            "e"
        ),
        "n",
    )
    ra = resid.alias("ra")
    rb = resid.select(
        (F.col("di") + 1).alias("dib"), F.col("e").alias("eb")
    )
    dw = (
        ra.join(rb, F.col("di") == F.col("dib"))
        .agg(
            F.max("n").alias("n_days"),
            F.round(
                F.sum(
                    ((F.col("e") - F.col("eb")) * (F.col("e") - F.col("eb"))).cast(
                        "decimal(28,8)"
                    )
                ),
                4,
            )
            .cast("double")
            .alias("num"),
        )
    )
    den = resid.agg(
        F.round(F.sum((F.col("e") * F.col("e")).cast("decimal(28,8)")), 4)
        .cast("double")
        .alias("den")
    )
    return dw.crossJoin(F.broadcast(den)).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(F.col("num") / F.col("den"), 6).alias("dw_stat"),
        F.round(1.0 - (F.col("num") / F.col("den")) / 2.0, 6).alias(
            "rho1_approx"
        ),
    )


# ---------------------------------------------------------------------------
# Binary-segmentation changepoint: best single split of daily volume
# ---------------------------------------------------------------------------

_BSEG_SQL = """
WITH dd AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
              AS BIGINT) AS di,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), cum AS (
  SELECT di, y,
         SUM(y) OVER (ORDER BY di) AS s1,
         CAST(ROW_NUMBER() OVER (ORDER BY di) AS BIGINT) AS rn,
         (SELECT CAST(SUM(y) AS BIGINT) FROM dd) AS st,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM dd) AS n
  FROM dd
), cand AS (
  SELECT di, rn, n, s1, st,
         CAST(s1 AS DOUBLE) * s1 / rn
           + CAST(st - s1 AS DOUBLE) * (st - s1) / (n - rn)
           - CAST(st AS DOUBLE) * st / n AS gain
  FROM cum WHERE rn < n
), best AS (
  SELECT di, rn, n, s1, st, gain,
         ROW_NUMBER() OVER (ORDER BY gain DESC, di) AS pick
  FROM cand
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(di AS BIGINT) AS split_di,
       CAST(rn AS BIGINT) AS n_left,
       ROUND(gain, 6) AS between_sse_gain,
       ROUND(CAST(s1 AS DOUBLE) / rn, 6) AS mean_left,
       ROUND(CAST(st - s1 AS DOUBLE) / (n - rn), 6) AS mean_right
FROM best WHERE pick = 1
"""


@query("events_best_split_sse", oracle=_BSEG_SQL)
def events_best_split_sse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of binary-segmentation changepoint detection on
    daily event volume: the split day maximizing the between-group
    sum-of-squares gain S₁²/n_L + S₂²/n_R − S²/N (equivalently,
    minimizing total within-segment SSE). The level-shift detector
    CUSUM approximates — this one is EXACT for a single shift, and
    the full binary-segmentation algorithm is this query applied
    recursively to each side.

    Exactness: cumulative and total sums are exact BIGINTs off the
    distributed prefix-sum spine (no unpartitioned window); the gain
    is identical double algebra per candidate; the argmax breaks
    ties on the EARLIEST day via a deterministic best-of struct.

    Scale: one day-key count shuffle + one range exchange; the
    candidate scan and argmax run on the days-sized frame
    (TakeOrdered-style 1-row reduce, no global sort)."""
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    ev = load(spark, sf_dir, "events")
    dd = ev.groupBy(
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")), F.lit("2024-01-01").cast("date")
        ).alias("di")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    dd = dd.withColumn("one", F.lit(1).cast("bigint"))
    cum = with_global_prefix_sums(dd, ["di"], ["y", "one"])
    cand = cum.select(
        "di",
        F.col("_cum_one").alias("rn"),
        F.col("_tot_one").alias("n"),
        F.col("_cum_y").alias("s1"),
        F.col("_tot_y").alias("st"),
    ).filter(F.col("rn") < F.col("n"))
    gain = (
        F.col("s1").cast("double") * F.col("s1") / F.col("rn")
        + (F.col("st") - F.col("s1")).cast("double")
        * (F.col("st") - F.col("s1"))
        / (F.col("n") - F.col("rn"))
        - F.col("st").cast("double") * F.col("st") / F.col("n")
    )
    scored = cand.withColumn("gain", gain)
    # deterministic argmax: max over (gain, -di) struct — ties to the
    # EARLIEST day; a 1-row reduce, not a sort
    best = scored.agg(
        F.max(
            F.struct(
                F.col("gain"),
                (-F.col("di")).alias("ndi"),
                F.col("di"),
                F.col("rn"),
                F.col("n"),
                F.col("s1"),
                F.col("st"),
            )
        ).alias("b")
    ).select("b.*")
    return best.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("di").cast("bigint").alias("split_di"),
        F.col("rn").cast("bigint").alias("n_left"),
        F.round("gain", 6).alias("between_sse_gain"),
        F.round(F.col("s1").cast("double") / F.col("rn"), 6).alias("mean_left"),
        F.round(
            (F.col("st") - F.col("s1")).cast("double")
            / (F.col("n") - F.col("rn")),
            6,
        ).alias("mean_right"),
    )


# ---------------------------------------------------------------------------
# MATTR moving-average type-token ratio (lexical diversity per doc)
# ---------------------------------------------------------------------------

_MATTR_W = 25

_MATTR_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
), w AS (
  SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
         CASE WHEN len(l) >= {_MATTR_W} THEN
           [CAST(len(list_distinct(l[i:i+{_MATTR_W}-1])) AS BIGINT)
            FOR i IN range(1, len(l) - {_MATTR_W} + 2)]
         ELSE [CAST(len(list_distinct(l)) AS BIGINT)] END AS dts,
         CASE WHEN len(l) >= {_MATTR_W}
              THEN {_MATTR_W} ELSE len(l) END AS w_eff
  FROM toks
)
SELECT doc_id, n_tokens,
       CAST(len(dts) AS BIGINT) AS n_windows,
       ROUND(CAST(list_sum(dts) AS DOUBLE) / (len(dts) * w_eff), 6)
         AS mattr
FROM w ORDER BY doc_id
"""


@query("text_mattr_diversity", oracle=_MATTR_SQL)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR — moving-average type-token ratio (McCarthy & Jarvis
    2010): mean of (distinct tokens / w) over every w=25-token
    sliding window of each document. The lexical-diversity metric
    that fixes raw TTR's length bias (TTR mechanically falls with
    document length, so corpus-quality filters built on it
    systematically mis-rank long docs); short docs fall back to
    plain TTR over the whole token list. Belongs in the text-quality
    belt next to the repetition ratio and Zipf fit.

    Exactness: window distinct-counts are exact integers from array
    slices; the mean is an integer sum over one double division.

    Scale: per-document array work inside whole-stage codegen
    (transform/slice/array_distinct — no UDF, no shuffle at all
    beyond the scan); O(len·w) per doc with w fixed."""
    d = load_wide(spark, sf_dir, "documents")  # widen: per-row window scan
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
    )
    w = _MATTR_W
    n = F.size("l")
    dts_long = F.transform(
        F.sequence(F.lit(1), n - w + 1),
        lambda i: F.size(F.array_distinct(F.slice("l", i, w))).cast("bigint"),
    )
    dts_short = F.array(F.size(F.array_distinct("l")).cast("bigint"))
    out = toks.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.when(n >= w, dts_long).otherwise(dts_short).alias("dts"),
        F.when(n >= w, F.lit(w)).otherwise(n).alias("w_eff"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        F.size("dts").cast("bigint").alias("n_windows"),
        F.round(
            F.aggregate(
                "dts", F.lit(0).cast("bigint"), lambda acc, x: acc + x
            ).cast("double")
            / (F.size("dts") * F.col("w_eff")),
            6,
        ).alias("mattr"),
    ).orderBy("doc_id")


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
# Synchronous label propagation (2 unrolled rounds, majority label)
# ---------------------------------------------------------------------------


def _lpa_oracle() -> str:
    """DuckDB CTE unroll of 2 synchronous LPA rounds (majority
    neighbor label, ties to the smallest label) over the co-activity
    graph — same unroll technique as the k-means/k-core oracles."""
    head = """
WITH b AS (
  SELECT DISTINCT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         user_id
  FROM events WHERE user_id < 100
), e AS (
  SELECT a.user_id AS u, c.user_id AS v
  FROM b a JOIN b c
    ON a.event_type = c.event_type AND a.h = c.h AND a.user_id < c.user_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
), sym AS (
  SELECT u, v FROM e UNION ALL SELECT v, u FROM e
), l0 AS (
  SELECT DISTINCT u AS node, u AS label FROM sym
)"""
    rounds = []
    for r in range(1, 3):
        rounds.append(f""",
v{r} AS (
  SELECT s.u AS node, l.label, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM sym s JOIN l{r - 1} l ON l.node = s.v
  GROUP BY s.u, l.label
), l{r} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY cnt DESC, label) AS rk
    FROM v{r}
  ) WHERE rk = 1
)""")
    tail = """
SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS size
FROM l2 GROUP BY label ORDER BY size DESC, community LIMIT 20
"""
    return head + "".join(rounds) + tail


@query("graph_label_propagation", oracle=_lpa_oracle)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    user REPEATED-co-activity graph (an edge needs >= 3 shared
    (type, hour) buckets — one shared busy hour is noise, and the
    unthresholded graph is 70% dense, where every community
    algorithm rightly returns one block), 2 rounds: every node
    adopts its neighbors' MAJORITY label, ties to the smallest label —
    community detection where connected components is too coarse
    (components only finds disconnected islands; LPA splits a
    connected graph along density boundaries). Top-20 communities
    by size.

    Determinism contract: the classic async LPA is order-dependent;
    the SYNCHRONOUS variant with a total-order tie-break
    (count DESC, label ASC via one struct-max) is a pure function
    of the graph, so a DuckDB CTE unroll replays both rounds
    bit-for-bit (the k-means/k-core oracle technique). Fixed round
    count = fixed plan depth — the production form checkpoints per
    round via RoundCheckpointer like pagerank.

    Scale: each round is one (node, label) count shuffle + a
    per-node struct-max — Σ deg work per round, never quadratic;
    labels live on nodes (bounded state)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    b = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    e = (
        a.join(
            c,
            (F.col("a.event_type") == F.col("c.event_type"))
            & (F.col("a.h") == F.col("c.h"))
            & (F.col("a.user_id") < F.col("c.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 3)
        .select("u", "v")
    )
    sym = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)  # reused by both rounds
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(2):
        votes = (
            sym.join(
                labels.select(
                    F.col("node").alias("v"), F.col("label")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        # majority with ties to the SMALLEST label: one struct-max
        labels = votes.groupBy("node").agg(
            F.max(
                F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
            ).alias("m")
        ).select("node", (-F.col("m.nl")).alias("label"))
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .orderBy(F.col("size").desc(), "community")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto front) of customers by (revenue, order count)
# ---------------------------------------------------------------------------

_SKY_SQL = """
WITH cust AS (
  SELECT o_custkey AS custkey,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,8))), 2) AS DOUBLE)
           AS rev,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
), v AS (
  SELECT rev, CAST(MAX(n_orders) AS BIGINT) AS vmax FROM cust GROUP BY rev
), r AS (
  SELECT rev, vmax,
         MAX(vmax) OVER (ORDER BY rev DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS r_excl
  FROM v
), sky AS (
  SELECT c.custkey, c.rev, c.n_orders
  FROM cust c JOIN r ON r.rev = c.rev
  WHERE (r.r_excl IS NULL OR r.r_excl < c.n_orders)
    AND r.vmax <= c.n_orders
)
SELECT custkey, ROUND(rev, 2) AS revenue, n_orders
FROM sky ORDER BY rev DESC, custkey
"""


@query("analytics_skyline_pareto", oracle=_SKY_SQL)
def analytics_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front) of customers under (total revenue,
    order count): a customer survives iff NO other customer weakly
    dominates them on both axes with at least one strict — the
    classic "best under any monotone preference" database operator
    (Börzsönyi et al. 2001), here the whale shortlist no single
    score can produce.

    Distributed form: dominance collapses to ONE prefix-max scan —
    sort distinct revenue values descending; a point is dominated
    iff the running max of order-counts over STRICTLY higher
    revenues reaches its count, or a same-revenue point has strictly
    more orders. The exclusive prefix max rides the month-stitch
    running-extreme helper over a rank spine (rank from the
    distributed prefix sum — no unpartitioned window anywhere).

    Exactness: revenue is the exact decimal sum rounded at 2 (ties
    compare exactly); everything else is integer counting.

    Scale: one customer-key aggregate, a distinct-revenue spine
    (≪ customers), one range exchange for ranks, and a broadcast
    join back — never a pairwise dominance join (O(n²) is the naive
    skyline's named failure mode)."""
    from ibd_pipeline_spark.operators.calendar import (
        month_stitched_running_extreme,
    )
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    o = load(spark, sf_dir, "orders")
    cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2)
        .cast("double")
        .alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    v = cust.groupBy("rev").agg(
        F.max("n_orders").cast("bigint").alias("vmax")
    ).withColumn("one", F.lit(1).cast("bigint"))
    ranked = with_global_prefix_sums(
        v, [(-F.col("rev")).alias("negrev")], ["one"]
    ).select("rev", "vmax", F.col("_cum_one").alias("rk"))
    # inclusive running max over the rank order, block-stitched
    rincl = month_stitched_running_extreme(
        ranked,
        "rk",
        "vmax",
        "r_incl",
        kind="max",
        block=F.floor(F.col("rk") / 64),
    )
    # exclusive prefix max = inclusive max at rank-1 (NULL at rank 1)
    prev = rincl.select(
        (F.col("rk") + 1).alias("rk_next"), F.col("r_incl").alias("r_excl")
    )
    spine = rincl.join(
        F.broadcast(prev), F.col("rk") == F.col("rk_next"), "left"
    ).select("rev", "vmax", "r_excl")
    sky = (
        cust.join(F.broadcast(spine), "rev")
        .filter(
            (F.col("r_excl").isNull() | (F.col("r_excl") < F.col("n_orders")))
            & (F.col("vmax") <= F.col("n_orders"))
        )
    )
    return sky.select(
        "custkey", F.round("rev", 2).alias("revenue"), "n_orders"
    ).orderBy(F.col("rev").desc(), "custkey")


# ---------------------------------------------------------------------------
# Bigram language-model perplexity (train/held-out split by doc parity)
# ---------------------------------------------------------------------------

_BIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
), grams AS (
  SELECT doc_id, source, l[i] AS w1, l[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(l))) t(i)
), train_big AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM grams WHERE doc_id % 2 = 0 GROUP BY w1, w2
), train_ctx AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM train_big GROUP BY w1
), vocab AS (
  SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM train_big
), scored AS (
  SELECT g.doc_id, g.source,
         CAST(ln((COALESCE(tb.c12, 0) + 1.0)
                 / (COALESCE(tc.c1, 0) + (SELECT v FROM vocab)))
              AS DECIMAL(28,10)) AS lp
  FROM grams g
  LEFT JOIN train_big tb ON tb.w1 = g.w1 AND tb.w2 = g.w2
  LEFT JOIN train_ctx tc ON tc.w1 = g.w1
  WHERE g.doc_id % 2 = 1
), per_src AS (
  SELECT source,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(ROUND(SUM(lp), 6) AS DOUBLE) AS lp_sum
  FROM scored GROUP BY source
)
SELECT source, n_docs, n_bigrams,
       ROUND(-lp_sum / n_bigrams, 6) AS cross_entropy_nats,
       ROUND(exp(-lp_sum / n_bigrams), 4) AS perplexity
FROM per_src ORDER BY source
"""


@query("train_bigram_perplexity", oracle=_BIGRAM_SQL)
def train_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram-LM perplexity per source: train an add-1-
    smoothed bigram model on even doc_ids, score odd doc_ids —
    P(w₂|w₁) = (c(w₁,w₂)+1)/(c(w₁)+V) — and report per-source
    cross-entropy and perplexity. The corpus-quality readout one
    level up from train_unigram_logprob_score: bigram surprise
    catches scrambled/boilerplate text a unigram model scores as
    fluent, and per-source perplexity is the standard "which crawl
    slice is OOD for my model" ranking.

    Exactness: counts and V are exact integers; each bigram's
    log-probability is one identical double ln() chain
    decimal-quantized before the per-source fold.

    Scale: gram-postings joins (the DSIR/decontamination shape) —
    the bigram table is vocab²-bounded and Zipf-small; the held-out
    stream left-joins it on the gram key (broadcastable once
    thresholded); no data-sized state anywhere."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
    )
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.zip_with(
                F.slice("l", 1, F.greatest(F.size("l") - 1, F.lit(0))),
                F.slice("l", 2, F.greatest(F.size("l") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("g"),
    ).select("doc_id", "source", "g.w1", "g.w2")
    train_big = (
        grams.filter(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    train_ctx = train_big.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1")
    )
    vocab = train_big.agg(
        F.countDistinct("w2").cast("bigint").alias("v")
    )
    scored = (
        grams.filter(F.col("doc_id") % 2 == 1)
        .join(train_big, ["w1", "w2"], "left")
        .join(train_ctx, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "source",
            F.log(
                (F.coalesce("c12", F.lit(0)) + 1.0)
                / (F.coalesce("c1", F.lit(0)) + F.col("v"))
            )
            .cast("decimal(28,10)")
            .alias("lp"),
        )
    )
    per_src = scored.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.sum("lp"), 6).cast("double").alias("lp_sum"),
    )
    return per_src.select(
        "source",
        "n_docs",
        "n_bigrams",
        F.round(-F.col("lp_sum") / F.col("n_bigrams"), 6).alias(
            "cross_entropy_nats"
        ),
        F.round(F.exp(-F.col("lp_sum") / F.col("n_bigrams")), 4).alias(
            "perplexity"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test on daily volume (above/below exact median)
# ---------------------------------------------------------------------------

_RUNS_SQL = f"""
WITH dd AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
              AS BIGINT) AS di,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), med AS (
  SELECT MIN(y) AS m FROM (
    SELECT y, SUM(cnt) OVER (ORDER BY y) AS cw,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dd) AS n
    FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM dd GROUP BY y)
  ) WHERE cw >= (n + 1) // 2
), kept AS (
  SELECT di, CASE WHEN y > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
  FROM dd WHERE y <> (SELECT m FROM med)
), seq AS (
  SELECT di, s, ROW_NUMBER() OVER (ORDER BY di) AS rn FROM kept
), runs AS (
  SELECT
    (SELECT CAST(SUM(s) AS BIGINT) FROM kept) AS n1,
    (SELECT CAST(COUNT(*) - SUM(s) AS BIGINT) FROM kept) AS n2,
    CAST(1 + COUNT(*) AS BIGINT) AS r
  FROM seq a JOIN seq b ON b.rn = a.rn + 1 AND b.s <> a.s
), z AS (
  SELECT n1, n2, r,
         2.0 * n1 * n2 / (n1 + n2) + 1.0 AS mu,
         sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
              / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)))
           AS sd
  FROM runs
)
SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
       ROUND(mu, 6) AS expected_runs,
       ROUND((r - mu) / sd, 6) AS z_stat,
       ROUND(2.0 * {_phi_tail_sql('ABS((r - mu) / sd)')}, 8) AS p_value
FROM z
"""


@query("stats_runs_test", oracle=_RUNS_SQL)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of daily volume:
    split days into above/below the EXACT median (median-equal days
    excluded, the standard convention), count runs of consecutive
    same-sign days, compare to E[R] = 2n₁n₂/N + 1. Too few runs =
    trending/autocorrelated volume, too many = oscillation — the
    nonparametric companion to Durbin–Watson (DW reads residual
    correlation strength; runs reads sign-pattern randomness with
    no linearity assumption).

    Exactness: the median comes from the distributed prefix-sum
    spine (exact, window-free on the Spark side); run boundaries are
    integer comparisons between RANK-adjacent kept days (rank from
    the same spine; calendar gaps don't split runs — documented
    convention); one double chain + the shared normal tail.

    Scale: one day-key count shuffle; the sequence logic runs on the
    days-sized frame via a rank self-join."""
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    ev = load(spark, sf_dir, "events")
    dd = ev.groupBy(
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")), F.lit("2024-01-01").cast("date")
        ).alias("di")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    pv = dd.groupBy("y").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    cum = with_global_prefix_sums(pv, ["y"], ["cnt"])
    med = cum.filter(
        F.col("_cum_cnt") >= F.expr("(_tot_cnt + 1) DIV 2")
    ).agg(F.min("y").alias("m"))
    kept = (
        dd.crossJoin(F.broadcast(med))
        .filter(F.col("y") != F.col("m"))
        .select(
            "di",
            F.when(F.col("y") > F.col("m"), 1).otherwise(0).alias("s"),
        )
        .withColumn("one", F.lit(1).cast("bigint"))
    )
    seq = with_global_prefix_sums(kept, ["di"], ["one"]).select(
        "s", F.col("_cum_one").alias("rn")
    )
    nxt = seq.select((F.col("rn") - 1).alias("rnp"), F.col("s").alias("s2"))
    changes = seq.join(nxt, F.col("rn") == F.col("rnp")).filter(
        F.col("s") != F.col("s2")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ch"))
    counts = kept.agg(
        F.sum("s").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("n2"),
    )
    z = counts.crossJoin(F.broadcast(changes)).select(
        "n1",
        "n2",
        (F.col("ch") + 1).cast("bigint").alias("r"),
    )
    mu = 2.0 * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")) + 1.0
    nn = (F.col("n1") + F.col("n2")).cast("double")
    sd = F.sqrt(
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))
        / (nn * (F.col("n1") + F.col("n2")) * (F.col("n1") + F.col("n2") - 1))
    )
    zs = (F.col("r") - mu) / sd
    return z.select(
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.round(mu, 6).alias("expected_runs"),
        F.round(zs, 6).alias("z_stat"),
        F.round(2.0 * _phi_tail_col(F.abs(zs)), 8).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Benjamini–Yekutieli FDR under arbitrary dependence (brand z-tests)
# ---------------------------------------------------------------------------

_BY_Q_NUM, _BY_Q_DEN = 1, 10  # q = 0.10, the BH family convention


def _by_oracle() -> str:
    from ibd_pipeline_spark.queries.round10_stats import _phi_tail_sql as pts

    return f"""
WITH b AS (
  SELECT p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt FROM b
), zt AS (
  SELECT brand, n,
         ABS((CAST(r AS DOUBLE) / n - CAST(rt AS DOUBLE) / nt)
             / sqrt((CAST(rt AS DOUBLE) / nt)
                    * (1.0 - CAST(rt AS DOUBLE) / nt) / n)) AS az
  FROM b CROSS JOIN tot
), pv AS (
  SELECT brand, n, az, ROUND(2.0 * {pts("az")}, 8) AS p_value FROM zt
), mc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST((SELECT CAST(ROUND(SUM(
                 CAST(1.0 / CAST(i AS DOUBLE) AS DECIMAL(28,12))), 10)
               AS DOUBLE)
               FROM range(1, 100001) t(i)
               WHERE i <= (SELECT COUNT(*) FROM pv)) AS DOUBLE)
           AS cm
  FROM pv
), rk AS (
  SELECT a.brand, a.n, a.az, a.p_value,
         CAST(COUNT(*) AS BIGINT) AS rank
  FROM pv a
  JOIN pv c ON (c.p_value < a.p_value)
            OR (c.p_value = a.p_value AND c.brand <= a.brand)
  GROUP BY a.brand, a.n, a.az, a.p_value
), kmax AS (
  SELECT COALESCE(MAX(rank), 0) AS kmax
  FROM rk CROSS JOIN mc
  WHERE p_value * m * cm * {_BY_Q_DEN} <= rank * {_BY_Q_NUM}
)
SELECT brand, n, ROUND(az, 6) AS z_stat, p_value,
       CAST(rank AS INT) AS p_rank,
       ROUND((SELECT cm FROM mc), 10) AS c_m,
       rank <= kmax.kmax AS rejected
FROM rk, kmax
ORDER BY brand
"""


@query("stats_benjamini_yekutieli", oracle=_by_oracle)
def stats_benjamini_yekutieli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Yekutieli FDR control (q = 0.10) over the SAME
    per-brand z-test family as BH and Holm — the third corner of the
    multiple-testing belt: BY's harmonic penalty c(m) = Σ 1/i makes
    the FDR guarantee hold under ARBITRARY dependence between tests
    (brand return rates share the corpus denominator, so they are
    dependent — exactly BY's regime; BH assumes positive dependence
    and is reported as triage).

    Exactness: c(m) sums decimal-quantized harmonic terms
    (order-independent; rounded at 10 in the decimal domain); the
    step-up inequality p·m·c(m)·10 ≤ rank is evaluated on identical
    doubles both engines; ranks via the brand-bounded triangular
    join (window-free).

    Scale: identical plan shape to BH — one fact-dim join, m-row
    algebra after."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("r"),
        )
    )
    tot = b.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("r").cast("bigint").alias("rt"),
    )
    p0 = F.col("rt").cast("double") / F.col("nt")
    az = F.abs(
        (F.col("r").cast("double") / F.col("n") - p0)
        / F.sqrt(p0 * (1.0 - p0) / F.col("n"))
    )
    pv = (
        b.crossJoin(F.broadcast(tot))
        .select(
            "brand",
            "n",
            az.alias("az"),
        )
        .select(
            "brand",
            "n",
            "az",
            F.round(2.0 * _phi_tail_col(F.col("az")), 8).alias("p_value"),
        )
    )
    mc = pv.agg(F.count(F.lit(1)).cast("bigint").alias("m")).select(
        "m",
        F.round(
            F.expr(
                "aggregate(transform(sequence(1, CAST(m AS INT)),"
                " i -> CAST(1.0 / CAST(i AS DOUBLE) AS DECIMAL(28,12))),"
                " CAST(0 AS DECIMAL(28,12)),"
                " (acc, x) -> CAST(acc + x AS DECIMAL(28,12)))"
            ),
            10,
        )
        .cast("double")
        .alias("cm"),
    )
    a, c = pv.alias("a"), pv.alias("c")
    rk = (
        a.join(
            F.broadcast(c),
            (F.col("c.p_value") < F.col("a.p_value"))
            | (
                (F.col("c.p_value") == F.col("a.p_value"))
                & (F.col("c.brand") <= F.col("a.brand"))
            ),
        )
        .groupBy("a.brand", "a.n", "a.az", "a.p_value")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rank"))
        .crossJoin(F.broadcast(mc))
    )
    kmax = rk.filter(
        F.col("p_value") * F.col("m") * F.col("cm") * _BY_Q_DEN
        <= F.col("rank") * _BY_Q_NUM
    ).agg(F.coalesce(F.max("rank"), F.lit(0)).alias("kmax"))
    return (
        rk.crossJoin(F.broadcast(kmax))
        .select(
            "brand",
            "n",
            F.round("az", 6).alias("z_stat"),
            "p_value",
            F.col("rank").cast("int").alias("p_rank"),
            F.round("cm", 10).alias("c_m"),
            (F.col("rank") <= F.col("kmax")).alias("rejected"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# Anderson–Darling k-sample (k=2, Scholz–Stephens ties version)
# ---------------------------------------------------------------------------

_AD_SQL = """
WITH s AS (
  SELECT value AS v, event_type = 'purchase' AS is_a
  FROM events WHERE event_type IN ('purchase', 'view')
    AND value IS NOT NULL
), pv AS (
  SELECT v,
         CAST(COUNT(CASE WHEN is_a THEN 1 END) AS BIGINT) AS l1,
         CAST(COUNT(CASE WHEN NOT is_a THEN 1 END) AS BIGINT) AS l2
  FROM s GROUP BY v
), cum AS (
  SELECT v, l1, l2, l1 + l2 AS lj,
         SUM(l1) OVER (ORDER BY v) AS f1,
         SUM(l2) OVER (ORDER BY v) AS f2,
         (SELECT SUM(l1) FROM pv) AS n1,
         (SELECT SUM(l2) FROM pv) AS n2
  FROM pv
), terms AS (
  SELECT n1, n2, n1 + n2 AS nn,
         CAST(f1 AS DOUBLE) - l1 / 2.0 AS ma1,
         CAST(f2 AS DOUBLE) - l2 / 2.0 AS ma2,
         CAST(f1 + f2 AS DOUBLE) - lj / 2.0 AS ba,
         CAST(lj AS DOUBLE) AS lj
  FROM cum
), inner_t AS (
  SELECT n1, n2, nn,
    CAST((lj / nn) * ((nn * ma1 - n1 * ba) * (nn * ma1 - n1 * ba))
         / (ba * (nn - ba) - nn * lj / 4.0) / n1 AS DECIMAL(28,10)) AS t1,
    CAST((lj / nn) * ((nn * ma2 - n2 * ba) * (nn * ma2 - n2 * ba))
         / (ba * (nn - ba) - nn * lj / 4.0) / n2 AS DECIMAL(28,10)) AS t2
  FROM terms
)
SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(CAST(MAX(nn) - 1 AS DOUBLE) / MAX(nn)
             * CAST(ROUND(SUM(t1 + t2), 6) AS DOUBLE), 6) AS a2_stat
FROM inner_t
"""


@query("stats_anderson_darling_2samp", oracle=_AD_SQL)
def stats_anderson_darling_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson–Darling statistic (Scholz & Stephens 1987,
    the midrank/ties version of A²ₐₖN at k=2) between purchase and
    view values. AD weights ECDF gaps by 1/(F(1−F)) — maximal
    sensitivity in the TAILS, which is where training-data value
    distributions actually drift (CvM weighs the middle, KS only the
    worst point; the three together are the standard drift triage).
    Statistic-only readout like CvM (the null law is tabulated;
    A² ≫ k−1 = 1 is the drift signal).

    Exactness: the midrank cumulatives (F − l/2) are exact halves of
    integers; every per-value term is one identical double chain
    decimal-quantized before the fold; the (N−1)/N factor applies
    after the rounded sum.

    Scale: the same distinct-value prefix-sum spine as KS/CvM — one
    value-key shuffle + one range exchange."""
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    )
    s = ev.select(
        F.col("value").alias("v"),
        (F.col("event_type") == "purchase").alias("is_a"),
    )
    pv = s.groupBy("v").agg(
        F.count(F.when(F.col("is_a"), 1)).cast("bigint").alias("l1"),
        F.count(F.when(~F.col("is_a"), 1)).cast("bigint").alias("l2"),
    )
    cum = with_global_prefix_sums(pv, ["v"], ["l1", "l2"])
    n1 = F.col("_tot_l1")
    n2 = F.col("_tot_l2")
    nn = (n1 + n2).cast("double")
    lj = (F.col("l1") + F.col("l2")).cast("double")
    ma1 = F.col("_cum_l1").cast("double") - F.col("l1") / 2.0
    ma2 = F.col("_cum_l2").cast("double") - F.col("l2") / 2.0
    ba = (F.col("_cum_l1") + F.col("_cum_l2")).cast("double") - lj / 2.0
    den = ba * (nn - ba) - nn * lj / 4.0
    t1 = (
        (lj / nn) * ((nn * ma1 - n1 * ba) * (nn * ma1 - n1 * ba)) / den / n1
    ).cast("decimal(28,10)")
    t2 = (
        (lj / nn) * ((nn * ma2 - n2 * ba) * (nn * ma2 - n2 * ba)) / den / n2
    ).cast("decimal(28,10)")
    agg = cum.agg(
        F.max(n1).cast("bigint").alias("n1"),
        F.max(n2).cast("bigint").alias("n2"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.round(F.sum(t1 + t2), 6).cast("double").alias("ssum"),
        F.max(nn).alias("nn"),
    )
    return agg.select(
        "n1",
        "n2",
        "n_distinct",
        F.round(
            (F.col("nn") - 1.0) / F.col("nn") * F.col("ssum"), 6
        ).alias("a2_stat"),
    )


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance diversified re-ranking (search belt)
# ---------------------------------------------------------------------------

_MMR_POOL = 10
_MMR_K = 5
_MMR_LAM = "0.7"


def _mmr_oracle() -> str:
    """DuckDB unroll of the 5-step MMR greedy: quantized-cosine pool,
    pairwise sims, then one argmax CTE per step (the k-means-unroll
    technique applied to a greedy selection)."""
    from ibd_pipeline_spark.queries.similarity import _KM_DIM

    def qdot(a: str, b: str) -> str:
        return (
            f"(SELECT SUM(CAST(FLOOR({a}.v[i] * {b}.v[i] * 1000000000000.0)"
            f" AS BIGINT)) FROM UNNEST(generate_series(1,{_KM_DIM})) t(i))"
        )

    head = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), nf AS (
  SELECT vec_id,
         (SELECT SUM(CAST(FLOOR(e.v[i] * e.v[i] * 1000000000000.0)
                          AS BIGINT))
          FROM UNNEST(generate_series(1,{_KM_DIM})) t(i)) AS nfp
  FROM e
), scoredall AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         ROUND(CAST({qdot('q', 'c')} AS DOUBLE)
               / sqrt(CAST(nq.nfp AS DOUBLE) * nc.nfp), 9) AS rel
  FROM e q JOIN e c ON q.vec_id < 3 AND c.vec_id <> q.vec_id
  JOIN nf nq ON nq.vec_id = q.vec_id
  JOIN nf nc ON nc.vec_id = c.vec_id
), pool AS (
  SELECT qid, cid, rel FROM (
    SELECT qid, cid, rel,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY rel DESC, cid) AS rn
    FROM scoredall
  ) WHERE rn <= {_MMR_POOL}
), pp AS (
  SELECT a.qid, a.cid AS ca, b.cid AS cb,
         ROUND(CAST((SELECT SUM(CAST(FLOOR(ea.v[i] * eb.v[i]
                                           * 1000000000000.0) AS BIGINT))
                     FROM UNNEST(generate_series(1,{_KM_DIM})) t(i))
                    AS DOUBLE)
               / sqrt(CAST(na.nfp AS DOUBLE) * nb.nfp), 9) AS s
  FROM pool a JOIN pool b ON a.qid = b.qid AND a.cid <> b.cid
  JOIN e ea ON ea.vec_id = a.cid JOIN e eb ON eb.vec_id = b.cid
  JOIN nf na ON na.vec_id = a.cid JOIN nf nb ON nb.vec_id = b.cid
), sel1 AS (
  SELECT qid, cid, 1 AS rank, rel AS score FROM (
    SELECT qid, cid, rel,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY rel DESC, cid) AS rn
    FROM pool
  ) WHERE rn = 1
), sall1 AS (SELECT * FROM sel1)"""
    steps = []
    for k in range(2, _MMR_K + 1):
        steps.append(f""",
cand{k} AS (
  SELECT p.qid, p.cid,
         {_MMR_LAM} * p.rel - (1.0 - {_MMR_LAM}) * mx.s AS score
  FROM pool p
  JOIN (SELECT pp.qid, pp.ca AS cid, MAX(pp.s) AS s
        FROM pp JOIN sall{k - 1} sp
          ON sp.qid = pp.qid AND sp.cid = pp.cb
        GROUP BY pp.qid, pp.ca) mx
    ON mx.qid = p.qid AND mx.cid = p.cid
  WHERE NOT EXISTS (SELECT 1 FROM sall{k - 1} sp2
                    WHERE sp2.qid = p.qid AND sp2.cid = p.cid)
), sel{k} AS (
  SELECT qid, cid, {k} AS rank, score FROM (
    SELECT qid, cid, score,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY score DESC, cid) AS rn
    FROM cand{k}
  ) WHERE rn = 1
), sall{k} AS (SELECT * FROM sall{k - 1} UNION ALL SELECT * FROM sel{k})""")
    tail = f"""
SELECT qid AS query_id, CAST(rank AS INT) AS rank, cid AS corpus_id,
       ROUND(score, 6) AS mmr_score
FROM sall{_MMR_K} ORDER BY qid, rank
"""
    return head + "".join(steps) + tail


@query("search_mmr_rerank", oracle=_mmr_oracle)
def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick 5 of the top-10 cosine candidates per query,
    each step maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)
    (λ = 0.7) — the production diversification pass between retrieval
    and display that keeps near-duplicate hits from monopolizing the
    result page (the operator-level fix for what SemDeDup fixes at
    corpus level).

    Determinism: all relevances and pairwise sims are the attested
    fixed-point cosine (FLOOR·10¹² BIGINT sums, ROUND 9); the greedy
    has a total-order tie-break (score DESC, cid) — so the 5-step
    unroll is a pure function DuckDB replays step for step.

    Scale: per query the greedy touches only the POOL (10 candidates,
    45 pairwise sims) — the expensive part is candidate generation,
    which is the ANN layer's job (similarity_ann_*); MMR itself is
    pool-bounded regardless of corpus size. Each step is one
    broadcast join + struct-max over pool-sized frames."""
    from ibd_pipeline_spark.operators.similarity import as_double_array

    lam = float(_MMR_LAM)
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", as_double_array("embedding").alias("v")
    ).withColumn(
        "nfp",
        F.expr(
            "aggregate(transform(v, x -> CAST(FLOOR(x * x * 1e12) AS"
            " BIGINT)), 0L, (acc, t) -> acc + t)"
        ),
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nfp").alias("qn"),
    )
    qdot = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> CAST(FLOOR(x * y * 1e12) AS"
        " BIGINT)), 0L, (acc, t) -> acc + t)"
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            F.round(
                qdot.cast("double")
                / F.sqrt(F.col("qn").cast("double") * F.col("nfp")),
                9,
            ).alias("rel"),
        )
    )
    # pool: top-10 per query via struct-max ranks on a 3-query frame
    from pyspark.sql import Window

    wq = Window.partitionBy("qid").orderBy(F.col("rel").desc(), "cid")
    pool = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _MMR_POOL)
        .drop("rn")
        .localCheckpoint(eager=True)  # reused by 5 greedy steps
    )
    pv = pool.join(
        e.select(F.col("vec_id").alias("cid"), "v", "nfp"), "cid"
    ).select("qid", "cid", "rel", "v", "nfp")
    a = pv.select(
        "qid",
        F.col("cid").alias("ca"),
        F.col("v").alias("va"),
        F.col("nfp").alias("na"),
    )
    b = pv.select(
        F.col("qid").alias("qb"),
        F.col("cid").alias("cb"),
        F.col("v").alias("vb"),
        F.col("nfp").alias("nb"),
    )
    pdot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> CAST(FLOOR(x * y * 1e12) AS"
        " BIGINT)), 0L, (acc, t) -> acc + t)"
    )
    pp = (
        a.join(
            F.broadcast(b),
            (F.col("qid") == F.col("qb")) & (F.col("ca") != F.col("cb")),
        )
        .select(
            "qid",
            "ca",
            "cb",
            F.round(
                pdot.cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb")),
                9,
            ).alias("s"),
        )
        .localCheckpoint(eager=True)  # 45 rows/query; reused 4x
    )
    # greedy unroll
    sel = (
        pool.groupBy("qid")
        .agg(F.max(F.struct("rel", (-F.col("cid")).alias("nc"))).alias("m"))
        .select(
            "qid",
            (-F.col("m.nc")).alias("cid"),
            F.lit(1).alias("rank"),
            F.col("m.rel").alias("score"),
        )
    )
    sall = sel
    for k in range(2, _MMR_K + 1):
        mx = (
            pp.join(
                sall.select(
                    F.col("qid").alias("qs"), F.col("cid").alias("sb")
                ),
                (F.col("qid") == F.col("qs")) & (F.col("cb") == F.col("sb")),
            )
            .groupBy("qid", F.col("ca").alias("cid"))
            .agg(F.max("s").alias("ms"))
        )
        cand = (
            pool.join(mx, ["qid", "cid"])
            .join(
                sall.select(
                    F.col("qid").alias("q2"), F.col("cid").alias("c2")
                ),
                (F.col("qid") == F.col("q2")) & (F.col("cid") == F.col("c2")),
                "left_anti",
            )
            .select(
                "qid",
                "cid",
                (lam * F.col("rel") - (1.0 - lam) * F.col("ms")).alias(
                    "score"
                ),
            )
        )
        pick = (
            cand.groupBy("qid")
            .agg(
                F.max(
                    F.struct("score", (-F.col("cid")).alias("nc"))
                ).alias("m")
            )
            .select(
                "qid",
                (-F.col("m.nc")).alias("cid"),
                F.lit(k).alias("rank"),
                F.col("m.score").alias("score"),
            )
        )
        sall = sall.unionByName(pick).localCheckpoint(eager=True)
    return sall.select(
        F.col("qid").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("cid").alias("corpus_id"),
        F.round("score", 6).alias("mmr_score"),
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing
# ---------------------------------------------------------------------------

_QL_TERMS = ["data", "table", "query", "scan", "fast"]
_QL_MU = 2000


def _ql_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _QL_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
), dl AS (
  SELECT doc_id, CAST(len(l) AS BIGINT) AS dlen FROM toks
), posts AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(l) AS tok FROM toks)
  WHERE tok IN ({terms}) GROUP BY doc_id, tok
), cf AS (
  SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf FROM posts GROUP BY tok
), ct AS (
  SELECT CAST(SUM(dlen) AS BIGINT) AS ctot FROM dl
), qt AS (SELECT unnest([{terms}]) AS tok),
scored AS (
  SELECT dl.doc_id,
         CAST(ln(CAST(COALESCE(p.tf, 0) * ct.ctot + {_QL_MU} * cf.cf
                      AS DOUBLE)
                 / (CAST(dl.dlen + {_QL_MU} AS DOUBLE) * ct.ctot))
              AS DECIMAL(28,10)) AS lp
  FROM dl CROSS JOIN qt
  JOIN cf ON cf.tok = qt.tok
  LEFT JOIN posts p ON p.doc_id = dl.doc_id AND p.tok = qt.tok
  CROSS JOIN ct
), per_doc AS (
  SELECT doc_id,
         CAST(ROUND(SUM(lp), 6) AS DOUBLE) AS ql_score
  FROM scored GROUP BY doc_id
), top AS (
  SELECT doc_id, ql_score,
         ROW_NUMBER() OVER (ORDER BY ql_score DESC, doc_id) AS rk
  FROM per_doc
)
SELECT CAST(rk AS INT) AS rank, doc_id, ROUND(ql_score, 6) AS ql_score
FROM top WHERE rk <= 20 ORDER BY rk
"""


@query("search_query_likelihood", oracle=_ql_oracle)
def search_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001): score(q, d) = Σ_t ln((tf + μ·P(t|C)) / (|d| + μ)),
    μ = 2000 — the language-modeling retrieval family beside BM25
    (search_hybrid_rrf's lexical leg); Dirichlet smoothing is the
    standard choice because it adapts to document length where
    Jelinek-Mercer does not. Top-20 documents for a fixed 5-term
    query.

    Exactness: each term's logarithm is taken of an ALL-INTEGER
    rational ((tf·Ctot + μ·cf) / ((|d|+μ)·Ctot) — exact BIGINTs cast
    to double in one division), so both engines feed ln() identical
    doubles; per-doc sums decimal-quantized; the top-20 is
    TakeOrdered + the 20-row triangular rank (window-free).

    Scale: a postings build filtered to the query terms (the gram
    shuffle touches only matching tokens), a 5-row cf broadcast, and
    a per-doc fold — per-query cost is postings-of-query-terms, the
    inverted-index contract."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
    )
    dl = toks.select(
        "doc_id", F.size("l").cast("bigint").alias("dlen")
    )
    posts = (
        toks.select("doc_id", F.explode("l").alias("tok"))
        .filter(F.col("tok").isin(*_QL_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    cf = posts.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("cf"))
    ct = dl.agg(F.sum("dlen").cast("bigint").alias("ctot"))
    qt = posts.sparkSession.createDataFrame(
        [(t,) for t in _QL_TERMS], "tok string"
    )
    scored = (
        dl.crossJoin(F.broadcast(qt))
        .join(F.broadcast(cf), "tok")
        .join(posts, ["doc_id", "tok"], "left")
        .crossJoin(F.broadcast(ct))
        .select(
            "doc_id",
            F.log(
                (
                    F.coalesce("tf", F.lit(0)) * F.col("ctot")
                    + _QL_MU * F.col("cf")
                ).cast("double")
                / ((F.col("dlen") + _QL_MU).cast("double") * F.col("ctot"))
            )
            .cast("decimal(28,10)")
            .alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.round(F.sum("lp"), 6).cast("double").alias("ql_score")
    )
    top = per_doc.orderBy(F.col("ql_score").desc(), "doc_id").limit(20)
    key = F.struct(
        (-F.col("ql_score")).alias("ns"), F.col("doc_id").alias("d")
    )
    o = top.select(key.alias("_ko"))
    ranked = (
        top.withColumn("_k", key)
        .join(F.broadcast(o), F.col("_ko") <= F.col("_k"))
        .groupBy("doc_id", "ql_score")
        .agg(F.count(F.lit(1)).cast("int").alias("rank"))
    )
    return ranked.select(
        "rank", "doc_id", F.round("ql_score", 6).alias("ql_score")
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Bartlett's test of variance homogeneity (k = 5 event types)
# ---------------------------------------------------------------------------

_BARTLETT_SQL = """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE) AS s1,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))
                        * CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE) AS s2
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), v AS (
  SELECT event_type, n, (s2 - s1 * s1 / n) / (n - 1) AS s2i FROM g
), terms AS (
  SELECT n, s2i,
         CAST((n - 1) * ln(s2i) AS DECIMAL(28,10)) AS lnterm,
         CAST((n - 1) * s2i AS DECIMAL(28,8)) AS wvar,
         CAST(1.0 / (n - 1) AS DECIMAL(28,12)) AS invterm
  FROM v
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nt,
         CAST(ROUND(SUM(lnterm), 6) AS DOUBLE) AS sum_ln,
         CAST(ROUND(SUM(wvar), 4) AS DOUBLE) AS sum_wvar,
         CAST(ROUND(SUM(invterm), 10) AS DOUBLE) AS sum_inv
  FROM terms
), s AS (
  SELECT k, nt,
         ((nt - k) * ln(sum_wvar / (nt - k)) - sum_ln)
           / (1.0 + (sum_inv - 1.0 / (nt - k)) / (3.0 * (k - 1)))
           AS t_stat
  FROM agg
)
SELECT nt AS n_total, CAST(k AS INT) AS n_groups,
       CAST(k - 1 AS INT) AS df,
       ROUND(t_stat, 6) AS bartlett_stat,
       ROUND(exp(-t_stat / 2.0) * (1.0 + t_stat / 2.0), 8) AS p_value
FROM s
"""


@query("stats_bartlett_test", oracle=_BARTLETT_SQL)
def stats_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity across the five event
    types — the classic normal-theory counterpart of the robust
    Levene/Brown–Forsythe pair already in the belt (Bartlett is more
    powerful when normality holds, badly anti-conservative when it
    doesn't; shipping all three is how variance checks are actually
    triaged). T = ((N−k)·ln(S²ₚ) − Σ(nᵢ−1)·ln(S²ᵢ)) / C with the
    standard C correction; p at df = k−1 = 4 via the even-df
    closed-form survival.

    Exactness: group variances from exact decimal Σx/Σx² (the Welch
    discipline); each (nᵢ−1)·ln(S²ᵢ), (nᵢ−1)·S²ᵢ and 1/(nᵢ−1) term
    is decimal-quantized so the k-term sums are order-independent;
    the final statistic is one identical double chain.

    Scale: one 5-group scan-aggregate; everything after runs on k
    rows."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dec = F.col("value").cast("decimal(28,8)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum(dec), 4).cast("double").alias("s1"),
        F.round(F.sum(dec * dec), 4).cast("double").alias("s2"),
    )
    s2i = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    terms = g.select(
        "n",
        ((F.col("n") - 1) * F.log(s2i)).cast("decimal(28,10)").alias("lnterm"),
        ((F.col("n") - 1) * s2i).cast("decimal(28,8)").alias("wvar"),
        (1.0 / (F.col("n") - 1)).cast("decimal(28,12)").alias("invterm"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nt"),
        F.round(F.sum("lnterm"), 6).cast("double").alias("sum_ln"),
        F.round(F.sum("wvar"), 4).cast("double").alias("sum_wvar"),
        F.round(F.sum("invterm"), 10).cast("double").alias("sum_inv"),
    )
    nk = F.col("nt") - F.col("k")
    t = (
        nk * F.log(F.col("sum_wvar") / nk) - F.col("sum_ln")
    ) / (
        1.0
        + (F.col("sum_inv") - 1.0 / nk) / (3.0 * (F.col("k") - 1))
    )
    return agg.select(
        F.col("nt").alias("n_total"),
        F.col("k").cast("int").alias("n_groups"),
        (F.col("k") - 1).cast("int").alias("df"),
        F.round(t, 6).alias("bartlett_stat"),
        F.round(F.exp(-t / 2.0) * (1.0 + t / 2.0), 8).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Association rules over user event-type baskets (support/confidence/lift)
# ---------------------------------------------------------------------------

_ASSOC_SQL = """
WITH basket AS (
  SELECT DISTINCT user_id, event_type FROM events
), nu AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM basket
), singles AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM basket
  GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM basket a JOIN basket b
    ON a.user_id = b.user_id AND a.event_type <> b.event_type
  GROUP BY 1, 2
)
SELECT p.antecedent, p.consequent, p.n_both,
       sa.n AS n_antecedent, sc.n AS n_consequent,
       ROUND(CAST(p.n_both AS DOUBLE) / nu.n_users, 6) AS support,
       ROUND(CAST(p.n_both AS DOUBLE) / sa.n, 6) AS confidence,
       ROUND((CAST(p.n_both AS DOUBLE) / sa.n)
             / (CAST(sc.n AS DOUBLE) / nu.n_users), 6) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.antecedent
JOIN singles sc ON sc.event_type = p.consequent
CROSS JOIN nu
ORDER BY antecedent, consequent
"""


@query("analytics_association_rules", oracle=_ASSOC_SQL)
def analytics_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over per-user event-type baskets: for every
    ordered pair (A → B), support P(A∧B), confidence P(B|A), and
    lift P(B|A)/P(B) — single-level Apriori, the market-basket
    primitive behind "users who error also churn" readouts; lift ≈ 1
    on independent behaviors, the off-1 pairs are the story.

    Exactness: all counts are exact integers off one DISTINCT
    (user, type) reduce; the three metrics are identical
    double-division chains rounded at 6.

    Scale: the basket self-join fans out per user by (basket size)²
    with baskets bounded by the CATALOG of event types (≤ k² = 25
    pairs per user, never user-quadratic); singles and the user
    count broadcast back onto the k·(k−1)-row pair frame."""
    ev = load(spark, sf_dir, "events")
    basket = ev.select("user_id", "event_type").distinct()
    nu = basket.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    singles = basket.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = basket.select(
        "user_id", F.col("event_type").alias("antecedent")
    )
    b = basket.select(
        F.col("user_id").alias("uid2"), F.col("event_type").alias("consequent")
    )
    pairs = (
        a.join(
            b,
            (F.col("user_id") == F.col("uid2"))
            & (F.col("antecedent") != F.col("consequent")),
        )
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("antecedent"), F.col("n").alias("n_antecedent")
    )
    sc = singles.select(
        F.col("event_type").alias("consequent"), F.col("n").alias("n_consequent")
    )
    out = (
        pairs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sc), "consequent")
        .crossJoin(F.broadcast(nu))
    )
    conf = F.col("n_both").cast("double") / F.col("n_antecedent")
    return out.select(
        "antecedent",
        "consequent",
        "n_both",
        "n_antecedent",
        "n_consequent",
        F.round(F.col("n_both").cast("double") / F.col("n_users"), 6).alias(
            "support"
        ),
        F.round(conf, 6).alias("confidence"),
        F.round(
            conf / (F.col("n_consequent").cast("double") / F.col("n_users")),
            6,
        ).alias("lift"),
    ).orderBy("antecedent", "consequent")


# ---------------------------------------------------------------------------
# Combined p-values: Fisher's method + Stouffer's Z (brand z-tests)
# ---------------------------------------------------------------------------

_COMBINED_SQL = f"""
WITH b AS (
  SELECT p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt FROM b
), zt AS (
  SELECT brand,
         ABS((CAST(r AS DOUBLE) / n - CAST(rt AS DOUBLE) / nt)
             / sqrt((CAST(rt AS DOUBLE) / nt)
                    * (1.0 - CAST(rt AS DOUBLE) / nt) / n)) AS az
  FROM b CROSS JOIN tot
), pv AS (
  SELECT brand, az, ROUND(2.0 * {_phi_tail_sql('az')}, 8) AS p_value
  FROM zt
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(ROUND(SUM(CAST(-2.0 * ln(p_value) AS DECIMAL(28,10))), 6)
              AS DOUBLE) AS fisher_stat,
         CAST(ROUND(SUM(CAST(az AS DECIMAL(28,10))), 6) AS DOUBLE) AS sz
  FROM pv
), s AS (
  SELECT m, fisher_stat, sz / sqrt(CAST(m AS DOUBLE)) AS stouffer_z,
         (exp(ln(fisher_stat / (2.0 * m)) / 3.0)
          - (1.0 - 2.0 / (9.0 * (2.0 * m))))
           * sqrt(9.0 * (2.0 * m) / 2.0) AS whz
  FROM agg
)
SELECT CAST(m AS INT) AS n_tests,
       ROUND(fisher_stat, 6) AS fisher_stat,
       CAST(2 * m AS INT) AS fisher_df,
       ROUND({_phi_tail_sql('whz')}, 8) AS fisher_p_wh,
       ROUND(stouffer_z, 6) AS stouffer_z,
       ROUND({_phi_tail_sql('ABS(stouffer_z)')}, 8) AS stouffer_p_onesided
FROM s
"""


@query("stats_combined_pvalues", oracle=_COMBINED_SQL)
def stats_combined_pvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-analytic p-value COMBINATION over the per-brand z-test
    family — the question BH/Holm/BY don't answer: not "which brands
    deviate" but "is there any global deviation at all". Fisher's
    method X = −2·Σ ln pᵢ ~ χ²(2m) (sensitive to a few strong
    signals) and Stouffer's Z = Σzᵢ/√m (sensitive to many weak
    ones, directionless here since |z| is used) — reporting both is
    the standard meta-analysis practice. Fisher's p via the shared
    Wilson–Hilferty cube-root normal (the G-test precedent; exact
    closed forms need df/2 = m factorial terms that overflow
    integer arithmetic at m = 25).

    Exactness: each −2·ln p and z term is decimal-quantized before
    the m-term fold; p-values themselves are the ROUNDED family
    p-values (identical doubles both engines by construction).

    Scale: one fact-dim join; everything after is m-row algebra."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("r"),
        )
    )
    tot = b.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("r").cast("bigint").alias("rt"),
    )
    p0 = F.col("rt").cast("double") / F.col("nt")
    az = F.abs(
        (F.col("r").cast("double") / F.col("n") - p0)
        / F.sqrt(p0 * (1.0 - p0) / F.col("n"))
    )
    pv = b.crossJoin(F.broadcast(tot)).select(
        "brand",
        az.alias("az"),
    ).select(
        "brand",
        "az",
        F.round(2.0 * _phi_tail_col(F.col("az")), 8).alias("p_value"),
    )
    agg = pv.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.round(
            F.sum((-2.0 * F.log("p_value")).cast("decimal(28,10)")), 6
        )
        .cast("double")
        .alias("fisher_stat"),
        F.round(F.sum(F.col("az").cast("decimal(28,10)")), 6)
        .cast("double")
        .alias("sz"),
    )
    md = F.col("m").cast("double")
    df2 = 2.0 * md
    whz = (
        F.exp(F.log(F.col("fisher_stat") / df2) / 3.0)
        - (1.0 - 2.0 / (9.0 * df2))
    ) * F.sqrt(9.0 * df2 / 2.0)
    stz = F.col("sz") / F.sqrt(md)
    return agg.select(
        F.col("m").cast("int").alias("n_tests"),
        F.round("fisher_stat", 6).alias("fisher_stat"),
        (2 * F.col("m")).cast("int").alias("fisher_df"),
        F.round(_phi_tail_col(whz), 8).alias("fisher_p_wh"),
        F.round(stz, 6).alias("stouffer_z"),
        F.round(_phi_tail_col(F.abs(stz)), 8).alias("stouffer_p_onesided"),
    )


# ---------------------------------------------------------------------------
# Breusch–Pagan heteroskedasticity test on the daily-volume trend fit
# ---------------------------------------------------------------------------

_BP_SQL = f"""
WITH dd AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
              AS BIGINT) AS di,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(di) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(di * di) AS BIGINT) AS sxx,
         CAST(SUM(di * y) AS BIGINT) AS sxy
  FROM dd
), fit AS (
  SELECT n, sx,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS beta,
         sy
  FROM m
), fit2 AS (
  SELECT n, beta, (CAST(sy AS DOUBLE) - beta * sx) / n AS alpha FROM fit
), resid AS (
  SELECT di, CAST(y AS DOUBLE) - (alpha + beta * di) AS e FROM dd
  CROSS JOIN fit2
), aux AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(di) AS BIGINT) AS sx,
         CAST(SUM(di * di) AS BIGINT) AS sxx,
         CAST(ROUND(SUM(CAST(e * e AS DECIMAL(28,8))), 4) AS DOUBLE) AS sy2,
         CAST(ROUND(SUM(CAST(di * e * e AS DECIMAL(28,8))), 4) AS DOUBLE)
           AS sxy2,
         CAST(ROUND(SUM(CAST(e * e * e * e AS DECIMAL(38,8))), 4) AS DOUBLE)
           AS syy2
  FROM resid
), r2 AS (
  SELECT n,
         ((CAST(n AS DOUBLE) * sxy2 - CAST(sx AS DOUBLE) * sy2)
          * (CAST(n AS DOUBLE) * sxy2 - CAST(sx AS DOUBLE) * sy2))
           / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * (CAST(n AS DOUBLE) * syy2 - sy2 * sy2)) AS r2_aux
  FROM aux
)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(r2_aux, 6) AS r2_aux,
       ROUND(n * r2_aux, 6) AS bp_lm_stat,
       ROUND(LEAST(1.0, 2.0 * {_phi_tail_sql('sqrt(n * r2_aux)')}), 8)
         AS p_value
FROM r2
"""


@query("stats_breusch_pagan", oracle=_BP_SQL)
def stats_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch–Pagan heteroskedasticity test on the daily-volume
    linear-trend residuals: auxiliary regression of e² on the day
    index, LM = n·R²_aux ~ χ²(1) under homoskedasticity (p via the
    exact identity 2·Φ̄(√x)). Growing-variance volume (a scaling
    service, a widening bot mix) breaks every OLS standard error the
    trend fit reports — DW catches serial correlation, BP catches
    exactly this. Completes the regression-diagnostics pair.

    Exactness: the trend fit reuses the Durbin–Watson all-integer
    moment discipline; the auxiliary moments quantize the e², di·e²
    and e⁴ terms per day so the sums are order-independent; R² and
    LM are one identical double chain.

    Scale: one day-key count shuffle; both fits run on the days-sized
    frame with 1-row broadcasts."""
    ev = load(spark, sf_dir, "events")
    dd = ev.groupBy(
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")), F.lit("2024-01-01").cast("date")
        ).alias("di")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    m = dd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("di").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("di") * F.col("di")).cast("bigint").alias("sxx"),
        F.sum(F.col("di") * F.col("y")).cast("bigint").alias("sxy"),
    )
    beta = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    fit = m.select("n", "sx", beta.alias("beta"), "sy").select(
        "n",
        "beta",
        ((F.col("sy").cast("double") - F.col("beta") * F.col("sx")) / F.col("n")).alias(
            "alpha"
        ),
    )
    resid = dd.crossJoin(F.broadcast(fit)).select(
        "di",
        (F.col("y").cast("double") - (F.col("alpha") + F.col("beta") * F.col("di"))).alias(
            "e"
        ),
    )
    e2 = F.col("e") * F.col("e")
    aux = resid.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("di").cast("bigint").alias("sx"),
        F.sum(F.col("di") * F.col("di")).cast("bigint").alias("sxx"),
        F.round(F.sum(e2.cast("decimal(28,8)")), 4)
        .cast("double")
        .alias("sy2"),
        F.round(F.sum((F.col("di") * e2).cast("decimal(28,8)")), 4)
        .cast("double")
        .alias("sxy2"),
        F.round(F.sum((e2 * e2).cast("decimal(38,8)")), 4)
        .cast("double")
        .alias("syy2"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy2") - F.col("sx").cast("double") * F.col("sy2")
    r2 = (num * num) / (
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy2") - F.col("sy2") * F.col("sy2"))
    )
    lm = F.col("n") * r2
    return aux.select(
        F.col("n").alias("n_days"),
        F.round(r2, 6).alias("r2_aux"),
        F.round(lm, 6).alias("bp_lm_stat"),
        F.round(
            F.least(F.lit(1.0), 2.0 * _phi_tail_col(F.sqrt(lm))), 8
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Chow structural-break F-test at the window midpoint
# ---------------------------------------------------------------------------

_CHOW_SQL = """
WITH dd AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
              AS BIGINT) AS di,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), bnd AS (
  SELECT (MIN(di) + MAX(di)) // 2 AS mid FROM dd
), seg AS (
  SELECT di, y, CASE WHEN di <= (SELECT mid FROM bnd) THEN 0 ELSE 1 END
           AS s
  FROM dd
), m AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(di) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(di * di) AS BIGINT) AS sxx,
         CAST(SUM(di * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM seg GROUP BY s
), mp AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
         CAST(SUM(sy) AS BIGINT) AS sy, CAST(SUM(sxx) AS BIGINT) AS sxx,
         CAST(SUM(sxy) AS BIGINT) AS sxy, CAST(SUM(syy) AS BIGINT) AS syy
  FROM m
), sse AS (
  SELECT s, n,
         (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy
          - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
           / n AS sse
  FROM m
), ssep AS (
  SELECT n,
         (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy
          - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
           / n AS sse_pooled
  FROM mp
), f AS (
  SELECT ssep.n,
         ssep.sse_pooled,
         (SELECT SUM(sse) FROM sse) AS sse_split,
         ((ssep.sse_pooled - (SELECT SUM(sse) FROM sse)) / 2.0)
           / ((SELECT SUM(sse) FROM sse) / (ssep.n - 4)) AS f_stat
  FROM ssep
)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(sse_pooled, 6) AS sse_pooled,
       ROUND(sse_split, 6) AS sse_split,
       2 AS df1, CAST(n - 4 AS INT) AS df2,
       ROUND(f_stat, 6) AS chow_f
FROM f
"""


@query("stats_chow_test", oracle=_CHOW_SQL)
def stats_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test of the daily-volume trend at the
    window midpoint: fit the linear trend pooled and separately on
    each half; F = ((SSE_p − SSE₁ − SSE₂)/k) / ((SSE₁+SSE₂)/(n−2k)),
    k = 2 — did the REGIME change (both level and slope jointly),
    not just the level (events_best_split_sse's question)?
    Statistic-only readout with its (df1, df2) pair, the CvM/AD
    convention (the F tail has no elementary closed form; F ≫ 1 at
    these dfs is the break signal).

    Exactness: all three fits use ONLY exact BIGINT moment sums
    (Σx, Σy, Σx², Σxy, Σy² per segment — the pooled moments are the
    integer SUMS of the segment moments, so no second scan); each
    SSE is one identical closed-form double chain; the midpoint is
    integer floor-division.

    Scale: one day-key count shuffle, one 2-group moment aggregate;
    everything after is constant-size algebra."""
    ev = load(spark, sf_dir, "events")
    dd = ev.groupBy(
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")), F.lit("2024-01-01").cast("date")
        ).alias("di")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    bnd = dd.agg(F.expr("(MIN(di) + MAX(di)) DIV 2").alias("mid"))
    seg = dd.crossJoin(F.broadcast(bnd)).select(
        "di",
        "y",
        F.when(F.col("di") <= F.col("mid"), 0).otherwise(1).alias("s"),
    )
    m = seg.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("di").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("di") * F.col("di")).cast("bigint").alias("sxx"),
        F.sum(F.col("di") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )

    def sse_of(frame):
        nd = F.col("n").cast("double")
        num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
        return (
            nd * F.col("syy")
            - F.col("sy").cast("double") * F.col("sy")
            - (num * num)
            / (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        ) / F.col("n")

    sse = m.select("s", "n", sse_of(m).alias("sse"))
    mp = m.agg(
        *[
            F.sum(c).cast("bigint").alias(c)
            for c in ("n", "sx", "sy", "sxx", "sxy", "syy")
        ]
    )
    ssep = mp.select("n", sse_of(mp).alias("sse_pooled"))
    ssum = sse.agg(F.sum("sse").alias("sse_split"))
    f = ssep.crossJoin(F.broadcast(ssum)).select(
        "n",
        "sse_pooled",
        "sse_split",
        (
            ((F.col("sse_pooled") - F.col("sse_split")) / 2.0)
            / (F.col("sse_split") / (F.col("n") - 4))
        ).alias("f_stat"),
    )
    return f.select(
        F.col("n").alias("n_days"),
        F.round("sse_pooled", 6).alias("sse_pooled"),
        F.round("sse_split", 6).alias("sse_split"),
        F.lit(2).alias("df1"),
        (F.col("n") - 4).cast("int").alias("df2"),
        F.round("f_stat", 6).alias("chow_f"),
    )


# ---------------------------------------------------------------------------
# ABC (Pareto) customer classification by revenue contribution
# ---------------------------------------------------------------------------

_ABC_SQL = """
WITH cr AS (
  SELECT o_custkey,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,8))), 2) AS DOUBLE)
           AS rev
  FROM orders GROUP BY o_custkey
), tot AS (
  SELECT CAST(ROUND(SUM(CAST(rev AS DECIMAL(28,8))), 2) AS DOUBLE) AS trev,
         CAST(COUNT(*) AS BIGINT) AS ncust
  FROM cr
), ranked AS (
  SELECT rev,
         SUM(CAST(rev AS DECIMAL(28,8)))
           OVER (ORDER BY rev DESC, o_custkey) AS cumrev_d,
         ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rk
  FROM cr
), cls AS (
  SELECT CASE
           WHEN CAST(cumrev_d AS DOUBLE) / tot.trev <= 0.8 THEN 'A'
           WHEN CAST(cumrev_d AS DOUBLE) / tot.trev <= 0.95 THEN 'B'
           ELSE 'C' END AS abc_class,
         rev, rk, tot.ncust
  FROM ranked CROSS JOIN tot
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(ncust), 6) AS customer_share,
       CAST(ROUND(SUM(CAST(rev AS DECIMAL(28,8))), 2) AS DOUBLE)
         AS class_revenue
FROM cls GROUP BY abc_class ORDER BY abc_class
"""


@query("analytics_abc_classification", oracle=_ABC_SQL)
def analytics_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of customers by cumulative revenue
    contribution: rank by revenue descending, class A = the head
    carrying the first 80% of revenue, B = the next 15%, C = the
    tail — inventory management's 80/20 workhorse applied to
    accounts; together with HHI (dominance) and Gini (inequality)
    this completes the concentration-analytics kit with the
    actionable SEGMENTATION the other two only summarize.

    Exactness: per-customer and class revenues are exact decimal
    sums; the cumulative revenue is an exact DECIMAL running total
    over the (rev DESC, custkey) total order off the distributed
    prefix-sum spine (no unpartitioned window, no scale shed — the
    r11 calendar lesson); class boundaries compare the decimal
    cumsum's double image against 0.8/0.95 of the decimal total.

    Scale: one customer-key aggregate + one range exchange for the
    prefix sum; the class rollup is a 3-key aggregate."""
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    o = load(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2)
        .cast("double")
        .alias("rev")
    )
    cr = cr.withColumn("revd", F.col("rev").cast("decimal(28,8)"))
    ranked = with_global_prefix_sums(
        cr,
        [(-F.col("rev")).alias("negrev"), F.col("o_custkey")],
        ["revd"],
    )
    tot = ranked.agg(
        F.round(F.max("_tot_revd"), 2).cast("double").alias("trev"),
        F.count(F.lit(1)).cast("bigint").alias("ncust"),
    )
    share = F.col("_cum_revd").cast("double") / F.col("trev")
    cls = ranked.crossJoin(F.broadcast(tot)).select(
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev",
        "ncust",
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("ncust"), 6
            ).alias("customer_share"),
            F.round(F.sum(F.col("rev").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


# ---------------------------------------------------------------------------
# Cohen's kappa: behavioral agreement between window halves
# ---------------------------------------------------------------------------

_KAPPA_SQL = """
WITH bnd AS (
  SELECT (epoch_us(MIN(CAST(ts AS TIMESTAMP)))
          + epoch_us(MAX(CAST(ts AS TIMESTAMP)))) // 2 AS mid
  FROM events
), lab AS (
  SELECT user_id,
         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) < (SELECT mid FROM bnd)
              THEN 0 ELSE 1 END AS half,
         event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
), dom AS (
  SELECT user_id, half, event_type AS lab FROM (
    SELECT user_id, half, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, half
                              ORDER BY n DESC, event_type) AS rk
    FROM lab
  ) WHERE rk = 1
), pair AS (
  SELECT a.user_id, a.lab AS l1, b.lab AS l2
  FROM dom a JOIN dom b
    ON a.user_id = b.user_id AND a.half = 0 AND b.half = 1
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l1 = l2 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
  FROM pair
), marg AS (
  SELECT CAST(ROUND(SUM(CAST(
           (CAST(c1 AS DOUBLE) / agg.n) * (CAST(c2 AS DOUBLE) / agg.n)
           AS DECIMAL(28,12))), 10) AS DOUBLE) AS p_e,
         MAX(agg.n) AS n, MAX(agg.n_agree) AS n_agree
  FROM (
    SELECT COALESCE(m1.lab, m2.lab) AS lab,
           COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
    FROM (SELECT l1 AS lab, CAST(COUNT(*) AS BIGINT) AS c1
          FROM pair GROUP BY l1) m1
    FULL OUTER JOIN
         (SELECT l2 AS lab, CAST(COUNT(*) AS BIGINT) AS c2
          FROM pair GROUP BY l2) m2
      ON m1.lab = m2.lab
  ) CROSS JOIN agg
)
SELECT CAST(n AS BIGINT) AS n_users,
       ROUND(CAST(n_agree AS DOUBLE) / n, 6) AS p_observed,
       ROUND(p_e, 6) AS p_expected,
       ROUND((CAST(n_agree AS DOUBLE) / n - p_e) / (1.0 - p_e), 6)
         AS cohens_kappa
FROM marg
"""


@query("stats_cohens_kappa", oracle=_KAPPA_SQL)
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between each user's DOMINANT event type in the
    first vs second half of the observation window — chance-corrected
    agreement κ = (p₀ − p_e)/(1 − p_e). The inter-rater statistic
    repurposed as a behavioral-stability readout (raw agreement
    overstates stability whenever one behavior dominates the
    marginals; κ subtracts exactly that) — and the same query shape
    scores labeler-vs-labeler or model-vs-model agreement on any
    (item, rater, label) table.

    Exactness: dominant labels via a deterministic (count DESC,
    type) rank inside bounded (user, half) groups; agreement and
    marginal counts are exact integers; each marginal product is
    decimal-quantized before the k-term p_e sum; the midpoint is the
    McNemar integer-µs convention.

    Scale: one (user, half, type) count shuffle, a user-keyed pair
    join, then k-row marginal algebra."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    bnd = ev.agg(
        F.expr("(unix_micros(MIN(ts)) + unix_micros(MAX(ts))) DIV 2").alias(
            "mid"
        )
    )
    lab = (
        ev.crossJoin(F.broadcast(bnd))
        .groupBy(
            "user_id",
            F.when(F.expr("unix_micros(ts)") < F.col("mid"), 0)
            .otherwise(1)
            .alias("half"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("user_id", "half").orderBy(
        F.col("n").desc(), "event_type"
    )
    dom = (
        lab.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "half", F.col("event_type").alias("lab"))
    )
    a = dom.filter(F.col("half") == 0).select(
        "user_id", F.col("lab").alias("l1")
    )
    b = dom.filter(F.col("half") == 1).select(
        F.col("user_id").alias("uid2"), F.col("lab").alias("l2")
    )
    pair = a.join(b, F.col("user_id") == F.col("uid2")).select("l1", "l2")
    agg = pair.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l1") == F.col("l2"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    )
    m1 = pair.groupBy(F.col("l1").alias("lab")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c1")
    )
    m2 = pair.groupBy(F.col("l2").alias("lab")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    )
    marg = (
        m1.join(m2, "lab", "full")
        .select(
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
        .crossJoin(F.broadcast(agg))
    )
    pe = marg.agg(
        F.round(
            F.sum(
                (
                    (F.col("c1").cast("double") / F.col("n"))
                    * (F.col("c2").cast("double") / F.col("n"))
                ).cast("decimal(28,12)")
            ),
            10,
        )
        .cast("double")
        .alias("p_e"),
        F.max("n").alias("n"),
        F.max("n_agree").alias("n_agree"),
    )
    po = F.col("n_agree").cast("double") / F.col("n")
    return pe.select(
        F.col("n").alias("n_users"),
        F.round(po, 6).alias("p_observed"),
        F.round("p_e", 6).alias("p_expected"),
        F.round((po - F.col("p_e")) / (1.0 - F.col("p_e")), 6).alias(
            "cohens_kappa"
        ),
    )
