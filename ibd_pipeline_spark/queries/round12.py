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

from ibd_pipeline_spark.catalog import load
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
