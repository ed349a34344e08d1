"""Round-10 statistics / experimentation additions (split out of
the former round10.py god-file in r11): tie-corrected Spearman,
trimmed/winsorized means, one-way ANOVA, SRM audit, Brown-Forsythe
Levene, Mann-Kendall, Benjamini-Hochberg, power/MDE, priority
sampling, Gumbel return levels. Design rules as queries/__init__
docstring: exact integer/decimal moments, divisions only at the
last projection, global orders via operators/ranking.py."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# Spearman rank correlation (tie-corrected), per group
# ---------------------------------------------------------------------------

_SPEARMAN_SQL = """
WITH r AS (
  SELECT l_linestatus AS g, l_quantity AS x, l_extendedprice AS y
  FROM lineitem
), xr AS (
  SELECT g, x,
         2 * SUM(cnt) OVER (PARTITION BY g ORDER BY x) - cnt + 1 AS rx2
  FROM (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS cnt FROM r GROUP BY g, x)
), yr AS (
  SELECT g, y,
         2 * SUM(cnt) OVER (PARTITION BY g ORDER BY y) - cnt + 1 AS ry2
  FROM (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS cnt FROM r GROUP BY g, y)
), j AS (
  SELECT r.g, xr.rx2, yr.ry2
  FROM r JOIN xr ON xr.g = r.g AND xr.x = r.x
         JOIN yr ON yr.g = r.g AND yr.y = r.y
), m AS (
  SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(rx2 AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(ry2 AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(rx2 AS HUGEINT) * rx2) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(ry2 AS HUGEINT) * ry2) AS HUGEINT) AS syy,
         CAST(SUM(CAST(rx2 AS HUGEINT) * ry2) AS HUGEINT) AS sxy
  FROM j GROUP BY g
)
SELECT g AS l_linestatus, CAST(n AS BIGINT) AS n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS spearman_rho
FROM m ORDER BY l_linestatus
"""


@query("stats_spearman_corr", oracle=_SPEARMAN_SQL)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between quantity and
    price per line status — Pearson over AVERAGE ranks, where the
    average rank of a tied block is pure integer algebra:
    2·r̄(v) = 2·c_le(v) − cnt(v) + 1 (c_le = inclusive cumulative
    count under the value order). Doubling keeps every rank an exact
    BIGINT, and the ×2 scale cancels in the correlation, so the
    moments are exact integers and both engines agree bit-for-bit
    until the single final division.

    Scale: ranks are computed on the DISTINCT-VALUE frame (counts per
    (group, value)) via the distributed grouped prefix-sum — never a
    row-level sort — then broadcast/shuffle-joined back; moment sums
    are one map-side-combined aggregate. No value buffer, no
    single-task window (the in-operator offset window runs over
    partition metadata only)."""
    from ibd_pipeline_spark.operators.ranking import with_grouped_prefix_sum

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_linestatus").alias("g"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )

    def rank2(col: str) -> DataFrame:
        vc = li.groupBy("g", col).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        ps = with_grouped_prefix_sum(vc, ["g"], [col], "cnt")
        return ps.select(
            "g",
            col,
            (2 * F.col("_cw") - F.col("cnt") + 1).alias(f"r{col}2"),
        )

    j = li.join(rank2("x"), ["g", "x"]).join(rank2("y"), ["g", "y"])
    dec = "decimal(38,0)"
    m = j.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("rx2").cast(dec)).alias("sx"),
        F.sum(F.col("ry2").cast(dec)).alias("sy"),
        F.sum((F.col("rx2").cast(dec) * F.col("rx2"))).alias("sxx"),
        F.sum((F.col("ry2").cast(dec) * F.col("ry2"))).alias("syy"),
        F.sum((F.col("rx2").cast(dec) * F.col("ry2"))).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    return m.select(
        F.col("g").alias("l_linestatus"),
        "n",
        F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("spearman_rho"),
    ).orderBy("l_linestatus")


# ---------------------------------------------------------------------------
# Trimmed + winsorized mean per group (prefix-sum rank thresholds)
# ---------------------------------------------------------------------------

_TRIM_SQL = """
WITH r AS (
  SELECT l_returnflag AS g, l_extendedprice AS v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey,
                                     l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
), b AS (
  SELECT g, CAST(v AS DECIMAL(38,4)) AS v, rn, n,
         CAST(FLOOR(0.1 * n) AS BIGINT) AS lo
  FROM r
)
SELECT g AS l_returnflag,
       CAST(MAX(n) AS BIGINT) AS n,
       ROUND(CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo THEN v END)
                  AS DOUBLE) / (MAX(n) - 2 * MAX(lo)), 4) AS trimmed_mean,
       ROUND(CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo THEN v END)
                  + MAX(lo) * MIN(CASE WHEN rn >= lo + 1 THEN v END)
                  + MAX(lo) * MIN(CASE WHEN rn >= n - lo THEN v END)
                  AS DOUBLE) / MAX(n), 4) AS winsorized_mean
FROM b GROUP BY g ORDER BY l_returnflag
"""


@query("stats_trimmed_mean", oracle=_TRIM_SQL)
def stats_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% trimmed and winsorized means per return flag — the robust
    location estimators, as PURE RANK-THRESHOLD conditional
    aggregates over one weight-1 grouped prefix-sum scan (the same
    spine as stats_percentiles): trim drops ranks outside
    (⌊0.1n⌋, n−⌊0.1n⌋]; winsorize clamps them to the boundary values
    v(lo+1) / v(n−lo), both MIN-over-rank-condition lookups. Price
    sums stay in exact decimals; the two divisions happen once, at
    the end — bit-identical to the oracle's windowed ROW_NUMBER
    replay under the same (price, orderkey, linenumber) total order.

    Scale: one range exchange + Arrow running count (bounded memory
    even when a group spans tasks), conditional aggregates map-side
    combine; no per-group value buffer anywhere."""
    from ibd_pipeline_spark.operators.ranking import with_grouped_prefix_sum

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
        F.lit(1).cast("bigint").alias("_one"),
    )
    ps = with_grouped_prefix_sum(
        li, ["g"], ["v", "l_orderkey", "l_linenumber"], "_one"
    )
    rn, n = F.col("_cw"), F.col("_tw")
    lo = F.floor(0.1 * n).cast("bigint")
    # decimal-domain sums: price has 2 decimals, so the cast is exact
    # and the running total is order-independent cross-engine
    vdec = F.col("v").cast("decimal(38,4)")
    core = F.sum(F.when((rn > lo) & (rn <= n - lo), vdec))
    v_lo = F.min(F.when(rn >= lo + 1, vdec))
    v_hi = F.min(F.when(rn >= n - lo, vdec))
    n_, lo_ = F.max(n), F.max(lo)
    return (
        ps.groupBy("g")
        .agg(
            n_.cast("bigint").alias("n"),
            F.round(core.cast("double") / (n_ - 2 * lo_), 4).alias(
                "trimmed_mean"
            ),
            F.round(
                (core + lo_ * v_lo + lo_ * v_hi).cast("double") / n_, 4
            ).alias("winsorized_mean"),
        )
        .select(F.col("g").alias("l_returnflag"), "n", "trimmed_mean",
                "winsorized_mean")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# One-way ANOVA across groups
# ---------------------------------------------------------------------------

_ANOVA_SQL = """
WITH g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DECIMAL(38,4))
           AS sg,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4)) * l_extendedprice)
              AS DECIMAL(38,4)) AS qg
  FROM lineitem GROUP BY l_returnflag
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng, 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS ss_groups,
         CAST(SUM(sg) AS DOUBLE) AS s_all,
         CAST(SUM(qg) AS DOUBLE) AS q_all
  FROM g
), d AS (
  SELECT k, n,
         ss_groups - s_all * s_all / n AS ssb,
         q_all - ss_groups AS ssw
  FROM t
)
SELECT CAST(k AS INT) AS k_groups, n,
       ROUND(ssb / (k - 1), 4) AS ms_between,
       ROUND(ssw / (n - k), 4) AS ms_within,
       ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat,
       ROUND(ssb / (ssb + ssw), 6) AS eta_squared
FROM d
"""


@query("stats_anova_oneway", oracle=_ANOVA_SQL)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of extended price across return flags: F-statistic
    and effect size (η²) from per-group moment sums — count, Σx, Σx²
    in exact DECIMALs (price has 2 decimals, squares 4; nothing
    rounds) — so both engines carry identical numbers into the final
    double-domain sum-of-squares algebra. The per-group Σs²/n step
    runs over the K-ROW group frame in a fixed double expression.

    Scale: ONE map-side-combined aggregate over the fact table; the
    group frame is k rows; everything after is scalar algebra. This
    is the variance decomposition every A/B/C/n-way experiment
    readout needs, at one-scan cost."""
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(38,4)"
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum(F.col("l_extendedprice").cast(dec)).alias("sg"),
        F.sum(F.col("l_extendedprice").cast(dec) * F.col("l_extendedprice"))
        .alias("qg"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        # each group's Σ²/n is a deterministic double; ROUND→DECIMAL
        # before summing so the k-row sum is order-independent
        # cross-engine (a raw double sum at ~1e13 magnitude wobbles
        # past the output rounding under catastrophic cancellation)
        F.sum(
            F.round(
                F.col("sg").cast("double") * F.col("sg").cast("double")
                / F.col("ng"),
                4,
            ).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("ss_groups"),
        F.sum("sg").cast("double").alias("s_all"),
        F.sum("qg").cast("double").alias("q_all"),
    )
    ssb = F.col("ss_groups") - F.col("s_all") * F.col("s_all") / F.col("n")
    ssw = F.col("q_all") - F.col("ss_groups")
    msb = ssb / (F.col("k") - 1)
    msw = ssw / (F.col("n") - F.col("k"))
    return t.select(
        F.col("k").cast("int").alias("k_groups"),
        "n",
        F.round(msb, 4).alias("ms_between"),
        F.round(msw, 4).alias("ms_within"),
        F.round(msb / msw, 6).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_squared"),
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch audit
# ---------------------------------------------------------------------------

_SRM_SQL = """
WITH cust AS (
  SELECT DISTINCT o_custkey FROM orders
), arms AS (
  SELECT CAST(('0x' || substring(md5('srm:' || CAST(o_custkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 2 AS arm
  FROM cust
), c AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM arms
)
SELECT n_a, n_b,
       ROUND(CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b) / (n_a + n_b), 6)
         AS chi2,
       (CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b) / (n_a + n_b)) > 3.841
         AS srm_alarm
FROM c
"""


@query("ab_srm_check", oracle=_SRM_SQL)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit — the experimentation guardrail
    that catches broken randomization before any metric is read:
    units (customers) hash-split 50/50 by the engine-portable md5
    bucket, arm counts compared by the 1-df chi-square
    (n_a−n_b)²/(n_a+n_b) against the 0.05 critical value 3.841.
    Counts are exact integers; the statistic is one double division —
    both engines replay the split AND the verdict bit-for-bit.

    Scale: distinct-unit aggregate + 2-cell count — one shuffle on
    the unit key, constant output. The hash split is the same
    assignment mechanism ab_test_proportion_ztest uses, so this is
    the audit you run NEXT TO every experiment readout."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    cust = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    arms = cust.select(
        md5_bucket(F.col("o_custkey"), F.lit("srm"), 2).alias("arm")
    )
    c = arms.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    chi2 = (
        (F.col("n_a") - F.col("n_b")).cast("double")
        * (F.col("n_a") - F.col("n_b"))
        / (F.col("n_a") + F.col("n_b"))
    )
    return c.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_alarm"),
    )


# ---------------------------------------------------------------------------
# Brown–Forsythe (robust Levene) variance-homogeneity test
# ---------------------------------------------------------------------------

_LEVENE_SQL = """
WITH med AS (
  SELECT l_returnflag AS g,
         CAST(ROUND(quantile_cont(l_extendedprice, 0.5), 4)
              AS DECIMAL(38,4)) AS med
  FROM lineitem GROUP BY l_returnflag
), z AS (
  SELECT li.l_returnflag AS g,
         ABS(CAST(li.l_extendedprice AS DECIMAL(38,4)) - med.med) AS z
  FROM lineitem li JOIN med ON med.g = li.l_returnflag
), grp AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(z) AS DECIMAL(38,4)) AS sz,
         CAST(SUM(CAST(z AS DECIMAL(38,8)) * z) AS DECIMAL(38,8)) AS qz
  FROM z GROUP BY g
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / ng, 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS ss_groups,
         CAST(SUM(sz) AS DOUBLE) AS s_all,
         CAST(SUM(qz) AS DOUBLE) AS q_all
  FROM grp
), d AS (
  SELECT k, n,
         ss_groups - s_all * s_all / n AS ssb,
         q_all - ss_groups AS ssw
  FROM t
)
SELECT CAST(k AS INT) AS k_groups, n,
       ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS levene_w,
       (ssb / (k - 1)) / (ssw / (n - k)) > 3.0 AS variance_heterogeneous
FROM d
"""


@query("stats_levene_test", oracle=_LEVENE_SQL)
def stats_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (the robust Levene variant) for variance
    homogeneity across return flags — THE assumption check behind
    stats_anova_oneway: W = one-way-ANOVA F computed on the absolute
    deviations z = |x − median_g|. Composition showcase: the group
    medians come from the SAME bounded-memory prefix-sum
    quantile_cont replay stats_percentiles uses (rounded to 4
    decimals so z is an exact ≤4-decimal quantity), then the SAME
    decimal-moment ANOVA algebra runs on z — both stages already
    hash-attested on their own, now composed and attested end-to-end.

    Scale: one prefix-sum scan for the k medians (broadcast back as a
    k-row join), one map-side-combined moment aggregate over z; the
    k-row Σ²/n step ROUND→DECIMAL before summing (the ANOVA
    cancellation guard)."""
    from ibd_pipeline_spark.operators.ranking import with_grouped_prefix_sum

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
        F.lit(1).cast("bigint").alias("_one"),
    )
    ps = with_grouped_prefix_sum(
        li, ["g"], ["v", "l_orderkey", "l_linenumber"], "_one"
    )
    cw, n = F.col("_cw"), F.col("_tw")
    p = F.lit(1.0) + F.lit(0.5) * (n - F.lit(1)).cast("double")
    lo_rank = F.floor(p)
    frac = p - lo_rank.cast("double")
    vlo = F.min(F.when(cw >= lo_rank, F.col("v").cast("double")))
    vhi = F.min(F.when(cw >= lo_rank + 1, F.col("v").cast("double")))
    med = ps.groupBy("g").agg(
        F.round(vlo + F.max(frac) * (F.coalesce(vhi, vlo) - vlo), 4)
        .cast("decimal(38,4)")
        .alias("med")
    )
    z = (
        li.join(F.broadcast(med), "g")
        .select("g", F.abs(F.col("v").cast("decimal(38,4)") - F.col("med"))
                .alias("z"))
    )
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("z").cast("decimal(38,4)").alias("sz"),
        F.sum(F.col("z").cast("decimal(38,8)") * F.col("z"))
        .cast("decimal(38,8)")
        .alias("qz"),
    )
    t = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(
            F.round(
                F.col("sz").cast("double") * F.col("sz").cast("double")
                / F.col("ng"),
                4,
            ).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("ss_groups"),
        F.sum("sz").cast("double").alias("s_all"),
        F.sum("qz").cast("double").alias("q_all"),
    )
    ssb = F.col("ss_groups") - F.col("s_all") * F.col("s_all") / F.col("n")
    ssw = F.col("q_all") - F.col("ss_groups")
    w = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return t.select(
        F.col("k").cast("int").alias("k_groups"),
        "n",
        F.round(w, 6).alias("levene_w"),
        (w > 3.0).alias("variance_heterogeneous"),
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test (daily order volume)
# ---------------------------------------------------------------------------

_MK_SQL = """
WITH d AS (
  SELECT CAST(date_trunc('day', CAST(o_orderdate AS TIMESTAMP)) AS DATE)
           AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
), s AS (
  SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
         CAST(COUNT(DISTINCT a.day) + 1 AS BIGINT) AS n
  FROM d a JOIN d b ON b.day > a.day
), ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tt
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY x)
  WHERE t > 1
), v AS (
  SELECT s.n, s.s_stat, ties.tt,
         (CAST(s.n AS DOUBLE) * (s.n - 1) * (2 * s.n + 5) - ties.tt) / 18.0
           AS var_s
  FROM s, ties
)
SELECT n AS n_days, s_stat,
       ROUND(var_s, 4) AS var_s,
       ROUND(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                  ELSE 0.0 END, 6) AS z_stat,
       CASE WHEN s_stat > 0 THEN 'increasing'
            WHEN s_stat < 0 THEN 'decreasing' ELSE 'none' END AS trend
FROM v
"""


@query("stats_mann_kendall", oracle=_MK_SQL)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall nonparametric trend test on daily order volume —
    the monitoring family's distribution-free 'is this metric
    drifting' answer (no linearity or normality assumed, robust to
    spikes): S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected
    variance Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 and the
    continuity-corrected z. S and the tie sums are exact BIGINTs; the
    two divisions happen at output.

    Scale: the corpus-scale work is the day-grain count aggregate;
    the pair sum runs as a triangular self-join over the CALENDAR-
    bounded day frame (365² pairs/year — metadata, and window-free so
    the plan audit stays clean). The parametric twin is
    stats_theil_sen_trend (same frame, slope instead of sign-sum)."""
    orders = load(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    a, b = d.alias("a"), d.alias("b")
    # calendar-bounded frame: broadcast one side (BNLJ, never a
    # partitioned cartesian)
    s = a.join(F.broadcast(b), F.col("b.day") > F.col("a.day")).agg(
        F.sum(
            F.when(F.col("b.x") > F.col("a.x"), 1)
            .when(F.col("b.x") < F.col("a.x"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat"),
        (F.countDistinct("a.day") + 1).cast("bigint").alias("n"),
    )
    ties = (
        d.groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tt")
        )
    )
    v = s.crossJoin(F.broadcast(ties)).withColumn(
        "var_s",
        (
            F.col("n").cast("double")
            * (F.col("n") - 1)
            * (2 * F.col("n") + 5)
            - F.col("tt")
        )
        / 18.0,
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")),
        )
        .otherwise(F.lit(0.0))
    )
    return v.select(
        F.col("n").alias("n_days"),
        "s_stat",
        F.round("var_s", 4).alias("var_s"),
        F.round(z, 6).alias("z_stat"),
        F.when(F.col("s_stat") > 0, "increasing")
        .when(F.col("s_stat") < 0, "decreasing")
        .otherwise("none")
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR control over per-brand return-rate tests
# ---------------------------------------------------------------------------

_BH_Q_NUM, _BH_Q_DEN = 1, 10  # q = 0.10

from ibd_pipeline_spark.queries.statcommon import (  # noqa: E402,F401
    _PHI_B,
    _phi_tail_sql,
)


_BH_SQL = f"""
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
  SELECT brand, n, r,
         ABS((CAST(r AS DOUBLE) / n - CAST(rt AS DOUBLE) / nt)
             / sqrt((CAST(rt AS DOUBLE) / nt) * (1.0 - CAST(rt AS DOUBLE) / nt)
                    / n)) AS az
  FROM b, tot
), pv AS (
  SELECT brand, n, az,
         ROUND(2.0 * {_phi_tail_sql("az")}, 8) AS p_value
  FROM zt
), rk AS (
  SELECT a.brand, a.n, a.az, a.p_value,
         CAST(COUNT(*) AS BIGINT) AS rank,
         CAST(MAX(cnt.m) AS BIGINT) AS m
  FROM pv a
  JOIN pv c ON (c.p_value < a.p_value)
            OR (c.p_value = a.p_value AND c.brand <= a.brand)
  CROSS JOIN (SELECT COUNT(*) AS m FROM pv) cnt
  GROUP BY a.brand, a.n, a.az, a.p_value
), kmax AS (
  SELECT COALESCE(MAX(rank), 0) AS kmax
  FROM rk WHERE p_value * m * {_BH_Q_DEN} <= rank * {_BH_Q_NUM}
)
SELECT brand, n, ROUND(az, 6) AS z_stat, p_value,
       CAST(rank AS INT) AS p_rank,
       rank <= kmax.kmax AS rejected
FROM rk, kmax
ORDER BY brand
"""


@query("stats_benjamini_hochberg", oracle=_BH_SQL)
def stats_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control (q = 0.10) over one z-test per
    part brand (brand return rate vs the corpus rate) — the multiple-
    testing guardrail every metrics platform needs once it runs one
    test per segment: order the m p-values, find the largest k with
    p(k) ≤ k·q/m, reject ranks ≤ k. The BH inequality is evaluated in
    CROSS-MULTIPLIED integer-scaled form (p·m·10 ≤ rank·1), p-values
    come from the Zelen–Severo normal-CDF polynomial (plain exp +
    double algebra both engines evaluate identically, error < 7.5e-8,
    rounded to 8), and ranks come from a triangular self-join over
    the BRAND-bounded frame (catalog metadata, window-free).

    Scale: one fact-dimension join + per-brand counts (map-side
    combined); everything after runs on m = |brands| rows."""
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
    zt = b.crossJoin(F.broadcast(tot)).select("brand", "n", az.alias("az"))
    k = 1.0 / (1.0 + 0.2316419 * F.col("az"))
    poly = (
        (
            (
                (F.lit(_PHI_B[4]) * k + F.lit(_PHI_B[3])) * k
                + F.lit(_PHI_B[2])
            )
            * k
            + F.lit(_PHI_B[1])
        )
        * k
        + F.lit(_PHI_B[0])
    ) * k
    tail = F.lit(0.3989422804014327) * F.exp(-0.5 * F.col("az") * F.col("az")) * poly
    pv = zt.select(
        "brand", "n", "az", F.round(2.0 * tail, 8).alias("p_value")
    )
    a, c = pv.alias("a"), pv.alias("c")
    rk = (
        # brand-bounded frame: broadcast one side so the non-equi
        # rank join plans as BNLJ, never a partitioned cartesian
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
    )
    m = pv.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    rk = rk.crossJoin(F.broadcast(m))
    kmax = rk.filter(
        F.col("p_value") * F.col("m") * _BH_Q_DEN
        <= F.col("rank") * _BH_Q_NUM
    ).agg(F.coalesce(F.max("rank"), F.lit(0)).alias("kmax"))
    return (
        rk.crossJoin(F.broadcast(kmax))
        .select(
            F.col("brand"),
            F.col("n"),
            F.round("az", 6).alias("z_stat"),
            "p_value",
            F.col("rank").cast("int").alias("p_rank"),
            (F.col("rank") <= F.col("kmax")).alias("rejected"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# A/B power analysis: minimum detectable effect at the current size
# ---------------------------------------------------------------------------

_MDE_SQL = """
WITH cust AS (
  SELECT o_custkey,
         MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS converted
  FROM orders GROUP BY o_custkey
), arms AS (
  SELECT converted,
         CAST(('0x' || substring(md5('srm:' || CAST(o_custkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 2 AS arm
  FROM cust
), c AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(converted) AS BIGINT) AS conv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM arms
), d AS (
  SELECT n_a, n_b, conv, n,
         CAST(conv AS DOUBLE) / n AS p0,
         CASE WHEN n_a < n_b THEN n_a ELSE n_b END AS n_arm
  FROM c
)
SELECT n_a, n_b, conv,
       ROUND(p0, 6) AS p0,
       ROUND((1.959963985 + 0.841621234)
             * sqrt(2.0 * p0 * (1.0 - p0) / n_arm), 6) AS mde_abs,
       ROUND((1.959963985 + 0.841621234)
             * sqrt(2.0 * p0 * (1.0 - p0) / n_arm) / p0, 6) AS mde_rel
FROM d
"""


@query("ab_power_mde", oracle=_MDE_SQL)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect at the CURRENT experiment size —
    the 'is this test even worth running' readout that completes the
    experimentation kit (z-test → CUPED → delta-method → SRM → BH →
    power): with α = 0.05 two-sided and 80% power,
    MDE_abs = (z_{0.975} + z_{0.80})·√(2·p̂(1−p̂)/n_arm) on the
    baseline conversion p̂ (customer has an urgent order) under the
    same md5 hash split ab_srm_check audits. Counts are exact
    integers; the z constants are literals; one double formula at
    output — both engines replay the verdict bit-for-bit.

    Scale: one per-customer conversion aggregate + a 2-cell count —
    the same single-shuffle shape as the SRM audit it pairs with."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("converted")
        )
    )
    arms = cust.select(
        "converted", md5_bucket(F.col("o_custkey"), F.lit("srm"), 2).alias("arm")
    )
    c = arms.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum("converted").cast("bigint").alias("conv"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    p0 = F.col("conv").cast("double") / F.col("n")
    n_arm = F.least(F.col("n_a"), F.col("n_b"))
    z = F.lit(1.959963985 + 0.841621234)
    mde = z * F.sqrt(2.0 * p0 * (1.0 - p0) / n_arm)
    return c.select(
        "n_a",
        "n_b",
        "conv",
        F.round(p0, 6).alias("p0"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p0, 6).alias("mde_rel"),
    )


# ---------------------------------------------------------------------------
# Priority sampling for subset-sum estimation
# ---------------------------------------------------------------------------

_PRIO_K = 64
_PRIO_M = 1_000_000

_PRIO_SQL = f"""
WITH w AS (
  SELECT o_orderkey, o_orderpriority AS seg,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS wc,
         CAST(('0x' || substring(md5('prio:' || CAST(o_orderkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % {_PRIO_M} AS h
  FROM orders
), q AS (
  SELECT o_orderkey, seg, wc,
         CAST(wc AS DOUBLE) * {_PRIO_M} / (h + 1) AS prio
  FROM w
), topk1 AS (
  SELECT * FROM q ORDER BY prio DESC, o_orderkey LIMIT {_PRIO_K + 1}
), tau AS (
  SELECT MIN(prio) AS tau FROM topk1
), samp AS (
  SELECT t.seg, t.wc FROM topk1 t, tau
  WHERE t.prio > tau.tau
     OR (t.prio = tau.tau
         AND t.o_orderkey < (SELECT MAX(o_orderkey) FROM topk1 x, tau
                             WHERE x.prio = tau.tau))
), est AS (
  SELECT samp.seg,
         CAST(COUNT(*) AS BIGINT) AS n_sampled,
         SUM(CAST(ROUND(CASE WHEN CAST(samp.wc AS DOUBLE) > tau.tau
                             THEN CAST(samp.wc AS DOUBLE)
                             ELSE tau.tau END, 6) AS DECIMAL(28,6))) AS e
  FROM samp, tau GROUP BY samp.seg
), exact AS (
  SELECT seg, CAST(SUM(wc) AS BIGINT) AS exact_cents FROM w GROUP BY seg
)
SELECT exact.seg AS o_orderpriority,
       COALESCE(est.n_sampled, 0) AS n_sampled,
       ROUND(CAST(COALESCE(est.e, 0) AS DOUBLE) / 100, 2) AS est_total,
       ROUND(CAST(exact_cents AS DOUBLE) / 100, 2) AS exact_total,
       ROUND(ABS(CAST(COALESCE(est.e, 0) AS DOUBLE) / 100
                 - CAST(exact_cents AS DOUBLE) / 100)
             / (CAST(exact_cents AS DOUBLE) / 100), 4) AS rel_err
FROM exact LEFT JOIN est ON est.seg = exact.seg
ORDER BY o_orderpriority
"""


@query("sample_priority_subset_sums", oracle=_PRIO_SQL)
def sample_priority_subset_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM'07) — the
    weighted sample that answers UNBIASED SUBSET-SUM queries after
    the fact: each order draws priority q = w/u (u uniform from the
    engine-portable md5 hash, so both engines draw IDENTICAL
    priorities), the top-k survive, τ = the (k+1)-th priority, and
    any segment's total estimates as Σ max(w, τ) over its sampled
    members — provably unbiased with near-optimal variance, which
    A-Res-style weighted sampling (train_weighted_sample_ares) does
    NOT give you for sums. The audit emits per-priority-segment
    estimate vs exact total and relative error; the per-item
    max(w, τ) terms ROUND→DECIMAL before summing (≤ k doubles would
    otherwise sum in partial order).

    Scale: one scan computes priorities; the top-(k+1) is a
    TakeOrdered (per-task heaps, no global sort, no window); the
    estimator touches k rows. At 100 TB this is THE way to keep a
    64-row summary that still answers 'how much revenue did segment X
    have' unbiasedly — the sketch family's answer to weighted
    GROUP-BY-later queries."""
    orders = load(spark, sf_dir, "orders")
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    w = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("seg"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("wc"),
        md5_bucket(F.col("o_orderkey"), F.lit("prio"), _PRIO_M).alias("h"),
    )
    q = w.select(
        "o_orderkey",
        "seg",
        "wc",
        (F.col("wc").cast("double") * _PRIO_M / (F.col("h") + 1)).alias("prio"),
    )
    topk1 = q.orderBy(F.col("prio").desc(), "o_orderkey").limit(_PRIO_K + 1)
    topk1 = topk1.localCheckpoint(eager=True)  # tiny; consumed thrice
    tau = topk1.agg(F.min("prio").alias("tau"))
    # drop exactly ONE row at τ (the k+1-th); if several tie at τ, the
    # highest orderkey among them is the one TakeOrdered ranked last
    drop_key = (
        topk1.crossJoin(F.broadcast(tau))
        .filter(F.col("prio") == F.col("tau"))
        .agg(F.max("o_orderkey").alias("dk"))
    )
    samp = (
        topk1.crossJoin(F.broadcast(tau))
        .crossJoin(F.broadcast(drop_key))
        .filter(
            (F.col("prio") > F.col("tau"))
            | ((F.col("prio") == F.col("tau")) & (F.col("o_orderkey") < F.col("dk")))
        )
    )
    term = F.round(
        F.when(F.col("wc").cast("double") > F.col("tau"), F.col("wc").cast("double"))
        .otherwise(F.col("tau")),
        6,
    ).cast("decimal(28,6)")
    est = samp.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum(term).alias("e"),
    )
    exact = w.groupBy("seg").agg(F.sum("wc").cast("bigint").alias("exact_cents"))
    ex = F.col("exact_cents").cast("double") / 100
    ee = F.coalesce(F.col("e"), F.lit(0)).cast("double") / 100
    return (
        exact.join(F.broadcast(est), "seg", "left")
        .select(
            F.col("seg").alias("o_orderpriority"),
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
            F.round(ee, 2).alias("est_total"),
            F.round(ex, 2).alias("exact_total"),
            F.round(F.abs(ee - ex) / ex, 4).alias("rel_err"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Extreme-value analysis: Gumbel return levels from daily block maxima
# ---------------------------------------------------------------------------

_GUMBEL_SQL = """
WITH bm AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         CAST(ROUND(MAX(value), 6) AS DECIMAL(28,6)) AS mx
  FROM events GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mx) AS DECIMAL(38,6)) AS s,
         CAST(SUM(CAST(mx AS DECIMAL(38,12)) * mx) AS DECIMAL(38,12)) AS q
  FROM bm
), d AS (
  SELECT n,
         CAST(s AS DOUBLE) / n AS mean,
         sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
              / (n - 1)) AS sd
  FROM m
), fit AS (
  SELECT n, mean, sd,
         sd * sqrt(6.0) / pi() AS beta,
         mean - 0.5772156649015329 * (sd * sqrt(6.0) / pi()) AS mu
  FROM d
)
SELECT n AS n_days,
       ROUND(mean, 4) AS mean_daily_max,
       ROUND(mu, 4) AS gumbel_mu,
       ROUND(beta, 4) AS gumbel_beta,
       ROUND(mu - beta * ln(-ln(1.0 - 1.0 / 30)), 4) AS return_level_30d,
       ROUND(mu - beta * ln(-ln(1.0 - 1.0 / 365)), 4) AS return_level_365d
FROM fit
"""


@query("stats_gumbel_return_level", oracle=_GUMBEL_SQL)
def stats_gumbel_return_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis: Gumbel return levels from daily block
    maxima — the capacity-planning readout ('what value do we exceed
    once per 30 / 365 days?') the monitoring family needs beyond
    percentiles (which say nothing about maxima of FUTURE blocks).
    Method-of-moments Gumbel fit (β = s·√6/π, μ = x̄ − γ·β with the
    Euler–Mascheroni literal), return level z_T = μ − β·ln(−ln(1−1/T))
    — the classical EVT block-maxima recipe (Gumbel 1958; Coles 2001).

    Exactness: daily maxima are exact double MAXes, ROUNDed→DECIMAL
    before the moment sums (the cross-engine order-independence
    rule), the fit is fixed double algebra at output.

    Scale: one map-side-combined day-grain max + one moment aggregate
    over the calendar-bounded frame — no window, no sort, no buffer;
    block size (day) is the knob, not the data volume."""
    ev = load(spark, sf_dir, "events")
    bm = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.round(F.max("value"), 6).cast("decimal(28,6)").alias("mx"))
    m = bm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mx").cast("decimal(38,6)").alias("s"),
        F.sum(F.col("mx").cast("decimal(38,12)") * F.col("mx"))
        .cast("decimal(38,12)")
        .alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    import math

    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta

    def level(t: int):
        return F.round(mu - beta * math.log(-math.log(1.0 - 1.0 / t)), 4)

    return m.select(
        F.col("n").alias("n_days"),
        F.round(mean, 4).alias("mean_daily_max"),
        F.round(mu, 4).alias("gumbel_mu"),
        F.round(beta, 4).alias("gumbel_beta"),
        level(30).alias("return_level_30d"),
        level(365).alias("return_level_365d"),
    )


