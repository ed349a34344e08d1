"""Regression-diagnostic queries (round-12 split): Durbin–Watson
autocorrelation, Breusch–Pagan heteroskedasticity, Chow structural
break. Split out of the former round12.py; names/semantics unchanged.
No reference analog (`spark_processor.py:153-164`); SURVEY §2.2 rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query
from ibd_pipeline_spark.queries.statcommon import _phi_tail_col, _phi_tail_sql

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
# (moved from round10_stats.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

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
