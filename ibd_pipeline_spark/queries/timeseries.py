"""Time-series diagnostics (r14 topic split): autocorrelation, the
Ljung–Box portmanteau test, Mann–Kendall trend, and the Page–Hinkley
sequential changepoint detector — consolidated here from the
chronological round files; registry names, semantics, and oracles
unchanged.

No reference analog (`spark_processor.py:153-164`); SURVEY §2.2 rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query
from ibd_pipeline_spark.queries.statcommon import (  # noqa: F401
    _PHI_B,
    _phi_tail_col,
    _phi_tail_sql,
)


# ---------------------------------------------------------------------------
# (moved from round11c.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test (daily volume, lags 1..8)
# ---------------------------------------------------------------------------

_LB_H = 8

_LB_SQL = f"""
WITH dd AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
              AS BIGINT) AS di,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
), muc AS (
  SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mu,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM dd
), denc AS (
  SELECT CAST(SUM(CAST((CAST(dd.x AS DOUBLE) - muc.mu)
                       * (CAST(dd.x AS DOUBLE) - muc.mu) AS DECIMAL(28,8)))
              AS DOUBLE) AS den
  FROM dd CROSS JOIN muc
), numc AS (
  SELECT t.k AS lag_k,
         CAST(SUM(CAST((CAST(a.x AS DOUBLE) - muc.mu)
                       * (CAST(b.x AS DOUBLE) - muc.mu) AS DECIMAL(28,8)))
              AS DOUBLE) AS num
  FROM UNNEST(range(1, {_LB_H + 1})) t(k)
  JOIN dd a ON TRUE JOIN dd b ON b.di = a.di + t.k CROSS JOIN muc
  GROUP BY t.k
), terms AS (
  SELECT SUM(CAST(ROUND(
           (numc.num / denc.den) * (numc.num / denc.den)
           / ((SELECT n_days FROM muc) - numc.lag_k), 12)
           AS DECIMAL(28,12))) AS tsum
  FROM numc CROSS JOIN denc
), q AS (
  SELECT CAST(n_days AS DOUBLE) * (n_days + 2)
           * CAST(tsum AS DOUBLE) AS q_raw,
         n_days
  FROM terms, muc
)
SELECT n_days, {_LB_H} AS df,
       ROUND(q_raw, 6) AS q_stat,
       ROUND(exp(-q_raw / 2.0)
             * (1.0 + q_raw / 2.0 + (q_raw / 2.0) * (q_raw / 2.0) / 2.0
                + (q_raw / 2.0) * (q_raw / 2.0) * (q_raw / 2.0) / 6.0), 8)
         AS p_value
FROM q
"""


@query("stats_ljung_box", oracle=_LB_SQL)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on daily event volume — "is the
    series white noise at lags 1..8, jointly?": Q = n(n+2)·Σ_k
    ρ̂_k²/(n−k), chi-square with df = 8 under H₀. The one-number
    model diagnostic on top of stats_autocorrelation_daily's per-lag
    curve — run it on forecast RESIDUALS and a significant Q says the
    model left structure on the table. Even df=8 gives the exact
    closed-form survival exp(−x/2)·Σ_{j<4}(x/2)^j/j! — identical
    double algebra on both engines, no incomplete gamma.

    Exactness: the ACF machinery is the attested lag-spine join
    (calendar-distance pairing, no LAG window); each ρ²/(n−k) term
    rounds to DECIMAL(28,12) before the 8-term sum.

    Scale: one day-grain count aggregate; the spine join runs on
    (days × 8) rows; the statistic folds on one row."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.unix_date(F.to_date(F.date_trunc("day", "ts"))).alias("di")
    ).agg(F.count(F.lit(1)).alias("x"))
    mu = d.agg(
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    dm = d.crossJoin(F.broadcast(mu))
    den = dm.agg(
        F.sum(
            (
                (F.col("x").cast("double") - F.col("mu"))
                * (F.col("x").cast("double") - F.col("mu"))
            ).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("den")
    )
    ks = ev.sparkSession.range(1, _LB_H + 1).select(
        F.col("id").alias("lag_k")
    )
    b = d.select(F.col("di").alias("dib"), F.col("x").alias("xb"))
    pairs = dm.crossJoin(F.broadcast(ks)).join(
        b, F.col("dib") == F.col("di") + F.col("lag_k")
    )
    num = pairs.groupBy("lag_k").agg(
        F.sum(
            (
                (F.col("x").cast("double") - F.col("mu"))
                * (F.col("xb").cast("double") - F.col("mu"))
            ).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("num"),
        F.max("n_days").alias("n_days"),
    )
    rho = F.col("num") / F.col("den")
    terms = (
        num.crossJoin(F.broadcast(den))
        .select(
            F.round(rho * rho / (F.col("n_days") - F.col("lag_k")), 12)
            .cast("decimal(28,12)")
            .alias("term"),
            "n_days",
        )
        .groupBy("n_days")
        .agg(F.sum("term").alias("tsum"))
    )
    q = (
        F.col("n_days").cast("double")
        * (F.col("n_days") + 2)
        * F.col("tsum").cast("double")
    )
    x2 = q / 2.0
    return terms.select(
        "n_days",
        F.lit(_LB_H).alias("df"),
        F.round(q, 6).alias("q_stat"),
        F.round(
            F.exp(-x2)
            * (F.lit(1.0) + x2 + x2 * x2 / 2.0 + x2 * x2 * x2 / 6.0),
            8,
        ).alias("p_value"),
    )
