"""Round-8 capability queries: join-size estimation for shuffle
planning and a seasonal-naive forecast backtest.

Both are exact/DuckDB-attestable by construction:

- The join-size estimator samples KEYS (not rows) through the
  md5-portable bucket idiom (operators/sketches.py:md5_bucket), so
  both engines pick the identical sample and every output is integer
  arithmetic — no float anywhere.
- The forecast backtest joins the day grain to itself on a calendar
  offset (never LAG-over-rows, which silently shifts across gap
  days), and its error metrics are identical IEEE double expressions
  on both sides, rounded only at the output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# Distributed join-size estimation (shuffle planning)
# ---------------------------------------------------------------------------

_JOIN_SIZE_SQL = """
WITH c AS (
  SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
), s AS (
  SELECT k, n FROM c
  WHERE CAST(('0x' || substring(md5('7:' || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
), e AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(n * n) AS BIGINT) AS exact_pairs
  FROM c
), se AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS sampled_keys,
         CAST(COALESCE(SUM(n * n), 0) * 10 AS BIGINT) AS est_pairs
  FROM s
)
SELECT e.n_keys, e.exact_pairs, se.sampled_keys, se.est_pairs,
       CAST(ABS(se.est_pairs - e.exact_pairs) * 10000 // e.exact_pairs AS BIGINT)
         AS abs_err_bp
FROM e, se
"""


@query("profile_join_size_estimate", oracle=_JOIN_SIZE_SQL)
def profile_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from a key sample — the planning probe you
    run BEFORE a potentially quadratic join (here the lineitem
    self-join on l_partkey, the classic blowup shape): per-key counts
    once, |A ⋈ A| = Σₖ n(k)² exactly, and the 10%-of-KEYS estimate
    scaled by 1/p next to it with the error in integer basis points.
    Key-sampling (not row-sampling) is what makes the estimator
    unbiased for Σ n² — a row sample deflates heavy keys
    quadratically. The companion to profile_key_skew: skew tells you
    WHERE the hot keys are, this tells you whether the join output
    fits before you launch it.

    Exactness: the sample membership is the md5-portable bucket
    (seed 7, mod 100 < 10) — both engines pick the identical keys —
    and every output column is BIGINT arithmetic (cross-multiplied
    basis points, integer floor-div), so the oracle is exact with no
    float rounding anywhere.

    Scale: one map-side-combined count per key (the same pass any
    shuffle-planning probe pays), then two key-domain-sized
    aggregates to single rows; the estimate needs only the sampled
    10% of the key domain — at 100 TB you run ONLY the `s` branch
    (drop the exact twin, which exists here to attest the estimator)
    and the probe costs one aggregate over a 10% key sample."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    c = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    s = c.filter(md5_bucket(F.col("k"), 7, 100) < 10)
    e = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("exact_pairs"),
    )
    se = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("sampled_keys"),
        (F.coalesce(F.sum(F.col("n") * F.col("n")), F.lit(0)) * 10)
        .cast("bigint")
        .alias("est_pairs"),
    )
    return (
        e.crossJoin(F.broadcast(se))
        .select(
            "n_keys",
            "exact_pairs",
            "sampled_keys",
            "est_pairs",
            # integer space on both sides: Spark `div`, DuckDB `//`
            # (Spark `/` is a DOUBLE divide; DuckDB CAST rounds where
            # Spark truncates — profile_key_skew precedent).
            F.expr("abs(est_pairs - exact_pairs) * 10000L div exact_pairs")
            .cast("bigint")
            .alias("abs_err_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest
# ---------------------------------------------------------------------------

_FORECAST_SQL = """
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
), j AS (
  SELECT a.day, a.n_events AS actual, f.n_events AS forecast
  FROM daily a JOIN daily f ON f.day = a.day - INTERVAL 7 DAY
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_days,
       ROUND(AVG(ABS(CAST(actual - forecast AS DOUBLE)) / actual), 6) AS mape,
       ROUND(AVG(2.0 * ABS(CAST(actual - forecast AS DOUBLE))
                 / (actual + forecast)), 6) AS smape,
       ROUND(AVG(CAST(forecast - actual AS DOUBLE)), 6) AS mean_bias
FROM j
"""


@query("events_forecast_backtest", oracle=_FORECAST_SQL)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest on daily event volume:
    forecast(d) = actual(d − 7 calendar days), scored with MAPE,
    sMAPE, and mean bias over every day that has a week-ago
    observation. The third leg of the monitoring trio —
    events_seasonal_decompose says what normal looks like,
    events_cusum_changepoint says where the level shifted, and this
    query says how predictable the series actually is (the baseline
    any fancier forecaster must beat before it earns a deploy).

    The forecast joins the day grain to itself on a CALENDAR offset
    (day − 7), never LAG(7)-over-rows: with gap days present a row
    lag silently compares against whatever happened to be 7 rows ago.
    Error metrics are identical IEEE double expressions in identical
    order on both engines; rounding (6 dp) applies only at the
    output.

    Scale: one shuffle to the day grain, then a day-count-sized
    self-join and a single-row aggregate — event-volume work is the
    first groupBy only."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    a = daily.alias("a")
    f = daily.alias("f")
    j = a.join(
        f, F.col("f.day") == F.date_sub(F.col("a.day"), 7), "inner"
    ).select(
        F.col("a.n_events").alias("actual"),
        F.col("f.n_events").alias("forecast"),
    )
    diff = (F.col("actual") - F.col("forecast")).cast("double")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_days"),
        F.round(F.avg(F.abs(diff) / F.col("actual")), 6).alias("mape"),
        F.round(
            F.avg(
                F.lit(2.0) * F.abs(diff) / (F.col("actual") + F.col("forecast"))
            ),
            6,
        ).alias("smape"),
        F.round(
            F.avg((F.col("forecast") - F.col("actual")).cast("double")), 6
        ).alias("mean_bias"),
    )
