"""Statistical hypothesis tests and smoothing as distributed SQL
(round 5, wave 3): two-sample Kolmogorov–Smirnov, chi-square
independence, Mann–Whitney U, and a fixed-horizon EWMA — the readouts
a data-quality / experimentation platform runs next to its pipelines
(the same family as quality.py's PSI drift and A/B z-test).

Cross-engine float discipline: every statistic here is engineered so
the driver's value-hash can't flip —

- KS emits the EXACT integer-scaled statistic
  max|F1−F2|·n1·n2 (pure int arithmetic) next to a single-division
  double (one IEEE op on exact ints is bit-identical everywhere).
- chi-square computes each cell's term as the same per-row double
  expression in both engines (x*x spelled as multiplication, never
  POWER — library pow() implementations may differ), then sums
  order-independently in the decimal domain (dsum contract).
- Mann–Whitney U carries average ranks (exact halves) and emits the
  doubled integer 2·U plus a deterministic z chain on exact inputs.
- EWMA uses decay a = 0.5: 0.5^k is a pure exponent shift, so every
  product is exact scaling and the fixed-order 8-term sum is
  bit-identical across engines.

Reference parity note: no analog in the reference engine
(spark_processor.py computes streaming means/stddevs only); these
belong to SURVEY.md §2.2's capability-gap families (agg variants /
quality readouts).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

_KS_SQL = """
WITH p AS (
  SELECT value AS v,
         CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS c1,
         CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS c2
  FROM events
  WHERE event_type IN ('purchase', 'click')
  GROUP BY value
), c AS (
  SELECT SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
         SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
         SUM(c1) OVER () AS n1,
         SUM(c2) OVER () AS n2
  FROM p
)
SELECT CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS BIGINT) AS ks_scaled,
       CAST(MAX(n1) AS BIGINT) AS n1,
       CAST(MAX(n2) AS BIGINT) AS n2,
       CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS DOUBLE)
         / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE)) AS ks_d
FROM c
"""


@query("stats_ks_two_sample", oracle=_KS_SQL)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test: is the `value` distribution
    of purchase events the same as click events? D = max |F1(v) −
    F2(v)| over the pooled support, computed distributively: group by
    value (one shuffle, cardinality = distinct values), then BOTH
    running cumulative counts in one multi-weight distributed scan
    (operators/ranking.py:with_global_prefix_sums — a range exchange
    plus a narrow Arrow cumsum; NO single-partition WindowExec, so the
    support frame never lands on one task even when `value` is
    continuous and the distinct support is O(n)), then a max.

    The statistic is carried as the exact integer
    max|cum1·n2 − cum2·n1| — no ECDF division until the final single
    IEEE op — so the comparison is immune to float-summation order,
    and the integer weights make the distributed scan bit-identical
    to the oracle's serial windowed SUM.

    Scale: every step is now distributed — the r06–r08 form kept an
    unpartitioned window over the distinct-value support ("pre-bin at
    scale" escape hatch); r09 removed it and the query came off the
    plan-audit allow-list.
    """
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    per_value = ev.groupBy(F.col("value").alias("v")).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c2"),
    )
    # `v` is unique after the groupBy, so it is a total order.
    cum = with_global_prefix_sums(per_value, ["v"], ["c1", "c2"])
    scaled = F.abs(
        F.col("_cum_c1") * F.col("_tot_c2")
        - F.col("_cum_c2") * F.col("_tot_c1")
    )
    return cum.agg(
        F.max(scaled).cast("bigint").alias("ks_scaled"),
        F.max("_tot_c1").cast("bigint").alias("n1"),
        F.max("_tot_c2").cast("bigint").alias("n2"),
        (
            F.max(scaled).cast("double")
            / (
                F.max("_tot_c1").cast("double")
                * F.max("_tot_c2").cast("double")
            )
        ).alias("ks_d"),
    )


_CHI2_SQL = """
WITH o AS (
  SELECT event_type, ISODOW(ts) AS dow, CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, dow, obs,
         SUM(obs) OVER (PARTITION BY event_type) AS row_tot,
         SUM(obs) OVER (PARTITION BY dow) AS col_tot,
         SUM(obs) OVER () AS n
  FROM o
), t AS (
  SELECT CAST(obs AS DOUBLE) AS od,
         CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
           / CAST(n AS DOUBLE) AS e
  FROM m
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(ROUND(SUM(CAST(
              (od - e) * (od - e) / e AS DECIMAL(28,8))), 4)
            AS DOUBLE) AS chi2
FROM t
"""


@query("stats_chi_square_independence", oracle=_CHI2_SQL)
def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event_type and ISO
    day-of-week: one count aggregate builds the contingency table,
    MARGIN AGGREGATES broadcast back onto the cells derive the
    expectations (the stats_mutual_information form — no window
    operator anywhere; came off the unpartitioned-window allow-list
    in r12), and chi² = Σ (o−e)²/e folds over the (tiny) cell frame.

    Each cell's term is the identical per-row double chain in both
    engines — (o−e)·(o−e)/e with explicit multiplication, margins
    divided in the same order — then cast to decimal per cell so the
    35-term sum is order-independent (dsum contract). Spark's
    weekday()+1 equals DuckDB's ISODOW (1=Monday).

    Scale: the only row-count-proportional work is the first count
    aggregate (map-side combined, one shuffle on ~35 keys); margins
    are catalog-sized aggregates joined back by broadcast hash join.
    """
    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.weekday("ts") + F.lit(1)).alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    row_tot = obs.groupBy("event_type").agg(F.sum("obs").alias("row_tot"))
    col_tot = obs.groupBy("dow").agg(F.sum("obs").alias("col_tot"))
    n_tot = obs.agg(F.sum("obs").alias("n"))
    margins = (
        obs.join(F.broadcast(row_tot), "event_type")
        .join(F.broadcast(col_tot), "dow")
        .crossJoin(F.broadcast(n_tot))
        .select(
            F.col("obs").cast("double").alias("od"),
            (
                F.col("row_tot").cast("double")
                * F.col("col_tot").cast("double")
                / F.col("n").cast("double")
            ).alias("e"),
        )
    )
    term = (F.col("od") - F.col("e")) * (F.col("od") - F.col("e")) / F.col("e")
    return margins.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.sum(term.cast("decimal(28,8)")), 4).cast("double").alias("chi2"),
    )


_MWU_SQL = """
WITH s AS (
  SELECT value AS v, event_type = 'purchase' AS is_a
  FROM events WHERE event_type IN ('purchase', 'view')
), r AS (
  SELECT is_a,
         RANK() OVER (ORDER BY v) + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0
           AS avg_rank,
         COUNT(*) OVER (PARTITION BY v) AS tie_n
  FROM s
), agg AS (
  SELECT CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n2,
         SUM(CASE WHEN is_a THEN 2 * avg_rank ELSE 0 END) AS r1_x2
  FROM r
), ties AS (
  SELECT SUM(t * t * t - t) AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY v)
)
SELECT n1, n2,
       CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       (CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
        - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
       / SQRT(
           CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
           * (CAST(n1 + n2 + 1 AS DOUBLE)
              - CAST((SELECT tie_term FROM ties) AS DOUBLE)
                / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))
         ) AS z
FROM agg
"""


@query("stats_mann_whitney_u", oracle=_MWU_SQL)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test (purchase vs view `value`), with
    tie-corrected normal approximation. Average ranks come from
    RANK() plus half the tie-group width — exact multiples of 0.5, so
    their sum is exact in doubles and order-independent; the statistic
    is emitted as the exact integer 2·U1 plus a z-score whose whole
    chain (subtract, multiply, divide, sqrt) runs on exact inputs —
    bit-identical IEEE in both engines.

    Scale: fully distributed as of r09 — rank-from-prefix-sum replaces
    the global RANK() window. Group by value (one shuffle; average
    ranks are a pure function of the tie-group counts: for a distinct
    value v with pooled tie count t(v) and inclusive pooled running
    count cum(v), RANK = cum−t+1 and 2·avg_rank = 2·cum−t+1 — exact
    integers, no halves ever materialized), run ONE multi-weight
    distributed scan (operators/ranking.py:with_global_prefix_sums)
    for the pooled running count, and fold. Everything after runs on
    aggregates. No single-partition WindowExec anywhere.
    """
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    s = ev.select(
        F.col("value").alias("v"),
        (F.col("event_type") == "purchase").alias("is_a"),
    )
    per_value = s.groupBy("v").agg(
        F.count(F.when(F.col("is_a"), 1)).alias("c1"),
        F.count(F.when(~F.col("is_a"), 1)).alias("c2"),
    )
    per_value = per_value.withColumn("t", F.col("c1") + F.col("c2"))
    cum = with_global_prefix_sums(per_value, ["v"], ["t"])
    # Σ over group-A rows of 2·avg_rank, as exact integers:
    # 2·avg_rank(v) = 2·cum(v) − t(v) + 1 for every row tied at v.
    two_avg_rank = 2 * F.col("_cum_t") - F.col("t") + F.lit(1)
    agg = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * two_avg_rank).cast("double").alias("r1_x2"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_term"),
    )
    j = agg
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + F.lit(1))
    z = (
        u1.cast("double") / F.lit(2.0) - n1d * n2d / F.lit(2.0)
    ) / F.sqrt(
        n1d * n2d / F.lit(12.0)
        * (
            (F.col("n1") + F.col("n2") + F.lit(1)).cast("double")
            - F.col("tie_term").cast("double")
            / (nd * (F.col("n1") + F.col("n2") - F.lit(1)).cast("double"))
        )
    )
    return j.select(
        "n1", "n2", u1.cast("bigint").alias("u1_x2"), z.alias("z")
    )


_EWMA_SQL = """
WITH d AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE)
           / COUNT(value) AS day_avg
  FROM events
  GROUP BY 1
), l AS (
  SELECT day, n_events, day_avg,
         LAG(day_avg, 1) OVER (ORDER BY day) AS v1,
         LAG(day_avg, 2) OVER (ORDER BY day) AS v2,
         LAG(day_avg, 3) OVER (ORDER BY day) AS v3,
         LAG(day_avg, 4) OVER (ORDER BY day) AS v4,
         LAG(day_avg, 5) OVER (ORDER BY day) AS v5,
         LAG(day_avg, 6) OVER (ORDER BY day) AS v6,
         LAG(day_avg, 7) OVER (ORDER BY day) AS v7
  FROM d
)
SELECT day, n_events, day_avg,
       (day_avg + 0.5 * v1 + 0.25 * v2 + 0.125 * v3 + 0.0625 * v4
        + 0.03125 * v5 + 0.015625 * v6 + 0.0078125 * v7) / 1.9921875
         AS ewma
FROM l
WHERE v7 IS NOT NULL
ORDER BY day
"""


@query("events_ewma_daily", oracle=_EWMA_SQL)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-horizon EWMA smoothing of the daily mean event value:
    decay a = 0.5 over the trailing 8 days, normalized by the finite
    geometric sum 1.9921875 = 2 − 2⁻⁷. The horizon is truncated (days
    with fewer than 7 predecessors are dropped) so every output is a
    full window — the recursive form EWMA_t = a·v_t + (1−a)·EWMA_{t−1}
    has unbounded lookback, which neither SQL engine can express
    without recursion over data (and which this truncation
    approximates to within 2⁻⁸ of total weight).

    a = 0.5 is chosen deliberately: 0.5^k is an exponent shift, so
    each product is exact and the fixed-order sum is bit-identical
    across engines — no rounding needed on the smoothed output. The
    day_avg input itself rides the davg decimal contract.

    Scale: one day-grain aggregate (map-side combined), then lag
    windows over the day frame (rows = days, not events) running
    MONTH-PARTITIONED over a 7-day-padded day frame
    (operators/calendar.py:with_month_padding — r11; exact on a
    dense day grain; densify first for sparse grains).
    """
    from ibd_pipeline_spark.operators.calendar import with_month_padding

    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.round(F.sum(F.col("value").cast("decimal(28,8)")), 4).cast("double")
            / F.count("value")
        ).alias("day_avg"),
    )
    padded = with_month_padding(d, "day", pad_before=7)
    w = Window.partitionBy("_m").orderBy("day")
    lags = [F.lag("day_avg", k).over(w) for k in range(1, 8)]
    weights = [0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.0078125]
    ewma_num = F.col("day_avg")
    for wgt, lg in zip(weights, lags):
        ewma_num = ewma_num + F.lit(wgt) * lg
    return (
        padded.select(
            "day",
            "n_events",
            "day_avg",
            (ewma_num / F.lit(1.9921875)).alias("ewma"),
            lags[6].alias("_v7"),
            "_own",
        )
        .filter(F.col("_own") & F.col("_v7").isNotNull())
        .drop("_v7", "_own")
        .orderBy("day")
    )
