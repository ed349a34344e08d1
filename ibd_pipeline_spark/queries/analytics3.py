"""Behavioral analytics, wave 3 (round 5): strict-order funnel
matching — the MATCH_RECOGNIZE-class question ("users who did A, then
B after A, then C after B") that conditional aggregation
(funnel_signup_purchase) cannot answer, because it ignores ORDER.

Reference parity note: no analog in the reference engine; SURVEY.md
§2.2 event-analytics family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel,
       CAST((SELECT SUM(CAST(FLOOR(EPOCH(p.t3)) AS BIGINT)
                        - CAST(FLOOR(EPOCH(v.t1)) AS BIGINT))
             FROM p JOIN v ON p.user_id = v.user_id) AS BIGINT)
         AS total_convert_seconds
"""


@query("events_funnel_ordered_steps", oracle=_FUNNEL_SQL)
def events_funnel_ordered_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view → click → purchase: a click counts
    only if it happens AFTER the user's first view, a purchase only
    AFTER that qualifying click. Three stage aggregates, each the
    minimal event time satisfying the previous stage's anchor —
    the per-stage MIN is what makes the match semantics 'earliest
    qualifying path', the standard funnel definition.

    Conversion time is emitted as total SECONDS (exact integer sum of
    epoch differences) — no float anywhere.

    Scale: every aggregate and join keys on user_id, so AQE coalesces
    them onto one co-partitioned layout — the whole funnel is ONE
    logical shuffle of events by user plus per-user state the size of
    one timestamp per stage. Adding stages extends the chain without
    changing the shuffle count; a time-boxed variant (convert within
    N hours) adds a predicate, not a join.
    """
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    conv = p.join(v, "user_id").agg(
        F.sum(
            (F.unix_timestamp("t3") - F.unix_timestamp("t1")).cast("bigint")
        ).alias("total_convert_seconds")
    )
    counts = (
        v.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewed"))
        .crossJoin(
            c.agg(F.count(F.lit(1)).cast("bigint").alias("n_clicked_after_view"))
        )
        .crossJoin(p.agg(F.count(F.lit(1)).cast("bigint").alias("n_full_funnel")))
    )
    return counts.crossJoin(
        conv.select(F.col("total_convert_seconds").cast("bigint"))
    )


_INTERP_SQL = """
WITH d AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE)
           / COUNT(value) AS v
  FROM events GROUP BY 1
), kept AS (
  SELECT day, v FROM d
  WHERE CAST(('0x' || substring(md5(CAST(day AS VARCHAR)), 1, 8)) AS BIGINT) % 5 <> 0
), spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT MIN(day) FROM d), (SELECT MAX(day) FROM d),
           INTERVAL 1 DAY)) AS DATE) AS day
), s AS (
  SELECT sp.day, k.v,
         LAST_VALUE(CASE WHEN k.v IS NOT NULL THEN k.v END IGNORE NULLS)
           OVER (ORDER BY sp.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
         LAST_VALUE(CASE WHEN k.v IS NOT NULL THEN sp.day END IGNORE NULLS)
           OVER (ORDER BY sp.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dp,
         FIRST_VALUE(CASE WHEN k.v IS NOT NULL THEN k.v END IGNORE NULLS)
           OVER (ORDER BY sp.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
         FIRST_VALUE(CASE WHEN k.v IS NOT NULL THEN sp.day END IGNORE NULLS)
           OVER (ORDER BY sp.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS dn
  FROM spine sp LEFT JOIN kept k USING (day)
)
SELECT day,
       v IS NULL AS is_gap,
       CASE WHEN v IS NOT NULL THEN v
            WHEN vp IS NOT NULL AND vn IS NOT NULL THEN
              vp + (vn - vp) * (CAST(day - dp AS DOUBLE) / CAST(dn - dp AS DOUBLE))
            ELSE NULL END AS value_filled
FROM s
WHERE v IS NOT NULL OR (vp IS NOT NULL AND vn IS NOT NULL)
ORDER BY day
"""


@query("events_linear_interpolate_gaps", oracle=_INTERP_SQL)
def events_linear_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling by LINEAR interpolation: the daily mean-value
    series loses ~20% of its days (an md5 gate simulates feed
    outages — deterministic, so the oracle sees the same gaps), a
    generated date spine restores the missing rows, and each gap is
    filled as vp + (vn−vp)·Δ — the straight line between its nearest
    real neighbors. Builds on `join_date_spine_gapfill` (which
    carries the LAST value forward); interpolation is the variant
    dashboards and feature pipelines actually want for slowly-varying
    metrics. Leading/trailing gaps (no neighbor on one side) are
    dropped, the standard convention.

    Engine-portability: the neighbor lookups are IGNORE NULLS edge
    windows (Spark: last/first(ignorenulls=True)); the fill chain is
    one subtraction, one integer-ratio division, one multiply-add on
    exact inputs — bit-identical IEEE in both engines, so the DOUBLE
    output needs no rounding.

    Scale: the aggregate is the only event-volume work; spine and
    windows run on the day frame. The unpartitioned window is
    day-count-sized — at years-of-days scale, partition by month and
    stitch boundaries (the rollup-cascade pattern).
    """
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        (
            F.round(F.sum(F.col("value").cast("decimal(28,8)")), 4).cast("double")
            / F.count("value")
        ).alias("v")
    )
    gate = (
        F.conv(F.substring(F.md5(F.col("day").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 5
    )
    kept = d.filter(gate != 0)
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    from pyspark.sql import Window

    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    s = (
        spine.join(kept, "day", "left")
        .select(
            "day",
            "v",
            F.last(
                F.when(F.col("v").isNotNull(), F.col("v")), ignorenulls=True
            ).over(w_prev).alias("vp"),
            F.last(F.when(F.col("v").isNotNull(), F.col("day")), ignorenulls=True).over(w_prev).alias("dp"),
            F.first(F.when(F.col("v").isNotNull(), F.col("v")), ignorenulls=True).over(w_next).alias("vn"),
            F.first(F.when(F.col("v").isNotNull(), F.col("day")), ignorenulls=True).over(w_next).alias("dn"),
        )
    )
    frac = F.datediff("day", "dp").cast("double") / F.datediff("dn", "dp").cast(
        "double"
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("vp").isNotNull() & F.col("vn").isNotNull(),
            F.col("vp") + (F.col("vn") - F.col("vp")) * frac,
        )
    )
    return (
        s.select(
            "day",
            F.col("v").isNull().alias("is_gap"),
            filled.alias("value_filled"),
        )
        .filter(F.col("value_filled").isNotNull())
        .orderBy("day")
    )


_NEAREST_SQL = """
WITH s AS (
  SELECT event_id, user_id, ts, event_type,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view,
         FIRST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_view
  FROM events
), p AS (
  SELECT event_id, user_id,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t,
         CAST(FLOOR(EPOCH(prev_view)) AS BIGINT) AS tp,
         CAST(FLOOR(EPOCH(next_view)) AS BIGINT) AS tn
  FROM s WHERE event_type = 'purchase'
)
SELECT event_id, user_id,
       CASE WHEN tp IS NULL AND tn IS NULL THEN NULL
            WHEN tn IS NULL THEN t - tp
            WHEN tp IS NULL THEN tn - t
            WHEN (t - tp) <= (tn - t) THEN t - tp
            ELSE tn - t END AS nearest_view_gap_s,
       CASE WHEN tp IS NULL AND tn IS NULL THEN NULL
            WHEN tn IS NULL THEN 'backward'
            WHEN tp IS NULL THEN 'forward'
            WHEN (t - tp) <= (tn - t) THEN 'backward'
            ELSE 'forward' END AS direction
FROM p
WHERE user_id < 30
ORDER BY event_id
"""


@query("events_asof_nearest", oracle=_NEAREST_SQL)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join: for every purchase, the closest
    view by the same user in EITHER time direction (ties prefer
    backward — the causal side). The backward-only as-of join
    (`events_asof_join`) answers "state at time t"; the nearest
    variant answers "which exposure does this outcome belong to",
    the attribution question when events can be logged out of order.

    Spelled as ONE interleaved pass instead of two joins: both
    streams share a user_id sort, and two IGNORE NULLS edge windows
    (1 PRECEDING / 1 FOLLOWING frames, so a row never matches itself)
    pick each purchase's neighbors; the gap arithmetic is exact
    integer seconds. The user_id < 30 predicate bounds the emitted
    rows; it pushes to the scan.

    Scale: one shuffle on user_id shared by both windows — compare
    two range joins (two shuffles + fan-out) for the same answer.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_prev = base.rowsBetween(Window.unboundedPreceding, -1)
    w_next = base.rowsBetween(1, Window.unboundedFollowing)
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    s = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(view_ts, ignorenulls=True).over(w_prev).alias("prev_view"),
        F.first(view_ts, ignorenulls=True).over(w_next).alias("next_view"),
    ).filter(F.col("event_type") == "purchase")
    t = F.unix_timestamp("ts").cast("bigint")
    tp = F.unix_timestamp("prev_view").cast("bigint")
    tn = F.unix_timestamp("next_view").cast("bigint")
    back_gap, fwd_gap = t - tp, tn - t
    prefer_back = tp.isNotNull() & (tn.isNull() | (back_gap <= fwd_gap))
    return (
        s.select(
            "event_id",
            "user_id",
            F.when(tp.isNull() & tn.isNull(), F.lit(None).cast("bigint"))
            .when(prefer_back, back_gap)
            .otherwise(fwd_gap)
            .alias("nearest_view_gap_s"),
            F.when(tp.isNull() & tn.isNull(), F.lit(None).cast("string"))
            .when(prefer_back, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
        )
        .orderBy("event_id")
    )
