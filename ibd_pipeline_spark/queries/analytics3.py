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
