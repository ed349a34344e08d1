"""Product-analytics round 5: behavioral-sequence and segmentation
shapes — event-transition matrices (the Markov view of a product),
exact heavy hitters per dimension, RFM customer segmentation, and
late-arrival accounting (the batch audit of streaming watermark
semantics). No reference analog (SURVEY.md §2.2 capability-gap
families); all pure DataFrame ops, one to two shuffles each.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query


@query(
    "events_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY event_type), 6)
         AS p_transition
FROM seq
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY from_type, to_type
""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: P(next event type |
    current event type) per user journey — the Markov-chain view of
    product flow (where do users go after 'view'?). lead() over the
    per-user time order builds the bigram; one aggregate counts it;
    a window over the 5×5 result normalizes rows to probabilities.

    Scale: one shuffle on user_id (window), one on the 25-cell pair
    space. Ties in ts are broken by event_id so the sequence — and
    therefore every count — is partition-invariant."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    wrow = Window.partitionBy("from_type")
    return (
        counts.withColumn(
            "p_transition",
            F.round(
                F.col("n_transitions") / F.sum("n_transitions").over(wrow), 6
            ),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "events_heavy_hitters",
    oracle="""
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n
  FROM events GROUP BY event_type, user_id
), r AS (
  SELECT event_type, user_id, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY n DESC, user_id) AS rk
  FROM c
)
SELECT event_type, user_id, CAST(n AS BIGINT) AS n_events, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 5
ORDER BY event_type, rk
""",
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: top-5 users by event volume per event
    type. Aggregate FIRST (map-side combine shrinks the stream to one
    row per (type, user)), then rank the small result — the order
    that scales; ranking raw events would sort the full table.

    Scale: shuffle 1 = (type, user) hash agg; shuffle 2 = the
    aggregated counts only. Skewed users fold into one row each at
    stage 1, so the window never sees skew."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "user_id")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "event_type",
            "user_id",
            F.col("n").alias("n_events"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("event_type", "rk")
    )


@query(
    "customer_rfm_segments",
    oracle="""
WITH rfm AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*)         AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey,
         NTILE(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
         NTILE(4) OVER (ORDER BY frequency, o_custkey)  AS f_score,
         NTILE(4) OVER (ORDER BY monetary, o_custkey)   AS m_score
  FROM rfm
)
SELECT r_score, f_score, m_score, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
""",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — quartile scores for Recency / Frequency /
    Monetary per customer, then segment population counts. The
    classic CRM cube, built from one aggregate + three global ntile
    windows over the AGGREGATED (one-row-per-customer) relation.

    Monetary ranks on the exact decimal sum (not a rounded double):
    ntile over a last-ulp-noisy double would be partition-dependent
    near quartile boundaries. Every ordering carries a custkey
    tiebreak for total order.

    Scale: ONE distributed ranking pass for all three axes — the
    per-customer aggregate melts to (custkey, axis, sortable-value)
    long form, a grouped global row number (operators/ranking.py,
    axis = group) ranks all three axes in a single range shuffle
    (each axis split across many tasks, never one task per axis),
    the NTILE formula scores row-locally, and one pivot groupBy
    reassembles the per-customer score triple. Axis values ride a
    fixed-width lexicographic encoding (ISO date / zero-padded
    integer / zero-padded decimal) so one string column carries all
    three orderings exactly — no double rounding near quartile
    boundaries."""
    from ibd_pipeline_spark.operators.ranking import (
        ntile_from_row_number,
        with_grouped_row_number,
    )

    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(28,8)")).alias("monetary"),
    ).localCheckpoint(eager=True)
    # ^ one orders pass: repartitionByRange below samples its input
    #   for boundaries before shuffling — unchckpointed, that would
    #   re-run the whole orders scan+aggregate per job.
    # Fixed-width encodings: lexicographic order == axis order
    # (dates ISO-format; counts/sums are non-negative, zero-padded
    # so digits align; decimal(28,8) prints a fixed 8-digit scale).
    axes = F.array(
        F.struct(
            F.lit("r").alias("axis"),
            F.date_format("last_order", "yyyy-MM-dd").alias("v"),
        ),
        F.struct(
            F.lit("f").alias("axis"),
            F.lpad(F.col("frequency").cast("string"), 20, "0").alias("v"),
        ),
        F.struct(
            F.lit("m").alias("axis"),
            F.lpad(F.col("monetary").cast("string"), 32, "0").alias("v"),
        ),
    )
    melted = rfm.select("o_custkey", F.explode(axes).alias("a")).select(
        "o_custkey", "a.axis", "a.v"
    )
    ranked = with_grouped_row_number(melted, ["axis"], ["v", "o_custkey"])
    scored = (
        ranked.select(
            "o_custkey",
            "axis",
            ntile_from_row_number(F.col("_rn"), F.col("_n"), 4)
            .cast("int")
            .alias("score"),
        )
        .groupBy("o_custkey")
        .pivot("axis", ["r", "f", "m"])
        .agg(F.first("score"))
        .withColumnsRenamed({"r": "r_score", "f": "f_score", "m": "m_score"})
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


@query(
    "events_late_arrival_audit",
    oracle="""
WITH arr AS (
  SELECT CAST(ts AS TIMESTAMP) AS event_time,
         CAST(ts AS TIMESTAMP)
           + INTERVAL 1 SECOND * (event_id % 600) AS arrival_time,
         event_type
  FROM events
), marked AS (
  SELECT event_type,
         time_bucket(INTERVAL 5 MINUTE, event_time) AS window_start,
         CASE WHEN arrival_time > time_bucket(INTERVAL 5 MINUTE, event_time)
                                  + INTERVAL 5 MINUTE + INTERVAL 120 SECOND
              THEN 1 ELSE 0 END AS is_late
  FROM arr
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)    AS n_events,
       CAST(SUM(is_late) AS BIGINT) AS n_late,
       ROUND(SUM(is_late) * 1.0 / COUNT(*), 6) AS late_ratio
FROM marked
GROUP BY event_type
ORDER BY event_type
""",
)
def events_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-semantics audit, batch twin: how much data would a
    2-minute watermark have dropped? Arrival time is derived
    deterministically (event_id-seeded skew up to 10 min); an event
    is late when it arrives after its 5-minute window's close +
    watermark delay. This is the accounting report you run BEFORE
    picking a production watermark (streaming/weather.py:169 uses
    2 min) — the streaming dedup/window operators drop exactly these
    rows.

    Scale: pure per-row derivation + one hash aggregate; no window
    functions, no join."""
    e = load(spark, sf_dir, "events")
    win = F.window("ts", "5 minutes")
    arrival = F.col("ts") + F.make_dt_interval(
        secs=(F.col("event_id") % 600).cast("double")
    )
    marked = e.select(
        "event_type",
        F.when(
            arrival > win["end"] + F.expr("INTERVAL 120 SECONDS"), 1
        ).otherwise(0).alias("is_late"),
    )
    return (
        marked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_late").alias("n_late"),
            F.round(F.sum("is_late") / F.count(F.lit(1)), 6).alias("late_ratio"),
        )
        .orderBy("event_type")
    )


@query(
    "events_bounce_rate",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
), sess AS (
  SELECT user_id,
         SUM(is_start) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM ordered
), sizes AS (
  SELECT user_id, session_no, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_no
)
SELECT CAST(COUNT(*) AS BIGINT)                        AS n_sessions,
       CAST(COUNT(*) FILTER (n_events = 1) AS BIGINT)  AS n_bounces,
       ROUND(COUNT(*) FILTER (n_events = 1) * 1.0 / COUNT(*), 6)
         AS bounce_rate,
       ROUND(AVG(n_events), 4)                         AS avg_session_depth
FROM sizes
""",
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate over gap-based sessions (30-min inactivity): the
    share of sessions containing exactly one event, plus average
    session depth — the composition of sessionization (the
    events_sessionize_gaps primitive) into THE engagement KPI.
    Session ids come from the cumulative-sum-of-boundaries idiom;
    every window carries an event_id tiebreak.

    Scale: both windows share ONE user_id shuffle (same partition
    key and ordering → one sort, two frames); the session-size
    aggregate reuses that partitioning."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_start = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > 1800),
        1,
    ).otherwise(0)
    sess = e.select(
        "user_id",
        F.sum(is_start)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
    )
    sizes = sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_if(F.col("n_events") == 1).alias("n_bounces"),
        F.round(F.count_if(F.col("n_events") == 1) / F.count(F.lit(1)), 6).alias(
            "bounce_rate"
        ),
        F.round(F.avg("n_events"), 4).alias("avg_session_depth"),
    )


@query(
    "events_anomaly_rolling_zscore",
    oracle="""
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, COUNT(*) AS n
  FROM events GROUP BY 1
), stats AS (
  SELECT d, n,
         AVG(n)    OVER w AS mu,
         STDDEV_SAMP(n) OVER w AS sigma,
         COUNT(*)  OVER w AS n_window
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT d, CAST(n AS BIGINT) AS n_events,
       ROUND(mu, 4)    AS trailing_mean,
       ROUND(CASE WHEN sigma > 0 THEN (n - mu) / sigma END, 4) AS z_score,
       CASE WHEN sigma > 0 AND ABS((n - mu) / sigma) > 3
            THEN TRUE ELSE FALSE END AS is_anomaly
FROM stats
WHERE n_window = 7
ORDER BY d
""",
)
def events_anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each day's event count scored against
    its own TRAILING 7-day window (ROWS 7 PRECEDING .. 1 PRECEDING —
    today excluded, so a spike can't suppress its own alarm). The
    pipeline-monitoring twin of quality_psi_drift: PSI asks "did the
    distribution move between eras", this asks "is today's volume
    out of its own recent band". Days without a full trailing week
    are not scored (no partial-window false alarms).

    Scale: aggregate-then-window — the window's input is one row per
    DAY, not per event, and the bounded ROWS frame runs
    MONTH-PARTITIONED over a 7-day-padded day frame
    (operators/calendar.py:with_month_padding — r11; exact on a
    dense day grain, which daily event counts are; densify first for
    sparse grains). Same one-shuffle shape at any corpus size."""
    from ibd_pipeline_spark.operators.calendar import with_month_padding

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    padded = with_month_padding(daily, "d", pad_before=7)
    w = Window.partitionBy("_m").orderBy("d").rowsBetween(-7, -1)
    stats = (
        padded.select(
            "d",
            "n",
            F.avg("n").over(w).alias("mu"),
            F.stddev("n").over(w).alias("sigma"),
            F.count(F.lit(1)).over(w).alias("n_window"),
            "_own",
        )
        .filter(F.col("_own") & (F.col("n_window") == 7))
        .drop("_own")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return stats.select(
        "d",
        F.col("n").alias("n_events"),
        F.round("mu", 4).alias("trailing_mean"),
        F.round(F.when(F.col("sigma") > 0, z), 4).alias("z_score"),
        F.when((F.col("sigma") > 0) & (F.abs(z) > 3), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    ).orderBy("d")
