"""Data-quality primitives: expectation audits and column profiling.

The operational layer every production pipeline runs before/after the
analytics in the rest of the registry (dbt tests / Deequ-style
constraint checks, re-expressed as plain aggregates). Both queries
are single-scan formulations: N rules or N columns never mean N
passes over the table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query


@query(
    "quality_expectations_audit",
    oracle="""
WITH o AS (
  SELECT CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT) AS null_custkey,
         CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT) AS nonpos_price,
         CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('O','F','P')) AS BIGINT)
           AS bad_status,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkey
  FROM orders
),
refs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orphan_lineitems
  FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT rule_name, n_violations, n_violations = 0 AS passed
FROM (
  SELECT 'orders.o_custkey_not_null' AS rule_name, null_custkey AS n_violations FROM o
  UNION ALL SELECT 'orders.o_totalprice_positive', nonpos_price FROM o
  UNION ALL SELECT 'orders.o_orderstatus_accepted_values', bad_status FROM o
  UNION ALL SELECT 'orders.o_orderkey_unique', dup_orderkey FROM o
  UNION ALL SELECT 'lineitem.l_orderkey_referential', orphan_lineitems FROM refs
)
ORDER BY rule_name
""",
)
def quality_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit (dbt-test / Deequ shape): not-null, accepted
    values, positivity, key uniqueness, and referential integrity,
    reported as (rule, violation count, passed).

    Scale: ALL four orders rules ride ONE aggregate over one scan
    (count_if + count-distinct), not one scan per rule — the
    difference between auditing 100 TB once and four times. The
    referential rule is a left-anti join on the orderkey; at scale
    the runtime bloom filter (on by default, session.py) prunes the
    lineitem side before the shuffle. Results are unpivoted with
    stack() — constant-width, no shuffle."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    orders_audit = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkey"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpos_price"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("bad_status"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
    )
    orphans = (
        li.join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    audited = orders_audit.join(F.broadcast(orphans))
    rules = audited.select(
        F.expr(
            "stack(5, "
            "'orders.o_custkey_not_null', null_custkey, "
            "'orders.o_totalprice_positive', nonpos_price, "
            "'orders.o_orderstatus_accepted_values', bad_status, "
            "'orders.o_orderkey_unique', dup_orderkey, "
            "'lineitem.l_orderkey_referential', orphan_lineitems) "
            "AS (rule_name, n_violations)"
        )
    )
    return rules.select(
        "rule_name", "n_violations", (F.col("n_violations") == 0).alias("passed")
    ).orderBy("rule_name")


@query(
    "profile_table_columns",
    oracle="""
SELECT col_name, n_nulls, n_distinct, min_val, max_val
FROM (
  SELECT 'o_orderkey' AS col_name,
         CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)   AS n_distinct,
         CAST(MIN(o_orderkey) AS VARCHAR)             AS min_val,
         CAST(MAX(o_orderkey) AS VARCHAR)             AS max_val
  FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
         CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
         CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
         CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
  FROM orders
)
ORDER BY col_name
""",
)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (the "describe my table" operational query):
    null count, distinct count, lexicographic min/max per column,
    one row per column.

    Scale: null/min/max metrics come from ONE aggregate over ONE scan
    (the oracle's UNION-ALL-per-column form re-reads the table per
    column). Exact distinct counts are per-column TWO-LEVEL aggregates
    (map-side partial dedup shrinks each column to its distinct frame
    before its shuffle) instead of countDistinct terms in the shared
    agg — which planned an Expand row per column per input row, the
    4× shuffle the r15 optimization removed (same counts, 1-row
    frames cross-joined back). At 100 TB swap the exact distincts for
    approx_count_distinct and the Expand question disappears
    entirely. Min/max stringified AFTER the typed aggregate, so
    numeric columns compare numerically, not lexically."""
    o = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    for c in cols:
        dc = (
            o.select(c)
            .groupBy(c)
            .agg(F.lit(1))
            # count(c), not count(*): countDistinct never counts the
            # NULL group
            .agg(F.count(F.col(c)).alias(f"{c}__distinct"))
        )
        one = one.crossJoin(F.broadcast(dc))
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return (
        one.select(
            F.expr(
                f"stack({len(cols)}, {stack_args}) "
                "AS (col_name, n_nulls, n_distinct, min_val, max_val)"
            )
        )
        .orderBy("col_name")
    )


@query(
    "gdpr_delete_propagation",
    oracle="""
WITH tombstones AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
),
ev AS (
  SELECT CAST(COUNT(*) FILTER (t.user_id IS NOT NULL) AS BIGINT) AS n_deleted,
         CAST(COUNT(*) FILTER (t.user_id IS NULL) AS BIGINT)     AS n_retained
  FROM events e LEFT JOIN tombstones t USING (user_id)
),
cust AS (
  SELECT CAST(COUNT(*) FILTER (t.user_id IS NOT NULL) AS BIGINT) AS n_deleted,
         CAST(COUNT(*) FILTER (t.user_id IS NULL) AS BIGINT)     AS n_retained
  FROM customer c LEFT JOIN tombstones t ON c.c_custkey = t.user_id
)
SELECT table_name, n_deleted, n_retained
FROM (
  SELECT 'events' AS table_name, n_deleted, n_retained FROM ev
  UNION ALL SELECT 'customer', n_deleted, n_retained FROM cust
)
ORDER BY table_name
""",
)
def gdpr_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation audit: given a tombstone set
    of user ids (user_id % 97 == 0 plays the deletion-request table),
    report per table how many rows the delete pass will remove vs
    retain. The rewrite itself is the same plan with the aggregate
    swapped for a filtered write — this query is the dry-run every
    deletion pipeline executes first.

    Scale: the tombstone set is tiny relative to any fact table
    (deletion requests vs 100 TB of events) — broadcast left join,
    zero fact-side shuffle, counts map-side-combine. Per-table
    audits stay separate scans because they scan DIFFERENT tables;
    nothing is scanned twice."""
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    tomb = (
        e.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    ).withColumn("hit", F.lit(1))

    def audit(df: DataFrame, key: str, name: str) -> DataFrame:
        joined = df.join(
            F.broadcast(tomb), df[key] == tomb["user_id"], "left"
        )
        return joined.agg(
            F.lit(name).alias("table_name"),
            F.count("hit").alias("n_deleted"),
            F.count(F.when(F.col("hit").isNull(), 1)).alias("n_retained"),
        )

    return (
        audit(e, "user_id", "events")
        .unionByName(audit(c, "c_custkey", "customer"))
        .orderBy("table_name")
    )


@query(
    "quality_psi_drift",
    oracle="""
WITH binned AS (
  SELECT CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
              THEN 'expected' ELSE 'actual' END AS era,
         LEAST(9, CAST(FLOOR(value / 50.0) AS INT)) AS bin
  FROM events
),
counts AS (
  SELECT bin,
         COUNT(*) FILTER (era = 'expected') AS n_exp,
         COUNT(*) FILTER (era = 'actual')   AS n_act
  FROM binned GROUP BY bin
),
tot AS (
  SELECT SUM(n_exp) AS te, SUM(n_act) AS ta FROM counts
)
SELECT bin,
       ROUND(CAST(n_exp AS DOUBLE) / te, 6) AS expected_pct,
       ROUND(CAST(n_act AS DOUBLE) / ta, 6) AS actual_pct,
       ROUND((CAST(n_act AS DOUBLE) / ta - CAST(n_exp AS DOUBLE) / te)
             * ln((CAST(n_act AS DOUBLE) / ta + 1e-6)
                  / (CAST(n_exp AS DOUBLE) / te + 1e-6)), 6) AS psi_term
FROM counts, tot
ORDER BY bin
""",
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift detection: bin the metric,
    compare the distribution of a reference era (first half of the
    month) against the current era, emit the per-bin PSI contribution
    (Σ psi_term > 0.2 is the conventional "investigate" threshold).
    The standard ML-ops gate for feature drift before retraining.

    Scale: one scan, one hash-aggregate on ~10 bins (map-side
    combine collapses everything before the exchange), bin totals via
    a broadcast 1-row aggregate. Adding dimensions (per feature, per
    segment) only widens the tiny aggregate key."""
    e = load(spark, sf_dir, "events")
    binned = e.select(
        F.when(
            F.col("ts").cast("timestamp") < F.lit("2024-01-15").cast("timestamp"),
            F.lit("expected"),
        )
        .otherwise(F.lit("actual"))
        .alias("era"),
        F.least(F.lit(9), F.floor(F.col("value") / 50.0).cast("int")).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("era") == "expected", 1)).alias("n_exp"),
        F.count(F.when(F.col("era") == "actual", 1)).alias("n_act"),
    )
    tot = counts.agg(
        F.sum("n_exp").alias("te"), F.sum("n_act").alias("ta")
    )
    pe = F.col("n_exp").cast("double") / F.col("te")
    pa = F.col("n_act").cast("double") / F.col("ta")
    return (
        counts.join(F.broadcast(tot))
        .select(
            "bin",
            F.round(pe, 6).alias("expected_pct"),
            F.round(pa, 6).alias("actual_pct"),
            F.round((pa - pe) * F.log((pa + 1e-6) / (pe + 1e-6)), 6).alias(
                "psi_term"
            ),
        )
        .orderBy("bin")
    )


@query(
    "events_period_over_period",
    oracle="""
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
)
SELECT CAST(d AS TIMESTAMP) AS day,
       n_events,
       CAST(LAG(n_events) OVER (ORDER BY d) AS BIGINT) AS prev_day,
       ROUND(CASE WHEN LAG(n_events) OVER (ORDER BY d) IS NULL THEN NULL
             ELSE 100.0 * (n_events - LAG(n_events) OVER (ORDER BY d))
                  / LAG(n_events) OVER (ORDER BY d) END, 4) AS pct_change,
       ROUND(AVG(CAST(n_events AS DOUBLE)) OVER (
               ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
         AS ma7
FROM daily
ORDER BY day
""",
)
def events_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: daily volumes with day-over-day
    percent change and a trailing 7-OBSERVED-DAY moving average — the
    aggregate-then-window composition every operational dashboard
    runs (the window operates on the AGGREGATED grain, so its input
    is days, not events). NB: gap days don't pad the MA frame (ROWS,
    not RANGE — the oracle matches); densify with
    join_date_spine_gapfill first when calendar-day semantics are
    required, or see events_rolling_active_users for the range-frame
    form.

    Scale: the event scan collapses to day rows in one map-side-
    combined aggregate before any window; the lag/MA frames run
    MONTH-PARTITIONED over a 6-day-padded day frame
    (operators/calendar.py:with_month_padding — r11; exact on a
    dense day grain; densify first for sparse grains), so no single
    task ever holds the whole day spine."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.col("ts").cast("timestamp").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    from pyspark.sql import Window

    from ibd_pipeline_spark.operators.calendar import with_month_padding

    padded = with_month_padding(daily, "d", pad_before=6)
    w = Window.partitionBy("_m").orderBy("d")
    ma = w.rowsBetween(-6, 0)
    prev = F.lag("n_events").over(w)
    return (
        padded.select(
            F.col("d").cast("timestamp").alias("day"),
            "n_events",
            prev.alias("prev_day"),
            F.round(
                F.when(prev.isNull(), F.lit(None)).otherwise(
                    100.0 * (F.col("n_events") - prev) / prev
                ),
                4,
            ).alias("pct_change"),
            F.round(
                F.avg(F.col("n_events").cast("double")).over(ma), 4
            ).alias("ma7"),
            "_own",
        )
        .filter("_own")
        .drop("_own")
        .orderBy("day")
    )


@query(
    "ab_test_proportion_ztest",
    oracle="""
WITH assigned AS (
  SELECT user_id, user_id % 2 AS variant,
         MAX(CASE WHEN event_type = 'purchase' AND value > 80 THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT variant,
         COUNT(*) AS n_users,
         SUM(converted) AS n_converted,
         CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS rate
  FROM assigned GROUP BY variant
),
wide AS (
  SELECT MAX(CASE WHEN variant = 0 THEN n_users END)     AS n0,
         MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
         MAX(CASE WHEN variant = 0 THEN rate END)        AS r0,
         MAX(CASE WHEN variant = 1 THEN n_users END)     AS n1,
         MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1,
         MAX(CASE WHEN variant = 1 THEN rate END)        AS r1
  FROM arms
)
SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
       ROUND(r0, 6) AS rate_control,
       CAST(n1 AS BIGINT) AS n_treatment, CAST(c1 AS BIGINT) AS conv_treatment,
       ROUND(r1, 6) AS rate_treatment,
       ROUND(r1 - r0, 6) AS lift_abs,
       ROUND((r1 - r0) / NULLIF(sqrt(
         (CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
         * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
         * (1.0 / n0 + 1.0 / n1)), 0), 4) AS z_score
FROM wide
""",
)
def ab_test_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: deterministic
    variant assignment (user_id parity), per-user conversion, pooled
    standard error, and the z statistic (|z| > 1.96 ⇒ significant at
    5%) — the experimentation-platform readout as one declarative
    plan.

    Scale: per-user conversion is one hash-aggregate on user_id; the
    arms aggregate is 2 rows; everything after is constant-size
    arithmetic. Nothing about the experiment readout needs a driver
    loop or a stats library."""
    e = load(spark, sf_dir, "events")
    assigned = (
        e.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 80), 1
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    arms = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
        (F.sum("converted").cast("double") / F.count(F.lit(1))).alias("rate"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 0, F.col("rate"))).alias("r0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
        F.max(F.when(F.col("variant") == 1, F.col("rate"))).alias("r1"),
    )
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    se = F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return wide.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("c0").cast("long").alias("conv_control"),
        F.round("r0", 6).alias("rate_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        F.col("c1").cast("long").alias("conv_treatment"),
        F.round("r1", 6).alias("rate_treatment"),
        F.round(F.col("r1") - F.col("r0"), 6).alias("lift_abs"),
        F.round(
            (F.col("r1") - F.col("r0")) / F.nullif(se, F.lit(0.0)), 4
        ).alias("z_score"),
    )


@query(
    "quality_benford_digits",
    oracle="""
WITH d AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1
), c AS (
  SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
), t AS (
  SELECT digit, n, SUM(n) OVER () AS total FROM c
)
SELECT digit,
       CAST(n AS BIGINT)                       AS n_values,
       ROUND(n * 1.0 / total, 6)               AS p_observed,
       ROUND(LOG(1.0 + 1.0 / digit) / LOG(10.0), 6) AS p_benford,
       ROUND(n * 1.0 / total
             - LOG(1.0 + 1.0 / digit) / LOG(10.0), 6) AS deviation
FROM t
ORDER BY digit
""",
)
def quality_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit: observed vs expected first-significant-
    digit distribution of order totals — the classic fabricated-data
    / unit-mixing smell test for financial columns. The first digit
    is taken from the INTEGER string (floor → bigint → substring):
    double→string formatting differs between engines, integer
    formatting doesn't.

    Scale: per-row digit extraction + one 9-row hash aggregate; the
    window normalization runs over 9 rows."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy())
    p_obs = F.col("n") / total
    p_ben = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        c.select(
            "digit",
            F.col("n").alias("n_values"),
            F.round(p_obs, 6).alias("p_observed"),
            F.round(p_ben, 6).alias("p_benford"),
            F.round(p_obs - p_ben, 6).alias("deviation"),
        )
        .orderBy("digit")
    )


@query(
    "quality_mad_outliers",
    oracle="""
WITH med AS (
  SELECT o_orderpriority,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med
  FROM orders GROUP BY o_orderpriority
), dev AS (
  SELECT o.o_orderpriority, o.o_totalprice, m.med,
         ABS(o.o_totalprice - m.med) AS absdev
  FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority
), mad AS (
  SELECT o_orderpriority,
         ANY_VALUE(med) AS med,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY absdev) AS mad
  FROM dev GROUP BY o_orderpriority
)
SELECT d.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(ANY_VALUE(m.med), 4) AS median_price,
       ROUND(ANY_VALUE(m.mad), 4) AS mad_price,
       CAST(COUNT(*) FILTER (ABS(d.o_totalprice - m.med)
                             > 3 * 1.4826 * m.mad) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.o_orderpriority = m.o_orderpriority
GROUP BY d.o_orderpriority
ORDER BY d.o_orderpriority
""",
)
def quality_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: |x − median| > 3·1.4826·MAD per
    group — the monitoring rule that, unlike z-scores, doesn't let
    the outliers inflate their own threshold (median and MAD have a
    50% breakdown point; mean/stddev have 0%).

    Two passes by necessity (MAD needs the median first), each a
    grouped percentile + broadcast-joinable per-group constant; the
    fact table streams through both joins without shuffling (group
    medians are a 5-row broadcast).

    Scale: swap percentile for approx_percentile at 100 TB (same
    plan shape); exact form is the oracle contract."""
    o = load(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").withColumn(
        "absdev", F.abs(F.col("o_totalprice") - F.col("med"))
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.any_value("med").alias("med"),
        F.percentile("absdev", F.lit(0.5)).alias("mad"),
    )
    return (
        o.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.any_value("med"), 4).alias("median_price"),
            F.round(F.any_value("mad"), 4).alias("mad_price"),
            F.count_if(
                F.abs(F.col("o_totalprice") - F.col("med"))
                > 3 * 1.4826 * F.col("mad")
            ).alias("n_outliers"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "profile_key_candidates",
    oracle="""
SELECT 'event_id'            AS column_name,
       CAST(COUNT(*) AS BIGINT)                 AS n_rows,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
       COUNT(DISTINCT event_id) = COUNT(event_id)
         AND COUNT(event_id) = COUNT(*)         AS is_key
FROM events
UNION ALL
SELECT 'user_id', COUNT(*), COUNT(DISTINCT user_id),
       COUNT(DISTINCT user_id) = COUNT(user_id)
         AND COUNT(user_id) = COUNT(*)
FROM events
UNION ALL
SELECT 'ts', COUNT(*), COUNT(DISTINCT ts),
       COUNT(DISTINCT ts) = COUNT(ts) AND COUNT(ts) = COUNT(*)
FROM events
ORDER BY column_name
""",
)
def profile_key_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery: for each proposed key column, exact
    distinct count vs row count (unique AND non-null ⟺ key). The
    schema-inference pass that decides merge keys and dedup grain
    before a pipeline is wired up.

    All three columns are profiled in ONE scan via a multi-distinct
    aggregate (Spark expands it to a single expand+aggregate pair),
    then unpivoted to a row per column — contrast the oracle's
    3-scan UNION ALL, which is the semantics, not the plan.

    Scale: expand multiplies rows × columns-profiled before the
    combine — bounded fan-out, one shuffle; at 100 TB swap exact
    distinct for approx_count_distinct per column (mergeable sketch,
    no expand) once is_key can tolerate ε."""
    e = load(spark, sf_dir, "events")
    agg = e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("event_id")).alias("d_event_id"),
        F.count("event_id").alias("c_event_id"),
        F.count_distinct(F.col("user_id")).alias("d_user_id"),
        F.count("user_id").alias("c_user_id"),
        F.count_distinct(F.col("ts")).alias("d_ts"),
        F.count("ts").alias("c_ts"),
    )
    rows = [
        agg.select(
            F.lit(name).alias("column_name"),
            F.col("n_rows"),
            F.col(f"d_{name}").alias("n_distinct"),
            (
                (F.col(f"d_{name}") == F.col(f"c_{name}"))
                & (F.col(f"c_{name}") == F.col("n_rows"))
            ).alias("is_key"),
        )
        for name in ("event_id", "user_id", "ts")
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("column_name")


# ---------------------------------------------------------------------------
# (moved from round6.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Join-key skew profiling
# ---------------------------------------------------------------------------

_SKEW_SQL = """
WITH k AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS total_rows,
       CAST(MAX(cnt) AS BIGINT) AS max_per_key,
       CAST(MAX(cnt) * COUNT(*) * 10000 // SUM(cnt) AS BIGINT) AS skew_bp,
       CAST((MAX(cnt) * COUNT(*) + SUM(cnt) - 1) // SUM(cnt) AS BIGINT)
         AS suggested_salt
FROM k
GROUP BY event_type
ORDER BY event_type
"""


@query("profile_key_skew", oracle=_SKEW_SQL)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnosis — the profiling pass you run
    BEFORE deciding to salt (operators/skew.py): per candidate key
    domain (event_type × user_id here), the key count, max single-key
    row count, skew ratio max/mean in integer basis points, and the
    ceil(max/mean) salt factor the salted-join would use. All integer
    arithmetic (cross-multiplied, floor-div) — exact oracle, no float
    rounding anywhere.

    Scale: one map-side-combined count per (type, key) then a
    per-type reduce — the same two-level aggregate a 100 TB skew
    probe runs; output is O(|types|)."""
    k = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        k.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("cnt").cast("bigint").alias("total_rows"),
            F.max("cnt").cast("bigint").alias("max_per_key"),
        )
        .select(
            "event_type",
            "n_keys",
            "total_rows",
            "max_per_key",
            # `div`, not `/`: Spark `/` on BIGINTs is a DOUBLE divide
            # and DuckDB CAST(double AS BIGINT) ROUNDS where Spark
            # truncates — floor-div in INTEGER space on both sides.
            F.expr("max_per_key * n_keys * 10000L div total_rows")
            .cast("bigint")
            .alias("skew_bp"),
            F.expr("(max_per_key * n_keys + total_rows - 1) div total_rows")
            .cast("bigint")
            .alias("suggested_salt"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Order/lineitem reconciliation audit
# ---------------------------------------------------------------------------

_RECON_SQL = """
WITH li AS (
  SELECT l_orderkey,
         ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                   * (1 - CAST(l_discount AS DECIMAL(8,6)))
                   * (1 + CAST(l_tax AS DECIMAL(8,6)))), 2) AS computed
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderstatus,
         li.computed,
         ROUND(CAST(o.o_totalprice AS DECIMAL(18,6)), 2) AS stated
  FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(computed) AS BIGINT) AS n_with_lines,
       CAST(COUNT(*) FILTER (computed = stated) AS BIGINT) AS n_equal,
       CAST(COUNT(*) FILTER (computed > stated) AS BIGINT) AS n_over,
       CAST(COUNT(*) FILTER (computed < stated) AS BIGINT) AS n_under
FROM j
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("quality_order_reconciliation", oracle=_RECON_SQL)
def quality_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation: recompute each order's
    total from its line items (extendedprice·(1−discount)·(1+tax),
    the TPC-H revenue expression) and compare against the stated
    o_totalprice — the referential data-quality audit that catches
    drift between a rollup and its detail table. Comparison happens
    entirely in the exact DECIMAL domain rounded to cents (the dsum
    contract), so equal/over/under counts are engine-exact.

    Scale: one lineitem aggregate sharing the orderkey shuffle with
    the join; output is O(|statuses|). AQE handles the orders-side
    join strategy."""
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(8,6)"))
                    * (F.lit(1) + F.col("l_tax").cast("decimal(8,6)"))
                ),
                2,
            ).alias("computed")
        )
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice").cast("decimal(18,6)"), 2).alias("stated"),
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left")
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.count("computed").cast("bigint").alias("n_with_lines"),
            F.count(F.when(F.col("computed") == F.col("stated"), 1))
            .cast("bigint")
            .alias("n_equal"),
            F.count(F.when(F.col("computed") > F.col("stated"), 1))
            .cast("bigint")
            .alias("n_over"),
            F.count(F.when(F.col("computed") < F.col("stated"), 1))
            .cast("bigint")
            .alias("n_under"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Referential-integrity orphan audit
# ---------------------------------------------------------------------------

_ORPHANS_SQL = """
SELECT 'lineitem->orders' AS relation,
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
         AS n_orphans
UNION ALL
SELECT 'orders->customer',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'customer->nation',
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
       CAST((SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
ORDER BY relation
"""


@query("quality_referential_orphans", oracle=_ORPHANS_SQL)
def quality_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    FK relation, the child row count and how many children have no
    parent (left-anti join) — the orphan check every warehouse load
    gate runs. Output: (relation, n_child, n_orphans).

    Scale: each orphan count is one anti join on the FK — broadcast
    when the parent is a dim (nation, customer at this ratio), AQE
    picks SMJ for orders⋈lineitem; the three audits are independent
    branches of one union plan and run concurrently."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")

    def audit(rel: str, child: DataFrame, ck: str, parent: DataFrame, pk: str):
        return child.agg(
            F.lit(rel).alias("relation"),
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
        ).crossJoin(
            child.join(parent, child[ck] == parent[pk], "left_anti").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orphans")
            )
        )

    return (
        audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(audit("customer->nation", c, "c_nationkey", n, "n_nationkey"))
        .orderBy("relation")
    )


# ---------------------------------------------------------------------------
# (moved from round8.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

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
# Functional-dependency profiling (det → dep violation audit)
# ---------------------------------------------------------------------------

_FD_PAIRS = [
    ("o_orderkey", "o_orderstatus"),     # key → anything: must hold
    ("o_orderkey", "o_orderpriority"),   # key → anything: must hold
    ("o_custkey", "o_orderstatus"),      # expected violated (reorders)
    ("o_orderpriority", "o_orderstatus"),  # expected violated
]

_FD_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{det}' AS determinant, '{dep}' AS dependent,
       CAST(COUNT(*) AS BIGINT) AS n_det_values,
       CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT) AS n_violating,
       CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) * 10000 // COUNT(*) AS BIGINT)
         AS violation_bp,
       COUNT(CASE WHEN nd > 1 THEN 1 END) = 0 AS holds
FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS nd FROM orders GROUP BY {det}) t
"""
    for det, dep in _FD_PAIRS
) + "\nORDER BY determinant, dependent"


@query("profile_functional_dependencies", oracle=_FD_SQL)
def profile_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — for each candidate det → dep
    rule, the number of determinant values, how many map to MORE
    than one dependent value (violations), the violation rate in
    basis points, and the verdict. The schema-inference profiling
    pass (TANE-style single-column check) that tells you which
    'obvious' relationships actually hold before you normalize,
    build dimension tables, or trust a join key: here the o_orderkey
    rules must hold (it's the key), while o_custkey → o_orderstatus
    must not (customers reorder) and o_orderpriority →
    o_orderstatus must not (priorities span statuses) — the profiler
    SURFACES which hold on this data rather than hard-coding them.

    Scale: each rule is one map-side-combined (det, dep) distinct
    aggregate then a det-grain count — the same two-level shape as
    profile_key_candidates; rules are independent scans of a
    two-column projection (column pruning makes each cheap) and
    could share one pass via grouping sets if the rule set grows."""
    o = load(spark, sf_dir, "orders")
    parts = []
    for det, dep in _FD_PAIRS:
        t = o.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        parts.append(
            t.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_det_values"),
                F.count(F.when(F.col("nd") > 1, 1))
                .cast("bigint")
                .alias("n_violating"),
            ).select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_det_values",
                "n_violating",
                F.expr("n_violating * 10000L div n_det_values")
                .cast("bigint")
                .alias("violation_bp"),
                (F.col("n_violating") == 0).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("determinant", "dependent")
