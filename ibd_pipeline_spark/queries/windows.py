"""Analytic (OVER-clause) window functions: ranking, offsets, frames.

Absent from the reference (its only "window" is the time-bucket
groupBy, spark_processor.py:151 — a group-by, not an analytic window);
required per SURVEY.md §2.2.

Scale note common to all: an analytic window shuffles once on its
PARTITION BY key and sorts within partitions. A window with no
PARTITION BY collapses to a single task — never do that at scale;
every query here partitions by a real key. Deterministic output
requires a total order inside each partition, so every ORDER BY
carries a unique tiebreaker column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query


@query(
    "window_rank_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn,
         RANK() OVER (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey) AS rnk,
         DENSE_RANK() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS drnk
  FROM customer
) WHERE rn <= 5
ORDER BY c_mktsegment, rn
""",
)
def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by balance per market segment via row_number.

    Scale: this is THE distributed top-k-per-group pattern — one
    shuffle on the group key, per-partition sort, early filter rn<=k.
    """
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "window_lag_lead",
    oracle="""
SELECT user_id, event_id,
       ROUND(value, 4) AS value,
       ROUND(LAG(value)  OVER w, 4) AS prev_value,
       ROUND(LEAD(value) OVER w, 4) AS next_value,
       ROUND(value - LAG(value) OVER w, 4) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
ORDER BY user_id, event_id
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD offsets per user ordered by event time."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    ).orderBy("user_id", "event_id")


@query(
    "window_running_agg",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_spend,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS order_seq
FROM orders
ORDER BY o_custkey, o_orderkey
""",
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum and count per customer — ROWS frame."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("order_seq"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_sliding_rows_frame",
    oracle="""
SELECT user_id, event_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP), event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS moving_avg3
FROM events
ORDER BY user_id, event_id
""",
)
def window_sliding_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per user — bounded ROWS frame."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg3"),
    ).orderBy("user_id", "event_id")


@query(
    "window_range_frame",
    oracle="""
SELECT p_partkey, p_size,
       CAST(COUNT(*) OVER (ORDER BY p_size
                           RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS peers_within_2
FROM part
ORDER BY p_partkey
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering column (value-based frame).

    Scale caveat: this window has no PARTITION BY, which serializes to
    one task — acceptable for the 200-row part dimension, never for a
    fact table. Kept as the RANGE-frame semantics exercise.
    """
    p = load(spark, sf_dir, "part")
    w = Window.orderBy("p_size").rangeBetween(-2, 0)
    return p.select(
        "p_partkey",
        "p_size",
        F.count(F.lit(1)).over(w).alias("peers_within_2"),
    ).orderBy("p_partkey")


@query(
    "window_ntile_percent",
    oracle="""
SELECT c_custkey,
       NTILE(4) OVER (ORDER BY c_acctbal, c_custkey)        AS balance_quartile,
       ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank,
       ROUND(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey), 6)    AS cume
FROM customer
ORDER BY c_custkey
""",
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE / PERCENT_RANK / CUME_DIST distribution functions — the
    DISTRIBUTED form: an unpartitioned `Window.orderBy` serializes the
    whole customer table onto one task, so the three functions are
    instead computed as row-level formulas of a distributed global row
    number (operators/ranking.py: range-shuffle + zipWithIndex idiom;
    (c_acctbal, c_custkey) is a total order, making rank == rn and
    all three functions exact)."""
    from ibd_pipeline_spark.operators.ranking import (
        cume_dist_from_row_number,
        ntile_from_row_number,
        percent_rank_from_row_number,
        with_global_row_number,
    )

    c = load(spark, sf_dir, "customer")
    r = with_global_row_number(
        c.select("c_custkey", "c_acctbal"), ["c_acctbal", "c_custkey"]
    )
    rn, n = F.col("_rn"), F.col("_n")
    return r.select(
        "c_custkey",
        ntile_from_row_number(rn, n, 4).cast("int").alias("balance_quartile"),
        F.round(percent_rank_from_row_number(rn, n), 6).alias("pct_rank"),
        F.round(cume_dist_from_row_number(rn, n), 6).alias("cume"),
    ).orderBy("c_custkey")


@query(
    "window_first_last_value",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS first_order,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_order
FROM orders
ORDER BY o_custkey, o_orderkey
""",
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE with an explicit full-partition frame
    (the default frame would make LAST_VALUE = current row)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    ).orderBy("o_custkey", "o_orderkey")
