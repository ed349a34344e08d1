"""Sixth relational batch (round 5, wave 3): the Spark 4 SQL surface
that closes the gap with warehouse engines — recursive CTEs (new in
Spark 4.0), correlated LATERAL subqueries, inline VALUES dimensions,
``try_``-family null-on-error arithmetic, and running-distinct
analytic windows. Every query carries a DuckDB oracle; each docstring
states the shuffle budget.

Reference parity note: the reference engine (spark_processor.py) has
no analog for any of these — they belong to the capability-gap
families of SURVEY.md §2.2 (joins, scalar library, analytic windows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import dsum, dsum_sql, query

_CHAIN_SQL = """
WITH RECURSIVE chain AS (
  SELECT s_suppkey, s_acctbal, 1 AS depth
  FROM supplier WHERE s_suppkey = 1
  UNION ALL
  SELECT s.s_suppkey, s.s_acctbal, c.depth + 1
  FROM supplier s
  JOIN chain c ON CAST(FLOOR(s.s_suppkey / 2) AS BIGINT) = c.s_suppkey
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       MIN(s_suppkey) AS min_key,
       MAX(s_suppkey) AS max_key,
       {bal} AS level_bal
FROM chain
GROUP BY depth
ORDER BY depth
"""


@query(
    "recursive_cte_supplier_tree",
    oracle=_CHAIN_SQL.format(bal=dsum_sql("s_acctbal")),
)
def recursive_cte_supplier_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.0+) over an implicit binary tree: node
    k's parent is floor(k/2), the root is s_suppkey=1. The recursion
    walks the tree breadth-first — each UNION ALL step joins the next
    generation of children against the previous level — and the outer
    query profiles each depth (node count, key range, exact-decimal
    balance sum).

    Scale: each recursion step is one join of `supplier` against the
    previous level's keys; depth is log2(|supplier|), so a 10M-row
    supplier table is 24 bounded joins, each prunable on the parent
    key. The per-level state is (key, acctbal, depth) — no lineage
    blow-up because Spark materializes each recursion step.
    """
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_CHAIN_SQL.format(bal=dsum_sql("s_acctbal")))


_LATERAL_SQL = """
SELECT n.n_name AS nation, t.c_name AS top_customer, t.bal
FROM nation n, LATERAL (
  SELECT c.c_name, c.c_acctbal AS bal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c.c_acctbal DESC, c.c_name
  LIMIT 2
) t
ORDER BY nation, bal DESC, top_customer
"""


@query("join_lateral_topn_per_nation", oracle=_LATERAL_SQL)
def join_lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: for every nation, the top-2
    customers by account balance. The lateral form is the readable
    spelling; Catalyst decorrelates it into the same
    window-rank-then-filter plan the hand-written
    `window_topn_per_group` uses — one shuffle on the correlation key,
    no per-outer-row re-execution (which is what a naive nested-loop
    engine would do and what 100 TB cannot afford).

    Scale: decorrelation means cost is one partition-by-nation window
    over customer, independent of nation count.
    """
    for t in ("nation", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


_PRIORITY_WEIGHTS = [
    ("1-URGENT", 5.0),
    ("2-HIGH", 3.0),
    ("3-MEDIUM", 2.0),
    ("4-NOT SPECIFIED", 1.0),
    ("5-LOW", 0.5),
]

_VALUES_SQL = """
WITH w(priority, weight) AS (
  VALUES ('1-URGENT', 5.0), ('2-HIGH', 3.0), ('3-MEDIUM', 2.0),
         ('4-NOT SPECIFIED', 1.0), ('5-LOW', 0.5)
)
SELECT CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))
                      * CAST(w.weight AS DECIMAL(3,1))), 2)
            AS DOUBLE) AS weighted_value
FROM orders o
JOIN w ON w.priority = o.o_orderpriority
GROUP BY 1
ORDER BY 1
"""


@query("join_values_inline_dim", oracle=_VALUES_SQL)
def join_values_inline_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join against an inline VALUES dimension — the idiom for small
    hand-maintained mappings (weights, tier tables, code lookups) that
    don't deserve a parquet file. The 5-row literal frame is
    broadcast, so the fact scan never shuffles for the join; the
    weighted sum happens in the exact decimal domain (weight cast to
    decimal BEFORE the multiply — decimal×decimal stays exact, and the
    rounding convention then matches DuckDB's; see the registry float
    contract).

    Scale: literal dim is driver-local and broadcast; one shuffle for
    the year aggregate.
    """
    o = load(spark, sf_dir, "orders")
    w = spark.createDataFrame(_PRIORITY_WEIGHTS, "priority string, weight double")
    joined = o.join(F.broadcast(w), o.o_orderpriority == w.priority)
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(
                    F.col("o_totalprice").cast("decimal(18,2)")
                    * F.col("weight").cast("decimal(3,1)")
                ),
                2,
            )
            .cast("double")
            .alias("weighted_value"),
        )
        .orderBy("order_year")
    )


_TRY_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (l_quantity = l_linenumber) AS BIGINT) AS n_zero_div,
       CAST(COUNT(*) FILTER (l_linenumber = 1) AS BIGINT) AS n_inbounds,
       CAST(ROUND(SUM(CAST(
              CASE WHEN l_quantity = l_linenumber THEN NULL
                   ELSE l_extendedprice / (l_quantity - l_linenumber) END
            AS DECIMAL(28,8))), 2) AS DOUBLE) AS safe_ratio_sum
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("scalar_try_safe_arithmetic", oracle=_TRY_SQL)
def scalar_try_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic: `try_divide` turns division by zero
    into NULL instead of either an exception (ANSI on) or a silent
    ±Infinity (ANSI off), and `try_element_at` makes out-of-bounds
    array access a total function (the 1-element array is in bounds
    exactly when l_linenumber = 1). The oracle spells the same
    semantics with NULLIF-style CASE / FILTER (DuckDB raises on /0,
    so the CASE guard is the portable twin).

    The divisor (l_quantity - l_linenumber) hits zero on real fixture
    rows, so the NULL path is exercised, not just declared. The
    quotient sum rides the decimal contract: each per-row quotient is
    cast to DECIMAL before summing, making the aggregate
    order-independent.

    Scale: pure per-row expressions + one hash aggregate on a 3-value
    key; stays in whole-stage codegen.
    """
    li = load(spark, sf_dir, "lineitem")
    quotient = F.try_divide(
        F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_linenumber")
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(
                F.when(F.col("l_quantity") == F.col("l_linenumber"), 1)
            ).alias("n_zero_div"),
            F.count(
                F.try_element_at(F.array(F.col("l_quantity")), F.col("l_linenumber"))
            ).alias("n_inbounds"),
            F.round(F.sum(quotient.cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("safe_ratio_sum"),
        )
        .orderBy("l_returnflag")
    )


_RUNNING_DISTINCT_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(COUNT(DISTINCT o_orderpriority) OVER (
              PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS INT) AS distinct_priorities_seen
FROM orders
WHERE o_custkey < 200
ORDER BY o_custkey, o_orderkey
"""


@query("window_running_distinct", oracle=_RUNNING_DISTINCT_SQL)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) — per customer, how many distinct order
    priorities they have used up to each order. Spark's window
    aggregates reject DISTINCT, so the portable spelling is
    `size(collect_set(...))` over the running frame; DuckDB accepts
    the literal `COUNT(DISTINCT ...) OVER` and the two agree exactly.

    Scale: one shuffle on o_custkey; the running set is bounded by the
    priority domain (5), so frame state stays O(1) per row regardless
    of customer history length. The o_custkey < 200 predicate bounds
    the emitted rows (it pushes to the scan) — the window itself is
    per-customer and scales out.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.size(F.collect_set("o_orderpriority").over(w))
            .cast("int")
            .alias("distinct_priorities_seen"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


_BLOOM_JOIN_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(28,8))), 2)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_orderdate >= DATE '2000-01-01'
GROUP BY o.o_orderpriority
"""


@query("join_bloom_prefiltered", oracle=_BLOOM_JOIN_SQL)
def join_bloom_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered fact join: the selective dimension side
    (urgent orders since 2000) publishes a Bloom filter of its join
    keys; the fact scan probes it BEFORE the join, so ~95% of lineitem
    rows die at the scan instead of riding the join. The final result
    is EXACT — Bloom false positives (and nothing else) survive to the
    equi-join, which removes them — so the oracle is the plain join
    SQL: the filter is a pure physical optimization, invisible in the
    answer. This hand-rolls, portably and oracle-checkably, what
    Spark's runtime bloom-filter join injection
    (spark.sql.optimizer.runtime.bloomFilter.enabled) does inside the
    engine: at 100 TB the win is shuffle mass — only key-matching
    fact rows are hashed across the wire.

    Scale: filter side must stay broadcast-sized (it is the SELECTIVE
    side by construction); the probe is one md5 + three O(1) bitset
    word tests per row in whole-stage codegen; one shuffle for the surviving join +
    map-side-combined aggregate.
    """
    from ibd_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
    )

    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    from ibd_pipeline_spark.catalog import load_wide

    bits = bloom_build(o.select(F.col("o_orderkey").alias("k")), "k")
    # The probe is md5-per-row CPU; a 3-split lineitem scan would
    # serialize it onto 3 cores (the load_wide rationale).
    li = load_wide(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    li_pruned = li.crossJoin(F.broadcast(bits)).filter(
        bloom_maybe_contains("bloom_words", F.col("l_orderkey"))
    )
    return (
        li_pruned.join(F.broadcast(o), li_pruned.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )
