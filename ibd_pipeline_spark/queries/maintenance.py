"""Warehouse-maintenance patterns: MERGE-style upsert of a dimension
table expressed as a pure DataFrame full-outer join (no lakehouse
format required), with a deterministic synthetic change batch so the
result is DuckDB-oracle-checkable.

The reference pipeline only ever appends (Kafka → InfluxDB points,
spark_processor.py:167-197); dimension upkeep is north-star surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query


@query(
    "merge_upsert_dimension",
    oracle="""
WITH bucketed AS (
  SELECT *,
         CAST(('0x' || SUBSTRING(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
           % 10 AS b
  FROM customer
), updates AS (
  SELECT c_custkey, 'PLATINUM' AS c_mktsegment,
         ROUND(c_acctbal + 100.0, 2) AS c_acctbal
  FROM bucketed WHERE b = 0
  UNION ALL
  SELECT c_custkey + 10000000, 'PLATINUM', 0.00
  FROM bucketed WHERE b = 1
), merged AS (
  SELECT COALESCE(u.c_custkey, t.c_custkey)       AS c_custkey,
         COALESCE(u.c_mktsegment, t.c_mktsegment) AS c_mktsegment,
         COALESCE(u.c_acctbal, t.c_acctbal)       AS c_acctbal,
         CASE WHEN t.c_custkey IS NULL THEN 'insert'
              WHEN u.c_custkey IS NULL THEN 'unchanged'
              ELSE 'update' END                   AS action
  FROM customer t
  FULL OUTER JOIN updates u ON t.c_custkey = u.c_custkey
)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(28,8))), 2) AS DOUBLE)
         AS total_acctbal,
       COUNT(*) FILTER (WHERE action = 'insert')  AS n_inserted,
       COUNT(*) FILTER (WHERE action = 'update')  AS n_updated
FROM merged
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def merge_upsert_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format: matched rows take
    the update's values, unmatched-by-target rows are inserted,
    everything else passes through — one full-outer join on the key
    plus COALESCE projection. The change batch is derived
    deterministically from the data (md5 buckets: bucket 0 →
    segment/balance update, bucket 1 → net-new PLATINUM customers), so
    both engines merge the identical batch.

    Scale design: the join shuffles on c_custkey once; with the
    dimension bucketed by key on disk (sources/io.py
    write_bucketed_table) the target side doesn't shuffle at all and
    nightly upserts become a map-side merge. Change batches are
    usually ≪ target, so AQE plans a broadcast for the update side —
    target rows then never move. A lakehouse MERGE (Delta/Iceberg)
    adds file-level pruning on top; the logical plan is this one.
    """
    c = load(spark, sf_dir, "customer")
    b = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10
    )
    bucketed = c.withColumn("b", b)
    updates = (
        bucketed.filter(F.col("b") == 0)
        .select(
            "c_custkey",
            F.lit("PLATINUM").alias("c_mktsegment"),
            F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        )
        .unionAll(
            bucketed.filter(F.col("b") == 1).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                F.lit("PLATINUM").alias("c_mktsegment"),
                F.lit(0.00).alias("c_acctbal"),
            )
        )
    )
    t, u = c.alias("t"), updates.alias("u")
    merged = t.join(u, F.col("t.c_custkey") == F.col("u.c_custkey"), "full_outer").select(
        F.coalesce("u.c_mktsegment", "t.c_mktsegment").alias("c_mktsegment"),
        F.coalesce("u.c_acctbal", "t.c_acctbal").alias("c_acctbal"),
        F.when(F.col("t.c_custkey").isNull(), "insert")
        .when(F.col("u.c_custkey").isNull(), "unchanged")
        .otherwise("update")
        .alias("action"),
    )
    return (
        merged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("total_acctbal"),
            F.count_if(F.col("action") == "insert").alias("n_inserted"),
            F.count_if(F.col("action") == "update").alias("n_updated"),
        )
        .orderBy("c_mktsegment")
    )


def _zinterleave_sql(a: str, b: str, bits: int) -> str:
    """DuckDB twin of operators.layout.zvalue for two columns —
    generated bit-shift arithmetic, identical on both engines."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_ZQ = "GREATEST(0, LEAST(CAST(FLOOR((l_quantity - 0.0) / 50.0 * 255) AS BIGINT), 255))"
_ZP = (
    "GREATEST(0, LEAST(CAST(FLOOR((l_extendedprice - 900.0) / 119100.0 * 255)"
    " AS BIGINT), 255))"
)


@query(
    "zorder_rowgroup_skipping",
    oracle=f"""
WITH coded AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         {_zinterleave_sql(_ZQ, _ZP, 8)} AS z
  FROM lineitem
), grouped AS (
  SELECT *, NTILE(64) OVER (ORDER BY z, l_orderkey, l_linenumber) AS rg
  FROM coded
)
SELECT rg,
       COUNT(*) AS n_rows,
       MIN(l_quantity)      AS min_qty,
       MAX(l_quantity)      AS max_qty,
       CAST(ROUND(MIN(CAST(l_extendedprice AS DECIMAL(28,8))), 2) AS DOUBLE)
         AS min_price,
       CAST(ROUND(MAX(CAST(l_extendedprice AS DECIMAL(28,8))), 2) AS DOUBLE)
         AS max_price,
       (MAX(l_quantity) < 10 OR MIN(l_quantity) > 20) AS skips_qty_10_20,
       (MAX(l_extendedprice) < 20000 OR MIN(l_extendedprice) > 40000)
         AS skips_price_20k_40k
FROM grouped
GROUP BY rg
ORDER BY rg
""",
)
def zorder_rowgroup_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit: Morton-interleave (quantity,
    extendedprice) on an 8-bit grid, slice the z-sorted table into 64
    synthetic row groups (NTILE), and report each group's min/max
    stats plus whether two example predicates could skip it — the
    measurable payoff of multi-dimensional clustering (what OPTIMIZE
    ZORDER BY gives a lakehouse, here as plain column algebra +
    a sort before write; operators/layout.py).

    On this data the z-layout lets a quantity-band predicate skip
    most groups AND a price-band predicate skip most groups from the
    SAME layout — single-column sort can only do one. Everything is
    deterministic integer bit math, so the DuckDB oracle reproduces
    the exact same codes, groups, and skip flags.

    Scale: the z-code is O(bits×cols) codegen integer ops per row;
    the only real cost is the range sort — the same exchange a
    single-column sort pays. NTILE's global numbering is the audit's
    convenience; a real write derives row groups from file layout."""
    from ibd_pipeline_spark.operators.layout import rank_bucket, zvalue
    from ibd_pipeline_spark.queries import query as _q  # noqa: F401
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    z = zvalue(
        [
            rank_bucket(F.col("l_quantity"), 0.0, 50.0, 8),
            rank_bucket(F.col("l_extendedprice"), 900.0, 120000.0, 8),
        ],
        8,
    )
    coded = li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", z.alias("z"))
    rg = F.ntile(64).over(Window.orderBy("z", "l_orderkey", "l_linenumber"))
    return (
        coded.withColumn("rg", rg)
        .groupBy("rg")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.round(F.min(F.col("l_extendedprice").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("min_price"),
            F.round(F.max(F.col("l_extendedprice").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("max_price"),
            ((F.max("l_quantity") < 10) | (F.min("l_quantity") > 20)).alias(
                "skips_qty_10_20"
            ),
            (
                (F.max("l_extendedprice") < 20000)
                | (F.min("l_extendedprice") > 40000)
            ).alias("skips_price_20k_40k"),
        )
        .orderBy("rg")
    )
