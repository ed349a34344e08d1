"""Data-quality wave 3 (round 5): snapshot diffing — the
"what changed between yesterday's load and today's" readout every
warehouse reconciliation job needs (the batch analog of CDC: given
two full snapshots and a key, classify every key as added / removed /
changed / unchanged WITHOUT any change log).

The 'new' snapshot is derived deterministically inside the query
(md5-gated mutations of the fixture table) so the diff exercises all
four classes and stays oracle-checkable — in production the two
sides are two partitions/paths of the same table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# Deterministic mutation gates (pure functions of the key, identical
# in both engines): ~5% of rows dropped, ~5% price-bumped, plus a
# shifted-key block of inserts.
_GATE = "CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100"

_DIFF_SQL = f"""
WITH old AS (
  SELECT o_orderkey AS k, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders
), new AS (
  SELECT o_orderkey AS k, o_orderstatus,
         CASE WHEN {_GATE} < 5
              THEN o_totalprice + 1000.0 ELSE o_totalprice END
           AS o_totalprice,
         o_orderpriority
  FROM orders
  WHERE {_GATE} >= 95 OR {_GATE} < 90
  UNION ALL
  SELECT o_orderkey + 10000000 AS k, o_orderstatus, o_totalprice,
         o_orderpriority
  FROM orders WHERE {_GATE} = 50
), j AS (
  SELECT COALESCE(o.k, n.k) AS k,
         o.k IS NOT NULL AS in_old,
         n.k IS NOT NULL AS in_new,
         o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
           OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
           AS differs
  FROM old o FULL OUTER JOIN new n ON o.k = n.k
)
SELECT CAST(COUNT(*) FILTER (in_old AND NOT in_new) AS BIGINT) AS n_removed,
       CAST(COUNT(*) FILTER (in_new AND NOT in_old) AS BIGINT) AS n_added,
       CAST(COUNT(*) FILTER (in_old AND in_new AND differs) AS BIGINT) AS n_changed,
       CAST(COUNT(*) FILTER (in_old AND in_new AND NOT differs) AS BIGINT)
         AS n_unchanged
FROM j
"""


@query("quality_snapshot_diff", oracle=_DIFF_SQL)
def quality_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-snapshot diff: full-outer join on the business key, then
    classify — removed (old only), added (new only), changed (both
    sides, any non-key column differs under null-safe comparison),
    unchanged. One join, one aggregate; no change log required. The
    null-safe IS DISTINCT FROM spelling (Spark: eqNullSafe) is what
    makes 'changed' correct when a column goes NULL ↔ non-NULL —
    plain <> would silently classify those as unchanged.

    Scale: the canonical reconciliation shape — both snapshots
    shuffle once on the key (or zero times if both are bucketed by
    it, the layout sources/io.py's bucketed writer exists for); the
    per-row compare is codegen. For wide tables, compare a
    precomputed row hash (xxhash64 of the struct) instead of N
    columns — same plan, constant compare cost.
    """
    o = load(spark, sf_dir, "orders")
    gate = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    old = o.select(
        F.col("o_orderkey").alias("k"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    )
    base = o.withColumn("_g", gate)
    new = (
        base.filter((F.col("_g") >= 95) | (F.col("_g") < 90))
        .select(
            F.col("o_orderkey").alias("k"),
            "o_orderstatus",
            # exact double add — a multiplicative bump would need a
            # round(), and rounding a computed double diverges across
            # engines (the registry float contract)
            F.when(F.col("_g") < 5, F.col("o_totalprice") + 1000.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderpriority",
        )
        .unionAll(
            base.filter(F.col("_g") == 50).select(
                (F.col("o_orderkey") + 10000000).alias("k"),
                "o_orderstatus",
                "o_totalprice",
                "o_orderpriority",
            )
        )
    )
    j = old.alias("o").join(new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer")
    in_old = F.col("o.k").isNotNull()
    in_new = F.col("n.k").isNotNull()
    differs = (
        ~F.col("o.o_orderstatus").eqNullSafe(F.col("n.o_orderstatus"))
        | ~F.col("o.o_totalprice").eqNullSafe(F.col("n.o_totalprice"))
        | ~F.col("o.o_orderpriority").eqNullSafe(F.col("n.o_orderpriority"))
    )
    return j.agg(
        F.count(F.when(in_old & ~in_new, 1)).cast("bigint").alias("n_removed"),
        F.count(F.when(in_new & ~in_old, 1)).cast("bigint").alias("n_added"),
        F.count(F.when(in_old & in_new & differs, 1)).cast("bigint").alias("n_changed"),
        F.count(F.when(in_old & in_new & ~differs, 1))
        .cast("bigint")
        .alias("n_unchanged"),
    )
