"""Warehouse-maintenance patterns: MERGE-style upsert of a dimension
table expressed as a pure DataFrame full-outer join (no lakehouse
format required), with a deterministic synthetic change batch so the
result is DuckDB-oracle-checkable.

The reference pipeline only ever appends (Kafka → InfluxDB points,
spark_processor.py:167-197); dimension upkeep is north-star surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

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
    convenience; a real write derives row groups from file layout.
    The row-group slicing is a distributed global row number
    (operators/ranking.py) + the NTILE formula — an unpartitioned
    ntile(64) window would single-task-sort the whole FACT table,
    the worst possible plan at 100 TB; the range exchange here is
    the same one the z-order write itself needs."""
    from ibd_pipeline_spark.operators.layout import rank_bucket, zvalue
    from ibd_pipeline_spark.operators.ranking import (
        ntile_from_row_number,
        with_global_row_number,
    )
    from ibd_pipeline_spark.queries import query as _q  # noqa: F401

    li = load(spark, sf_dir, "lineitem")
    z = zvalue(
        [
            rank_bucket(F.col("l_quantity"), 0.0, 50.0, 8),
            rank_bucket(F.col("l_extendedprice"), 900.0, 120000.0, 8),
        ],
        8,
    )
    coded = li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", z.alias("z"))
    numbered = with_global_row_number(coded, ["z", "l_orderkey", "l_linenumber"])
    rg = ntile_from_row_number(F.col("_rn"), F.col("_n"), 64).cast("int")
    return (
        numbered.withColumn("rg", rg)
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


_IVM_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(28,8))), 2)
            AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("maintenance_incremental_join_view", oracle=_IVM_SQL)
def maintenance_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for an insert-only join view,
    oracle-attested by the IVM identity itself: with base relations
    O, L and insert deltas ΔO, ΔL, the maintained view is

        (O⋈L)  ∪  (ΔO⋈L)  ∪  (O⋈ΔL)  ∪  (ΔO⋈ΔL)

    — the three delta terms are what an incremental refresh computes
    INSTEAD of re-joining the full tables. Here ~10% of each side is
    carved off as the delta (md5 gates, deterministic), the four
    terms are computed separately and unioned, and the ORACLE is the
    plain full join: any error in the delta algebra (a missed term, a
    doubled term, a wrong gate) breaks the hash match. Same
    self-attestation pattern as `join_salted_hot_key`.

    Scale: the production win is that the three delta terms touch
    |Δ|·selectivity rows, not |O|·|L| — base-side scans prune to the
    delta's join keys (at real scale the base sides are bucketed on
    the key, making the delta joins shuffle-free); the base⋈base term
    is the already-materialized view, never recomputed. Here all four
    terms run (there is no stored view in a bench query) — the
    identity, not the speedup, is what's under test.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def gate(col, mod=10):
        return (
            F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
            .cast("bigint") % mod
        )

    o_delta_cond = gate("o_orderkey") == 9
    l_delta_cond = gate("l_orderkey", 7) == 3
    o_base, o_dlt = o.filter(~o_delta_cond), o.filter(o_delta_cond)
    l_base, l_dlt = li.filter(~l_delta_cond), li.filter(l_delta_cond)

    def term(os_, ls_):
        return os_.select("o_orderkey", "o_orderpriority").join(
            ls_.select("l_orderkey", "l_extendedprice"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )

    view = (
        term(o_base, l_base)
        .unionByName(term(o_dlt, l_base))
        .unionByName(term(o_base, l_dlt))
        .unionByName(term(o_dlt, l_dlt))
    )
    return (
        view.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_COMPACT_SQL = """
WITH files AS (
  SELECT l_orderkey % 500 AS file_id,
         CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) % 8388608 + 65536 AS BIGINT)
           AS size_bytes
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT file_id, size_bytes,
         SUM(size_bytes) OVER (ORDER BY size_bytes DESC, file_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM files WHERE size_bytes < 4194304
), grouped AS (
  SELECT file_id, size_bytes,
         CAST((cum - 1) // 134217728 AS BIGINT) AS target_group
  FROM ranked
)
SELECT target_group,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(size_bytes) AS BIGINT) AS group_bytes,
       CAST(MIN(size_bytes) AS BIGINT) AS min_file,
       CAST(MAX(size_bytes) AS BIGINT) AS max_file
FROM grouped
GROUP BY target_group
ORDER BY target_group
"""


@query("maintenance_compaction_plan", oracle=_COMPACT_SQL)
def maintenance_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the answer to Spark's classic
    small-files problem: from a file-size inventory (synthesized
    deterministically here; `binaryFile` over a real directory in
    production — sources/io.py), select files under the 4 MiB
    smallness threshold and assign them to ~128 MiB rewrite groups by
    cumulative-size bucketing (size-descending first-fit: big files
    anchor groups, tails fill them). Output: per planned group, file
    count and byte totals — the work list a compaction job executes.

    The group assignment (cum−1) DIV 128 MiB is exact integer
    arithmetic; groups can overshoot the target by at most one file —
    the standard streaming bin-pack bound, and the reason the sort is
    size-descending.

    Scale: the inventory is metadata (one row per FILE, not per
    record); the one ordered window runs over that small frame. The
    plan's own output is what bounds rewrite parallelism.
    """
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    files = li.groupBy((F.col("l_orderkey") % 500).alias("file_id")).agg(
        (
            F.sum(F.floor("l_extendedprice").cast("bigint")) % 8388608 + 65536
        ).cast("bigint").alias("size_bytes")
    )
    small = files.filter(F.col("size_bytes") < 4194304)
    w = Window.orderBy(F.col("size_bytes").desc(), "file_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    grouped = small.select(
        "file_id",
        "size_bytes",
        F.expr("CAST((sum(size_bytes) OVER (ORDER BY size_bytes DESC, file_id "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) "
               "DIV 134217728 AS BIGINT)").alias("target_group"),
    )
    return (
        grouped.groupBy("target_group")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("size_bytes").cast("bigint").alias("group_bytes"),
            F.min("size_bytes").cast("bigint").alias("min_file"),
            F.max("size_bytes").cast("bigint").alias("max_file"),
        )
        .orderBy("target_group")
    )


# ---------------------------------------------------------------------------
# (moved from round10_analytics.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# File-overlap clustering depth (layout health metric)
# ---------------------------------------------------------------------------

_OVERLAP_SQL = """
WITH f AS (
  SELECT o_orderkey % 64 AS file_id,
         MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi
  FROM orders GROUP BY 1
), ev AS (
  SELECT file_id, lo AS d, 1 AS delta FROM f
  UNION ALL
  SELECT file_id, hi AS d, -1 AS delta FROM f
), dep AS (
  SELECT file_id, delta,
         SUM(delta) OVER (ORDER BY d, delta DESC, file_id
                          ROWS UNBOUNDED PRECEDING) AS depth
  FROM ev
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       ROUND(AVG(CAST(depth AS DOUBLE)), 4) AS avg_open_depth
FROM dep WHERE delta = 1
"""


@query("maintenance_file_overlap_depth", oracle=_OVERLAP_SQL)
def maintenance_file_overlap_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering depth of a file layout — the OPTIMIZE/Z-ORDER health
    metric: how many files' [min, max] key ranges overlap at once
    (depth 1 = perfectly clustered; high depth = every scan touches
    many files). Files simulated as orderkey%64 buckets with their
    orderdate ranges; depth is the classic +1/−1 boundary sweep —
    running sum over the 2·n_files boundary events, here as a
    TRIANGULAR SELF-JOIN on the file-count-sized boundary frame
    (n ≤ 128 rows → 16k join pairs) so no unpartitioned window
    appears anywhere in the plan. Boundary tie order (+1 before −1 at
    the same date: inclusive intervals overlap at a shared endpoint)
    is pinned by the (date, delta DESC, file_id) total order.

    Scale: the corpus-scale work is the per-file min/max aggregate
    (one map-side-combined pass); the sweep runs over file METADATA —
    at 100 TB that is the transaction log, not the data."""
    orders = load(spark, sf_dir, "orders")
    f = (
        orders.groupBy((F.col("o_orderkey") % 64).alias("file_id"))
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        # file-count-sized; pin it so the boundary union + triangular
        # join don't re-scan orders per reference
        .localCheckpoint(eager=True)
    )
    ev = f.select(
        "file_id", F.col("lo").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        f.select("file_id", F.col("hi").alias("d"), F.lit(-1).alias("delta"))
    )
    a, b = ev.alias("a"), F.broadcast(ev.alias("b"))
    # inclusive running sum under (d, delta DESC, file_id): b precedes
    # or equals a in the sweep order
    before = (
        (F.col("b.d") < F.col("a.d"))
        | ((F.col("b.d") == F.col("a.d")) & (F.col("b.delta") > F.col("a.delta")))
        | (
            (F.col("b.d") == F.col("a.d"))
            & (F.col("b.delta") == F.col("a.delta"))
            & (F.col("b.file_id") <= F.col("a.file_id"))
        )
    )
    dep = (
        a.join(b, before)
        .groupBy("a.file_id", "a.d", "a.delta")
        .agg(F.sum("b.delta").alias("depth"))
    )
    return (
        dep.filter(F.col("delta") == 1)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.max("depth").cast("bigint").alias("max_depth"),
            F.round(F.avg(F.col("depth").cast("double")), 4).alias(
                "avg_open_depth"
            ),
        )
    )


# ---------------------------------------------------------------------------
# (moved from round9.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Deletion-vector maintenance planning (merge-on-read bookkeeping)
# ---------------------------------------------------------------------------

_DV_SQL = """
WITH f AS (
  SELECT l_orderkey // 1000 AS file_id,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) FILTER (l_returnflag = 'R') AS BIGINT) AS n_deleted
  FROM lineitem GROUP BY 1
)
SELECT CAST(file_id AS BIGINT) AS file_id, n_rows, n_deleted,
       n_rows - n_deleted AS n_live,
       CAST(CEIL(n_rows / 8.0) AS BIGINT) AS dv_bytes,
       n_deleted = n_rows AS fully_dead,
       n_deleted * 10 > n_rows * 3 AS rewrite_recommended
FROM f
ORDER BY file_id
"""


@query("maintenance_deletion_vectors", oracle=_DV_SQL)
def maintenance_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector maintenance planner — the merge-on-read
    bookkeeping Delta/Iceberg tables run after a DELETE: per data file
    (simulated as l_orderkey÷1000 row groups), the DV cardinality a
    `l_returnflag='R'` predicate delete would write, the bitmap size
    (1 bit/row), fully-dead files (drop, don't rewrite), and the
    rewrite recommendation once tombstones exceed 30% of the file
    (read amplification beats rewrite cost past that point — the
    compaction trigger, cross-multiplied so the 0.3 threshold stays
    in exact integers).

    Scale: ONE count aggregate keyed by file id — this is metadata
    maintenance, the per-file frame is what a table's add/delete log
    holds; no joins, no windows, booleans and integers only."""
    li = load(spark, sf_dir, "lineitem")
    f = li.groupBy(
        F.floor(F.col("l_orderkey") / 1000).cast("bigint").alias("file_id")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_deleted"),
    )
    return (
        f.select(
            "file_id",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_deleted").cast("bigint").alias("n_deleted"),
            (F.col("n_rows") - F.col("n_deleted"))
            .cast("bigint")
            .alias("n_live"),
            F.ceil(F.col("n_rows") / 8.0).cast("bigint").alias("dv_bytes"),
            (F.col("n_deleted") == F.col("n_rows")).alias("fully_dead"),
            (F.col("n_deleted") * 10 > F.col("n_rows") * 3).alias(
                "rewrite_recommended"
            ),
        )
        .orderBy("file_id")
    )
