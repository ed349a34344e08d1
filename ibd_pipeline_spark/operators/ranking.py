"""Distributed global ranking: row numbers / NTILE / PERCENT_RANK /
CUME_DIST over a TOTAL order without a single-partition WindowExec.

An empty-partition window (`Window.orderBy(...)` with no partitionBy)
moves the whole input to ONE task — Spark's own `WindowExec: No
Partition Defined` warning. Fine for a vocab-sized frame, a
scale-killer on a fact table. This module is the scale-safe
replacement, the RDD `zipWithIndex` design re-expressed in DataFrame
ops:

  1. `repartitionByRange(P, order_cols)` — the same range exchange a
     distributed sort pays; every partition holds a contiguous key
     range, partition id order == global order.
  2. `sortWithinPartitions(order_cols)` then
     `monotonically_increasing_id()` — mid packs (partition id <<33 |
     consecutive record number), so `mid - min(mid per partition)` is
     the within-partition row index with NO window and NO second
     full-data shuffle. mid is nondeterministic-flagged, which pins
     the projection above the sort (Catalyst won't reorder it).
  3. per-partition (count, min(mid)) — a P-row aggregate; prefix-sum
     offsets via a window over the P-ROW frame (bounded by partition
     count — the one empty-partition window here, over partition
     metadata, never data; the plan audit recognizes it by the
     spark_partition_id grouping in its subtree).
  4. broadcast the P-row offset frame back: global rn = offset +
     within-partition index + 1.

Cost: one range shuffle of the data (what any global ordering costs),
one P-row shuffle, one broadcast. Nothing ever lands on a single
task. NTILE / PERCENT_RANK / CUME_DIST are then pure row-level
formulas of (rn, n).

REQUIRES the order columns to be a total order (append a unique
tiebreaker): ties that straddle a range-partition boundary would
otherwise make mid assignment non-deterministic, and the SQL
functions themselves are only well-defined up to ties.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def with_global_row_number(
    df: DataFrame,
    order_cols: "list[str | Column]",
    rn_col: str = "_rn",
    total_col: str = "_n",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + 1-based global row number (`rn_col`) and total row count
    (`total_col`) under the total order `order_cols`. See module
    docstring for the plan shape; exact for n < 2⁵³."""
    spark = df.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(P, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = ranged.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_cnt"), F.min("_mid").alias("_mid0")
    )
    # P-row frame: the empty-partition windows below run over
    # partition METADATA (≤ one row per shuffle partition), the
    # bounded case the module docstring allows.
    w_prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_pid",
        "_mid0",
        F.coalesce(F.sum("_cnt").over(w_prefix), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_all).alias(total_col),
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            rn_col, F.col("_off") + (F.col("_mid") - F.col("_mid0")) + F.lit(1)
        )
        .drop("_pid", "_mid", "_off", "_mid0")
    )


def _cdiv(a: Column, b: Column) -> Column:
    """ceil(a/b) for positive longs (exact below 2⁵³)."""
    return F.floor((a + b - F.lit(1)) / b).cast("long")


def ntile_from_row_number(rn: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) as a formula of (global row number, total count):
    the first n mod k buckets take ceil(n/k) rows, the rest take
    floor(n/k) — byte-for-byte the WindowExec semantics, evaluated
    row-locally with no window at all."""
    kk = F.lit(k).cast("long")
    q = F.floor(n / kk).cast("long")
    rem = n % kk
    big = rem * (q + F.lit(1))  # rows covered by the ceil-sized buckets
    return F.when(rn <= big, _cdiv(rn, q + F.lit(1))).otherwise(
        # q ≥ 1 whenever any row falls past the ceil-sized buckets,
        # so greatest() only guards the unreachable q=0 branch from
        # an eager-eval division by zero.
        rem + _cdiv(rn - big, F.greatest(q, F.lit(1)))
    )


def percent_rank_from_row_number(rn: Column, n: Column) -> Column:
    """PERCENT_RANK = (rank−1)/(n−1) under a TOTAL order (rank == rn
    because ties are impossible); 0.0 for a single row."""
    return F.when(n > 1, (rn - F.lit(1)) / (n - F.lit(1))).otherwise(F.lit(0.0))


def cume_dist_from_row_number(rn: Column, n: Column) -> Column:
    """CUME_DIST = rn/n under a TOTAL order (no ties ⇒ the ≤-count is
    the row number itself)."""
    return rn / n
