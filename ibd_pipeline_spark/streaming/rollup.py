"""Streaming continuous-aggregate materialization on plain parquet.

The batch twin (queries/events.py events_rollup_cascade) proves the
partial schema (count / exact decimal sum / max — never avg) merges
losslessly across grains. This module keeps those 5-minute partials
CONTINUOUSLY up to date from a stream and serves coarse grains from
the materialization, so raw events are read exactly once, by the
stream.

Upsert strategy — "append + read-side compaction": update-mode
re-emissions of a changed window are APPENDED with their micro-batch
id, and readers keep the latest version per (window_start, key) with
one row_number. Plain parquet has no point-update; eager merge-on-
write would rewrite files every trigger. Appends are cheap and
idempotent-per-batch-id; a periodic compaction job (compact_rollup)
rewrites the log into its current snapshot so the read-side window
stays bounded. This is exactly the merge-on-read design lakehouse
formats (Hudi MOR, Iceberg + position deletes) implement with better
bookkeeping; on a 100 TB cluster you would swap the sink for one of
those and keep every plan here unchanged.

Reference contrast: the reference pushes each changed window to
InfluxDB, whose same-tags+timestamp upsert hides this problem
(spark_processor.py:177-190); a parquet lake has to solve it
explicitly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming import StreamingQuery


def five_minute_partials(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    """Streaming 5-min grouped partials: count / exact decimal sum /
    max per (window, event_type). Mergeable by construction — decimal
    addition is order-independent, so any coarser grain re-aggregates
    these without drift."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,8)")).alias("s"),
            F.max("value").alias("mx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "s",
            "mx",
        )
    )


def rollup_append_sink(path: str):
    """foreachBatch handler: append this batch's changed windows,
    stamped with batch_id (the version for read-side compaction) and
    partitioned by hour so coarse-grain readers prune by time.

    Scale: appends only — no read-modify-write per trigger, no driver
    collect (contrast spark_processor.py:168); each micro-batch lands
    O(changed windows) rows across at most a few recent hour
    partitions."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .withColumn("hour_part", F.date_format("window_start", "yyyyMMddHH"))
            .write.mode("append")
            .partitionBy("hour_part")
            .parquet(path)
        )

    return handle


def run_rollup_materialization(
    events: DataFrame,
    path: str,
    checkpoint: str,
    *,
    available_now: bool = True,
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Wire stream → 5-min partials → update-mode append sink.

    `watermark` bounds how late an event may arrive and still update
    its window; a backfill replay over unordered files needs it wider
    than the replayed time span (late rows are DROPPED, not errored —
    standard watermark semantics)."""
    writer = (
        five_minute_partials(events, watermark=watermark)
        .writeStream.outputMode("update")
        .foreachBatch(rollup_append_sink(path))
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Current 5-min partial snapshot: latest appended version per
    (window_start, event_type). One shuffle on the key; hour-partition
    pruning applies before it when the caller filters on time."""
    log = spark.read.parquet(path)
    w = Window.partitionBy("window_start", "event_type").orderBy(F.desc("batch_id"))
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "batch_id", "hour_part")
    )


def compact_rollup(spark: SparkSession, path: str, out_path: str) -> None:
    """Rewrite the append log into its current snapshot (batch_id 0 =
    'compacted'). Run periodically so read_rollup's per-key version
    scan stays O(1) versions; at scale, compact only hour partitions
    whose version count grew since the last pass."""
    (
        read_rollup(spark, path)
        .withColumn("batch_id", F.lit(0))
        .withColumn("hour_part", F.date_format("window_start", "yyyyMMddHH"))
        .write.mode("overwrite")
        .partitionBy("hour_part")
        .parquet(out_path)
    )


def hourly_from_rollup(partials: DataFrame) -> DataFrame:
    """Serve the 1-hour grain from materialized 5-min partials —
    identical math to the batch cascade (events_rollup_cascade), raw
    events never touched."""
    return (
        partials.groupBy(
            F.date_trunc("hour", F.col("window_start")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("s").cast("double") / F.sum("n"), 4).alias("avg_value"),
            F.round(F.max("mx"), 4).alias("max_value"),
        )
    )
