"""Pluggable streaming sinks.

The reference sink collect()s every micro-batch to the driver and
writes InfluxDB points one HTTP client call per batch
(spark_processor.py:167-197) — a driver bottleneck at any real rate.
Every sink here writes per-partition on the executors.

InfluxDB itself isn't in this container, so the Influx adapter
formats line protocol (the public wire format) and hands each
partition's lines to a writer callback — file-backed by default,
an HTTP POST per partition in production. The Spark-side shape
(foreachBatch → foreachPartition → buffered writes) is the real,
scale-correct pattern.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def to_line_protocol(
    df: DataFrame,
    measurement: str,
    tags: dict[str, str],
    field_cols: list[str],
    time_col: str = "window_end",
) -> DataFrame:
    """Render rows as InfluxDB line protocol strings (measurement,
    tags, fields, ns timestamp — the reference writes the same shape
    via Point(), spark_processor.py:177-190) as a `line` column.

    Pure column expressions — rendering happens distributed, in
    codegen, not on the driver.
    """
    tag_str = ",".join(f"{k}={v}" for k, v in sorted(tags.items()))
    prefix = f"{measurement},{tag_str} " if tags else f"{measurement} "
    fields = [
        F.concat(F.lit(f"{c}="), F.col(c).cast("double").cast("string"))
        for c in field_cols
    ]
    ts_ns = (F.unix_micros(F.col(time_col)) * 1000).cast("string")
    return df.select(
        F.concat(
            F.lit(prefix),
            F.concat_ws(",", *fields),
            F.lit(" "),
            ts_ns,
        ).alias("line")
    )


def file_line_writer(directory: str) -> Callable[[int, Iterable[str]], None]:
    """Partition writer that appends lines to one file per partition —
    the test stand-in for an HTTP POST to /api/v2/write."""

    def write(partition_id: int, lines: Iterable[str]) -> None:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"part-{partition_id:05d}.lp")
        with open(path, "a", encoding="utf-8") as fh:
            for line in lines:
                fh.write(line + "\n")

    return write


def influx_foreach_batch(
    measurement: str,
    tags: dict[str, str],
    field_cols: list[str],
    writer_factory: Callable[[], Callable[[int, Iterable[str]], None]],
    time_col: str = "window_end",
):
    """Build a foreachBatch function that writes a micro-batch as line
    protocol, per partition, on the executors.

    Contrast with the reference (spark_processor.py:168): no
    collect(); the driver never sees row data. Update-mode
    re-emissions of the same window overwrite the same series point
    (same measurement+tags+timestamp ⇒ Influx upsert), which is what
    makes update mode correct for this sink."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        flat = batch_df.select(
            F.col("window.end").alias("window_end"),
            *[F.col(c) for c in field_cols],
        )
        lines = to_line_protocol(flat, measurement, tags, field_cols, "window_end")

        def per_partition(it):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId() if TaskContext.get() else 0
            writer = writer_factory()
            writer(pid, (row["line"] for row in it))

        lines.foreachPartition(per_partition)

    return handle
