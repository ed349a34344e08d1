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


# ---------------------------------------------------------------------------
# W4 — Kafka producer sink (SURVEY.md §2.1 W4; weather-producer.py:19-28,
# 224-225). The reference serializes a dict to JSON and producer.send()s it
# one message at a time with a flush() per message. The Spark-native rebuild
# is the built-in Kafka writer: project the frame to the (key, value) record
# contract and hand it to format("kafka") — batched, partition-parallel
# produces from the executors, no per-message flush, no driver involvement.
# The broker/connector jar is absent in this container, so tests validate
# the record projection and the writer configuration (the only code that is
# ours); the format("kafka") hand-off is Spark's own tested surface.
# ---------------------------------------------------------------------------


@dataclass
class KafkaSinkConfig:
    """Writer options mirroring KafkaSourceConfig (runner.py:29-37).

    Auth options (SASL_SSL / SCRAM-SHA-256, spark_processor.py:54-66)
    go in extra_options with values sourced from the environment or a
    secret store — never hard-coded (the reference embeds credentials,
    weather-producer.py:22-27)."""

    bootstrap_servers: str
    topic: str = "sensor_data"
    extra_options: dict[str, str] = field(default_factory=dict)

    def writer_options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
            **self.extra_options,
        }


def to_kafka_records(
    df: DataFrame, key_col: str | None = None, value_cols: list[str] | None = None
) -> DataFrame:
    """Project a DataFrame to the Kafka writer's record contract:
    `value` = JSON document of `value_cols` (default: every non-key
    column), optional `key` = key_col cast to string.

    JSON rendering is F.to_json over a struct — pure codegen, executed
    distributed; this is the engine-side twin of the reference
    producer's json.dumps value_serializer (weather-producer.py:21)."""
    cols = value_cols or [c for c in df.columns if c != key_col]
    record = [F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value")]
    if key_col is not None:
        record.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*record)


def write_kafka_batch(
    df: DataFrame, cfg: KafkaSinkConfig, key_col: str | None = None
) -> None:
    """Batch produce: df.write.format("kafka") — e.g. replaying a
    corrected table back into a topic. Executors produce in parallel;
    contrast the reference's 1 msg/s single-threaded send loop."""
    writer = to_kafka_records(df, key_col=key_col).write.format("kafka")
    for k, v in cfg.writer_options().items():
        writer = writer.option(k, v)
    writer.save()


def kafka_stream_writer(
    df: DataFrame,
    cfg: KafkaSinkConfig,
    checkpoint_dir: str,
    key_col: str | None = None,
    output_mode: str = "update",
):
    """Streaming produce: writeStream.format("kafka") with exactly-once
    bookkeeping via the checkpoint (the reference producer has no
    delivery guarantee at all). Returns the configured DataStreamWriter;
    callers .start() it (kept separate so tests can inspect the plan
    without a broker)."""
    writer = (
        to_kafka_records(df, key_col=key_col)
        .writeStream.format("kafka")
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in cfg.writer_options().items():
        writer = writer.option(k, v)
    return writer


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
