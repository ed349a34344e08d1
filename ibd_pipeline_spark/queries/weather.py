"""Registry entries for the reference-parity weather pipeline.

The weather stream isn't one of the fixture tables, so these queries
synthesize the reference producer's messages deterministically
in-process (seed 42) and run the real parse→window→aggregate
pipeline. No DuckDB oracle (the oracle runs only over the parquet
views) → rows-only check; the hand-computed golden test in
tests/test_streaming_weather.py is the value-level gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.queries import query
from ibd_pipeline_spark.sources.weather_sim import generate_messages
from ibd_pipeline_spark.streaming.weather import parse_weather_json, weather_pipeline


@query("weather_pipeline_5min")  # rows-only: source is synthesized, not a view
def weather_pipeline_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full query (spark_processor.py:121-165) over
    900 deterministic simulated messages: 3 five-minute windows of
    8 aggregates with verbatim reference output names."""
    raw = spark.createDataFrame([(m,) for m in generate_messages(900)], ["value"])
    agg = weather_pipeline(raw)
    return agg.select(
        F.col("window.start").alias("window_start"),
        *[F.round(c, 6).alias(c) for c in agg.columns if c.startswith(("avg_", "max_", "total_", "temperature_"))],
        "sample_count",
    ).orderBy("window_start")


@query("weather_synth_throughput")  # rows-only: distributed synthesis
def weather_synth_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume variant of the reference pipeline: 1,000,000 messages
    synthesized JVM-side (sources.weather_synth — spark.range +
    to_json, zero driver involvement) pushed through the full
    parse→window→aggregate path. Benchmarked in bench.py; the fixed
    1 msg/s producer of the reference (weather-producer.py:17) maps
    to ~11.5 days of simulated stream."""
    from ibd_pipeline_spark.sources.weather_synth import synth_weather_json

    raw = synth_weather_json(spark, 1_000_000)
    agg = weather_pipeline(raw)
    return agg.select(
        F.col("window.start").alias("window_start"),
        "sample_count",
        *[
            F.round(c, 4).alias(c)
            for c in agg.columns
            if c.startswith(("avg_", "max_", "total_", "temperature_"))
        ],
    ).orderBy("window_start")


@query("weather_parse_flatten")  # rows-only: source is synthesized
def weather_parse_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1→P4 alone (decode → from_json → flatten to the 12-column
    frame, spark_processor.py:121-145) over 100 simulated messages."""
    raw = spark.createDataFrame([(m,) for m in generate_messages(100)], ["value"])
    parsed = parse_weather_json(raw)
    numeric = [c for c, t in parsed.dtypes if t == "double"]
    return parsed.select(
        "event_time", *[F.round(c, 6).alias(c) for c in numeric]
    ).orderBy("event_time")
