"""Distributed weather-message synthesis: the reference producer's
payload (weather-producer.py:176-221) generated entirely JVM-side
with spark.range + to_json — no Python in the loop, no driver
bottleneck.

This is the scale-path twin of sources.weather_sim (which builds
JSON strings in driver Python for golden tests): spark.range
partitions the id space across executors, every field is a column
expression, and to_json(struct(...)) renders the exact nested
document. 10⁸ messages synthesize as fast as the cluster can write
shuffle — the right way to load-test the parse pipeline.

Determinism: oscillation is sin(i·0.1) exactly like the producer;
the noise term uses rand(seed) which is deterministic per
(seed, partition, row) — stable across runs at fixed parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

BASE_TEMP, OSC_TEMP = 15.0, 0.5
BASE_HUM, OSC_HUM = 60.0, 2.0
BASE_WIND, OSC_WIND = 10.0, 1.5


def synth_weather_json(
    spark: SparkSession,
    n: int,
    start_ts: str = "2024-06-01 12:00:00",
    interval_s: int = 1,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """n messages at interval_s of simulated time, as a `value` JSON
    string column — the Kafka-value contract of the parse pipeline."""
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    i = F.col("id").cast("double")

    def osc(base: float, amp: float, salt: int) -> F.Column:
        return (
            F.lit(base)
            + F.sin(i * 0.1) * amp
            + (F.rand(seed + salt) - 0.5) * (0.4 * amp)
        )

    temp = osc(BASE_TEMP, OSC_TEMP, 0)
    hum = F.least(F.lit(100.0), F.greatest(F.lit(0.0), osc(BASE_HUM, OSC_HUM, 1)))
    wind = F.greatest(F.lit(0.0), osc(BASE_WIND, OSC_WIND, 2))
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start_ts).cast("timestamp")) + F.col("id") * interval_s
    )
    doc = F.struct(
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        F.struct(
            F.lit(44.4274689).alias("latitude"),
            F.lit(26.1028208).alias("longitude"),
            F.lit("Europe/Bucharest").alias("timezone"),
            F.lit("EET").alias("timezone_abbreviation"),
        ).alias("location"),
        F.struct(
            F.struct(
                temp.alias("value"),
                F.lit("celsius").alias("unit"),
                (temp - 1.2).alias("apparent"),
            ).alias("temperature"),
            F.struct(hum.alias("value"), F.lit("percent").alias("unit")).alias(
                "humidity"
            ),
            F.struct(
                wind.alias("speed"),
                ((i * 7) % 360).alias("direction"),
                (wind * 1.6).alias("gusts"),
                F.lit("km/h").alias("unit"),
            ).alias("wind"),
            F.struct(
                (0.1 * (F.col("id") % 3)).alias("total"),
                F.lit(0.0).alias("rain"),
                F.lit(0.0).alias("showers"),
                F.lit(0.0).alias("snowfall"),
                F.lit("mm").alias("unit"),
            ).alias("precipitation"),
            F.struct(
                ((i * 11) % 100).alias("cloud_cover"),
                (F.lit(1013.0) + F.sin(i * 0.05) * 3).alias("pressure_msl"),
                F.lit(1010.0).alias("surface_pressure"),
                F.lit("hPa").alias("unit_pressure"),
            ).alias("atmosphere"),
            (F.col("id") % 4).cast("double").alias("weather_code"),
            ((F.col("id") / 300).cast("long") % 2 == 0).alias("is_day"),
        ).alias("current_conditions"),
        F.struct(
            i.alias("iteration"),
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss").alias("last_api_update"),
            F.lit("full").alias("simulation_mode"),
        ).alias("metadata"),
    )
    return rng.select(F.to_json(doc).alias("value"))
