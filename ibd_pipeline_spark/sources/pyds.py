"""Custom Python data source (Spark 4 `pyspark.sql.datasource` API)
for the simulated weather feed — the engine-native form of the
reference's producer loop (weather-producer.py:124-235): the same
baseline + sin(iteration·0.1)·oscillation + bounded-noise signal
model, but as a *partitioned, distributed source* the planner scans
like any other relation instead of a single-process Kafka feeder.

Each input partition generates a deterministic, seeded slice of the
message stream on its executor: `spark.read.format("weather_sim")
.option("rows", N).option("partitions", P)` scales out to P parallel
generators with no driver involvement and no network hop — the
100 TB-friendly way to replay a synthetic stream at volume. (The
JVM-side spark.range+to_json variant in sources/weather_synth.py is
the no-Python-boundary alternative; this class exercises the public
DataSource extension surface.)
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

BASELINES = {"temperature": 20.0, "humidity": 60.0, "wind_speed": 10.0}
OSCILLATIONS = {"temperature": 0.5, "humidity": 2.0, "wind_speed": 1.5}

SCHEMA = (
    "iteration BIGINT, temperature DOUBLE, humidity DOUBLE, "
    "wind_speed DOUBLE, simulated BOOLEAN"
)


def _noise(seed: int, iteration: int, field: str) -> float:
    """Deterministic stand-in for the producer's uniform ±20%·osc
    noise: a hash-derived value in [-1, 1)."""
    h = hashlib.md5(f"{seed}:{iteration}:{field}".encode()).digest()[:8]
    u = int.from_bytes(h, "little", signed=True)
    return u / float(2**63)


def simulate(seed: int, iteration: int) -> tuple:
    vals = {}
    for field, base in BASELINES.items():
        osc = OSCILLATIONS[field]
        v = (
            base
            + math.sin(iteration * 0.1) * osc
            + _noise(seed, iteration, field) * 0.2 * osc
        )
        if field == "humidity":
            v = min(100.0, max(0.0, v))
        if field == "wind_speed":
            v = max(0.0, v)
        vals[field] = v
    return (
        iteration,
        vals["temperature"],
        vals["humidity"],
        vals["wind_speed"],
        True,
    )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class WeatherSimReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> list[InputPartition]:
        per = max(1, -(-self.rows // self.n_parts))
        return [
            _Slice(lo, min(lo + per, self.rows), self.seed)
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield simulate(partition.seed, i)


class WeatherSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_sim"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WeatherSimReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WeatherSimDataSource)
