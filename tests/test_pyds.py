"""Custom Python data source (Spark 4 DataSource API): the
weather_sim format — schema, determinism, partitioned generation,
and signal-model bounds (the producer's clamp semantics,
weather-producer.py:168-171, reproduced engine-side)."""

import pyspark.sql.functions as F
import pytest

from ibd_pipeline_spark.sources import pyds


@pytest.fixture(autouse=True)
def _register(spark):
    pyds.register(spark)


def _read(spark, **opts):
    r = spark.read.format("weather_sim")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_and_rowcount(spark):
    df = _read(spark, rows=500, partitions=4)
    assert df.count() == 500
    assert dict(df.dtypes) == {
        "iteration": "bigint",
        "temperature": "double",
        "humidity": "double",
        "wind_speed": "double",
        "simulated": "boolean",
    }
    assert df.rdd.getNumPartitions() == 4


def test_deterministic_across_reads_and_partitionings(spark):
    a = _read(spark, rows=200, partitions=2).orderBy("iteration").collect()
    b = _read(spark, rows=200, partitions=7).orderBy("iteration").collect()
    assert a == b


def test_signal_bounds(spark):
    agg = _read(spark, rows=1000).agg(
        F.min("humidity").alias("hmin"),
        F.max("humidity").alias("hmax"),
        F.min("wind_speed").alias("wmin"),
        F.min("temperature").alias("tmin"),
        F.max("temperature").alias("tmax"),
    ).first()
    assert 0.0 <= agg.hmin and agg.hmax <= 100.0
    assert agg.wmin >= 0.0
    # temperature stays within baseline ± (oscillation + noise)
    assert 19.0 < agg.tmin < agg.tmax < 21.0


def test_iterations_form_contiguous_range(spark):
    df = _read(spark, rows=300, partitions=5)
    assert df.agg(F.countDistinct("iteration")).first()[0] == 300
    mm = df.agg(F.min("iteration"), F.max("iteration")).first()
    assert (mm[0], mm[1]) == (0, 299)
