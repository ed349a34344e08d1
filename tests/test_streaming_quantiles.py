"""Streaming quantile monitor (streaming/quantiles.py): bounded-state
histogram counters + read-side interpolated p50/p95/p99.

Mirrors the monitor-family suites: stream-equals-batch counters,
bounded state, accuracy envelope vs exact quantiles, planted
latency-shift alarm, quiet empty readout.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.streaming.quantiles import (
    DEFAULT_BOUNDS,
    bucket_traffic,
    quantile_report,
)


def test_streaming_bucket_counts_equal_batch(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select("value")
    src = str(tmp_path / "qsrc")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("value double").parquet(src)
    q = (
        bucket_traffic(stream)
        .writeStream.format("memory")
        .queryName("q_buckets")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "qck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["bucket"]: r["n"]
        for r in spark.sql("SELECT * FROM q_buckets").collect()
    }
    batch = {r["bucket"]: r["n"] for r in bucket_traffic(ev).collect()}
    assert streamed == batch
    assert 0 < len(streamed) <= len(DEFAULT_BOUNDS) + 1


def test_quantiles_bracket_exact(spark, sf_dir):
    """Histogram quantiles are bucket-resolution-bounded: each
    estimate must land within the bucket that contains the exact
    quantile."""
    ev = load(spark, sf_dir, "events").select("value").filter(
        F.col("value").isNotNull()
    )
    rep = quantile_report(bucket_traffic(ev)).collect()[0]
    exact = ev.approxQuantile("value", [0.5, 0.95, 0.99], 0.001)
    bounds = [0.0] + DEFAULT_BOUNDS

    def bucket_of(x):
        for i in range(1, len(bounds)):
            if x <= bounds[i]:
                return (bounds[i - 1], bounds[i])
        return (bounds[-1], float("inf"))

    for name, ex in zip(("p50", "p95", "p99"), exact):
        lo, hi = bucket_of(ex)
        assert lo <= rep[name] <= hi, (name, rep[name], ex, lo, hi)


def test_latency_shift_alarms(spark, sf_dir):
    """A 3x value inflation (the planted latency regression) must
    trip the alarm against the honest run's p95 reference; the
    honest run stays quiet against its own reference."""
    ev = load(spark, sf_dir, "events").select("value").filter(
        F.col("value").isNotNull()
    )
    honest = quantile_report(bucket_traffic(ev)).collect()[0]
    ref = honest["p95"]
    quiet = quantile_report(
        bucket_traffic(ev), reference_p95=ref
    ).collect()[0]
    assert not quiet["latency_alarm"], quiet
    shifted = ev.select((F.col("value") * 3.0).alias("value"))
    loud = quantile_report(
        bucket_traffic(shifted), reference_p95=ref
    ).collect()[0]
    assert loud["latency_alarm"], (ref, loud)


def test_empty_counter_is_quiet_row(spark):
    empty = bucket_traffic(
        spark.range(0).select(F.col("id").cast("double").alias("value"))
    )
    rows = quantile_report(empty).collect()
    assert len(rows) == 1
    assert rows[0]["n_total"] == 0
    assert not rows[0]["latency_alarm"]


def test_reference_p95_requires_p95_quantile(spark):
    """ADVICE r12: the shift alarm reads the p95 column, so asking for
    reference_p95 without 0.95 in `quantiles` must fail loud at call
    time, not with an unresolved-column analysis error later."""
    import pytest

    counts = bucket_traffic(
        spark.range(10).select(F.col("id").cast("double").alias("value"))
    )
    with pytest.raises(ValueError, match="requires 0.95"):
        quantile_report(counts, quantiles=(0.5, 0.9), reference_p95=1.0)
    # and the non-alarm path still accepts any quantile set
    row = quantile_report(counts, quantiles=(0.5, 0.9)).collect()[0]
    assert row["n_total"] == 10 and not row["latency_alarm"]
