"""Streaming Benford monitor (streaming/benford.py): bounded-state
per-digit counters + read-side chi-square goodness-of-fit.

Mirrors the SRM-monitor suite:
  * stream-equals-batch for the digit counters over a file source;
  * bounded state (≤ 9 rows no matter the volume);
  * quiet on a genuinely Benford stream (log-uniform amounts
    synthesized from md5 fractions — exactly Benford in
    distribution);
  * alarms on uniform prices (TPC-H totalprice — a TRUE violation:
    uniformly-priced amounts are exactly the synthetic/templated
    pattern the monitor exists to catch) and on a degenerate
    single-digit stream, where the spine restores the 8 dead digits.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.streaming.benford import (
    benford_report,
    digit_traffic,
)


def _benford_stream(spark, n: int = 20000):
    """Deterministic log-uniform amounts: x = 10^(3·u) with u an md5
    hash fraction — first digits follow Benford exactly."""
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("bf:"), F.col("id"))), 1, 13), 16, 10)
        .cast("double")
        / 4503599627370496.0
    )
    return spark.range(n).select(
        F.pow(F.lit(10.0), 3.0 * u).alias("value")
    )


def test_streaming_digit_counts_equal_batch(spark, tmp_path):
    amounts = _benford_stream(spark, 5000)
    src = str(tmp_path / "bsrc")
    amounts.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("value double").parquet(src)
    q = (
        digit_traffic(stream)
        .writeStream.format("memory")
        .queryName("bf_digits")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "bck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["digit"]: r["n"]
        for r in spark.sql("SELECT * FROM bf_digits").collect()
    }
    batch = {r["digit"]: r["n"] for r in digit_traffic(amounts).collect()}
    assert streamed == batch
    assert 0 < len(streamed) <= 9  # bounded by the digit space


def test_benford_quiet_on_log_uniform(spark):
    rep = benford_report(digit_traffic(_benford_stream(spark))).collect()[0]
    assert rep["n_total"] == 20000
    assert not rep["benford_alarm"], rep
    assert rep["p_value"] > 0.001


def test_benford_alarms_on_uniform_prices(spark, sf_dir):
    """Uniformly-distributed prices are a true Benford violation —
    the synthetic/templated-amount pattern the monitor targets."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("value")
    )
    rep = benford_report(digit_traffic(o)).collect()[0]
    assert rep["benford_alarm"], rep
    assert rep["p_value"] < 0.001


def test_benford_alarms_on_degenerate_digit(spark):
    one = spark.range(5000).select((F.lit(5000.0) + F.col("id")).alias("value"))
    rep = benford_report(digit_traffic(one)).collect()[0]
    assert rep["benford_alarm"]


def test_benford_empty_counter_is_quiet_row(spark):
    """Readout before any traffic: one quiet row, not empty (the
    msprt empty-frame lesson, ADVICE r11)."""
    empty = digit_traffic(
        spark.range(0).select(F.col("id").cast("double").alias("value"))
    )
    rows = benford_report(empty).collect()
    assert len(rows) == 1
    assert rows[0]["n_total"] == 0
    assert not rows[0]["benford_alarm"]
    assert rows[0]["p_value"] == 1.0
