"""Streaming drift monitor (streaming/drift.py): fixed-bin histogram
as a bounded-state streaming aggregation + read-side PSI vs a frozen
baseline.

Three properties:
  * stream-equals-batch: the streamed histogram over a file source
    equals the batch expression over the same rows (shared binning
    code, so this pins the streaming runtime, not the math);
  * bounded state: the result (hence the state store) holds at most
    `bins` rows no matter the input volume;
  * planted drift alarms: a shifted value distribution crosses the
    0.2 PSI threshold; an identical distribution stays quiet.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.streaming.drift import (
    binned_histogram,
    psi_report,
    value_bin,
)


def test_streaming_histogram_equals_batch(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select("value")
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("value double").parquet(src)
    q = (
        binned_histogram(stream, "value")
        .writeStream.format("memory")
        .queryName("drift_hist")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["bin"]: r["n"] for r in spark.sql("SELECT * FROM drift_hist").collect()
    }
    batch = {
        r["bin"]: r["n"] for r in binned_histogram(ev, "value").collect()
    }
    assert streamed == batch
    assert 0 < len(streamed) <= 32  # bounded by the bin space


def test_psi_planted_drift_alarms(spark):
    base = spark.range(0, 2000).select(
        (F.col("id") % 100).cast("double").alias("value")
    )
    same = spark.range(5000, 7000).select(
        (F.col("id") % 100).cast("double").alias("value")
    )
    shifted = spark.range(0, 2000).select(
        (F.lit(50.0) + (F.col("id") % 25)).cast("double").alias("value")
    )
    hb = binned_histogram(base, "value")
    quiet = psi_report(binned_histogram(same, "value"), hb).collect()[0]
    loud = psi_report(binned_histogram(shifted, "value"), hb).collect()[0]
    assert quiet["drift_alarm"] is False and abs(quiet["psi"]) < 0.01
    assert loud["drift_alarm"] is True and loud["psi"] > 0.2
    assert quiet["n_current"] == 2000 and quiet["n_baseline"] == 2000


def test_psi_empty_stream_alarms(spark):
    """A total outage of the monitored stream (n_current = 0) leaves
    psi undefined (NULL) but must FORCE the alarm — a NULL alarm would
    silently read as not-alarmed downstream (ADVICE r9)."""
    base = spark.range(0, 2000).select(
        (F.col("id") % 100).cast("double").alias("value")
    )
    empty = base.filter(F.lit(False))
    hb = binned_histogram(base, "value")
    out = psi_report(binned_histogram(empty, "value"), hb).collect()[0]
    assert out["n_current"] == 0
    assert out["psi"] is None
    assert out["drift_alarm"] is True
    # empty BASELINE (misconfigured monitor) alarms too
    out2 = psi_report(hb, binned_histogram(empty, "value")).collect()[0]
    assert out2["n_baseline"] == 0 and out2["drift_alarm"] is True


def test_value_bin_clamps_outliers(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (99.9,), (250.0,)], "value double"
    )
    got = [r[0] for r in df.select(value_bin("value", 32, 0.0, 100.0)).collect()]
    assert got[0] == 0 and got[1] == 0
    assert 0 <= got[2] <= 31 and got[3] == 31 and got[4] == 31
