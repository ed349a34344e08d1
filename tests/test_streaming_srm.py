"""Streaming SRM monitor (streaming/srm.py): bounded-state per-arm
traffic counters + read-side chi-square allocation audit.

Three properties (mirrors the drift-monitor suite):
  * stream-equals-batch: the streamed arm counters over a file source
    equal the batch expression over the same rows (shared hash-split
    code, so this pins the streaming runtime, not the math);
  * bounded state: the counter table holds at most `arms` rows no
    matter the input volume;
  * planted SRM alarms: dropping a third of one arm's traffic crosses
    the p < 0.001 bar; the untouched split stays quiet; an arm with
    ZERO traffic (dead variant server) alarms rather than vanishing.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.streaming.srm import (
    arm_index,
    arm_traffic,
    srm_report,
)


def test_streaming_arm_counts_equal_batch(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select("user_id")
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("user_id bigint").parquet(src)
    q = (
        arm_traffic(stream)
        .writeStream.format("memory")
        .queryName("srm_arms")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["arm"]: r["n"] for r in spark.sql("SELECT * FROM srm_arms").collect()
    }
    batch = {r["arm"]: r["n"] for r in arm_traffic(ev).collect()}
    assert streamed == batch
    assert 0 < len(streamed) <= 2  # bounded by the arm space


def test_srm_quiet_on_honest_split(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id")
    rep = srm_report(arm_traffic(ev)).collect()[0]
    assert rep["n_total"] == ev.count()
    assert rep["n_arms"] == 2
    assert not rep["srm_alarm"], f"A/A split alarmed: {rep}"
    assert rep["p_value"] > 0.001


def test_srm_alarms_on_planted_mismatch(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id")
    # eat a third of arm-1 traffic (a variant-server brownout):
    # deterministic md5 sub-hash so the damage is reproducible
    sub = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit("dmg"), "user_id")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 3
    )
    damaged = ev.filter(~((arm_index() == 1) & (sub == 0)))
    rep = srm_report(arm_traffic(damaged)).collect()[0]
    assert rep["srm_alarm"], f"planted SRM not detected: {rep}"
    assert rep["p_value"] < 0.001


def test_srm_alarms_on_dead_arm(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id")
    one_arm = ev.filter(arm_index() == 0)
    rep = srm_report(arm_traffic(one_arm)).collect()[0]
    assert rep["n_arms"] == 2  # the spine restores the dead arm
    assert rep["srm_alarm"]


def test_srm_rejects_kway(spark, sf_dir):
    import pytest

    ev = load(spark, sf_dir, "events").select("user_id")
    with pytest.raises(ValueError):
        srm_report(arm_traffic(ev), ratios=[0.5, 0.25, 0.25])


def test_streaming_conversion_counts_equal_batch(spark, sf_dir, tmp_path):
    from ibd_pipeline_spark.streaming.srm import conversion_traffic

    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    src = str(tmp_path / "csrc")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id bigint, event_type string").parquet(src)
    q = (
        conversion_traffic(stream)
        .writeStream.format("memory")
        .queryName("conv_arms")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["arm"]: (r["n"], r["conv"])
        for r in spark.sql("SELECT * FROM conv_arms").collect()
    }
    batch = {
        r["arm"]: (r["n"], r["conv"]) for r in conversion_traffic(ev).collect()
    }
    assert streamed == batch and len(streamed) <= 2


def test_msprt_quiet_on_aa(spark, sf_dir):
    from ibd_pipeline_spark.streaming.srm import conversion_traffic, msprt_report

    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    rep = msprt_report(conversion_traffic(ev)).collect()[0]
    assert not rep["effect_alarm"], rep
    assert rep["p_always_valid"] > 0.05


def test_msprt_alarms_on_planted_effect(spark, sf_dir):
    from ibd_pipeline_spark.streaming.srm import (
        arm_index,
        conversion_traffic,
        msprt_report,
    )

    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    # kill 80% of arm-1 purchases (a broken checkout in the variant)
    sub = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit("fx"), "user_id")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 5
    )
    damaged = ev.filter(
        ~(
            (arm_index() == 1)
            & (F.col("event_type") == "purchase")
            & (sub != 0)
        )
    )
    rep = msprt_report(conversion_traffic(damaged)).collect()[0]
    assert rep["effect_alarm"], rep
    assert rep["p_always_valid"] < 0.05
    assert rep["rate_b"] < rep["rate_a"]


def test_msprt_degenerate_is_quiet(spark, sf_dir):
    from ibd_pipeline_spark.streaming.srm import conversion_traffic, msprt_report

    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    no_conv = ev.filter(F.col("event_type") != "purchase")
    rep = msprt_report(conversion_traffic(no_conv)).collect()[0]
    assert not rep["effect_alarm"]
    assert rep["p_always_valid"] == 1.0


def test_msprt_zero_traffic_arm_is_quiet_row(spark, sf_dir):
    """ADVICE r11 (medium): a dead variant server means NO counter row
    for arm 1 — the report must still be exactly one quiet row (p=1,
    alarm false), not an empty frame that IndexErrors consumers."""
    from ibd_pipeline_spark.streaming.srm import (
        arm_index,
        conversion_traffic,
        msprt_report,
    )

    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    one_arm = ev.filter(arm_index() == 0)
    rows = msprt_report(conversion_traffic(one_arm)).collect()
    assert len(rows) == 1
    rep = rows[0]
    assert not rep["effect_alarm"]
    assert rep["p_always_valid"] == 1.0

    # the fully-empty counter (readout before ANY traffic) is the same
    # contract: one quiet row.
    empty = conversion_traffic(ev.filter(F.lit(False)))
    rows = msprt_report(empty).collect()
    assert len(rows) == 1
    assert not rows[0]["effect_alarm"]
    assert rows[0]["p_always_valid"] == 1.0
    assert rows[0]["n_total"] == 0


def test_srm_alarms_on_off_spine_arm(spark, sf_dir):
    """ADVICE r11 (low): a counter built with arms=3 must not read
    healthy under the default 2-arm spine — off-spine traffic is
    surfaced and alarms."""
    ev = load(spark, sf_dir, "events").select("user_id")
    rep = srm_report(arm_traffic(ev, arms=3)).collect()[0]
    assert rep["off_spine_traffic"] > 0
    assert rep["srm_alarm"], rep

    # the honest 2-arm split reports zero off-spine traffic
    rep2 = srm_report(arm_traffic(ev)).collect()[0]
    assert rep2["off_spine_traffic"] == 0
