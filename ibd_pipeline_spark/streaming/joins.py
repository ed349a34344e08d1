"""Stream-stream joins (Structured Streaming state-to-state joins).

The reference pipeline is a single linear stream (SURVEY §3); real
event pipelines join streams — click→purchase attribution, order→
shipment matching. Spark's stream-stream join buffers both sides in
state and needs two things to stay bounded, both encoded here:

  * watermarks on BOTH inputs (state eviction), and
  * an event-time RANGE condition tying the two times together — it
    is what lets the engine compute how long a buffered row can still
    match, i.e. the state TTL. An equi-key alone would buffer
    forever.

The builder works unchanged on batch frames (same API, no watermark
semantics) — tests exploit that: the streaming result must equal the
batch join over the same data once all input is processed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
    streaming: bool = True,
) -> DataFrame:
    """Join each click to purchases by the same user within
    [click_ts, click_ts + horizon] — the attribution shape.

    how="inner": emit matches as soon as both sides arrive.
    how="left_outer": additionally emit (click, NULL purchase) once
    the watermark proves no match can arrive — the abandoned-funnel
    feed. Outer results are inherently watermark-delayed; a row is
    only NULL-matched after event-time passes click_ts + horizon +
    watermark.

    Scale: state is hash-partitioned on user_id (one shuffle per
    side); the range condition bounds per-row state lifetime to
    horizon + watermark, so state size is input-rate × window — flat
    over time, no unbounded growth. Skewed users behave like any
    skewed streaming key: salt upstream or widen partitions; AQE does
    not apply inside micro-batch state joins.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if streaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond, how).select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
