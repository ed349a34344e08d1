"""Streaming pipeline-health monitor: the per-type freshness state
(`quality_freshness_sla`'s batch readout) maintained live by a
streaming aggregation.

Like the streaming CMS (sketch_stream.py), this is an UNBOUNDED
aggregation made safe by a bounded key space: the group key is the
event type, so the state store holds one row per type forever — no
watermark, no TTL. Each micro-batch advances (n_events, last_ts)
per type; the SLA comparison happens read-side against the consumer's
clock (or, in tests, against the stream's own horizon — which keeps
the assertion deterministic).

Reference parity note: the reference pipeline has no health readout
at all — a stalled producer shows up as silently-missing Influx
points (spark_processor.py writes only what arrives). This operator
is the alarm for exactly that failure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def freshness_state(events: DataFrame, type_col: str = "event_type", ts_col: str = "ts") -> DataFrame:
    """Streaming (or batch — same expression) per-type freshness
    state: event count and latest event time. outputMode 'update'
    emits only the types whose state advanced in the micro-batch;
    'complete' re-emits the whole (type-count-sized) table.
    """
    return events.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max(ts_col).alias("last_ts"),
    )


def staleness_report(state: DataFrame, now: Column, sla: DataFrame) -> Column | DataFrame:
    """Read-side SLA join: seconds since last_ts vs per-type budget.
    `now` is a timestamp Column (F.current_timestamp() in production;
    a fixed horizon in tests). `sla` carries
    (event_type, max_gap_minutes)."""
    staleness = (F.unix_timestamp(now) - F.unix_timestamp("last_ts")).cast(
        "bigint"
    )
    return (
        state.join(F.broadcast(sla), "event_type")
        .select(
            "event_type",
            "n_events",
            staleness.alias("staleness_seconds"),
            (staleness > F.col("max_gap_minutes") * 60).alias("breached"),
        )
    )
