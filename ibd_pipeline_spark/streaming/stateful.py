"""Stateful streaming extensions beyond the reference's single
watermarked tumbling aggregate (SURVEY §2.2 'stateful ops / dedup /
late data'): streaming dedup within watermark, sliding & session
windows, and a custom per-key stateful operator via
applyInPandasWithState.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def dedup_within_watermark(
    parsed: DataFrame,
    keys: list[str],
    event_time_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of the same key seen within
    the watermark horizon. State is evicted as the watermark advances
    — bounded memory, unlike a naive dropDuplicates whose state grows
    forever on an unbounded stream."""
    return parsed.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def sliding_window_agg(
    parsed: DataFrame,
    value_col: str,
    event_time_col: str = "event_time",
    length: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Sliding event-time windows (each event lands in length/slide
    windows) — the streaming extension of the reference's tumbling
    window (spark_processor.py:151)."""
    src = (
        parsed.withWatermark(event_time_col, watermark)
        if parsed.isStreaming
        else parsed
    )
    return src.groupBy(F.window(event_time_col, length, slide).alias("window")).agg(
        F.avg(value_col).alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    )


def session_window_agg(
    parsed: DataFrame,
    key_col: str,
    value_col: str,
    event_time_col: str = "event_time",
    gap: str = "5 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Session windows per key with an inactivity gap — state closes
    (and memory frees) when the watermark passes session end + gap."""
    src = (
        parsed.withWatermark(event_time_col, watermark)
        if parsed.isStreaming
        else parsed
    )
    return src.groupBy(
        F.session_window(event_time_col, gap).alias("session"), F.col(key_col)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
    )


USER_STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_seen", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_event_time", TimestampType()),
        StructField("emit_reason", StringType()),
    ]
)

USER_STATS_STATE = StructType(
    [
        StructField("events_seen", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def running_user_stats(events: DataFrame, timeout_ms: int = 30_000) -> DataFrame:
    """Custom stateful operator: per-user running count/sum that emits
    on every update and flushes on processing-time timeout — the
    applyInPandasWithState pattern for operators Spark's built-in
    aggregates can't express (per-key custom state machines).

    Scale: state lives in the state store partitioned by user_id —
    the same shuffle key as the groupBy, no extra exchange. Arrow
    batches cross the Python boundary, not rows."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            seen, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "events_seen": [seen],
                    "value_sum": [vsum],
                    "last_event_time": [pd.NaT],
                    "emit_reason": ["timeout"],
                }
            )
            return
        seen, vsum = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            seen += len(pdf)
            vsum += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((seen, vsum))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "events_seen": [seen],
                "value_sum": [vsum],
                "last_event_time": [last_ts],
                "emit_reason": ["update"],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


TWS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_seen", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("value_max", DoubleType()),
    ]
)


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """The same per-key running-stats state machine as
    running_user_stats, on the Spark 4 `transformWithStateInPandas`
    API — typed ValueState in the (RocksDB) state store, per-key
    Arrow batches, no GroupState tuple packing. This is the
    forward-looking stateful-operator surface: composable named state
    variables, timers, and TTL live on the handle instead of a single
    opaque state blob.

    Scale: identical runtime shape to applyInPandasWithState — state
    partitioned on the grouping key, one shuffle, Arrow across the
    Python boundary; RocksDB keeps per-key state off-heap so state
    size is bounded by disk, not executor memory.

    Runtime requirement: a working `google.protobuf` (the stateful
    processor speaks a protobuf protocol to the JVM state server) and
    the RocksDB state store provider. The test suite skips this
    operator where protobuf is unavailable; applyInPandasWithState
    (running_user_stats above) is the dependency-free fallback."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "seen BIGINT, vsum DOUBLE, vmax DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            prior = self._stats.get()
            seen, vsum, vmax = prior if prior is not None else (0, 0.0, None)
            for pdf in rows:
                seen += len(pdf)
                vsum += float(pdf["value"].sum())
                batch_max = float(pdf["value"].max())
                vmax = batch_max if vmax is None else max(vmax, batch_max)
            self._stats.update((seen, vsum, vmax))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "events_seen": [seen],
                    "value_sum": [vsum],
                    "value_max": [vmax],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=TWS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


CUSUM_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n_seen", LongType()),
        StructField("s_pos", DoubleType()),
        StructField("n_alarms", LongType()),
    ]
)

CUSUM_STATE = StructType(
    [
        StructField("s_pos", DoubleType()),
        StructField("n_seen", LongType()),
        StructField("n_alarms", LongType()),
    ]
)


def _cusum_fold(
    s: float, n: int, alarms: int, values, target: float, slack: float, threshold: float
) -> tuple[float, int, int]:
    """One-sided CUSUM recursion (Page 1954): s ← max(0, s + (x −
    target − slack)); crossing `threshold` raises an alarm and resets
    s. Shared verbatim by the streaming operator and the batch twin
    so stream-equals-batch is a property of the fold, not two
    implementations."""
    for x in values:
        s = max(0.0, s + (float(x) - target - slack))
        n += 1
        if s > threshold:
            alarms += 1
            s = 0.0
    return s, n, alarms


def cusum_monitor(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "event_time",
    target: float = 0.0,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Streaming sequential changepoint detection — a per-key
    one-sided CUSUM alarm (the classic sequential test: cumulate
    positive drift above `target + slack`, alarm when the cumulant
    crosses `threshold`, reset after each alarm). The continuous twin
    of the batch `events_cusum_changepoint`: that query locates a
    level shift after the fact; this operator RAISES it while the
    stream runs, with O(1) state per key — exactly what Spark's
    built-in windowed aggregates can't express (the recursion's reset
    makes it non-associative, hence applyInPandasWithState).

    Within each micro-batch, rows are folded in event-time order
    (stable sort, so same-timestamp rows keep arrival order); across
    batches the state store carries (s, n, alarms). Emits the running
    state per key on every update — route to foreachBatch/Kafka for
    alerting.

    Scale: state is three scalars per key in the state store,
    partitioned on the grouping key (one shuffle, same as the
    groupBy); Arrow batches cross the Python boundary. Unbounded key
    domains need a timeout-based eviction (running_user_stats shows
    the pattern); monitoring keys (metric names, event types) are
    naturally small."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        s, n, alarms = state.get if state.exists else (0.0, 0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        s, n, alarms = _cusum_fold(
            s, n, alarms, pdf[value_col], target, slack, threshold
        )
        state.update((s, n, alarms))
        yield pd.DataFrame(
            {
                "key": [str(k)],
                "n_seen": [n],
                "s_pos": [s],
                "n_alarms": [alarms],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT,
        stateStructType=CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_batch(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "event_time",
    target: float = 0.0,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Batch twin of cusum_monitor: the SAME `_cusum_fold` over each
    key's full history in event-time order, one output row per key —
    what the stream's final per-key update must equal (the
    stream-equals-batch contract proven in
    tests/test_streaming_stateful.py)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        s, n, alarms = _cusum_fold(
            0.0, 0, 0, pdf[value_col], target, slack, threshold
        )
        return pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])],
                "n_seen": [n],
                "s_pos": [s],
                "n_alarms": [alarms],
            }
        )

    return events.groupBy(key_col).applyInPandas(fold, schema=CUSUM_OUTPUT)
