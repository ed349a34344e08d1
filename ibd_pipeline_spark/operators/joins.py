"""Composite join operators Spark lacks natively.

as_of_join: the time-series "latest value at or before t" join
(SURVEY §2.2 joins row). Implemented union-and-window — one shuffle
on the key, no range explosion:

    tag events (carry their own timestamp as the payload) and probes
    (null payload), union, sort within key by (time, side) with
    events first at identical timestamps, and take
    last(payload, ignorenulls) over the running frame.

The naive formulation — range-join every probe to all earlier events
then MAX — materializes O(|probes|·|events-per-key|) pairs before
aggregating; this one is O(n log n) within each key partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def as_of_join(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    probe_time: str,
    event_time: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """For each probe row, attach the latest event at-or-before its
    timestamp with the same key.

    probes: any columns + `key` + `probe_time`.
    events: `key` + `event_time` + optional `value_cols` to carry.
    Returns probes' columns plus `asof_<event_time>` (the matched
    event timestamp) and the carried value columns (null when no
    event precedes the probe).
    """
    value_cols = value_cols or []
    carried = [f"asof_{event_time}", *[f"asof_{c}" for c in value_cols]]

    e = events.select(
        F.col(key).alias("__k"),
        F.col(event_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(event_time).alias(f"asof_{event_time}"),
        *[F.col(c).alias(f"asof_{c}") for c in value_cols],
    )
    probe_cols = probes.columns
    p = probes.select(
        *probe_cols,
        F.col(key).alias("__k"),
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(events.schema[event_time].dataType).alias(f"asof_{event_time}"),
        *[
            F.lit(None).cast(events.schema[c].dataType).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    unioned = p.unionByName(e, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c not in carried],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    )
    return filled.filter(F.col("__side") == 1).select(*probe_cols, *carried)


def asof_nearest_join(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    probe_time: str,
    event_time: str,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each probe row, attach the NEAREST event timestamp in
    EITHER direction with the same key — the sensor/trade-quote
    alignment variant of as_of_join (which is backward-only). Exact
    ties (an event equidistant before and after) resolve BACKWARD,
    matching the at-or-before convention of the backward pass.

    `tolerance_seconds` nulls out matches farther than the bound in
    both directions (the pandas merge_asof `tolerance` contract).

    Returns probes' columns + `nearest_<event_time>` (timestamp,
    null when nothing within tolerance), `gap_seconds` (BIGINT,
    null when unmatched) and `direction` ('backward' / 'forward' /
    null).

    Gap arithmetic runs at MICROSECOND precision (unix_micros on
    both sides) and only the reported `gap_seconds` floors the true
    gap — so a probe at 10.9s with events at 10.1s (gap 0.8s) and
    11.0s (gap 0.1s) correctly picks forward. The earlier per-side
    truncate-to-seconds form (cast timestamp→long before
    subtracting) called that tie 0 vs 1 and chose the farther
    backward match (ADVICE r10); tolerance comparisons are likewise
    exact now (gap_us ≤ tolerance_seconds·1e6).

    Scale: two union-and-window passes over ONE shuffle key — the
    same no-range-explosion shape as as_of_join; the backward and
    forward fills reuse the same (key, time)-sorted union, so the
    plan pays one exchange + two windows over it."""
    e = events.select(
        F.col(key).alias("__k"),
        F.col(event_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(event_time).alias("__ev"),
    )
    probe_cols = probes.columns
    p = probes.select(
        *probe_cols,
        F.col(key).alias("__k"),
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(events.schema[event_time].dataType).alias("__ev"),
    )
    unioned = p.unionByName(e, allowMissingColumns=True)
    # backward: events at the same instant count (event __side=0
    # sorts before probe __side=1)
    w_back = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: same-instant events must fall INSIDE the forward frame,
    # so probes sort FIRST at equal __t (side DESC)
    w_fwd = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c != "__ev"],
        F.last("__ev", ignorenulls=True).over(w_back).alias("__bwd"),
        F.first("__ev", ignorenulls=True).over(w_fwd).alias("__fwd"),
    ).filter(F.col("__side") == 1)
    t_us = F.unix_micros(F.col("__t").cast("timestamp"))
    bgap_us = t_us - F.unix_micros(F.col("__bwd"))
    fgap_us = F.unix_micros(F.col("__fwd")) - t_us
    if tolerance_seconds is not None:
        tol_us = F.lit(int(tolerance_seconds) * 1_000_000)
        bwd = F.when(bgap_us <= tol_us, F.col("__bwd"))
        fwd = F.when(fgap_us <= tol_us, F.col("__fwd"))
    else:
        bwd, fwd = F.col("__bwd"), F.col("__fwd")
    take_back = bwd.isNotNull() & (fwd.isNull() | (bgap_us <= fgap_us))
    nearest = F.when(take_back, bwd).otherwise(fwd)
    direction = F.when(take_back, F.lit("backward")).otherwise(
        F.when(fwd.isNotNull(), F.lit("forward"))
    )
    # gaps are non-negative, so integer division == floor
    gap = F.when(take_back, bgap_us).otherwise(
        F.when(fwd.isNotNull(), fgap_us)
    ) / F.lit(1_000_000)
    return filled.select(
        *probe_cols,
        nearest.alias(f"nearest_{event_time}"),
        F.floor(gap).cast("bigint").alias("gap_seconds"),
        direction.alias("direction"),
    )
