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
