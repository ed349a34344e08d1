"""Streaming quantile monitor: fixed-boundary histogram counters over
a value stream, read off as interpolated p50/p95/p99 with a shift
alarm against a committed reference.

The latency-SLO tripwire: tail quantiles (p95/p99) move long before
means do. Exact streaming quantiles need unbounded state; the
histogram trade (Prometheus's choice) makes state BOUNDED — the
group key is the BUCKET INDEX over fixed boundaries, so the state
store holds at most `len(boundaries)+1` rows forever (the
drift/burstiness/SRM/Benford idiom), and the quantile read is a
read-side interpolation over the tiny counter table. Accuracy is
bucket-resolution-bounded and the boundaries are part of the
monitor's contract (pick them around the SLO).

Reference parity note: the reference has no latency/quantile
monitoring; north-star monitoring belt (SURVEY §2.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Default boundaries: log-ish ladder for a [0, 500+] value stream.
DEFAULT_BOUNDS = [1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0, 200.0, 500.0]


def bucket_index(value_col: str, bounds: "list[float]"):
    """Index of the first boundary >= value (len(bounds) = overflow
    bucket); engine-portable CASE ladder."""
    c = F.lit(len(bounds))
    for i in range(len(bounds) - 1, -1, -1):
        c = F.when(F.col(value_col) <= F.lit(bounds[i]), F.lit(i)).otherwise(c)
    return c.cast("int")


def bucket_traffic(
    events: DataFrame,
    value_col: str = "value",
    bounds: "list[float] | None" = None,
) -> DataFrame:
    """Streaming (or batch — same expression) per-bucket counter:
    (bucket, n) with at most len(bounds)+1 state rows."""
    b = bounds if bounds is not None else DEFAULT_BOUNDS
    return (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(bucket_index(value_col, b).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def quantile_report(
    counts: DataFrame,
    bounds: "list[float] | None" = None,
    quantiles: "tuple[float, ...]" = (0.5, 0.95, 0.99),
    reference_p95: "float | None" = None,
    alarm_ratio: float = 1.5,
) -> DataFrame:
    """Read-side quantile estimates over a (bucket, n) counter:
    for each q, find the first bucket where the cumulative share
    reaches q and linearly interpolate inside it (Prometheus
    histogram_quantile semantics; bucket 0 interpolates from 0, the
    overflow bucket reports its lower bound — a known-saturated
    readout). One row out: n_total, p50/p95/p99, and an alarm when
    p95 exceeds `reference_p95 · alarm_ratio` (quiet when no
    reference is set).

    The spine join restores empty buckets so the cumulative walk is
    total; the readout is exact given the counters (all integer
    cumulative math; interpolation is one double chain per
    quantile)."""
    b = bounds if bounds is not None else DEFAULT_BOUNDS
    spark = counts.sparkSession
    lows = [0.0] + b
    highs = b + [b[-1]]  # overflow bucket clamps to its lower bound
    spine = spark.createDataFrame(
        [(i, lows[i], highs[i]) for i in range(len(b) + 1)],
        "bucket int, lo double, hi double",
    )
    j = spine.join(counts, "bucket", "left").select(
        "bucket",
        "lo",
        "hi",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
    )
    tot = j.agg(F.sum("n").cast("bigint").alias("nt"))
    # cumulative over ≤10 rows: triangular count on the bucket spine
    a2 = j.select(F.col("bucket").alias("b2"), F.col("n").alias("n2"))
    cum = (
        j.join(F.broadcast(a2), F.col("b2") <= F.col("bucket"))
        .groupBy("bucket", "lo", "hi", "n")
        .agg(F.sum("n2").cast("bigint").alias("cw"))
        .crossJoin(F.broadcast(tot))
    )
    outs = []
    for q in quantiles:
        target = F.lit(q) * F.col("nt")
        # interpolate inside the hit bucket BEFORE the argmin so the
        # totals stay in scope: fraction = (target - (cw - n)) / n
        pq = F.col("lo") + (F.col("hi") - F.col("lo")) * (
            (target - (F.col("cw") - F.col("n")).cast("double"))
            / F.col("n")
        )
        hit = (
            cum.filter((F.col("cw") >= target) & (F.col("n") > 0))
            .agg(F.min(F.struct("bucket", pq.alias("pq"))).alias("h"))
            .select(F.col("h.pq").alias(f"p{int(q * 100)}"))
        )
        outs.append(hit)
    row = outs[0]
    for o in outs[1:]:
        row = row.crossJoin(F.broadcast(o))
    row = row.crossJoin(F.broadcast(tot))
    # The shift alarm compares against p95 specifically, so asking for
    # it requires 0.95 in `quantiles` — fail loud at call time instead
    # of with an unresolved-column analysis error later.
    if reference_p95 is not None and 0.95 not in quantiles:
        raise ValueError(
            "reference_p95 requires 0.95 in quantiles (the alarm "
            f"reads the p95 column); got quantiles={tuple(quantiles)}"
        )
    alarm = (
        F.lit(False)
        if reference_p95 is None
        else (F.col("nt") > 0) & (F.col("p95") > reference_p95 * alarm_ratio)
    )
    return row.select(
        F.col("nt").alias("n_total"),
        *[
            F.round(f"p{int(q * 100)}", 4).alias(f"p{int(q * 100)}")
            for q in quantiles
        ],
        alarm.alias("latency_alarm"),
    )
