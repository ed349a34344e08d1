"""Streaming distribution-drift monitor: a fixed-bin value histogram
maintained live by a streaming aggregation, scored read-side against
a frozen baseline with PSI (population stability index).

Like the streaming CMS (sketch_stream.py) and the freshness monitor
(monitor.py), this is an UNBOUNDED aggregation made safe by a bounded
key space: values are bucketed into a FIXED number of bins BEFORE the
groupBy, so the state store holds at most `bins` rows forever — no
watermark, no TTL, and the histogram is exactly mergeable across
restarts. The drift score is computed read-side (one tiny join per
readout), so the streaming state stays pure counts — the same
separation the batch PSI query (quality_psi_drift) uses.

The binning and PSI expressions are shared between the streaming and
batch paths — the stream-equals-batch test in
tests/test_streaming_drift.py holds by construction, plus an
end-to-end planted-drift alarm test.

Reference parity note: the reference pipeline has no drift readout —
a sensor whose value distribution silently shifts (the simulation's
oscillation drift, weather-producer.py:109-113) flows straight to the
dashboard. This operator is the alarm for that failure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def value_bin(value_col: str, bins: int = 32, lo: float = 0.0, hi: float = 100.0):
    """Fixed-width bin index in [0, bins-1], clamping outliers into
    the edge bins — the key-space bound that makes the streaming
    aggregate's state finite."""
    raw = F.floor(
        (F.col(value_col) - F.lit(lo)) / F.lit(hi - lo) * F.lit(bins)
    )
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")


def binned_histogram(
    events: DataFrame,
    value_col: str = "value",
    bins: int = 32,
    lo: float = 0.0,
    hi: float = 100.0,
) -> DataFrame:
    """Streaming (or batch — same expression) fixed-bin histogram:
    (bin, n) with at most `bins` state rows. outputMode 'update'
    emits only bins whose count advanced; 'complete' re-emits the
    whole histogram (bin-count-sized)."""
    return events.groupBy(
        value_bin(value_col, bins, lo, hi).alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


def psi_report(
    current: DataFrame,
    baseline: DataFrame,
    bins: int = 32,
    alarm_at: float = 0.2,
) -> DataFrame:
    """Read-side PSI of the live histogram vs a frozen baseline
    histogram (both (bin, n)): PSI = Σ (p−q)·ln(p/q) with the
    standard 0.5-count smoothing on empty bins so the score stays
    finite. Returns ONE row: total counts, psi, and the alarm at the
    industry 0.2 threshold. Join cost is ≤ `bins` rows — the
    monitoring readout, not a data-sized job.

    An EMPTY side (n_current = 0 or n_baseline = 0) leaves psi NULL
    (the divergence is undefined without a distribution) but forces
    drift_alarm TRUE: a total outage of the monitored stream is the
    biggest drift of all, and a NULL alarm would silently read as
    not-alarmed in downstream boolean checks (ADVICE r9)."""
    spine = current.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    j = (
        spine.join(
            current.withColumnRenamed("n", "n_cur"), "bin", "left"
        )
        .join(baseline.withColumnRenamed("n", "n_base"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_cur", F.lit(0)).cast("double").alias("c"),
            F.coalesce("n_base", F.lit(0)).cast("double").alias("b"),
        )
    )
    tot = j.agg(
        F.sum("c").alias("ct"), F.sum("b").alias("bt")
    )
    # try_divide: an empty side (total 0) yields NULL ratios — psi
    # stays NULL and the alarm coalesces TRUE below — instead of an
    # ANSI DIVIDE_BY_ZERO abort of the whole monitor (ADVICE r9).
    p_cur = F.try_divide(F.greatest("c", F.lit(0.5)), F.col("ct"))
    p_base = F.try_divide(F.greatest("b", F.lit(0.5)), F.col("bt"))
    w = j.crossJoin(F.broadcast(tot)).select(
        # 0.5-count smoothing keeps ln finite on empty bins
        (p_cur - p_base).alias("dp"),
        F.log(p_cur / p_base).alias("lr"),
        F.col("ct"),
        F.col("bt"),
    )
    return w.agg(
        F.max("ct").cast("bigint").alias("n_current"),
        F.max("bt").cast("bigint").alias("n_baseline"),
        F.round(
            F.sum((F.col("dp") * F.col("lr")).cast("decimal(28,8)")), 6
        )
        .cast("double")
        .alias("psi"),
        F.coalesce(
            F.sum((F.col("dp") * F.col("lr")).cast("decimal(28,8)"))
            .cast("double")
            > F.lit(alarm_at),
            # empty current or baseline → psi NULL → alarm, not silence
            F.lit(True),
        ).alias("drift_alarm"),
    )
