"""Streaming Benford first-digit monitor: live leading-digit counters
over a positive amount stream, scored read-side with a chi-square
goodness-of-fit against Benford's law.

The fraud/entry-error tripwire the batch audit (quality_benford_digits)
runs nightly, made LIVE with the bounded-key-space idiom shared by the
drift, burstiness, SRM, and mSPRT monitors: the streaming aggregate
groups by the LEADING DIGIT, so the state store holds at most 9 rows
forever, and the chi-square score + alarm are computed read-side per
readout. Synthetic/templated amounts (a bot posting $500.00 forever,
a broken price-multiplier) bend the first-digit mass away from
log10(1 + 1/d) long before any volume monitor fires.

Reference parity note: the reference pipeline has no data-quality
monitoring of any kind; this belongs to the north-star monitoring
belt (SURVEY §2.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Chi-square survival at df = 8 (9 digits − 1) via the even-df closed
# form exp(-x/2)·Σ_{j<4}(x/2)^j/j! — exact, no approximation.
_DF = 8


def _chi2_sf8(x):
    h = x / 2.0
    series = (
        F.lit(1.0) + h + h * h / 2.0 + h * h * h / 6.0
    )
    return F.exp(-h) * series


def leading_digit(amount_col: str = "value"):
    """First significant digit of a positive amount, engine-portable:
    digit = floor(x / 10^floor(log10(x))). NULL for non-positive or
    NULL amounts (filtered out of the counter)."""
    x = F.col(amount_col)
    return F.when(
        x > 0,
        F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int"),
    )


def digit_traffic(events: DataFrame, amount_col: str = "value") -> DataFrame:
    """Streaming (or batch — same expression) per-digit counter:
    (digit, n) with at most 9 state rows. outputMode 'complete'
    re-emits the tiny counter each trigger."""
    return (
        events.select(leading_digit(amount_col).alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def benford_report(counts: DataFrame, alarm_p: float = 0.001) -> DataFrame:
    """Read-side Benford score over a (digit, n) counter table:
    chi-square goodness-of-fit against p_d = log10(1 + 1/d), exact
    even-df survival at df = 8, alarm at the monitoring-grade strict
    p < 0.001 (the SRM monitor's bar — this too is read continuously,
    so the false-positive budget must be strict).

    A digit with zero traffic is restored by the 9-row spine join so
    a degenerate stream (every amount starting with the same digit)
    alarms instead of shrinking the table (the dead-arm lesson,
    streaming/srm.py). Off-spine digits cannot occur by construction
    (leading_digit yields 1..9 for positive amounts)."""
    spark = counts.sparkSession
    spine_rows = [(d, float(__import__("math").log10(1.0 + 1.0 / d))) for d in range(1, 10)]
    spine = spark.createDataFrame(spine_rows, "digit int, p double")
    j = spine.join(counts, "digit", "left").select(
        "digit", "p", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    tot = j.agg(F.sum("n").cast("bigint").alias("nt"))
    terms = j.crossJoin(F.broadcast(tot)).select(
        "n",
        "nt",
        (F.col("p") * F.col("nt")).alias("expected"),
    )
    chi = terms.agg(
        F.max("nt").alias("n_total"),
        F.sum(
            F.when(
                F.col("expected") > 0,
                (F.col("n") - F.col("expected"))
                * (F.col("n") - F.col("expected"))
                / F.col("expected"),
            ).otherwise(F.lit(0.0))
        ).alias("chi2"),
    )
    p = F.when(F.col("chi2") > 0, _chi2_sf8(F.col("chi2"))).otherwise(
        F.lit(1.0)
    )
    return chi.select(
        "n_total",
        F.lit(_DF).alias("df"),
        F.round("chi2", 6).alias("chi2"),
        F.round(p, 8).alias("p_value"),
        ((F.col("n_total") > 0) & (p < alarm_p)).alias("benford_alarm"),
    )
