"""Hypothesis property tests for the block-stitched window-free
helpers (operators/calendar.py) — the machinery every day-grain
cumulative query rides. Added after the r11 sf0.1 incident: the
offset add silently shed a decimal scale digit ((38,s) + (38,s) →
(38,s−1)), which no query-level test at the smaller fixtures could
see. These tests pin the helper DIRECTLY:

  * exact-value parity with a Python running total, for BIGINT and
    for high-scale DECIMAL weights, across block boundaries;
  * the decimal SCALE of the cumsum equals the input scale (the
    regression pin for the fix);
  * running min/max parity for the extreme stitch, including the
    all-NULL prefix.
"""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# order keys spanning several 8-wide blocks, with duplicates possible
# squeezed out (the helper contract is one row per (group, day))
days = st.integers(min_value=0, max_value=40)


@st.composite
def weighted_rows(draw):
    ds = sorted(set(draw(st.lists(days, min_size=1, max_size=20))))
    ws = [
        draw(st.integers(min_value=-(10**6), max_value=10**6)) for _ in ds
    ]
    return list(zip(ds, ws))


@given(weighted_rows())
@SET
def test_stitched_cumsum_bigint_matches_python(spark, rows):
    from ibd_pipeline_spark.operators.calendar import month_stitched_cumsum

    df = spark.createDataFrame(rows, "d long, w long")
    out = month_stitched_cumsum(
        df, "d", ["w"], block=F.floor(F.col("d") / 8)
    )
    got = {r["d"]: r["cum_w"] for r in out.collect()}
    acc = 0
    for d, w in rows:
        acc += w
        assert got[d] == acc, (d, got[d], acc)


@given(weighted_rows())
@SET
def test_stitched_cumsum_decimal_keeps_scale_and_value(spark, rows):
    from pyspark.sql.types import DecimalType

    from ibd_pipeline_spark.operators.calendar import month_stitched_cumsum

    # 8-dp decimals whose exact sum needs all 8 digits — the r11
    # incident class: a shed digit flips the last decimal place
    dec_rows = [(d, Decimal(w) / Decimal(10**8)) for d, w in rows]
    df = spark.createDataFrame(dec_rows, "d long, w decimal(28,8)")
    out = month_stitched_cumsum(
        df, "d", ["w"], block=F.floor(F.col("d") / 8)
    )
    cum_type = dict(out.dtypes)["cum_w"]
    field = [f for f in out.schema.fields if f.name == "cum_w"][0]
    assert isinstance(field.dataType, DecimalType), cum_type
    assert field.dataType.scale == 8, (
        f"stitched cumsum shed scale: input (28,8) -> {cum_type}"
    )
    got = {r["d"]: r["cum_w"] for r in out.collect()}
    acc = Decimal(0)
    for d, w in dec_rows:
        acc += w
        assert got[d] == acc, (d, got[d], acc)


def test_stitched_cumsum_decimal_overflow_is_loud(spark):
    """ADVICE r11: a running total exceeding the documented
    10^(37-s) bound must raise, not silently NULL the cumsum."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from ibd_pipeline_spark.operators.calendar import month_stitched_cumsum

    # 10^35 fits the (38,2) source type but not the (37,2) re-bound
    big = Decimal(10) ** 35
    df = spark.createDataFrame(
        [(1, big), (2, big), (3, big)], "d long, w decimal(38,2)"
    )
    out = month_stitched_cumsum(
        df, "d", ["w"], block=F.floor(F.col("d") / 2)
    )
    with pytest.raises(Exception) as ei:
        out.collect()
    msg = str(ei.value)
    assert ("overflow" in msg.lower()) or ("cannot be represented" in msg), msg


@st.composite
def extreme_rows(draw):
    ds = sorted(set(draw(st.lists(days, min_size=1, max_size=20))))
    vs = [
        draw(
            st.one_of(
                st.none(), st.integers(min_value=-1000, max_value=1000)
            )
        )
        for _ in ds
    ]
    return list(zip(ds, vs))


@given(extreme_rows())
@SET
def test_stitched_running_extreme_matches_python(spark, rows):
    from ibd_pipeline_spark.operators.calendar import (
        month_stitched_running_extreme,
    )

    df = spark.createDataFrame(rows, "d long, v long")
    out = month_stitched_running_extreme(
        df, "d", "v", "rmin", kind="min", block=F.floor(F.col("d") / 8)
    )
    got = {r["d"]: r["rmin"] for r in out.collect()}
    best = None
    for d, v in rows:
        if v is not None:
            best = v if best is None else min(best, v)
        assert got[d] == best, (d, got[d], best)
