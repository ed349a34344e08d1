"""Month-partitioned calendar-window helpers (r11, VERDICT #5).

Day-grain frames (one row per calendar day) are tiny at any realistic
corpus size, but an UNPARTITIONED window over them still serializes
onto one task and trips Spark's `WindowExec: No Partition Defined`
warning — and at planetary scale (decades of days × thousands of
groups) the single task is a real bottleneck. These helpers implement
the documented escape every day-grain query's docstring pointed at
("partition by month + stitch") exactly once:

- `month_stitched_cumsum` — EXACT unbounded prefix sums: within-month
  running totals (window PARTITIONED by month) plus month offsets
  from a months-sized triangular self-join, broadcast back. Sums are
  a monoid, so the stitch is exact for any input, integer sums stay
  order-independent, and no unpartitioned window ever exists in the
  plan.

- `with_month_padding` — BOUNDED frames (lag k / ROWS ±k / RANGE ±k
  days): rows within `pad` days of a month edge are duplicated into
  the neighbor month's partition, the caller runs its bounded window
  PARTITIONED by `_m`, and `_own` filters the duplicates out of the
  output. RANGE-on-days frames are exactly correct for any input;
  ROWS/lag frames are exact whenever the day grain is DENSE inside
  the pad horizon (true of any production event stream and of the
  fixtures — for sparse grains densify with join_date_spine_gapfill
  first, at which point ROWS == RANGE).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def month_stitched_cumsum(
    df: DataFrame,
    day_col: str,
    weight_cols: "list[str]",
    group_cols: "tuple[str, ...] | list[str]" = (),
    prefix: str = "cum_",
) -> DataFrame:
    """df + inclusive running totals ``<prefix><w>`` of each weight
    column under the (group, day) order, with NO unpartitioned
    window: within-month cumsum + broadcast month offsets.

    The offset join is triangular over the months-sized aggregate
    (≤ months × groups rows — metadata-sized), so the whole plan is
    window-partitioned + one broadcast hash join. Exact for any
    input: addition is associative, and integer weights make the
    result bit-identical to a global windowed SUM."""
    group_cols = list(group_cols)
    base = df.withColumn("_m", F.date_trunc("month", F.col(day_col)))
    win = (
        Window.partitionBy(*group_cols, "_m")
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.select(
        "*", *[F.sum(w).over(win).alias(f"_mc_{w}") for w in weight_cols]
    )
    mt = base.groupBy(*group_cols, "_m").agg(
        *[F.sum(w).alias(f"_s_{w}") for w in weight_cols]
    )
    a, b = mt.alias("a"), mt.alias("b")
    cond = F.col("b._m") < F.col("a._m")
    for g in group_cols:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    off = (
        a.join(b, cond, "left")
        .groupBy(
            *[F.col(f"a.{g}").alias(g) for g in group_cols],
            F.col("a._m").alias("_m"),
        )
        .agg(
            *[
                F.coalesce(F.sum(F.col(f"b._s_{w}")), F.lit(0)).alias(
                    f"_off_{w}"
                )
                for w in weight_cols
            ]
        )
    )
    out = within.join(F.broadcast(off), [*group_cols, "_m"])
    for w in weight_cols:
        out = out.withColumn(f"{prefix}{w}", F.col(f"_off_{w}") + F.col(f"_mc_{w}"))
    return out.drop(
        "_m",
        *[f"_mc_{w}" for w in weight_cols],
        *[f"_off_{w}" for w in weight_cols],
    )


def with_month_padding(
    df: DataFrame,
    day_col: str,
    pad_before: int = 0,
    pad_after: int = 0,
) -> DataFrame:
    """df unioned with boundary duplicates so BOUNDED day-grain
    windows can run month-partitioned: returns df + `_m` (the
    partition key) + `_own` (true on original rows). Run your window
    over ``Window.partitionBy("_m").orderBy(<day>)`` (rows or
    range frames up to the pads), then ``filter("_own")`` and drop
    the two helper columns.

    A row in the last `pad_before` days of its month is copied into
    the NEXT month's partition (it sits inside next-month rows'
    trailing frames); a row in the first `pad_after` days is copied
    into the PREVIOUS month's partition (leading frames). Copies are
    `_own = false`: they contribute to frames, never to output."""
    mstart = F.date_trunc("month", F.col(day_col))
    nstart = F.add_months(mstart, 1)
    own = df.withColumn("_m", mstart).withColumn("_own", F.lit(True))
    parts = [own]
    if pad_before:
        parts.append(
            df.filter(
                F.datediff(nstart, F.col(day_col).cast("date")) <= pad_before
            )
            .withColumn("_m", nstart)
            .withColumn("_own", F.lit(False))
        )
    if pad_after:
        parts.append(
            df.filter(
                F.datediff(F.col(day_col).cast("date"), mstart.cast("date"))
                < pad_after
            )
            .withColumn("_m", F.add_months(mstart, -1))
            .withColumn("_own", F.lit(False))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
