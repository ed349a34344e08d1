"""Semantics tests for the UDF family that the sf fixtures don't
exercise: degenerate z-score groups (ADVICE r1 — NaN vs NULL oracle
divergence)."""

from __future__ import annotations


def test_zscore_degenerate_groups_emit_null(spark):
    from ibd_pipeline_spark.queries.udf import zscore_group_fn

    df = spark.createDataFrame(
        [
            (1, 10, 5.0),   # single-row group -> stddev NULL
            (2, 20, 3.0),   # zero-variance group
            (2, 21, 3.0),
            (3, 30, 1.0),   # healthy group
            (3, 31, 2.0),
            (3, 32, 3.0),
        ],
        ["user_id", "event_id", "value"],
    )
    out = (
        df.groupBy("user_id")
        .applyInPandas(zscore_group_fn, "user_id long, event_id long, zscore double")
        .collect()
    )
    z = {r.event_id: r.zscore for r in out}
    assert z[10] is None and z[20] is None and z[21] is None
    assert z[31] == 0.0 and z[30] is not None and z[30] < 0 < z[32]
