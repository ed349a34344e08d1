"""Round-12 property/brute-force pins for the operator-shaped
queries: the distributed form must equal an independent driver-side
recomputation (the oracle proves cross-engine agreement; these prove
the ALGORITHM, under partitionings and inputs the fixtures don't
exercise).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=300,
    ),
    parts=st.integers(min_value=1, max_value=8),
)
@SET
def test_mergeable_min_k_is_exact(spark, vals, parts):
    """The per-partition partial min-k + k-sized merge (the KMV
    sketch build) must return EXACTLY the global k smallest distinct
    values for any input and any partition count."""
    k = 20
    df = spark.createDataFrame(
        [(v,) for v in vals], "h long"
    ).repartition(parts).distinct()
    part = df.groupBy(F.spark_partition_id().alias("p")).agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("ks")
    )
    merged = (
        part.select(F.explode("ks").alias("h"))
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("ks"))
        .collect()[0]["ks"]
    )
    assert merged == sorted(set(vals))[:k]


def test_skyline_equals_bruteforce(spark, sf_dir):
    """The prefix-max skyline must equal the O(n²) dominance scan."""
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.queries.analytics3 import analytics_skyline_pareto

    got = {
        (r["custkey"], r["n_orders"])
        for r in analytics_skyline_pareto(spark, sf_dir).collect()
    }
    pts = [
        (r["custkey"], r["rev"], r["n_orders"])
        for r in load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .collect()
    ]
    sky = set()
    for ck, rev, no in pts:
        dominated = any(
            (r2 >= rev and n2 >= no and (r2 > rev or n2 > no))
            for _, r2, n2 in pts
        )
        if not dominated:
            sky.add((ck, no))
    assert got == sky


def test_mmr_greedy_matches_python_replay(spark, sf_dir):
    """The unrolled DataFrame greedy must pick the same 5 candidates
    (same order) as a plain Python MMR over the collected pool."""
    from ibd_pipeline_spark.queries.search import (
        _MMR_LAM,
        search_mmr_rerank,
    )

    lam = float(_MMR_LAM)
    rows = search_mmr_rerank(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(r["corpus_id"])

    # rebuild pool + pairwise sims exactly as the query does
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.operators.similarity import as_double_array

    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", as_double_array("embedding").alias("v")
    ).withColumn(
        "nfp",
        F.expr(
            "aggregate(transform(v, x -> CAST(FLOOR(x * x * 1e12) AS"
            " BIGINT)), 0L, (acc, t) -> acc + t)"
        ),
    )
    data = {r["vec_id"]: (r["v"], r["nfp"]) for r in e.collect()}
    import math

    def cos(a, b):
        va, na = data[a]
        vb, nb = data[b]
        dot = sum(
            int(math.floor(x * y * 1e12)) for x, y in zip(va, vb)
        )
        return round(dot / math.sqrt(float(na) * float(nb)), 9)

    for qid in range(3):
        rel = {
            c: cos(qid, c) for c in data if c != qid
        }
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:10]
        sel = []
        # step 1: max rel, ties to lowest cid
        first = min(pool, key=lambda c: (-rel[c], c))
        sel.append(first)
        for _ in range(4):
            cands = [c for c in pool if c not in sel]
            scores = {
                c: lam * rel[c]
                - (1.0 - lam) * max(cos(c, s) for s in sel)
                for c in cands
            }
            pick = min(cands, key=lambda c: (-scores[c], c))
            sel.append(pick)
        assert got[qid] == sel, (qid, got[qid], sel)


def test_chow_and_bp_internal_consistency(spark, sf_dir):
    """Chow: splitting can only reduce total SSE; BP: R² ∈ [0, 1]
    and LM = n·R²."""
    from ibd_pipeline_spark.queries.stats3 import (
        stats_breusch_pagan,
        stats_chow_test,
    )

    c = stats_chow_test(spark, sf_dir).collect()[0]
    assert c["sse_split"] <= c["sse_pooled"] + 1e-6
    assert c["chow_f"] >= 0.0
    assert c["df2"] == c["n_days"] - 4

    b = stats_breusch_pagan(spark, sf_dir).collect()[0]
    assert 0.0 <= b["r2_aux"] <= 1.0
    assert abs(b["bp_lm_stat"] - b["n_days"] * b["r2_aux"]) < 1e-3


def test_abc_partition_and_order(spark, sf_dir):
    """ABC classes partition the customers; class A's per-customer
    revenue share dominates C's."""
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.queries.analytics3 import analytics_abc_classification

    rows = {r["abc_class"]: r for r in
            analytics_abc_classification(spark, sf_dir).collect()}
    n_cust = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows.values()) == n_cust
    if "A" in rows and "C" in rows:
        a, c = rows["A"], rows["C"]
        assert (
            a["class_revenue"] / a["n_customers"]
            > c["class_revenue"] / c["n_customers"]
        )
