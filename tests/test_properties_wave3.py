"""Hypothesis property tests for the wave-3 primitives (SURVEY §5.4
style): randomized inputs vs brute-force Python oracles — BPE greedy
merge, nucleus top-p cut, A-Res weighted sampling, and the KS
statistic. The DuckDB oracles already pin these on the fixtures;
these tests cover the edge geometry fixtures can't (empty arrays,
all-equal weights, single-element groups, total ties).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

syms = st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12)


def _merge_py(toks, a, b, sep):
    out = []
    for x in toks:
        if out and out[-1] == a and x == b:
            out[-1] = f"{a}{sep}{b}"
        else:
            out.append(x)
    return out


@given(st.lists(syms, min_size=1, max_size=6),
       st.sampled_from(["a", "b", "c"]), st.sampled_from(["a", "b", "c"]))
@SET
def test_merge_pair_matches_python_fold(spark, docs, a, b):
    from ibd_pipeline_spark.operators.bpe import MERGE_SEP, merge_pair

    df = spark.createDataFrame([(d,) for d in docs], "syms array<string>")
    got = [
        r["m"]
        for r in df.select(
            merge_pair(F.col("syms"), F.lit(a), F.lit(b)).alias("m")
        ).collect()
    ]
    want = [_merge_py(d, a, b, MERGE_SEP) for d in docs]
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


@st.composite
def weighted_rows(draw):
    n = draw(st.integers(1, 20))
    return [
        (i, draw(st.sampled_from(["s1", "s2"])), draw(st.integers(1, 50)))
        for i in range(n)
    ]


@given(weighted_rows())
@SET
def test_nucleus_cut_matches_python(spark, rows):
    """Replicates train_nucleus_topp_per_source's exact-integer rule
    on random data: keep while 10·(cum−mass) < 9·tot in desc-mass,
    asc-id order."""
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "doc_id long, source string, mass long")
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("mass").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("source")
    kept = (
        df.select(
            "doc_id",
            "source",
            "mass",
            F.sum("mass").over(w_cum).alias("cum"),
            F.sum("mass").over(w_all).alias("tot"),
        )
        .filter(10 * (F.col("cum") - F.col("mass")) < 9 * F.col("tot"))
    )
    got = {(r["source"], r["doc_id"]) for r in kept.collect()}

    want = set()
    for src in {r[1] for r in rows}:
        grp = sorted((r for r in rows if r[1] == src), key=lambda r: (-r[2], r[0]))
        tot = sum(r[2] for r in grp)
        cum = 0
        for r in grp:
            if 10 * cum < 9 * tot:
                want.add((src, r[0]))
            cum += r[2]
    assert got == want
    # invariant: kept mass reaches the 90% threshold unless the group
    # is fully kept
    for src in {r[1] for r in rows}:
        tot = sum(r[2] for r in rows if r[1] == src)
        kept_mass = sum(r[2] for r in rows if r[1] == src and (src, r[0]) in want)
        n_grp = sum(1 for r in rows if r[1] == src)
        n_kept = sum(1 for s, _ in want if s == src)
        assert 10 * kept_mass >= 9 * tot or n_kept == n_grp


@given(weighted_rows())
@SET
def test_ares_topk_matches_python(spark, rows):
    """A-Res selection is a pure function of (doc_id, weight): the
    Spark window top-3 must equal the Python computation of the same
    md5-derived scores."""
    import hashlib

    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "doc_id long, source string, mass long")
    u_col = (
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            + 1
        )
        / F.lit(4294967297.0)
    )
    w = Window.partitionBy("source").orderBy(
        (-F.log(u_col) / F.col("mass").cast("double")), "doc_id"
    )
    got = {
        (r["source"], r["doc_id"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    }

    def score(doc_id, mass):
        u = (int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 1) / 4294967297.0
        return -math.log(u) / float(mass)

    want = set()
    for src in {r[1] for r in rows}:
        grp = sorted(
            (r for r in rows if r[1] == src),
            key=lambda r: (score(r[0], r[2]), r[0]),
        )
        want |= {(src, r[0]) for r in grp[:3]}
    assert got == want


@st.composite
def two_samples(draw):
    a = draw(st.lists(st.integers(0, 9), min_size=1, max_size=25))
    b = draw(st.lists(st.integers(0, 9), min_size=1, max_size=25))
    return a, b


@given(two_samples())
@SET
def test_ks_scaled_statistic_matches_python(spark, data):
    """The integer-scaled KS statistic (stats_ks_two_sample's core)
    vs a brute-force ECDF computation."""
    from pyspark.sql import Window

    a, b = data
    rows = [(float(v), "purchase") for v in a] + [(float(v), "click") for v in b]
    df = spark.createDataFrame(rows, "value double, event_type string")
    per = df.groupBy(F.col("value").alias("v")).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c2"),
    )
    w_run = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = per.select(
        F.sum("c1").over(w_run).alias("cum1"),
        F.sum("c2").over(w_run).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    scaled = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    got = cum.agg(F.max(scaled)).collect()[0][0]

    n1, n2 = len(a), len(b)
    support = sorted(set(a) | set(b))
    want = max(
        abs(sum(1 for x in a if x <= v) * n2 - sum(1 for x in b if x <= v) * n1)
        for v in support
    )
    assert got == want


@st.composite
def waterfill_inputs(draw):
    n = draw(st.integers(1, 8))
    rows = [
        (f"s{i}", draw(st.integers(10, 500)), draw(st.integers(1, 4)))
        for i in range(n)
    ]
    budget_x10 = draw(st.integers(5, 60))  # 0.5x .. 6x of total weight
    return rows, budget_x10


@given(waterfill_inputs())
@SET
def test_waterfill_invariants(spark, data):
    """The waterfill allocation (train_epoch_waterfill's core) on
    random inputs: never exceeds a source's cap, exhausts the budget
    up to integer flooring loss (< n tokens) whenever the budget is
    below total caps, allocates every cap when the budget covers
    them, and uncapped sources share one water level (equal
    epochs ±rounding)."""
    from pyspark.sql import Window

    rows, bx10 = data
    df = spark.createDataFrame(rows, "source string, w long, e_max long")
    tot_w = sum(r[1] for r in rows)
    b = (bx10 * tot_w) // 10
    budgeted = df.withColumn("b", F.lit(b)).withColumn(
        "cap", F.col("w") * F.col("e_max")
    )
    w_cum = Window.orderBy("e_max", "source").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_rest_w = Window.orderBy("e_max", "source").rowsBetween(
        0, Window.unboundedFollowing
    )
    ranked = budgeted.select(
        "*",
        F.sum("cap").over(w_cum).alias("capsum_incl"),
        F.sum("w").over(w_rest_w).alias("w_from_here"),
    )
    lvl = ranked.filter(
        F.col("b") - (F.col("capsum_incl") - F.col("cap"))
        < F.col("e_max") * F.col("w_from_here")
    ).agg(
        F.min(F.col("capsum_incl") - F.col("cap")).alias("capsum_before"),
        F.min_by(
            F.col("w_from_here"), F.col("capsum_incl") - F.col("cap")
        ).alias("w_rest"),
    )
    r = ranked.crossJoin(F.broadcast(lvl))
    alloc = (
        F.when(F.col("capsum_before").isNull(), F.col("cap"))
        .when(
            F.col("capsum_incl") - F.col("cap") < F.col("capsum_before"),
            F.col("cap"),
        )
        .otherwise(
            F.expr("CAST(w * (b - capsum_before) DIV w_rest AS BIGINT)")
        )
    )
    out = r.select("source", "w", "e_max", "cap", alloc.alias("a")).collect()

    total_caps = sum(x[1] * x[2] for x in rows)
    got = {o["source"]: o for o in out}
    assert len(got) == len(rows)
    for o in out:
        assert 0 <= o["a"] <= o["cap"], o
    allocated = sum(o["a"] for o in out)
    if b >= total_caps:
        assert allocated == total_caps
        assert all(o["a"] == o["cap"] for o in out)
    else:
        # budget met up to flooring loss (< one token per source)
        assert b - len(rows) < allocated <= b
        # uncapped sources share the water level: a/w within 1/w of
        # each other → cross-difference |a_i w_j − a_j w_i| ≤ w_i w_j
        unc = [o for o in out if o["a"] < o["cap"]]
        for i in unc:
            for j in unc:
                assert abs(i["a"] * j["w"] - j["a"] * i["w"]) <= i["w"] * j["w"]
