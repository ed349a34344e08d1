"""Round-13 property/brute-force pins: the distributed rank-spine
constructions (Wilcoxon signed-rank, Jonckheere–Terpstra) must equal
an independent O(n²)/driver-side recomputation on arbitrary small
inputs and partitionings; Cochran's Q must satisfy its algebraic
identities (reduction to McNemar's uncorrected χ² at k = 2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _wilcoxon_bruteforce(diffs):
    """2·W⁺ with mid-ranks over |d|, zeros dropped, pure Python."""
    ds = [d for d in diffs if d != 0]
    if not ds:
        return 0, 0
    by_abs = sorted(ds, key=abs)
    n = len(by_abs)
    # mid-ranks: for each tie group of |d|, rank = average position
    w2 = 0
    i = 0
    while i < n:
        j = i
        while j < n and abs(by_abs[j]) == abs(by_abs[i]):
            j += 1
        # positions i+1..j (1-based), 2·avg = (i+1) + j
        two_avg = (i + 1) + j
        for k in range(i, j):
            if by_abs[k] > 0:
                w2 += two_avg
        i = j
    return w2, n


@given(
    diffs=st.lists(
        st.integers(min_value=-8, max_value=8), min_size=1, max_size=120
    ),
    parts=st.integers(min_value=1, max_value=6),
)
@SET
def test_wilcoxon_rank_spine_matches_bruteforce(spark, diffs, parts):
    """The distinct-|d| prefix-sum identity Σ cpos·(2·cum − t + 1)
    must equal the brute-force mid-rank 2·W⁺ for any diff multiset
    and any partitioning (heavy ties included by construction)."""
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    expected_w2, expected_n = _wilcoxon_bruteforce(diffs)
    df = spark.createDataFrame(
        [(d,) for d in diffs], "d long"
    ).repartition(parts).filter(F.col("d") != 0)
    if expected_n == 0:
        assert df.count() == 0
        return
    pv = df.groupBy(F.abs(F.col("d")).alias("ad")).agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("cpos"),
        F.count(F.lit(1)).alias("t"),
    )
    cum = with_global_prefix_sums(pv, ["ad"], ["t"])
    row = cum.agg(
        F.sum(
            F.col("cpos") * (2 * F.col("_cum_t") - F.col("t") + F.lit(1))
        ).alias("w2"),
        F.sum("t").alias("n"),
    ).collect()[0]
    assert (row["w2"], row["n"]) == (expected_w2, expected_n)


def _jt_bruteforce(pairs):
    """2·JT = Σ_{i<j groups} [2·#{x<y} + #{x=y}] over group pairs."""
    from collections import defaultdict

    groups = defaultdict(list)
    for g, v in pairs:
        groups[g].append(v)
    order = sorted(groups)
    jt2 = 0
    for a in range(len(order)):
        for b in range(a + 1, len(order)):
            for x in groups[order[a]]:
                for y in groups[order[b]]:
                    if x < y:
                        jt2 += 2
                    elif x == y:
                        jt2 += 1
    return jt2


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=2,
        max_size=80,
    ),
    parts=st.integers(min_value=1, max_value=6),
)
@SET
def test_jt_prefix_scan_matches_bruteforce(spark, pairs, parts):
    """The per-value fold 2·c_j·(cum_i − c_i) + c_i·c_j summed over
    the three ordered group pairs must equal the O(n²) pairwise
    precedence count for any grouping and any partitioning."""
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    expected = _jt_bruteforce(pairs)
    df = spark.createDataFrame(pairs, "g int, v long").repartition(parts)
    pv = df.groupBy("v").agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("g") == 2, 1).otherwise(0)).alias("c2"),
        F.sum(F.when(F.col("g") == 3, 1).otherwise(0)).alias("c3"),
    )
    cum = with_global_prefix_sums(pv, ["v"], ["c1", "c2"])
    m1, m2 = F.col("_cum_c1"), F.col("_cum_c2")
    row = cum.agg(
        F.sum(
            2 * F.col("c2") * (m1 - F.col("c1"))
            + F.col("c1") * F.col("c2")
            + 2 * F.col("c3") * (m1 - F.col("c1"))
            + F.col("c1") * F.col("c3")
            + 2 * F.col("c3") * (m2 - F.col("c2"))
            + F.col("c2") * F.col("c3")
        ).alias("jt2")
    ).collect()[0]
    assert row["jt2"] == expected


def test_cochran_q_reduces_to_mcnemar_at_k2():
    """At k = 2, Q = (b − c)²/(b + c) — McNemar's uncorrected χ².
    Verify the integer-sum form [k(k−1)ΣCⱼ² − (k−1)T²]/(kT − ΣRᵤ²)
    against that identity on exhaustive small tables."""
    import itertools

    for rows in itertools.product([(0, 0), (0, 1), (1, 0), (1, 1)], repeat=5):
        b = sum(1 for r in rows if r == (1, 0))
        c = sum(1 for r in rows if r == (0, 1))
        if b + c == 0:
            continue
        k = 2
        t = sum(x + y for x, y in rows)
        sr2 = sum((x + y) ** 2 for x, y in rows)
        c1 = sum(x for x, _ in rows)
        c2 = sum(y for _, y in rows)
        sc2 = c1 * c1 + c2 * c2
        q = (k * (k - 1) * sc2 - (k - 1) * t * t) / (k * t - sr2)
        assert abs(q - (b - c) ** 2 / (b + c)) < 1e-12, (rows, q, b, c)


def test_variance_ratio_is_one_for_random_walk_increments():
    """A pure random-walk construction (iid increments) gives
    VR ≈ 1 + ρ₁, and exactly 1 when increments are exactly
    uncorrelated by construction — use an alternating ±1 series to
    pin the OTHER extreme (ρ₁ = −1 → 2-period increments all zero →
    VR = 0): validates the moment algebra end to end."""
    xs = [0]
    for i in range(100):
        xs.append(xs[-1] + (1 if i % 2 == 0 else -1))
    inc1 = [xs[i] - xs[i - 1] for i in range(1, len(xs))]
    inc2 = [xs[i] - xs[i - 2] for i in range(2, len(xs))]

    def mle_var(v):
        m = len(v)
        s1 = sum(v)
        s2 = sum(x * x for x in v)
        return (s2 - s1 * s1 / m) / m

    v1, v2 = mle_var(inc1), mle_var(inc2)
    assert abs(v1 - 1.0) < 1e-9  # ±1 increments, mean ~0
    assert v2 < 0.05  # alternating walk: 2-period increments ≈ 0
    assert v2 / (2 * v1) < 0.05
