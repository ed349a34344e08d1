"""Round-10 query invariants beyond the DuckDB oracle parity:
independent Python recomputations and planted-fixture checks."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import all_queries


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    sf = tmp_path / "sf"
    sf.mkdir()
    df.write.parquet(str(sf / "documents.parquet"))
    return str(sf)


def test_prefix_filter_jaccard_equals_bruteforce(spark, tmp_path):
    """Prefix filtering is EXACT: on a planted corpus the query's pair
    set equals a brute-force all-pairs shingle-Jaccard at the same
    threshold — zero false negatives (the pigeonhole guarantee) and
    zero false positives (the verify step)."""
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = [
        (0, base, "s"),
        (1, base + " tonight", "s"),  # near-dup of 0
        (2, "completely different words compose this other document text", "s"),
        (3, base.replace("fox", "cat"), "s"),  # near-dup of 0
        (4, "one two three four five six seven eight nine ten", "s"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r["id_a"], r["id_b"])
        for r in all_queries()["dedup_prefix_filter_jaccard"](spark, sf).collect()
    }

    def sh(text):
        w = text.split(" ")
        if len(w) < 3:
            return {text}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = sh(rows[i][1]), sh(rows[j][1])
            if 5 * len(a & b) >= 3 * len(a | b):
                want.add((rows[i][0], rows[j][0]))
    assert got == want and want  # the fixture must plant at least one


def test_pq_codes_centroids_self_quantize(spark, sf_dir):
    """A vector that IS a centroid (one of the 16 lowest vec_ids)
    quantizes to itself in every subspace with zero error."""
    out = {
        r["vec_id"]: r
        for r in all_queries()["similarity_pq_codes"](spark, sf_dir).collect()
    }
    cents = sorted(out)[:16]
    for cid in cents:
        r = out[cid]
        assert r["quant_err"] == 0.0, r
        for s in range(8):
            assert r[f"c{s}"] == cid, (cid, s, r)
    # non-centroid errors are non-negative and codes live in the
    # centroid id set
    cset = set(cents)
    for r in out.values():
        assert r["quant_err"] >= 0.0
        assert all(r[f"c{s}"] in cset for s in range(8))


def test_shapley_efficiency_and_python_twin(spark, sf_dir):
    """Shapley axioms on the real fixture: Σφᵢ = v(N) − v(∅)
    (efficiency, in exact 24ths) and every φᵢ matches an independent
    Python lattice computation from the same mask counts."""
    rows = all_queries()["analytics_shapley_attribution"](spark, sf_dir).collect()
    got = {r["channel"]: r["shapley_x24"] for r in rows}

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    masks: dict[int, int] = {}
    for uid, grp in pdf.groupby("user_id"):
        mask = 0
        for et in grp["event_type"]:
            if et == "purchase":
                masks[mask] = masks.get(mask, 0) + 1
                break
            mask |= bits.get(et, 0)

    def v(S):
        return sum(c for m, c in masks.items() if (m | S) == S)

    w24 = {0: 6, 1: 2, 2: 2, 3: 6}
    want = {}
    for ch, bit in bits.items():
        tot = 0
        for S in range(16):
            if S & bit:
                continue
            tot += w24[bin(S).count("1")] * (v(S | bit) - v(S))
        want[ch] = tot
    assert got == want
    assert sum(got.values()) == 24 * (v(15) - v(0))


def test_spearman_matches_python(spark, sf_dir):
    """Engine Spearman equals a direct Python tie-averaged-rank
    computation over the same rows."""
    rows = all_queries()["stats_spearman_corr"](spark, sf_dir).collect()
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_linestatus", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for r in rows:
        g = li[li["l_linestatus"] == r["l_linestatus"]]
        rx = g["l_quantity"].rank(method="average")
        ry = g["l_extendedprice"].rank(method="average")
        rho = rx.corr(ry)  # pearson over average ranks == spearman
        assert abs(r["spearman_rho"] - rho) < 1e-4, (r, rho)


def test_trimmed_mean_matches_python(spark, sf_dir):
    rows = all_queries()["stats_trimmed_mean"](spark, sf_dir).collect()
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .toPandas()
    )
    for r in rows:
        v = sorted(li[li["l_returnflag"] == r["l_returnflag"]]["l_extendedprice"])
        n = len(v)
        lo = int(math.floor(0.1 * n))
        core = v[lo : n - lo]
        tm = sum(core) / (n - 2 * lo)
        wm = (sum(core) + lo * v[lo] + lo * v[n - lo - 1]) / n
        assert abs(r["trimmed_mean"] - tm) < 1e-2, (r, tm)
        assert abs(r["winsorized_mean"] - wm) < 1e-2, (r, wm)


def test_anova_matches_python(spark, sf_dir):
    r = all_queries()["stats_anova_oneway"](spark, sf_dir).collect()[0]
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .toPandas()
    )
    groups = [g["l_extendedprice"].values for _, g in li.groupby("l_returnflag")]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(g.sum() for g in groups) / n
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k_groups"] == k and r["n"] == n
    assert abs(r["f_stat"] - f) / max(f, 1e-9) < 1e-3, (r["f_stat"], f)
    assert abs(r["eta_squared"] - ssb / (ssb + ssw)) < 1e-4


def test_srm_balanced_split(spark, sf_dir):
    """The md5 split must not itself trip SRM on clean data, and the
    counts must cover every distinct unit exactly once."""
    r = all_queries()["ab_srm_check"](spark, sf_dir).collect()[0]
    n_units = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert r["n_a"] + r["n_b"] == n_units
    assert r["chi2"] >= 0.0
    assert r["srm_alarm"] is False  # a fair hash split must pass its own audit


def test_overlap_depth_planted_fixture(spark, tmp_path):
    """Known layout: orderkeys 0..63 → 64 one-order files at 64
    distinct dates (depth 1 everywhere) PLUS keys 64..127 re-hitting
    the same files widens every file to the full range (max depth =
    n_files)."""
    import datetime

    rows = []
    d0 = datetime.datetime(2024, 1, 1)
    # one order per file, one distinct date per file -> zero overlap
    for kk in range(64):
        rows.append((kk, kk, d0 + datetime.timedelta(days=kk), 1.0))
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp, o_totalprice double"
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.write.parquet(str(sf / "orders.parquet"))
    r = all_queries()["maintenance_file_overlap_depth"](spark, str(sf)).collect()[0]
    assert r["n_files"] == 64
    assert r["max_depth"] == 1 and r["avg_open_depth"] == 1.0


def test_heaps_fit_is_sublinear_and_sound(spark, sf_dir):
    r = all_queries()["text_heaps_law"](spark, sf_dir).collect()[0]
    assert 0.0 < r["heaps_b"] <= 1.0  # vocabulary grows sublinearly
    assert 0.0 <= r["r_squared"] <= 1.0
    assert r["vocab"] <= r["n_tokens"]
    # the fitted curve roughly reproduces the endpoint
    pred = math.exp(r["heaps_logk"]) * r["n_tokens"] ** r["heaps_b"]
    assert 0.5 * r["vocab"] <= pred <= 2.0 * r["vocab"]


def test_levene_matches_python(spark, sf_dir):
    """Engine Brown-Forsythe W equals a direct Python computation
    (ANOVA F over |x - group median|, medians rounded to 4 decimals
    exactly as the query does)."""
    r = all_queries()["stats_levene_test"](spark, sf_dir).collect()[0]
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .toPandas()
    )
    zs = []
    for _, g in li.groupby("l_returnflag"):
        med = round(g["l_extendedprice"].quantile(0.5, interpolation="linear"), 4)
        zs.append((g["l_extendedprice"] - med).abs().values)
    n = sum(len(z) for z in zs)
    k = len(zs)
    grand = sum(z.sum() for z in zs) / n
    ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    w = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k_groups"] == k and r["n"] == n
    assert abs(r["levene_w"] - w) / max(w, 1e-9) < 1e-3, (r["levene_w"], w)


def test_ivfpq_recall_vs_bruteforce(spark, sf_dir):
    """IVF-PQ with exact rerank recovers most of the exact top-5: the
    composed index's recall against similarity_bruteforce_topk stays
    above the IVF-alone floor (shared probe mechanics), and every
    returned neighbor's cosine matches the exact query's value for
    that pair (the rerank IS exact)."""
    qs = all_queries()
    exact = {}
    for r in qs["similarity_bruteforce_topk"](spark, sf_dir).collect():
        exact.setdefault(r["query_id"], {})[r["corpus_id"]] = r["cosine_sim"]
    got = qs["similarity_ivfpq_topk"](spark, sf_dir).collect()
    hits = sum(1 for r in got if r["corpus_id"] in exact[r["query_id"]])
    assert hits >= 0.5 * len(got), (hits, len(got))
    for r in got:
        want = exact[r["query_id"]].get(r["corpus_id"])
        if want is not None:
            assert r["cosine_sim"] == want, r


def test_mann_kendall_matches_python(spark, sf_dir):
    r = all_queries()["stats_mann_kendall"](spark, sf_dir).collect()[0]
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date(F.date_trunc("day", "o_orderdate")).alias("day"))
        .count()
        .orderBy("day")
        .toPandas()
    )
    xs = list(d["count"])
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(xs)
    tt = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
    z = (s - 1) / var**0.5 if s > 0 else (s + 1) / var**0.5 if s < 0 else 0.0
    assert r["n_days"] == n and r["s_stat"] == s
    assert abs(r["z_stat"] - z) < 1e-5, (r["z_stat"], z)


def test_benjamini_hochberg_properties(spark, sf_dir):
    """BH structural invariants: rejections form a prefix of the
    p-value order, the BH inequality holds exactly at every rejected
    rank, and p-values agree with scipy-free Python normal tails."""
    rows = all_queries()["stats_benjamini_hochberg"](spark, sf_dir).collect()
    m = len(rows)
    by_rank = sorted(rows, key=lambda r: r["p_rank"])
    assert [r["p_rank"] for r in by_rank] == list(range(1, m + 1))
    # monotone p along rank; rejected = prefix
    ps = [r["p_value"] for r in by_rank]
    assert ps == sorted(ps)
    flags = [r["rejected"] for r in by_rank]
    assert all(a or not b for a, b in zip(flags, flags[1:]))  # prefix
    for r in by_rank:
        if r["rejected"]:
            kmax = max(x["p_rank"] for x in by_rank if x["rejected"])
            assert r["p_rank"] <= kmax
    # the boundary rank satisfies p <= k*q/m
    rejected = [r for r in by_rank if r["rejected"]]
    if rejected:
        k = rejected[-1]["p_rank"]
        assert rejected[-1]["p_value"] * m * 10 <= k * 1 + 1e-9
    # python twin of the normal tail for a couple of rows
    import math as _m

    for r in by_rank[:3]:
        z = r["z_stat"]
        kk = 1.0 / (1.0 + 0.2316419 * z)
        poly = ((((1.330274429 * kk - 1.821255978) * kk + 1.781477937) * kk
                 - 0.356563782) * kk + 0.319381530) * kk
        tail = 0.3989422804014327 * _m.exp(-0.5 * z * z) * poly
        assert abs(r["p_value"] - round(2 * tail, 8)) < 2e-6, r


def test_asof_nearest_tolerance_and_ties(spark, tmp_path):
    """Planted fixture: backward/forward picks, the exact-tie rule
    (backward wins), and the tolerance null-out."""
    import datetime

    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)

    def ts(**kw):
        return t0 + datetime.timedelta(**kw)

    from ibd_pipeline_spark.operators.joins import asof_nearest_join

    probes = spark.createDataFrame(
        [
            (1, t0, 1),          # events 1h before and 2h after -> backward
            (2, t0, 2),          # events 3h before and 3h after -> tie: backward
            (3, t0, 3),          # only forward within tolerance
            (4, t0, 4),          # nearest event 10 days away -> null
            (5, t0, 5),          # no events at all -> null
        ],
        "pid int, pt timestamp, k int",
    )
    events = spark.createDataFrame(
        [
            (1, ts(hours=-1)), (1, ts(hours=2)),
            (2, ts(hours=-3)), (2, ts(hours=3)),
            (3, ts(minutes=30)),
            (4, ts(days=10)),
        ],
        "k int, et timestamp",
    )
    out = {
        r["pid"]: r
        for r in asof_nearest_join(
            probes, events, key="k", probe_time="pt", event_time="et",
            tolerance_seconds=7 * 24 * 3600,
        ).collect()
    }
    assert out[1]["direction"] == "backward" and out[1]["gap_seconds"] == 3600
    assert out[2]["direction"] == "backward" and out[2]["gap_seconds"] == 3 * 3600
    assert out[3]["direction"] == "forward" and out[3]["gap_seconds"] == 1800
    assert out[4]["nearest_et"] is None and out[4]["direction"] is None
    assert out[5]["nearest_et"] is None and out[5]["gap_seconds"] is None


def test_fano_poisson_and_constant(spark, tmp_path):
    """Synthetic arrivals: a constant-rate type has Fano = 0 and
    burstiness (0-sigma) = -1; all stats finite on real data."""
    import datetime

    rows = []
    t0 = datetime.datetime(2024, 3, 1)
    eid = 0
    # 'steady': exactly 4 events every hour for 48 hours -> var 0
    for h in range(48):
        for j in range(4):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h, minutes=j), 7, "steady", 1.0, "{}")
            )
            eid += 1
    # 'bursty': 40 events in one hour, then 1 event in each of 39 hours
    for j in range(40):
        rows.append((eid, t0 + datetime.timedelta(minutes=j), 8, "bursty", 1.0, "{}"))
        eid += 1
    for h in range(1, 40):
        rows.append((eid, t0 + datetime.timedelta(hours=h), 8, "bursty", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.write.parquet(str(sf / "events.parquet"))
    out = {
        r["event_type"]: r
        for r in all_queries()["events_fano_burstiness"](spark, str(sf)).collect()
    }
    assert out["steady"]["fano_factor"] == 0.0
    assert out["steady"]["burstiness"] == -1.0
    assert out["bursty"]["fano_factor"] > 10
    assert out["bursty"]["burstiness"] > 0


def test_mde_matches_python(spark, sf_dir):
    """MDE equals a direct Python recomputation and shrinks with n
    (the defining property of a power analysis)."""
    r = all_queries()["ab_power_mde"](spark, sf_dir).collect()[0]
    assert r["n_a"] + r["n_b"] > 0 and 0 < r["p0"] < 1
    n_arm = min(r["n_a"], r["n_b"])
    p0 = r["conv"] / (r["n_a"] + r["n_b"])
    z = 1.959963985 + 0.841621234
    mde = z * (2 * p0 * (1 - p0) / n_arm) ** 0.5
    assert abs(r["mde_abs"] - mde) < 1e-6
    assert abs(r["mde_rel"] - mde / p0) < 1e-6
    # halving the arm inflates MDE by ~sqrt(2)
    mde_half = z * (2 * p0 * (1 - p0) / (n_arm // 2)) ** 0.5
    assert mde_half > r["mde_abs"] * 1.4


def test_priority_sampling_unbiased_across_seeds(spark, sf_dir):
    """The priority-sampling estimator's TOTAL (all segments) sits
    within a loose band of the exact total on the real fixture, the
    sample is exactly k rows, and every per-segment estimate is
    non-negative with max(w, tau) >= w for sampled items (the
    threshold property)."""
    rows = all_queries()["sample_priority_subset_sums"](spark, sf_dir).collect()
    n_sampled = sum(r["n_sampled"] for r in rows)
    assert n_sampled == 64
    est = sum(r["est_total"] for r in rows)
    exact = sum(r["exact_total"] for r in rows)
    # k=64 over ~1.5k orders: generous 3-sigma-ish band; the point is
    # the estimator is in the right universe, unbiasedness itself is
    # an expectation property
    assert 0.5 * exact < est < 2.0 * exact, (est, exact)
    for r in rows:
        assert r["est_total"] >= 0 and r["rel_err"] >= 0


def test_gumbel_return_levels_ordered_and_python_twin(spark, sf_dir):
    """Return levels are ordered (365d > 30d > mean of maxima) and
    match a direct Python method-of-moments recomputation."""
    import math as _m

    r = all_queries()["stats_gumbel_return_level"](spark, sf_dir).collect()[0]
    assert r["return_level_365d"] > r["return_level_30d"] > r["mean_daily_max"]
    bm = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.round(F.max("value"), 6).alias("mx"))
        .toPandas()["mx"]
    )
    mean, sd = bm.mean(), bm.std(ddof=1)
    beta = sd * _m.sqrt(6) / _m.pi
    mu = mean - 0.5772156649015329 * beta
    z30 = mu - beta * _m.log(-_m.log(1 - 1 / 30))
    assert abs(r["gumbel_mu"] - mu) < 1e-3
    assert abs(r["return_level_30d"] - z30) < 1e-3


def test_kcore_planted_structure(spark, tmp_path):
    """Planted graph: a 5-clique (all in the 3-core) plus a pendant
    chain (peeled). Co-activity edges come from one shared bucket."""
    import datetime

    t0 = datetime.datetime(2024, 4, 1, 10, 0, 0)
    rows = []
    eid = 0
    # 5 users active in ONE (type, hour) bucket -> 5-clique
    for u in range(5):
        rows.append((eid, t0, u, "click", 1.0, "{}")); eid += 1
    # chain: (10,11) then (11,12) in separate buckets -> degrees 1-2
    for h, (ua, ub) in enumerate([(10, 11), (11, 12)], start=2):
        tb = t0 + datetime.timedelta(hours=h)
        rows.append((eid, tb, ua, "view", 1.0, "{}")); eid += 1
        rows.append((eid, tb, ub, "view", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.write.parquet(str(sf / "events.parquet"))
    got = {
        r["user_id"]: r["core_degree"]
        for r in all_queries()["graph_kcore_peel"](spark, str(sf)).collect()
    }
    assert got == {u: 4 for u in range(5)}  # the clique, nothing else
