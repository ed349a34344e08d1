#!/usr/bin/env python
"""Empirical scaling probe: measure wall time of representative
operators as input volume grows (1x / 4x / 16x), on local[32]. The
point is the SHAPE of the curve — near-linear scan/agg, sub-linear
candidate growth for LSH vs quadratic for brute force — not the
absolute numbers. Results land in SCALE.md §Measured scaling.

    python tools/scale_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"


def timed(df) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def replicate(df, times: int, id_cols: dict[str, int]):
    """Union `times` shifted copies so keys stay distinct per copy."""
    out = None
    for i in range(times):
        c = df
        for col, stride in id_cols.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * stride))
        out = c if out is None else out.unionByName(c)
    return out


def main() -> None:
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.operators import dedup as D
    from ibd_pipeline_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk
    from ibd_pipeline_spark.session import get_spark
    from ibd_pipeline_spark.sources.weather_synth import synth_weather_json
    from ibd_pipeline_spark.streaming.weather import weather_pipeline

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    results: dict[str, dict[str, float]] = {}

    # 1. streaming-parity pipeline throughput: parse → window → agg
    weather_pipeline(synth_weather_json(spark, 10_000)).write.format("noop").mode(
        "overwrite"
    ).save()  # warm codegen
    for n in (1_000_000, 4_000_000, 16_000_000):
        results.setdefault("weather_pipeline_msgs", {})[str(n)] = timed(
            weather_pipeline(synth_weather_json(spark, n))
        )

    # 2. scan+filter+groupBy (q1 shape) over replicated lineitem
    li = load(spark, SF, "lineitem")
    for k in (1, 4, 16):
        fact = replicate(li, k, {"l_orderkey": 10_000_000})
        agg = (
            fact.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        results.setdefault("scan_agg_lineitem_x", {})[str(k)] = timed(agg)

    # 3. fact-fact shuffle join over replicated orders ⋈ lineitem
    o = load(spark, SF, "orders")
    for k in (1, 4, 8):
        fact_l = replicate(li, k, {"l_orderkey": 10_000_000})
        fact_o = replicate(o, k, {"o_orderkey": 10_000_000})
        j = fact_o.join(fact_l, fact_o.o_orderkey == fact_l.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        results.setdefault("shuffle_join_x", {})[str(k)] = timed(j)

    # 4. ANN: brute force vs LSH as the corpus replicates
    emb = load(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vec")
    )
    for k in (1, 4):
        corpus = replicate(emb, k, {"vec_id": 10_000_000}).select(
            F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("vec")
        )
        results.setdefault("ann_bruteforce_x", {})[str(k)] = timed(
            brute_force_topk(q, corpus, k=5)
        )
        results.setdefault("ann_lsh_x", {})[str(k)] = timed(
            lsh_bucketed_topk(q, corpus, k=5, n_tables=8, bits_per_table=6, dim=64)
        )

    # 5. minhash LSH dedup as the corpus replicates (candidate growth)
    docs = load(spark, SF, "documents")
    for k in (1, 4):
        corpus = replicate(docs, k, {"doc_id": 10_000_000})
        reps = (
            corpus.groupBy(D.content_digest("text").alias("digest"))
            .agg(F.min(F.struct("doc_id", "text")).alias("rep"))
            .select(F.col("rep.doc_id").alias("doc_id"), F.col("rep.text").alias("text"))
        )
        pairs = D.minhash_candidate_pairs(reps, "doc_id", "text").filter(
            F.col("jaccard") >= 0.5
        )
        results.setdefault("minhash_lsh_x", {})[str(k)] = timed(pairs)

    # 5b. simhash signature build (explode + 64-sum hash-agg) as the
    # corpus replicates — must stay linear in corpus tokens.
    for k in (1, 4):
        corpus = replicate(docs, k, {"doc_id": 10_000_000})
        results.setdefault("simhash_signatures_x", {})[str(k)] = timed(
            D.simhash_signatures(corpus)
        )

    # 5e. multi-table SimHash pair generation (r06): 4 rotated band
    # tables must keep candidate growth bounded by block occupancy —
    # flat-to-linear in corpus, like the single-table and MinHash
    # blockers, never quadratic.
    for k in (1, 4):
        corpus = replicate(docs, k, {"doc_id": 10_000_000})
        pairs = D.simhash_near_dup_pairs_multi(corpus)
        results.setdefault("simhash_multitable_x", {})[str(k)] = timed(pairs)
        D.release_state(pairs)

    # 5d. BPE regex apply (r06 form: K compiled regexp passes over the
    # joined symbol string) as the corpus replicates — the claim is
    # LINEAR in corpus bytes; the old array-fold form was quadratic in
    # per-doc symbols.
    from ibd_pipeline_spark.operators.bpe import bpe_apply, bpe_learn

    bpe_merges = bpe_learn(docs.filter(F.col("doc_id") % 20 == 0), n_merges=6)
    for k in (1, 4, 16):
        corpus = replicate(docs, k, {"doc_id": 10_000_000})
        results.setdefault("bpe_apply_x", {})[str(k)] = timed(
            bpe_apply(corpus, bpe_merges).groupBy().agg(
                F.sum("n_syms_after").alias("n")
            )
        )

    # 5c. gap sessionization + stream-stream attribution join (batch
    # form) as the events stream replicates — both single-shuffle-per-
    # side shapes that must stay linear.
    from ibd_pipeline_spark.streaming.joins import attribution_join

    ev = load(spark, SF, "events")
    for k in (1, 4):
        str_ev = replicate(ev, k, {"event_id": 10_000_000, "user_id": 10_000_000})
        # same plan shape as the events_sessionize_gaps registry query
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        sess = (
            str_ev.select(
                "user_id", "ts", "value",
                F.sum(
                    F.when(gap.isNull() | (gap > 6 * 3600 * 1_000_000), 1).otherwise(0)
                )
                .over(
                    Window.partitionBy("user_id")
                    .orderBy("ts", "event_id")
                    .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                .alias("session_seq"),
            )
            .groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("s"))
        )
        results.setdefault("sessionize_x", {})[str(k)] = timed(sess)
        results.setdefault("stream_join_batch_x", {})[str(k)] = timed(
            attribution_join(
                str_ev.filter(F.col("event_type") == "click"),
                str_ev.filter(F.col("event_type") == "purchase"),
                streaming=False,
            ).groupBy().agg(F.count(F.lit(1)).alias("n"))
        )

    # 6. skew: one key holding 90% of a 2.4M-row fact, joined to a
    # non-broadcastable dim — plain SMJ vs AQE skew-split vs salting.
    from ibd_pipeline_spark.operators.skew import salted_join

    fact = replicate(li, 4, {"l_orderkey": 10_000_000}).select(
        F.when(F.rand(1) < 0.9, F.lit(0))
        .otherwise(F.col("l_orderkey") % 10_000)
        .alias("k"),
        "l_quantity",
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_val")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        agg = lambda j: j.agg(  # noqa: E731
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        results.setdefault("skew_join", {})["plain_smj"] = timed(
            agg(fact.join(dim, "k"))
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        results["skew_join"]["aqe_skew_split"] = timed(agg(fact.join(dim, "k")))
        results["skew_join"]["salted_8"] = timed(
            agg(salted_join(fact, dim, "k", "k", salt_factor=8))
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    print(json.dumps(results, indent=2))
    spark.stop()


def main_r10() -> None:
    """Round-10 probes only (`python tools/scale_probe.py r10`):
    candidate growth of the EXACT prefix-filter Jaccard join and
    per-query flatness of IVF-PQ as the corpus replicates."""
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.queries.dedup import (
        dedup_prefix_filter_jaccard,  # noqa: F401 (registry import)
    )
    from ibd_pipeline_spark.queries.similarity import _PQ_CENTS
    from ibd_pipeline_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    results: dict[str, dict[str, float]] = {}

    # 7. EXACT prefix-filter Jaccard join: candidates must grow with
    # rare-shingle postings (≈ true-duplicate density), never corpus².
    # Naive replication makes every text an EXACT 4-way duplicate
    # (quadratic candidate growth BY CONSTRUCTION — measured 2.1 s →
    # 15.3 s), and interleaving a marker token COLLAPSES the shingle
    # universe onto the 31-word vocab (~1.9 k distinct shingles for
    # 20 k docs → giant postings → measured 87 s). The honest axis is
    # a PER-REPLICA TOKEN-RENAMING BIJECTION (prefix every word with
    # the replica tag): shingle diversity and dup density are
    # preserved exactly, replica vocabularies are disjoint.
    import pyspark.sql.functions as FF

    docs = load(spark, SF, "documents")
    import tempfile

    for k in (1, 4):
        copies = []
        for i in range(k):
            c = docs.withColumn("doc_id", FF.col("doc_id") + FF.lit(i * 10_000_000))
            if i:
                c = c.withColumn(
                    "text", FF.regexp_replace("text", r"(\S+)", f"c{i}$1")
                )
            copies.append(c)
        corpus = copies[0]
        for c in copies[1:]:
            corpus = corpus.unionByName(c)
        with tempfile.TemporaryDirectory() as td:
            corpus.write.parquet(f"{td}/documents.parquet")
            from ibd_pipeline_spark.queries import all_queries

            q = all_queries()["dedup_prefix_filter_jaccard"]
            results.setdefault("prefix_jaccard_x", {})[str(k)] = timed(
                q(spark, td)
            )

    # 8. IVF-PQ: index build is linear in corpus (one assignment scan
    # + one encode scan); the per-query ADC cost is |cell|·n_probe —
    # so END-TO-END wall should grow ~linearly with corpus (index
    # build dominates) while the brute-force twin grows the SCORED
    # PAIRS linearly per query. Probe both.
    from ibd_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_cells,
        ivf_probe,
    )
    import pyspark.sql.functions as FF

    emb = load(spark, SF, "embeddings")
    q10 = emb.filter(FF.col("vec_id") < 10).select(
        FF.col("vec_id").alias("query_id"), FF.col("embedding").alias("vec")
    )
    for k in (1, 4):
        corpus = replicate(emb, k, {"vec_id": 10_000_000}).select(
            FF.col("vec_id").alias("corpus_id"), FF.col("embedding").alias("vec")
        )
        cents, cells = ivf_cells(corpus, _PQ_CENTS)
        probe = ivf_probe(q10, cents, 4)
        scored = (
            probe.join(cells.withColumnRenamed("cid", "corpus_id"), "cell_id")
            .filter(FF.col("qid") != FF.col("corpus_id"))
            .groupBy("qid")
            .agg(FF.count(FF.lit(1)).alias("n_scored"))
        )
        results.setdefault("ivf_probe_scored_x", {})[str(k)] = timed(scored)
        results.setdefault("ann_bruteforce_x", {})[str(k)] = timed(
            brute_force_topk(q10, corpus, k=5)
        )

    print(json.dumps(results, indent=2))
    spark.stop()




def main_r11() -> None:
    """Round-11 probes only (`python tools/scale_probe.py r11`):
    bucket-density sensitivity of the k-core co-activity edge build,
    distinct-value-frame growth of the Spearman rank spine, and
    journey fan-in of the Markov attribution transition build."""
    from pyspark.sql import Window

    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.operators.ranking import with_grouped_prefix_sum
    from ibd_pipeline_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    results: dict[str, dict[str, object]] = {}
    ev = load(spark, SF, "events")

    # 10. k-core edge build: the (type x hour) bucket self-join.
    # Two replication modes separate the scaling variable:
    #   volume mode — copies shift BOTH users and hours, so bucket
    #   occupancy is constant and buckets multiply -> edges (and
    #   wall) should grow ~linearly;
    #   density mode — copies shift users only, so each bucket gets
    #   k x occupancy -> per-bucket pair fan-out is quadratic BY
    #   CONSTRUCTION (the named degradation mode: co-activity spikes,
    #   e.g. a bot burst in one hour, are what to salt/cap upstream).
    def kcore_edges(events):
        b = events.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
        ).distinct()
        a, c = b.alias("a"), b.alias("c")
        return (
            a.join(
                c,
                (F.col("a.event_type") == F.col("c.event_type"))
                & (F.col("a.h") == F.col("c.h"))
                & (F.col("a.user_id") < F.col("c.user_id")),
            )
            .select(F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v"))
            .distinct()
        )

    for k in (1, 4):
        vol = None
        for i in range(k):
            c = ev.withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
            c = c.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {i * 2400} HOURS")
            )
            vol = c if vol is None else vol.unionByName(c)
        dens = replicate(ev, k, {"user_id": 1_000_000})
        ev_, ed_ = kcore_edges(vol), kcore_edges(dens)
        results.setdefault("kcore_edges_volume_x", {})[str(k)] = {
            "wall_s": timed(ev_), "n_edges": ev_.count()
        }
        results.setdefault("kcore_edges_density_x", {})[str(k)] = {
            "wall_s": timed(ed_), "n_edges": ed_.count()
        }

    # 11. Spearman rank spine: cost must track the DISTINCT-VALUE
    # frame, not raw rows. same-values mode: replicas reuse the value
    # domain (distinct frame constant -> flat-to-sublinear wall);
    # jittered mode: each replica shifts values (distinct frame x k
    # -> linear in distinct values, the worst case for rank algebra).
    li = load(spark, SF, "lineitem").select(
        F.col("l_linestatus").alias("g"),
        F.col("l_quantity").alias("x"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
    )

    def rank_spine(rows):
        vc = rows.groupBy("g", "x").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        ps = with_grouped_prefix_sum(vc, ["g"], ["x"], "cnt")
        return ps.select("g", "x", (2 * F.col("_cw") - F.col("cnt") + 1).alias("r2"))

    for k in (1, 4, 16):
        same = replicate(li, k, {"rid": 100_000_000})
        jit = None
        for i in range(k):
            c = li.withColumn("x", F.col("x") + F.lit(i) * 0.001)
            jit = c if jit is None else jit.unionByName(c)
        results.setdefault("spearman_spine_samevals_x", {})[str(k)] = timed(
            rank_spine(same)
        )
        results.setdefault("spearman_spine_jittered_x", {})[str(k)] = timed(
            rank_spine(jit)
        )

    # 12. Markov attribution journey fan-in: same users, k x longer
    # journeys (copies appended in time). Journey construction (one
    # user window + the transition count aggregate) should be linear
    # in events; the chain state stays (channels+2)-sized regardless.
    def transition_counts(events):
        w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ord_ = events.select(
            "user_id", "event_type", F.row_number().over(w_u).alias("rn")
        )
        fp = ord_.groupBy("user_id").agg(
            F.min(F.when(F.col("event_type") == "purchase", F.col("rn"))).alias("prn")
        )
        kept = ord_.join(fp, "user_id").filter(
            F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
        )
        w_k = Window.partitionBy("user_id").orderBy("rn")
        leads = kept.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w_k).alias("nxt"),
        )
        return (
            leads.filter(~(F.col("nxt").isNull() & (F.col("src") == "purchase")))
            .groupBy("src", F.coalesce("nxt", F.lit("END")).alias("dst"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    for k in (1, 4):
        fan = None
        for i in range(k):
            c = ev.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {i * 2400} HOURS")
            ).withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
            fan = c if fan is None else fan.unionByName(c)
        results.setdefault("markov_journey_fanin_x", {})[str(k)] = timed(
            transition_counts(fan)
        )

    print(json.dumps(results, indent=2))
    spark.stop()


def main_r11b() -> None:
    """Round-11 wave-5 probes (`python tools/scale_probe.py r11b`):
    DSIR gram/count pass growth under corpus replication (expect
    ~linear — bucket state is fixed at B), and SemDeDup within-cluster
    pair growth with k FIXED (expect ~quadratic pairs — the named
    degradation mode) vs k SCALED with n (the published contract:
    k ∝ n keeps per-cluster occupancy, and so wall, ~flat-per-item)."""
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.operators.similarity import kmeans_attested
    from ibd_pipeline_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    results: dict[str, dict[str, object]] = {}

    docs = load(spark, SF, "documents")
    results["dsir_gram_pass"] = {}
    for mult in (1, 4):
        d = replicate(docs, mult, {"doc_id": 1_000_000})
        toks = d.select(
            "doc_id",
            "lang",
            F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
        ).localCheckpoint(eager=True)
        grams = toks.select(
            "doc_id",
            "lang",
            F.explode(
                F.zip_with(
                    F.slice("l", 1, F.greatest(F.size("l") - 1, F.lit(0))),
                    F.slice("l", 2, F.greatest(F.size("l") - 1, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("gram"),
        )
        hashed = grams.select(
            "doc_id",
            (
                F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
                .cast("bigint")
                % 256
            ).alias("b"),
        )
        counts = hashed.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
        docw = hashed.join(F.broadcast(counts), "b").groupBy("doc_id").agg(
            F.sum("cr").alias("w")
        )
        results["dsir_gram_pass"][f"{mult}x"] = timed(docw)

    emb = load(spark, SF, "embeddings")
    results["semdedup_pairs"] = {}
    for mult, k in ((1, 8), (4, 8), (4, 32)):
        e = replicate(emb, mult, {"vec_id": 1_000_000})
        assigned = kmeans_attested(
            e, k=k, iters=1, id_col="vec_id", vec="embedding"
        ).select("vec_id", "cluster_id").localCheckpoint(eager=True)
        a = assigned.select(
            F.col("cluster_id"), F.col("vec_id").alias("ia")
        )
        b = assigned.select(
            F.col("cluster_id").alias("cb"), F.col("vec_id").alias("ib")
        )
        pairs = a.join(
            b,
            (F.col("cluster_id") == F.col("cb")) & (F.col("ia") < F.col("ib")),
        )
        n_pairs = pairs.count()
        t0 = time.perf_counter()
        pairs.groupBy("cluster_id").count().write.format("noop").mode(
            "overwrite"
        ).save()
        results["semdedup_pairs"][f"{mult}x_k{k}"] = {
            "pairs": n_pairs,
            "wall_s": round(time.perf_counter() - t0, 3),
        }

    print(json.dumps(results, indent=2))
    spark.stop()




def main_r12() -> None:
    """Round-12 probes (`python tools/scale_probe.py r12`):

    1. SemDeDup at OPERATOR DEFAULTS (k=None -> k ∝ n): candidate
       pairs should grow ~linearly under 4x corpus replication now
       that the derived k holds per-cluster occupancy flat (the r11
       probe showed fixed k=8 going 16x/quadratic).
    2. Adamic-Adar wedge enumeration (r11 VERDICT #8): volume mode
       (users+hours shift -> bucket occupancy constant) should be
       ~linear in wedges/wall; density mode (users shift only -> each
       bucket k x denser) is quadratic BY CONSTRUCTION via the
       Σ deg² wedge bound - the named degradation mode (co-activity
       spikes salt/cap upstream, same as k-core).
    3. Clustering-coefficient oriented-wedge triangle join, same two
       modes; bound is Σ deg² on the ORIENTED (u < v) adjacency,
       roughly a quarter of the undirected bound.
    """
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.operators.dedup import semdedup_pairs
    from ibd_pipeline_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    results: dict[str, dict[str, object]] = {}

    emb = load(spark, SF, "embeddings")
    results["semdedup_default_kprop_x"] = {}
    for mult in (1, 4):
        e = replicate(emb, mult, {"vec_id": 1_000_000})
        n = e.count()
        pairs = semdedup_pairs(
            e, k=None, iters=1, target_cluster_size=250, k_min=4
        )
        t0 = time.perf_counter()
        n_pairs = pairs.count()
        results["semdedup_default_kprop_x"][f"{mult}x"] = {
            "n_vectors": n,
            "derived_k": max(4, -(-n // 250)),
            "pairs": n_pairs,
            "wall_s": round(time.perf_counter() - t0, 3),
        }

    ev = load(spark, SF, "events").filter(F.col("user_id") < 150)

    def edge_set(events):
        b = events.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
        ).distinct()
        a, c = b.alias("a"), b.alias("c")
        return (
            a.join(
                c,
                (F.col("a.event_type") == F.col("c.event_type"))
                & (F.col("a.h") == F.col("c.h"))
                & (F.col("a.user_id") < F.col("c.user_id")),
            )
            .select(F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    def aa_wedges(e):
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        t1, t2 = sym.alias("t1"), sym.alias("t2")
        return t1.join(
            t2, (F.col("t1.u") == F.col("t2.u")) & (F.col("t1.v") < F.col("t2.v"))
        ).select(
            F.col("t1.v").alias("u"), F.col("t2.v").alias("v"),
            F.col("t1.u").alias("w"),
        )

    def cc_triangles(e):
        e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
        return (
            e1.join(
                e2,
                (F.col("e1.u") == F.col("e2.u"))
                & (F.col("e1.v") < F.col("e2.v")),
            )
            .join(
                e3,
                (F.col("e3.u") == F.col("e1.v"))
                & (F.col("e3.v") == F.col("e2.v")),
            )
            .select(
                F.col("e1.u").alias("u"),
                F.col("e1.v").alias("v"),
                F.col("e2.v").alias("w"),
            )
        )

    for k in (1, 4):
        vol = None
        for i in range(k):
            c = ev.withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
            c = c.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {i * 2400} HOURS")
            )
            vol = c if vol is None else vol.unionByName(c)
        dens = replicate(ev, k, {"user_id": 1_000_000})
        for mode, src in (("volume", vol), ("density", dens)):
            e = edge_set(src)
            w = aa_wedges(e)
            t0 = time.perf_counter()
            n_w = w.count()
            results.setdefault(f"adamic_adar_wedges_{mode}_x", {})[str(k)] = {
                "n_edges": e.count(),
                "wedges": n_w,
                "wall_s": round(time.perf_counter() - t0, 3),
            }
            t = cc_triangles(e)
            t0 = time.perf_counter()
            n_t = t.count()
            results.setdefault(f"cc_triangles_{mode}_x", {})[str(k)] = {
                "triangles": n_t,
                "wall_s": round(time.perf_counter() - t0, 3),
            }

    print(json.dumps(results, indent=2))
    spark.stop()


def main_r13() -> None:
    """Round-13 probes (`python tools/scale_probe.py r13`) — the two
    r12 graph shapes whose SCALE.md bounds were stated but not
    measured (VERDICT r12 #7), same 1x/4x volume/density protocol as
    the Adamic-Adar / clustering-coefficient probes:

    1. Label propagation, 2 synchronous rounds over the thresholded
       (w >= 3) co-activity graph: per-round work is one
       (node, label) vote shuffle = Σ deg — volume mode should be
       ~linear in edges; density mode inflates Σ deg via the same
       bucket-occupancy quadratic as every co-activity consumer
       (edge build dominates; the vote rounds stay Σ deg).
    2. Global transitivity: wedge bound Σ deg² on the oriented
       adjacency + one edge-list triangle equi-join — shares the CC
       probe's bound, measured here end-to-end (degree binomial sum
       + triangle closure + the one division).
    """
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    results: dict[str, dict[str, object]] = {}

    ev = load(spark, SF, "events").filter(F.col("user_id") < 150)

    def lpa_communities(events):
        b = events.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
        ).distinct()
        a, c = b.alias("a"), b.alias("c")
        e = (
            a.join(
                c,
                (F.col("a.event_type") == F.col("c.event_type"))
                & (F.col("a.h") == F.col("c.h"))
                & (F.col("a.user_id") < F.col("c.user_id")),
            )
            .groupBy(F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v"))
            .agg(F.count(F.lit(1)).alias("w"))
            .filter(F.col("w") >= 3)
            .select("u", "v")
        )
        sym = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).localCheckpoint(eager=True)
        labels = sym.select(F.col("u").alias("node")).distinct().select(
            "node", F.col("node").alias("label")
        )
        for _ in range(2):
            votes = (
                sym.join(
                    labels.select(F.col("node").alias("v"), F.col("label")),
                    "v",
                )
                .groupBy(F.col("u").alias("node"), "label")
                .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            )
            labels = votes.groupBy("node").agg(
                F.max(
                    F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
                ).alias("m")
            ).select("node", (-F.col("m.nl")).alias("label"))
        return sym, labels

    def transitivity_row(events):
        b = events.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
        ).distinct()
        a, c = b.alias("a"), b.alias("c")
        e = (
            a.join(
                c,
                (F.col("a.event_type") == F.col("c.event_type"))
                & (F.col("a.h") == F.col("c.h"))
                & (F.col("a.user_id") < F.col("c.user_id")),
            )
            .select(F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        deg = sym.groupBy(F.col("u").alias("n")).agg(
            F.count(F.lit(1)).cast("bigint").alias("deg")
        )
        e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
        tri = (
            e1.join(
                e2,
                (F.col("e1.u") == F.col("e2.u"))
                & (F.col("e1.v") < F.col("e2.v")),
            )
            .join(
                e3,
                (F.col("e3.u") == F.col("e1.v"))
                & (F.col("e3.v") == F.col("e2.v")),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
        )
        wed = deg.agg(
            F.sum(F.expr("(deg * (deg - 1)) DIV 2")).cast("bigint").alias("n_wedges")
        )
        return e, wed.crossJoin(F.broadcast(tri)).select(
            "n_wedges",
            "n_tri",
            F.round(3.0 * F.col("n_tri") / F.col("n_wedges"), 6).alias("t"),
        )

    for k in (1, 4):
        vol = None
        for i in range(k):
            c = ev.withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
            c = c.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {i * 2400} HOURS")
            )
            vol = c if vol is None else vol.unionByName(c)
        dens = replicate(ev, k, {"user_id": 1_000_000})
        for mode, src in (("volume", vol), ("density", dens)):
            t0 = time.perf_counter()
            sym, labels = lpa_communities(src)
            n_comm = labels.select("label").distinct().count()
            results.setdefault(f"lpa_2rounds_{mode}_x", {})[str(k)] = {
                "sym_edges": sym.count(),
                "n_communities": n_comm,
                "wall_s": round(time.perf_counter() - t0, 3),
            }
            t0 = time.perf_counter()
            e, row = transitivity_row(src)
            r = row.collect()[0]
            results.setdefault(f"transitivity_{mode}_x", {})[str(k)] = {
                "n_edges": e.count(),
                "n_wedges": r["n_wedges"],
                "n_triangles": r["n_tri"],
                "wall_s": round(time.perf_counter() - t0, 3),
            }

    print(json.dumps(results, indent=2))
    spark.stop()


def main_r14() -> None:
    """Round-14 probe (`python tools/scale_probe.py r14`) — VERDICT
    r13 #5: the composed `dedup_lsh_recall_eval` shape, whose cost
    story ("one run of each side") inherits TWO different bounds:
    the banded bucket join (density-quadratic in block occupancy) and
    the prefix-filter truth join (rare-postings bounded). Same 1x/4x
    volume/density protocol as the LPA/transitivity probes.

    - volume mode: 4 textually-DISTINCT copies (a per-copy token is
      interleaved between every word, so every 3-shingle of copy i
      contains the token and shares nothing across copies, while
      intra-copy near-dup structure is preserved — both members of a
      pair get the same transformation). Expectation: both sides
      ~linear in corpus (postings and buckets grow, occupancy per
      key does not).
    - density mode: 4 copies with a single distinct token APPENDED
      (near-dup but not exact-dup, so the exact-keeper semi-join
      keeps them): every original near-dup cluster of size s becomes
      size ~4s -> true pairs grow ~quadratically BY CONSTRUCTION;
      the probe measures whether wall time follows the pair count
      (the verify stage is the quadratic consumer) or worse.
    """
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.operators import dedup as D
    from ibd_pipeline_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    results: dict[str, dict[str, object]] = {}

    base = load(spark, SF, "documents").select("doc_id", "text")

    def eval_counts(docs):
        """The dedup_lsh_recall_eval composition, re-driven against an
        injected documents frame (mirrors queries/dedup.py:871)."""
        par = spark.sparkContext.defaultParallelism
        reps = docs.join(
            D.exact_keeper_ids(docs.withColumn("source", F.lit("x"))),
            "doc_id",
            "left_semi",
        )
        hashed = (
            reps.repartition(par)
            .select("doc_id", F.split("text", " ").alias("w"))
            .localCheckpoint(eager=True)
            .select(
                "doc_id",
                F.explode(
                    F.array_distinct(
                        F.transform(
                            D.shingles(F.concat_ws(" ", "w"), 3),
                            lambda g: F.substring(F.md5(g), 1, 8),
                        )
                    )
                ).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
        sets = hashed.groupBy("doc_id").agg(
            F.collect_set("h").alias("hs"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        tf = hashed.groupBy("h").agg(
            F.count(F.lit(1)).cast("bigint").alias("freq")
        )
        stp = (
            hashed.join(tf, "h")
            .groupBy("doc_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("freq", "h"))),
                    lambda s: s["h"],
                ).alias("stoks"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
            )
        )
        plen = (
            F.col("n") - F.ceil(F.col("n") / F.lit(2.0)) + F.lit(1)
        ).cast("int")
        pref = stp.select(
            "doc_id", F.explode(F.slice("stoks", F.lit(1), plen)).alias("h")
        ).localCheckpoint(eager=True)
        a, b = pref.alias("a"), pref.alias("b")
        tcand = (
            a.join(
                b,
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
            .repartition(par)
        )
        x = sets.select(
            F.col("doc_id").alias("id_a"),
            F.col("hs").alias("ha"),
            F.col("n").alias("na"),
        )
        y = sets.select(
            F.col("doc_id").alias("id_b"),
            F.col("hs").alias("hb"),
            F.col("n").alias("nb"),
        )
        ni = F.size(F.array_intersect("ha", "hb")).cast("bigint")
        gate = 2 * ni >= F.col("na") + F.col("nb") - ni
        truth = (
            tcand.join(x, "id_a").join(y, "id_b").filter(gate)
            .select("id_a", "id_b")
        )
        cand = (
            D.minhash_candidate_pairs(
                reps.withColumn("source", F.lit("x")),
                "doc_id",
                "text",
                portable=True,
            )
            .select("id_a", "id_b")
            .repartition(par)
        )
        found = (
            cand.join(x, "id_a").join(y, "id_b").filter(gate)
            .select("id_a", "id_b")
        )
        return {
            "n_postings": hashed.count(),
            "n_truth_cand": tcand.count(),
            "n_lsh_cand": cand.count(),
            "n_true": truth.count(),
            "n_found": found.count(),
        }

    for k in (1, 4):
        # volume: interleave a per-copy token between every word
        vol = None
        for i in range(k):
            c = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
            if i:
                c = c.withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), " ", f" qq{i}x "),
                )
            vol = c if vol is None else vol.unionByName(c)
        # density: one distinct token appended (near-dup, not exact)
        dens = None
        for i in range(k):
            c = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
            if i:
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" zc{i}"))
                )
            dens = c if dens is None else dens.unionByName(c)
        for mode, src in (("volume", vol), ("density", dens)):
            t0 = time.perf_counter()
            m = eval_counts(src)
            m["wall_s"] = round(time.perf_counter() - t0, 3)
            results.setdefault(f"lsh_recall_eval_{mode}_x", {})[str(k)] = m

    print(json.dumps(results, indent=2))
    spark.stop()


def main_r15() -> None:
    """Round-15 probe (`python tools/scale_probe.py r15`) — VERDICT
    r14 #7: the k-truss peel loop (`queries/graph2.py:graph_ktruss_peel`),
    whose "round r costs <= round r-1" bound was inherited from the
    k-core precedent, not measured. Per-ROUND instrumentation under
    1x/4x volume AND density:

    - volume mode: 4 disjoint copies (user ids shifted AND event_type
      namespaced per copy, so no cross-copy co-activity) — edges,
      triangles, and per-round cost should grow ~linearly.
    - density mode: 4 user populations co-active in the SAME
      (event_type, hour) slots — per-slot occupancy x4, so the edge
      count grows ~quadratically and the triangle count ~cubically
      BY CONSTRUCTION; the probe measures whether each peel round's
      wall follows the survivor triangle count and whether the
      monotone "round r <= round r-1" claim holds when round 1 is
      violently dense.
    """
    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    results: dict[str, dict[str, object]] = {}
    base = load(spark, SF, "events").filter(F.col("user_id") < 100)

    def peel_rounds(ev):
        """graph_ktruss_peel re-driven with per-round metrics
        (mirrors queries/graph2.py:1098 — same builder, same
        support_of, same k=4 / 3-round peel)."""
        b = ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
        ).distinct()
        a, c = b.alias("a"), b.alias("c")
        e = (
            a.join(
                c,
                (F.col("a.event_type") == F.col("c.event_type"))
                & (F.col("a.h") == F.col("c.h"))
                & (F.col("a.user_id") < F.col("c.user_id")),
            )
            .select(
                F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

        def support_of(edges):
            e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
            tri = (
                e1.join(
                    e2,
                    (F.col("e1.u") == F.col("e2.u"))
                    & (F.col("e1.v") < F.col("e2.v")),
                )
                .join(
                    e3,
                    (F.col("e3.u") == F.col("e1.v"))
                    & (F.col("e3.v") == F.col("e2.v")),
                )
                .select(
                    F.col("e1.u").alias("a"),
                    F.col("e1.v").alias("b"),
                    F.col("e2.v").alias("c"),
                )
            )
            edge_tri = (
                tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
                .unionAll(
                    tri.select(F.col("a").alias("u"), F.col("c").alias("v"))
                )
                .unionAll(
                    tri.select(F.col("b").alias("u"), F.col("c").alias("v"))
                )
            )
            return (
                edges.join(
                    edge_tri.withColumn("hit", F.lit(1)), ["u", "v"], "left"
                )
                .groupBy("u", "v")
                .agg(F.count("hit").cast("bigint").alias("support"))
            )

        rounds = []
        for r in range(3):
            n_in = e.count()
            t0 = time.perf_counter()
            sup = support_of(e).localCheckpoint(eager=True)
            wall = round(time.perf_counter() - t0, 3)
            tri3 = sup.agg(F.sum("support")).collect()[0][0] or 0
            e = (
                sup.filter(F.col("support") >= 2)
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            rounds.append(
                {
                    "round": r + 1,
                    "edges_in": n_in,
                    "tri_incidences": int(tri3),
                    "survivors": e.count(),
                    "wall_s": wall,
                }
            )
        return rounds

    for k in (1, 4):
        vol = None
        for i in range(k):
            c = base.withColumn(
                "user_id", F.col("user_id") + F.lit(i * 1000)
            )
            if i:
                c = c.withColumn(
                    "event_type", F.concat(F.col("event_type"), F.lit(f"_c{i}"))
                )
            vol = c if vol is None else vol.unionByName(c)
        dens = None
        for i in range(k):
            c = base.withColumn(
                "user_id", F.col("user_id") + F.lit(i * 1000)
            )
            dens = c if dens is None else dens.unionByName(c)
        for mode, src in (("volume", vol), ("density", dens)):
            t0 = time.perf_counter()
            rounds = peel_rounds(src)
            results.setdefault(f"ktruss_peel_{mode}_x", {})[str(k)] = {
                "rounds": rounds,
                "wall_total_s": round(time.perf_counter() - t0, 3),
            }

    print(json.dumps(results, indent=2))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "r15":
        main_r15()
    elif len(sys.argv) > 1 and sys.argv[1] == "r14":
        main_r14()
    elif len(sys.argv) > 1 and sys.argv[1] == "r13":
        main_r13()
    elif len(sys.argv) > 1 and sys.argv[1] == "r10":
        main_r10()
    elif len(sys.argv) > 1 and sys.argv[1] == "r11":
        main_r11()
    elif len(sys.argv) > 1 and sys.argv[1] == "r11b":
        main_r11b()
    elif len(sys.argv) > 1 and sys.argv[1] == "r12":
        main_r12()
    else:
        main()
