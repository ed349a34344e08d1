"""Round-11 registry additions (wave 1): similarity, graph, events
and sampling operators a large-scale training-data pipeline needs
next to the existing families.

- Maximum-inner-product top-k (the recommendation/retrieval scoring
  mode; norm-augmentation reduction documented and attested).
- Johnson–Lindenstrauss sign projection with a distortion audit —
  the cheap dimensionality-reduction front end next to PCA.
- Adamic–Adar link prediction over the user co-activity graph.
- Per-user interval-union coverage (sweep-line via partitioned
  prefix max — exact integer microseconds).
- Consistent hash sampling across TABLES (the property rand() can't
  give: the same entities sampled in every table they appear in).

Shared rules as every round: exact integer/decimal algebra wherever
a float sum would be partition-order-dependent; divisions at the
last projection; global orders ride TakeOrdered or partitioned
windows, never an unpartitioned data window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# Maximum-inner-product top-k
# ---------------------------------------------------------------------------


def _seq_dot(a: str, b: str, dim: int = 64) -> str:
    return " + ".join(f"{a}[{i + 1}] * {b}[{i + 1}]" for i in range(dim))


_MIPS_SQL = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS qid, v AS qv,
         sqrt({_seq_dot('v', 'v')}) AS qn
  FROM v WHERE vec_id < 10
), m AS (
  SELECT MAX(sqrt({_seq_dot('v', 'v')})) AS mx FROM v
), s AS (
  SELECT q.qid, c.vec_id AS cid, q.qn,
         ({_seq_dot('q.qv', 'c.v')}) AS ip
  FROM q CROSS JOIN v c WHERE c.vec_id <> q.qid
), r AS (
  SELECT qid, cid, qn, ip,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ip DESC, cid) AS rn
  FROM s
)
SELECT qid AS query_id, cid AS corpus_id, CAST(rn AS INT) AS rank,
       ROUND(ip, 6) AS inner_product,
       ROUND(ip / (qn * m.mx), 6) AS mips_cosine
FROM r, m WHERE rn <= 5
ORDER BY query_id, rank
"""


@query("similarity_mips_topk", oracle=_MIPS_SQL)
def similarity_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product top-k — the scoring mode of two-tower
    retrieval and recommendation (query·item, NOT cosine: a popular
    item's larger norm should win). Exact brute force over the
    corpus for 10 query vectors, with the norm-augmentation
    reduction attested alongside: appending sqrt(M²−‖c‖²) to each
    item (M = max corpus norm) turns MIPS into cosine search — the
    standard trick that unlocks the sign-LSH/IVF bucketing this repo
    already has for cosine — and the emitted `mips_cosine` =
    ip/(‖q‖·M) is exactly the augmented-space cosine, monotone in ip
    per query, so both rankings provably agree.

    Scale: 10 broadcast queries × corpus scan, one fold per pair,
    per-query top-5 via a qid-partitioned window; the LSH-bucketed
    path for large query sets is lsh_bucketed_topk over augmented
    vectors (same reduction). Cross-engine exactness: the dot is the
    left-associated fold both engines evaluate identically; ties
    break on corpus_id."""
    from ibd_pipeline_spark.operators.similarity import (
        as_double_array,
        dot,
        l2_norm,
    )

    emb = load(spark, sf_dir, "embeddings")
    v = emb.select(
        F.col("vec_id").alias("cid"), as_double_array("embedding").alias("cv")
    )
    q = (
        emb.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("qid"),
            as_double_array("embedding").alias("qv"),
        )
        .withColumn("qn", l2_norm(F.col("qv")))
    )
    mx = v.agg(F.max(l2_norm(F.col("cv"))).alias("mx"))
    s = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid", "qn", dot(F.col("qv"), F.col("cv")).alias("ip"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("ip").desc(), "cid")
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("corpus_id"),
            F.col("rn").cast("int").alias("rank"),
            F.round("ip", 6).alias("inner_product"),
            F.round(F.col("ip") / (F.col("qn") * F.col("mx")), 6).alias(
                "mips_cosine"
            ),
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Adamic–Adar link prediction over the co-activity graph
# ---------------------------------------------------------------------------

_AA_SQL = """
WITH b AS (
  SELECT DISTINCT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         user_id
  FROM events WHERE user_id < 150
), e AS (
  SELECT DISTINCT a.user_id AS u, c.user_id AS v
  FROM b a JOIN b c
    ON a.event_type = c.event_type AND a.h = c.h AND a.user_id < c.user_id
), sym AS (
  SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
), deg AS (
  SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u
), cn AS (
  SELECT t1.v AS u, t2.v AS v, t1.u AS w
  FROM sym t1 JOIN sym t2 ON t1.u = t2.u AND t1.v < t2.v
), nonedge AS (
  SELECT cn.u, cn.v, cn.w FROM cn
  LEFT JOIN e ON e.u = cn.u AND e.v = cn.v
  WHERE e.u IS NULL
), scored AS (
  SELECT ne.u, ne.v,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         SUM(CAST(1.0 / ln(d.deg) AS DECIMAL(28,12))) AS aa
  FROM nonedge ne JOIN deg d ON d.n = ne.w
  GROUP BY ne.u, ne.v
)
SELECT u, v, n_common,
       CAST(ROUND(aa, 6) AS DOUBLE) AS aa_score
FROM scored
ORDER BY aa DESC, u, v
LIMIT 20
"""


@query("graph_adamic_adar", oracle=_AA_SQL)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction over the user co-activity graph
    (same edge build as graph_kcore_peel: an edge joins two users
    active in the same (event_type, hour) bucket): for every
    NON-edge pair with ≥1 common neighbor, AA(u,v) = Σ_w 1/ln(deg w)
    over common neighbors — rare shared contacts score higher than
    hubs. The "who will co-occur next" primitive behind
    recommendation seeding and fraud-ring expansion. Top-20 by score.

    Exactness: per-term 1/ln(deg) quantized to DECIMAL(28,12) (the
    dsum pattern) so the per-pair sum is order-independent; a common
    neighbor has degree ≥ 2 by construction, so ln(deg) > 0 always.

    Scale: common-neighbor enumeration is the sym⋈sym self-join on
    the CENTER node — fan-out Σ_w deg(w)², the standard triangle/
    wedge bound, never user-quadratic; the user_id < 150 slice
    bounds the bench, not the shape. Top-20 is a TakeOrdered."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 150)
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
        .select(F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)  # edge set reused by 3 consumers
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    t1, t2 = sym.alias("t1"), sym.alias("t2")
    cn = t1.join(
        t2, (F.col("t1.u") == F.col("t2.u")) & (F.col("t1.v") < F.col("t2.v"))
    ).select(
        F.col("t1.v").alias("u"), F.col("t2.v").alias("v"), F.col("t1.u").alias("w")
    )
    nonedge = cn.join(e, ["u", "v"], "left_anti")
    scored = (
        nonedge.join(deg.withColumnRenamed("n", "w"), "w")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum(
                (F.lit(1.0) / F.log(F.col("deg").cast("double"))).cast(
                    "decimal(28,12)"
                )
            ).alias("aa"),
        )
    )
    return (
        scored.orderBy(F.col("aa").desc(), "u", "v")
        .limit(20)
        .select(
            "u",
            "v",
            "n_common",
            F.round("aa", 6).cast("double").alias("aa_score"),
        )
    )


# ---------------------------------------------------------------------------
# Interval-union activity coverage
# ---------------------------------------------------------------------------

_IVU_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
         epoch_us(CAST(ts AS TIMESTAMP)) + 300000000 AS e
  FROM events WHERE user_id < 50
), marked AS (
  SELECT user_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -9223372036854775808)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
), isl AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (
           PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
  FROM marked
), g AS (
  SELECT user_id, island_id,
         MIN(s) AS is_, MAX(e) AS ie, CAST(COUNT(*) AS BIGINT) AS n
  FROM isl GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(ie - is_) AS BIGINT) AS covered_us
FROM g GROUP BY user_id ORDER BY user_id
"""


@query("events_interval_union_time", oracle=_IVU_SQL)
def events_interval_union_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TOTAL ACTIVE TIME as the union of overlapping
    activity intervals (each event opens a 5-minute window): the
    sweep-line island merge — an interval starts a new island iff its
    start exceeds the running max end of everything before it — done
    entirely with user-PARTITIONED windows and exact integer
    microseconds. The engagement-time primitive session counts
    under-measure (overlapping sessions double-count; this never
    does). Complements join_interval_overlap (pairwise) with the
    union/coverage aggregate.

    Scale: one user_id shuffle shared by both windows and the island
    aggregate — the sessionization shape; islands are
    monotone-mergeable so a streaming twin holds per-user
    (last_island_end) state only. user_id < 50 bounds the output,
    not the shape."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id", us.alias("s"), (us + F.lit(300_000_000)).alias("e")
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(prev_max, F.lit(-(2**63))), 1
        ).otherwise(0).alias("new_island"),
    )
    isl = marked.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island_id"),
    )
    g = isl.groupBy("user_id", "island_id").agg(
        F.min("s").alias("is_"),
        F.max("e").alias("ie"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum(F.col("ie") - F.col("is_")).cast("bigint").alias("covered_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Consistent cross-table hash sampling
# ---------------------------------------------------------------------------

_CONSISTENT_SQL = """
WITH eu AS (
  SELECT DISTINCT user_id AS k FROM events
), ou AS (
  SELECT DISTINCT o_custkey % 150 AS k FROM orders
), tagged AS (
  SELECT k, 'events' AS tbl,
         CAST(('0x' || substring(md5('7:' || CAST(k AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 < 10 AS sampled
  FROM eu
  UNION ALL
  SELECT k, 'orders' AS tbl,
         CAST(('0x' || substring(md5('7:' || CAST(k AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 < 10 AS sampled
  FROM ou
), agg AS (
  SELECT
    CAST(COUNT(CASE WHEN tbl = 'events' THEN 1 END) AS BIGINT) AS n_event_users,
    CAST(COUNT(CASE WHEN tbl = 'orders' THEN 1 END) AS BIGINT) AS n_order_users,
    CAST(COUNT(CASE WHEN tbl = 'events' AND sampled THEN 1 END) AS BIGINT)
      AS sampled_event_users,
    CAST(COUNT(CASE WHEN tbl = 'orders' AND sampled THEN 1 END) AS BIGINT)
      AS sampled_order_users
  FROM tagged
), common AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_common,
         CAST(COUNT(CASE WHEN e.sampled THEN 1 END) AS BIGINT)
           AS sampled_common,
         CAST(COUNT(CASE WHEN e.sampled <> o.sampled THEN 1 END) AS BIGINT)
           AS n_flag_mismatch
  FROM (SELECT k, sampled FROM tagged WHERE tbl = 'events') e
  JOIN (SELECT k, sampled FROM tagged WHERE tbl = 'orders') o USING (k)
)
SELECT a.*, c.n_common, c.sampled_common, c.n_flag_mismatch,
       c.n_flag_mismatch = 0 AS consistent
FROM agg a CROSS JOIN common c
"""


@query("sample_consistent_hash_join", oracle=_CONSISTENT_SQL)
def sample_consistent_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent 10% entity sampling ACROSS TABLES: the same md5
    bucket rule applied to the shared key in events AND orders keeps
    exactly the same entities in both samples — the property
    rand()/TABLESAMPLE cannot give, and the one that makes sampled
    JOINs valid (sample-then-join equals join-then-sample on hash
    samples; on independent samples the join keeps ~1% instead of
    10%). Emits per-table populations/sample sizes, the common-key
    domain, and a zero flag-mismatch attestation.

    Scale: per-row hash + two distinct-key aggregates + one key
    join; no data-sized structure anywhere. The md5 rule is
    engine-portable, so a downstream DuckDB/ClickHouse consumer
    draws the identical sample."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    ev = load(spark, sf_dir, "events")
    od = load(spark, sf_dir, "orders")
    eu = ev.select(F.col("user_id").alias("k")).distinct()
    ou = od.select((F.col("o_custkey") % 150).alias("k")).distinct()
    flag = (md5_bucket(F.col("k"), 7, 100) < 10).alias("sampled")
    e = eu.select("k", flag)
    o = ou.select("k", flag)
    agg = e.select(F.lit("e").alias("t"), "sampled").unionAll(
        o.select(F.lit("o").alias("t"), "sampled")
    ).agg(
        F.count(F.when(F.col("t") == "e", 1)).cast("bigint").alias("n_event_users"),
        F.count(F.when(F.col("t") == "o", 1)).cast("bigint").alias("n_order_users"),
        F.count(F.when((F.col("t") == "e") & F.col("sampled"), 1))
        .cast("bigint")
        .alias("sampled_event_users"),
        F.count(F.when((F.col("t") == "o") & F.col("sampled"), 1))
        .cast("bigint")
        .alias("sampled_order_users"),
    )
    j = e.withColumnRenamed("sampled", "se").join(
        o.withColumnRenamed("sampled", "so"), "k"
    )
    common = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
        F.count(F.when(F.col("se"), 1)).cast("bigint").alias("sampled_common"),
        F.count(F.when(F.col("se") != F.col("so"), 1))
        .cast("bigint")
        .alias("n_flag_mismatch"),
    )
    return agg.crossJoin(F.broadcast(common)).withColumn(
        "consistent", F.col("n_flag_mismatch") == 0
    )


# ---------------------------------------------------------------------------
# Nelson–Aalen cumulative hazard
# ---------------------------------------------------------------------------

_NA_SQL = """
WITH u AS (
  SELECT user_id,
         MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
         MAX(CAST(ts AS TIMESTAMP)) AS last_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
           AS conv_ts
  FROM events GROUP BY user_id
), lif AS (
  SELECT CAST(datediff('day', CAST(first_ts AS DATE),
                       CAST(COALESCE(conv_ts, last_ts) AS DATE))
              AS BIGINT) AS dur,
         conv_ts IS NULL AS censored
  FROM u
), d AS (
  SELECT dur,
         CAST(COUNT(*) FILTER (NOT censored) AS BIGINT) AS d_events,
         CAST(COUNT(*) FILTER (censored) AS BIGINT) AS c_censored
  FROM lif GROUP BY dur
), k AS (
  SELECT dur, d_events, c_censored,
         CAST((SELECT SUM(d_events + c_censored) FROM d)
           - COALESCE(SUM(d_events + c_censored) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM d
), s AS (
  SELECT dur, d_events, n_risk,
         SUM(CAST(ROUND(CAST(d_events AS DOUBLE) / n_risk, 8)
                  AS DECIMAL(28,8))) OVER (
           ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS h,
         SUM(CAST(ROUND(CAST(d_events AS DOUBLE) / (n_risk * n_risk), 10)
                  AS DECIMAL(28,10))) OVER (
           ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS vr
  FROM k
)
SELECT dur, n_risk, d_events,
       ROUND(CAST(h AS DOUBLE), 6) AS cum_hazard,
       ROUND(EXP(-CAST(h AS DOUBLE)), 6) AS na_survival,
       ROUND(CAST(vr AS DOUBLE), 8) AS hazard_var
FROM s ORDER BY dur
"""


@query("stats_nelson_aalen", oracle=_NA_SQL)
def stats_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator over time-to-first-
    purchase (same right-censored construction as stats_kaplan_meier
    since r11: death = a user's first purchase, measured in days from
    first activity; never-purchasers censored at last activity):
    H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ, its variance Σ dᵢ/nᵢ², and
    the Fleming–Harrington survival exp(−H) — the hazard-side
    companion KM's product-limit can't give (H is additive, so
    hazard INCREMENTS between any two horizons read directly off the
    curve).

    Exactness: dᵢ, nᵢ are exact integers; each hazard term rounds
    to decimal BEFORE the cumulative sum (the KM ln-term pattern) so
    prefixes are order-independent; prefix sums ride the
    block-stitched cumsum (blocks of 32 duration days — the r11
    calendar helper with an integer spine), no unpartitioned window.

    Scale: one user_id shuffle for lifetimes; everything after runs
    on the day-span-bounded duration frame."""
    from ibd_pipeline_spark.operators.calendar import month_stitched_cumsum

    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("conv_ts"),
    )
    lif = u.select(
        F.datediff(
            F.to_date(F.coalesce("conv_ts", "last_ts")),
            F.to_date("first_ts"),
        )
        .cast("bigint")
        .alias("dur"),
        F.col("conv_ts").isNull().alias("censored"),
    )
    d = lif.groupBy("dur").agg(
        F.count(F.when(~F.col("censored"), 1)).cast("bigint").alias("d_events"),
        F.count(F.when(F.col("censored"), 1)).cast("bigint").alias("c_censored"),
    )
    tot = d.agg(
        F.sum(F.col("d_events") + F.col("c_censored")).alias("n_total")
    )
    blk = F.floor(F.col("dur") / 32)
    cum = month_stitched_cumsum(
        d.withColumn("dc", F.col("d_events") + F.col("c_censored")),
        "dur",
        ["dc"],
        block=blk,
    )
    k = cum.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d_events",
        (F.col("n_total") - F.col("cum_dc") + F.col("dc"))
        .cast("bigint")
        .alias("n_risk"),
    )
    terms = k.select(
        "dur",
        "d_events",
        "n_risk",
        F.round(F.col("d_events").cast("double") / F.col("n_risk"), 8)
        .cast("decimal(28,8)")
        .alias("ht"),
        F.round(
            F.col("d_events").cast("double")
            / (F.col("n_risk") * F.col("n_risk")),
            10,
        )
        .cast("decimal(28,10)")
        .alias("vt"),
    )
    s = month_stitched_cumsum(terms, "dur", ["ht", "vt"], block=blk)
    # r11: ROUND runs on the decimal→double IMAGE, not the decimal —
    # a DECIMAL cumsum ending in an exact trailing "…50" rounds
    # differently across engines (Spark decimal ROUND is HALF_UP;
    # DuckDB's is not), while the double image never sits exactly on
    # the half, so both engines decide the same way (hit at sf0.1:
    # cum_hazard 1.11769250 → 1.117693 vs 1.117692)
    return s.select(
        "dur",
        "n_risk",
        "d_events",
        F.round(F.col("cum_ht").cast("double"), 6).alias("cum_hazard"),
        F.round(F.exp(-F.col("cum_ht").cast("double")), 6).alias("na_survival"),
        F.round(F.col("cum_vt").cast("double"), 8).alias("hazard_var"),
    ).orderBy("dur")


# ---------------------------------------------------------------------------
# Cochran–Armitage trend test
# ---------------------------------------------------------------------------

from ibd_pipeline_spark.queries.statcommon import _phi_tail_sql, _PHI_B  # noqa: E402

_CA_SQL = f"""
WITH g AS (
  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS r
  FROM orders GROUP BY 1
), m AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(r) AS BIGINT) AS rr,
         CAST(SUM(s * n) AS BIGINT) AS sn,
         CAST(SUM(s * s * n) AS BIGINT) AS ssn,
         CAST(SUM(s * r) AS BIGINT) AS sr
  FROM g
), z AS (
  SELECT nn, rr,
         (CAST(sr AS DOUBLE) - CAST(rr AS DOUBLE) * sn / nn) AS t,
         (CAST(rr AS DOUBLE) / nn) * (1.0 - CAST(rr AS DOUBLE) / nn)
           * (CAST(ssn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / nn) AS v
  FROM m
)
SELECT nn AS n, rr AS n_success,
       ROUND(t / sqrt(v), 6) AS z_stat,
       ROUND(2.0 * {_phi_tail_sql("abs(t / sqrt(v))")}, 8) AS p_value
FROM z
"""


@query("stats_cochran_armitage", oracle=_CA_SQL)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: is the 'F'-status proportion
    monotonically associated with order priority (scores 1..5 from
    the priority prefix)? The dose-response test a chi-square of
    independence wastes power on — one degree of freedom aimed at
    the ORDERED alternative. T = Σsᵢrᵢ − R·Σsᵢnᵢ/N with
    Var = p̄(1−p̄)(Σsᵢ²nᵢ − (Σsᵢnᵢ)²/N); all five moments are exact
    BIGINTs from one map-side-combined aggregate, the z and the
    Abramowitz–Stegun two-sided p are fixed double algebra at
    output (the BH normal-tail pattern).

    Scale: one scan, one 5-row group frame — nothing else."""
    od = load(spark, sf_dir, "orders")
    g = od.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("s")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1))
        .cast("bigint")
        .alias("r"),
    )
    m = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("r").cast("bigint").alias("rr"),
        F.sum(F.col("s") * F.col("n")).cast("bigint").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).cast("bigint").alias("ssn"),
        F.sum(F.col("s") * F.col("r")).cast("bigint").alias("sr"),
    )
    t = (
        F.col("sr").cast("double")
        - F.col("rr").cast("double") * F.col("sn") / F.col("nn")
    )
    v = (
        (F.col("rr").cast("double") / F.col("nn"))
        * (F.lit(1.0) - F.col("rr").cast("double") / F.col("nn"))
        * (
            F.col("ssn").cast("double")
            - F.col("sn").cast("double") * F.col("sn") / F.col("nn")
        )
    )
    az = F.abs(t / F.sqrt(v))
    kk = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    poly = (
        (
            (
                (F.lit(_PHI_B[4]) * kk + F.lit(_PHI_B[3])) * kk
                + F.lit(_PHI_B[2])
            )
            * kk
            + F.lit(_PHI_B[1])
        )
        * kk
        + F.lit(_PHI_B[0])
    ) * kk
    tail = F.lit(0.3989422804014327) * F.exp(-0.5 * az * az) * poly
    return m.select(
        F.col("nn").alias("n"),
        F.col("rr").alias("n_success"),
        F.round(t / F.sqrt(v), 6).alias("z_stat"),
        F.round(2.0 * tail, 8).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Page–Hinkley changepoint statistic
# ---------------------------------------------------------------------------

_PH_DELTA, _PH_LAMBDA = 0.1, 5.0

_PH_SQL = f"""
WITH d AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE)
           / COUNT(value) AS day_avg
  FROM events GROUP BY 1
), g AS (
  SELECT CAST(ROUND(SUM(CAST(day_avg AS DECIMAL(28,8))), 8) AS DOUBLE)
           / COUNT(*) AS gmean
  FROM d
), t AS (
  SELECT day, day_avg,
         CAST(ROUND(day_avg - g.gmean - {_PH_DELTA}, 8) AS DECIMAL(28,8)) AS dev
  FROM d, g
), c0 AS (
  SELECT day, day_avg,
         SUM(dev) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM t
), c AS (
  SELECT day, day_avg, m,
         MIN(m) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
  FROM c0
), ph AS (
  SELECT day, day_avg, m - runmin AS ph FROM c
)
SELECT day AS changepoint_day,
       CAST(ROUND(ph, 6) AS DOUBLE) AS ph_stat,
       ph > {_PH_LAMBDA} AS alarm,
       ROUND(day_avg, 4) AS day_avg
FROM ph ORDER BY ph DESC, day LIMIT 1
"""


@query("stats_page_hinkley", oracle=_PH_SQL)
def stats_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley upward-drift detector on the daily mean event
    value: mₜ = Σ(x̄ᵢ − μ − δ) and PHₜ = mₜ − min_{k≤t} mₖ — the
    sequential cousin of events_cusum_changepoint (CUSUM localizes a
    level shift against the diagonal; PH accumulates drift against a
    tolerance δ and alarms when the climb from the running minimum
    exceeds λ). Reports the argmax day, the statistic, and the
    alarm verdict at δ=0.1, λ=5.

    Exactness: day means ride the davg decimal contract; deviations
    round to DECIMAL(28,8) before any prefix, so the cumulative sum
    AND its running minimum are exact decimal algebra — both ride
    the r11 month-stitch helpers (cumsum + running-extreme), no
    unpartitioned window.

    Scale: one day-grain aggregate, then day-frame stitches; argmax
    is a LIMIT-1 TakeOrdered."""
    from ibd_pipeline_spark.operators.calendar import (
        month_stitched_cumsum,
        month_stitched_running_extreme,
    )

    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        (
            F.round(F.sum(F.col("value").cast("decimal(28,8)")), 4).cast("double")
            / F.count("value")
        ).alias("day_avg")
    )
    g = d.agg(
        (
            F.round(F.sum(F.col("day_avg").cast("decimal(28,8)")), 8).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("gmean")
    )
    t = d.crossJoin(F.broadcast(g)).select(
        "day",
        "day_avg",
        F.round(
            F.col("day_avg") - F.col("gmean") - F.lit(_PH_DELTA), 8
        )
        .cast("decimal(28,8)")
        .alias("dev"),
    )
    c = month_stitched_cumsum(t, "day", ["dev"])
    c = month_stitched_running_extreme(c, "day", "cum_dev", "runmin", kind="min")
    ph = F.col("cum_dev") - F.col("runmin")
    return (
        c.select("day", "day_avg", ph.alias("ph"))
        .orderBy(F.col("ph").desc(), "day")
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.round("ph", 6).cast("double").alias("ph_stat"),
            (F.col("ph") > _PH_LAMBDA).alias("alarm"),
            F.round("day_avg", 4).alias("day_avg"),
        )
    )


# ---------------------------------------------------------------------------
# mSPRT always-valid sequential test
# ---------------------------------------------------------------------------

_MSPRT_TAU2 = 1e-4

_MSPRT_SQL = f"""
WITH du AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, user_id,
         CAST(('0x' || substring(md5('11:' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS arm,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY 1, 2, 3
), daily AS (
  SELECT day,
         CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS na,
         CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS cb
  FROM du GROUP BY day
), cum AS (
  SELECT day,
         SUM(na) OVER w AS na, SUM(nb) OVER w AS nb,
         SUM(ca) OVER w AS ca, SUM(cb) OVER w AS cb
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), lam AS (
  SELECT day, na, nb, ca, cb,
         CASE WHEN na > 0 AND nb > 0
                   AND (ca + cb) > 0 AND (ca + cb) < (na + nb) THEN
           sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                * (1.0 / na + 1.0 / nb)
                / ((CAST(ca + cb AS DOUBLE) / (na + nb))
                   * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                   * (1.0 / na + 1.0 / nb) + {_MSPRT_TAU2}))
           * exp((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                 * (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                 * {_MSPRT_TAU2}
                 / (2.0 * ((CAST(ca + cb AS DOUBLE) / (na + nb))
                           * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                           * (1.0 / na + 1.0 / nb))
                    * ((CAST(ca + cb AS DOUBLE) / (na + nb))
                       * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                       * (1.0 / na + 1.0 / nb) + {_MSPRT_TAU2})))
         END AS lam
  FROM cum
), runm AS (
  SELECT day, na, nb, ca, cb, lam,
         MAX(lam) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lmax
  FROM lam
)
SELECT day, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(ca AS BIGINT) AS conv_a, CAST(cb AS BIGINT) AS conv_b,
       ROUND(lam, 6) AS mixture_lr,
       ROUND(CASE WHEN lmax IS NOT NULL AND lmax > 1.0
                  THEN 1.0 / lmax ELSE 1.0 END, 6) AS p_always_valid
FROM runm ORDER BY day
"""


@query("ab_msprt_always_valid", oracle=_MSPRT_SQL)
def ab_msprt_always_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B testing via the mixture SPRT
    (Johari et al.): per calendar day, the cumulative two-proportion
    mixture likelihood ratio Λₙ = √(Vₙ/(Vₙ+τ²))·exp(d²τ²/(2Vₙ(Vₙ+τ²)))
    and the always-valid p-value pₙ = min(1, 1/max_{k≤n} Λₖ) — the
    p-value you may READ EVERY DAY and stop on without inflating
    type-I error, which the fixed-horizon z-test
    (ab_test_proportion_ztest) forbids. Units are (user, day) active
    Bernoullis, arms by md5 hash split, conversion = any purchase
    that day.

    Exactness: all cumulative counts are exact integer prefix sums
    (r11 month-stitch); Λ and p are fixed double algebra over
    identical integers, and the running max rides the
    running-extreme stitch — max over identical doubles is
    bit-deterministic.

    Scale: one (day, user) aggregate, a day-grain frame after;
    everything windowed is month-partitioned."""
    from ibd_pipeline_spark.operators.calendar import (
        month_stitched_cumsum,
        month_stitched_running_extreme,
    )
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    ev = load(spark, sf_dir, "events")
    du = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "user_id",
        md5_bucket(F.col("user_id"), 11, 2).alias("arm"),
    ).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("conv")
    )
    daily = du.groupBy("day").agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("na"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("nb"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    cum = month_stitched_cumsum(daily, "day", ["na", "nb", "ca", "cb"])
    na, nb = F.col("cum_na"), F.col("cum_nb")
    ca, cb = F.col("cum_ca"), F.col("cum_cb")
    pbar = (ca + cb).cast("double") / (na + nb)
    v = pbar * (F.lit(1.0) - pbar) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    d = ca.cast("double") / na - cb.cast("double") / nb
    lam = F.when(
        (na > 0) & (nb > 0) & ((ca + cb) > 0) & ((ca + cb) < (na + nb)),
        F.sqrt(v / (v + F.lit(_MSPRT_TAU2)))
        * F.exp(
            d * d * F.lit(_MSPRT_TAU2)
            / (F.lit(2.0) * v * (v + F.lit(_MSPRT_TAU2)))
        ),
    )
    lamf = cum.select("day", na.alias("n_a"), nb.alias("n_b"),
                      ca.alias("conv_a"), cb.alias("conv_b"),
                      lam.alias("lam"))
    runm = month_stitched_running_extreme(lamf, "day", "lam", "lmax", kind="max")
    return runm.select(
        "day",
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round("lam", 6).alias("mixture_lr"),
        F.round(
            F.when(
                F.col("lmax").isNotNull() & (F.col("lmax") > 1.0),
                F.lit(1.0) / F.col("lmax"),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("p_always_valid"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Brown's double exponential smoothing + 7-day forecast
# ---------------------------------------------------------------------------

_DS_W = [0.5 ** k for k in range(8)]  # dyadic EWMA weights, a = 0.5
_DS_A = 1.9921875  # sum of the 8 truncated weights (2 - 2^-7)


def _ewma_sql(col: str, lag_fmt: str) -> str:
    """value + 0.5*lag1 + ... over 7 lags, normalized — written once,
    instantiated for both engines with their lag spelling."""
    terms = [col] + [
        f"{w!r} * {lag_fmt.format(col=col, k=k)}"
        for k, w in enumerate(_DS_W[1:], start=1)
    ]
    return f"(({' + '.join(terms)}) / {_DS_A!r})"


_DS_SQL = f"""
WITH d AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE)
           / COUNT(value) AS x
  FROM events GROUP BY 1
), s1 AS (
  SELECT day, x,
         {_ewma_sql("x", "LAG({col}, {k}) OVER (ORDER BY day)")} AS sp,
         LAG(x, 14) OVER (ORDER BY day) AS x14
  FROM d
), s2 AS (
  SELECT day, x, sp, x14,
         {_ewma_sql("sp", "LAG({col}, {k}) OVER (ORDER BY day)")} AS spp
  FROM s1
)
SELECT day, ROUND(x, 4) AS day_avg,
       ROUND(2.0 * sp - spp, 6) AS level,
       ROUND(sp - spp, 6) AS trend,
       ROUND((2.0 * sp - spp) + 7.0 * (sp - spp), 6) AS forecast_7d
FROM s2 WHERE x14 IS NOT NULL
ORDER BY day
"""


@query("events_double_smoothing_forecast", oracle=_DS_SQL)
def events_double_smoothing_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing of the daily mean event
    value with a 7-day-ahead forecast: S′ = EWMA(x), S″ = EWMA(S′),
    level = 2S′−S″, trend = S′−S″ (α = 0.5 makes Holt's two
    parameters collapse), ŷ(t+7) = level + 7·trend — the
    trend-aware forecaster events_ewma_daily (level only) and
    events_forecast_backtest feed on. Both smoothing stages use the
    8-term truncated dyadic window of the EWMA precedent, so every
    product is an exponent shift and the fixed-order sums are
    bit-identical across engines; only days with 14 full lags emit
    (every output is a full double window).

    Scale: one day-grain aggregate; both lag stages run
    MONTH-PARTITIONED over a 14-day-padded day frame
    (operators/calendar.py:with_month_padding — exact on the dense
    day grain)."""
    from ibd_pipeline_spark.operators.calendar import with_month_padding

    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        (
            F.round(F.sum(F.col("value").cast("decimal(28,8)")), 4).cast("double")
            / F.count("value")
        ).alias("x")
    )
    padded = with_month_padding(d, "day", pad_before=14)
    w = Window.partitionBy("_m").orderBy("day")

    def ewma_of(col: str):
        e = F.col(col)
        for k, wt in enumerate(_DS_W[1:], start=1):
            e = e + F.lit(wt) * F.lag(col, k).over(w)
        return e / F.lit(_DS_A)

    s1 = padded.select(
        "day",
        "x",
        "_m",
        "_own",
        ewma_of("x").alias("sp"),
        F.lag("x", 14).over(w).alias("x14"),
    )
    s2 = s1.select(
        "day", "x", "x14", "_own", ewma_of("sp").alias("spp"), "sp"
    )
    level = 2.0 * F.col("sp") - F.col("spp")
    trend = F.col("sp") - F.col("spp")
    return (
        s2.filter(F.col("_own") & F.col("x14").isNotNull())
        .select(
            "day",
            F.round("x", 4).alias("day_avg"),
            F.round(level, 6).alias("level"),
            F.round(trend, 6).alias("trend"),
            F.round(level + 7.0 * trend, 6).alias("forecast_7d"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Hurst exponent by rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------

_HURST_NS = (8, 16, 32)

_HURST_SQL = f"""
WITH d AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
), idx AS (
  SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS t FROM d
), blocks AS (
  SELECT n, (t - 1) // n AS blk, t, CAST(x AS DOUBLE) AS x
  FROM idx, UNNEST([{", ".join(str(n) for n in _HURST_NS)}]) u(n)
), full_blocks AS (
  SELECT n, blk FROM blocks GROUP BY n, blk HAVING COUNT(*) = n
), m AS (
  SELECT b.n, b.blk, b.t, b.x,
         CAST(SUM(b.x) OVER (PARTITION BY b.n, b.blk) AS DOUBLE) / b.n AS mu,
         CAST(SUM(b.x * b.x) OVER (PARTITION BY b.n, b.blk) AS DOUBLE) / b.n
           AS xx
  FROM blocks b SEMI JOIN full_blocks f ON f.n = b.n AND f.blk = b.blk
), cd AS (
  SELECT n, blk, mu, xx,
         SUM(x - mu) OVER (PARTITION BY n, blk ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdev
  FROM m
), rs AS (
  SELECT n, blk,
         CASE WHEN xx - mu * mu > 0 THEN
           CAST(ROUND((MAX(cdev) - MIN(cdev)) / sqrt(xx - mu * mu), 8)
                AS DECIMAL(28,8))
         END AS rsv
  FROM cd GROUP BY n, blk, mu, xx
), av AS (
  SELECT n, CAST(COUNT(rsv) AS BIGINT) AS n_blocks,
         CAST(SUM(rsv) AS DOUBLE) / COUNT(rsv) AS avg_rs
  FROM rs GROUP BY n HAVING COUNT(rsv) > 0
), pts AS (
  SELECT n, n_blocks, avg_rs,
         CAST(ROUND(ln(CAST(n AS DOUBLE)), 10) AS DECIMAL(28,10)) AS lx,
         CAST(ROUND(ln(avg_rs), 10) AS DECIMAL(28,10)) AS ly
  FROM av
), h AS (
  SELECT (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(lx * ly) AS DOUBLE)
          - CAST(SUM(lx) AS DOUBLE) * CAST(SUM(ly) AS DOUBLE))
         / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(lx * lx) AS DOUBLE)
            - CAST(SUM(lx) AS DOUBLE) * CAST(SUM(lx) AS DOUBLE)) AS hurst
  FROM pts
)
SELECT CAST(p.n AS INT) AS block_size, p.n_blocks,
       ROUND(p.avg_rs, 6) AS avg_rs,
       ROUND(h.hurst, 4) AS hurst
FROM pts p CROSS JOIN h ORDER BY block_size
"""


@query("events_hurst_exponent", oracle=_HURST_SQL)
def events_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily event-count series by classical
    rescaled-range analysis: split the series into blocks of n ∈
    {8, 16, 32} days, per block R/S = (max−min of the mean-adjusted
    cumulative deviation) / population σ, and H = the log-log OLS
    slope of avg R/S against n — the long-memory diagnostic
    (H ≈ 0.5 random walk, > 0.5 persistent trends, < 0.5 mean
    reversion) that tells a capacity planner whether bursts cluster.
    Complements events_fano_burstiness (dispersion at ONE scale)
    with the ACROSS-scale signature, and
    stats_autocorrelation_daily (linear memory at fixed lags) with a
    scale-free summary.

    Exactness: day indices ride the integer month-stitch; block
    moments are exact integer sums; the within-block cumulative
    deviation is a sequential windowed sum over identical doubles
    (deterministic under the total order on both engines); per-block
    R/S rounds to decimal before the cross-block mean, and the
    ln-values round to decimal before the 3-point OLS (the ANOVA
    cancellation guard).

    Scale: one day-grain aggregate; blocks are day-frame-sized, all
    windows (n, blk)-partitioned."""
    from ibd_pipeline_spark.operators.calendar import month_stitched_cumsum

    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    idx = month_stitched_cumsum(
        d.withColumn("one", F.lit(1).cast("bigint")), "day", ["one"]
    ).select("day", "x", F.col("cum_one").alias("t"))
    ns = spark.range(len(_HURST_NS)).select(
        F.element_at(
            F.array(*[F.lit(n) for n in _HURST_NS]), (F.col("id") + 1).cast("int")
        ).alias("n")
    )
    blocks = idx.crossJoin(F.broadcast(ns)).select(
        "n",
        F.floor((F.col("t") - 1) / F.col("n")).alias("blk"),
        "t",
        F.col("x").cast("double").alias("x"),
    )
    full = blocks.groupBy("n", "blk").agg(
        F.count(F.lit(1)).alias("c")
    ).filter(F.col("c") == F.col("n")).select("n", "blk")
    b = blocks.join(full, ["n", "blk"], "left_semi")
    wb = Window.partitionBy("n", "blk")
    m = b.select(
        "n",
        "blk",
        "t",
        "x",
        (F.sum("x").over(wb).cast("double") / F.col("n")).alias("mu"),
        (F.sum(F.col("x") * F.col("x")).over(wb).cast("double") / F.col("n"))
        .alias("xx"),
    )
    wcd = (
        Window.partitionBy("n", "blk")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cd = m.select(
        "n", "blk", "mu", "xx",
        F.sum(F.col("x") - F.col("mu")).over(wcd).alias("cdev"),
    )
    rs = cd.groupBy("n", "blk", "mu", "xx").agg(
        F.when(
            F.col("xx") - F.col("mu") * F.col("mu") > 0,
            F.round(
                (F.max("cdev") - F.min("cdev"))
                / F.sqrt(F.col("xx") - F.col("mu") * F.col("mu")),
                8,
            ).cast("decimal(28,8)"),
        ).alias("rsv")
    )
    av = (
        rs.groupBy("n")
        .agg(
            F.count("rsv").cast("bigint").alias("n_blocks"),
            (F.sum("rsv").cast("double") / F.count("rsv")).alias("avg_rs"),
        )
        .filter(F.col("n_blocks") > 0)
    )
    pts = av.select(
        "n",
        "n_blocks",
        "avg_rs",
        F.round(F.log(F.col("n").cast("double")), 10)
        .cast("decimal(28,10)")
        .alias("lx"),
        F.round(F.log("avg_rs"), 10).cast("decimal(28,10)").alias("ly"),
    )
    hm = pts.agg(
        (
            (
                F.count(F.lit(1)).cast("double")
                * F.sum(F.col("lx") * F.col("ly")).cast("double")
                - F.sum("lx").cast("double") * F.sum("ly").cast("double")
            )
            / (
                F.count(F.lit(1)).cast("double")
                * F.sum(F.col("lx") * F.col("lx")).cast("double")
                - F.sum("lx").cast("double") * F.sum("lx").cast("double")
            )
        ).alias("hurst")
    )
    return (
        pts.crossJoin(F.broadcast(hm))
        .select(
            F.col("n").cast("int").alias("block_size"),
            "n_blocks",
            F.round("avg_rs", 6).alias("avg_rs"),
            F.round("hurst", 4).alias("hurst"),
        )
        .orderBy("block_size")
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss sign projection + distortion audit
# ---------------------------------------------------------------------------

_JL_M, _JL_DIM, _JL_SQRT_M = 16, 64, 4.0


def _jl_signs() -> "list[list[float]]":
    """±1 sign matrix (m × dim) from md5 — deterministic public
    randomness, generated once here and embedded as LITERALS in both
    engines (Achlioptas 2003: ±1 entries satisfy the JL lemma)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[:2], 16) % 2
            == 0
            else -1.0
            for i in range(_JL_DIM)
        ]
        for j in range(_JL_M)
    ]


def _jl_proj_sql(vec: str, one_based: bool) -> "list[str]":
    off = 1 if one_based else 0
    return [
        "(("
        + " + ".join(
            f"{s!r} * {vec}[{i + off}]" for i, s in enumerate(row)
        )
        + f") / {_JL_SQRT_M!r})"
        for row in _jl_signs()
    ]


def _jl_oracle() -> str:
    projs = ", ".join(
        f"{p} AS p{j}" for j, p in enumerate(_jl_proj_sql("v", True))
    )
    d_orig = " + ".join(
        f"(a.v[{i + 1}] - b.v[{i + 1}]) * (a.v[{i + 1}] - b.v[{i + 1}])"
        for i in range(_JL_DIM)
    )
    d_proj = " + ".join(
        f"(a.p{j} - b.p{j}) * (a.p{j} - b.p{j})" for j in range(_JL_M)
    )
    return f"""
WITH v AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < 20
), p AS (
  SELECT id, v, {projs} FROM v
)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND({d_orig}, 6) AS d_orig,
       ROUND({d_proj}, 6) AS d_proj,
       ROUND(({d_proj}) / ({d_orig}), 4) AS distortion
FROM p a JOIN p b ON a.id < b.id
ORDER BY id_a, id_b
"""


@query("similarity_jl_projection", oracle=_jl_oracle)
def similarity_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sign projection (64 → 16 dims) with a
    per-pair distortion audit: y = Rx/√m with R ∈ {±1}^{16×64} drawn
    from md5 (Achlioptas' database-friendly JL — no Gaussians
    needed), then every pair among 20 probe vectors reports original
    vs projected squared L2 and their ratio. The cheap OBLIVIOUS
    dimensionality reduction next to PCA (data-dependent, needs a
    pass) — the front end that shrinks ANN/clustering inputs 4× with
    E[distortion] = 1 and variance 2/m per pair.

    Exactness: the sign matrix is generated ONCE in Python from md5
    and embedded as literals in both engines; projections and
    distances are identical fixed-order double chains, so the audit
    replays bit-for-bit.

    Scale: projection is a per-row map (16 dot folds); the audit's
    pair join is probe-set-sized (190 pairs), broadcast."""
    from ibd_pipeline_spark.operators.similarity import as_double_array

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    v = emb.select(
        F.col("vec_id").alias("id"), as_double_array("embedding").alias("v")
    )
    from ibd_pipeline_spark.operators.ckpt import literal_barrier

    projs = _jl_proj_sql("v", False)
    p = literal_barrier(  # probe-set-sized; barrier stops re-projection
        v.select(
            "id", "v", *[F.expr(pp).alias(f"p{j}") for j, pp in enumerate(projs)]
        )
    )
    a = p.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        *[F.col(f"p{j}").alias(f"pa{j}") for j in range(_JL_M)],
    )
    b = p.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        *[F.col(f"p{j}").alias(f"pb{j}") for j in range(_JL_M)],
    )
    d_orig = F.lit(0.0)
    # left-assoc without a leading 0.0 to mirror the oracle's chain
    d_orig = None
    for i in range(1, _JL_DIM + 1):
        t = (F.element_at("va", i) - F.element_at("vb", i)) * (
            F.element_at("va", i) - F.element_at("vb", i)
        )
        d_orig = t if d_orig is None else d_orig + t
    d_proj = None
    for j in range(_JL_M):
        t = (F.col(f"pa{j}") - F.col(f"pb{j}")) * (
            F.col(f"pa{j}") - F.col(f"pb{j}")
        )
        d_proj = t if d_proj is None else d_proj + t
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(d_orig, 6).alias("d_orig"),
            F.round(d_proj, 6).alias("d_proj"),
            F.round(d_proj / d_orig, 4).alias("distortion"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# TOST equivalence test
# ---------------------------------------------------------------------------

_TOST_MARGIN = 0.02


def _phi_upper(t: str) -> str:
    """SQL for P(Z > t) for ARBITRARY-sign t via the positive-arg
    Zelen–Severo tail: tail(t) when t ≥ 0, else 1 − tail(−t)."""
    return (
        f"(CASE WHEN {t} >= 0 THEN {_phi_tail_sql(f'({t})')}"
        f" ELSE 1.0 - {_phi_tail_sql(f'(-({t}))')} END)"
    )


_TOST_SQL = f"""
WITH assigned AS (
  SELECT user_id,
         CAST(('0x' || substring(md5('11:' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' AND value > 80
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), c AS (
  SELECT CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n_a,
         CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
           AS conv_a,
         CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
           AS conv_b
  FROM assigned
), d AS (
  SELECT n_a, n_b, conv_a, conv_b,
         CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b AS diff,
         sqrt(CAST(conv_a AS DOUBLE) / n_a * (1.0 - CAST(conv_a AS DOUBLE) / n_a)
                / n_a
              + CAST(conv_b AS DOUBLE) / n_b
                * (1.0 - CAST(conv_b AS DOUBLE) / n_b) / n_b) AS se
  FROM c
), t AS (
  SELECT n_a, n_b, conv_a, conv_b, diff, se,
         (diff + {_TOST_MARGIN}) / se AS t1,
         (diff - {_TOST_MARGIN}) / se AS t2
  FROM d
)
SELECT n_a, n_b, conv_a, conv_b,
       ROUND(diff, 6) AS diff,
       ROUND(GREATEST({_phi_upper('t1')},
                      1.0 - {_phi_upper('t2')}), 8) AS p_tost,
       GREATEST({_phi_upper('t1')}, 1.0 - {_phi_upper('t2')}) < 0.05
         AS equivalent
FROM t
"""


@query("ab_tost_equivalence", oracle=_TOST_SQL)
def ab_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (two one-sided tests, Schuirmann): can
    we POSITIVELY conclude the two arms' conversion rates differ by
    less than ±2 points? The question a non-significant z-test
    cannot answer (absence of evidence ≠ evidence of absence) — the
    ship-the-cheaper-variant / no-regression gate. p_tost =
    max(P(d ≤ −δ), P(d ≥ δ)) under the normal approximation; same
    md5 hash split and conversion rule as ab_test_proportion_ztest
    so the two read side by side.

    Exactness: counts are exact integers; diff/se/both tails are
    fixed double algebra (the signed normal tail reduces to the
    positive-arg Zelen–Severo polynomial both engines share).

    Scale: one user-grain aggregate, then 1-row algebra."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    ev = load(spark, sf_dir, "events")
    assigned = ev.groupBy(
        "user_id", md5_bucket(F.col("user_id"), 11, 2).alias("arm")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 80), 1
            ).otherwise(0)
        ).alias("converted")
    )
    c = assigned.agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a")
    pb = F.col("conv_b").cast("double") / F.col("n_b")
    diff = pa - pb
    se = F.sqrt(
        pa * (F.lit(1.0) - pa) / F.col("n_a")
        + pb * (F.lit(1.0) - pb) / F.col("n_b")
    )
    t1 = (diff + F.lit(_TOST_MARGIN)) / se
    t2 = (diff - F.lit(_TOST_MARGIN)) / se

    def phi_upper(t):
        at = F.abs(t)
        kk = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * at)
        poly = (
            (
                (
                    (F.lit(_PHI_B[4]) * kk + F.lit(_PHI_B[3])) * kk
                    + F.lit(_PHI_B[2])
                )
                * kk
                + F.lit(_PHI_B[1])
            )
            * kk
            + F.lit(_PHI_B[0])
        ) * kk
        tail = F.lit(0.3989422804014327) * F.exp(-0.5 * at * at) * poly
        return F.when(t >= 0, tail).otherwise(F.lit(1.0) - tail)

    p_tost = F.greatest(phi_upper(t1), F.lit(1.0) - phi_upper(t2))
    return c.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(diff, 6).alias("diff"),
        F.round(p_tost, 8).alias("p_tost"),
        (p_tost < 0.05).alias("equivalent"),
    )


# ---------------------------------------------------------------------------
# Wilson score confidence intervals
# ---------------------------------------------------------------------------

_WILSON_Z = 1.959963985

_WILSON_SQL = f"""
WITH assigned AS (
  SELECT user_id,
         CAST(('0x' || substring(md5('11:' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' AND value > 80
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), c AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM assigned GROUP BY arm
), w AS (
  SELECT arm, n, conv,
         CAST(conv AS DOUBLE) / n AS p,
         {_WILSON_Z} * {_WILSON_Z} / n AS z2n
  FROM c
)
SELECT CAST(arm AS INT) AS arm, n, conv,
       ROUND(p, 6) AS p_hat,
       ROUND((p + z2n / 2.0
              - {_WILSON_Z} * sqrt(p * (1.0 - p) / n + z2n / (4.0 * n)))
             / (1.0 + z2n), 6) AS wilson_lo,
       ROUND((p + z2n / 2.0
              + {_WILSON_Z} * sqrt(p * (1.0 - p) / n + z2n / (4.0 * n)))
             / (1.0 + z2n), 6) AS wilson_hi
FROM w ORDER BY arm
"""


@query("stats_wilson_ci", oracle=_WILSON_SQL)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence intervals for each arm's
    conversion rate — the binomial interval that behaves at the
    extremes where the Wald interval collapses (never escapes [0,1],
    correct coverage at small n or p near 0/1); the per-arm readout
    next to the difference tests. Same md5 split and conversion
    rule as the z-test family.

    Exactness: exact integer counts; the interval is one fixed
    double formula per arm. Scale: one user-grain aggregate."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    ev = load(spark, sf_dir, "events")
    assigned = ev.groupBy(
        "user_id", md5_bucket(F.col("user_id"), 11, 2).alias("arm")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 80), 1
            ).otherwise(0)
        ).alias("converted")
    )
    c = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    p = F.col("conv").cast("double") / F.col("n")
    z2n = F.lit(_WILSON_Z) * F.lit(_WILSON_Z) / F.col("n")
    rad = F.lit(_WILSON_Z) * F.sqrt(
        p * (F.lit(1.0) - p) / F.col("n") + z2n / (F.lit(4.0) * F.col("n"))
    )
    return c.select(
        F.col("arm").cast("int").alias("arm"),
        "n",
        "conv",
        F.round(p, 6).alias("p_hat"),
        F.round((p + z2n / 2.0 - rad) / (F.lit(1.0) + z2n), 6).alias("wilson_lo"),
        F.round((p + z2n / 2.0 + rad) / (F.lit(1.0) + z2n), 6).alias("wilson_hi"),
    ).orderBy("arm")


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction
# ---------------------------------------------------------------------------

_RAKE_STOP = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

_RAKE_SQL = f"""
WITH toks AS (
  SELECT doc_id, i AS pos, w[i] AS word,
         w[i] IN ({", ".join(f"'{s}'" for s in _RAKE_STOP)}) AS is_stop
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(generate_series(1, len(w))) t(i)
), seg AS (
  SELECT doc_id, pos, word, is_stop,
         SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
  FROM toks
), nonstop AS (
  SELECT doc_id, pos, word, seg_id FROM seg WHERE NOT is_stop
), phr AS (
  SELECT doc_id, seg_id,
         string_agg(word, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS plen
  FROM nonstop GROUP BY doc_id, seg_id
), pw AS (
  SELECT p.doc_id, p.seg_id, p.phrase, p.plen, s.word
  FROM phr p JOIN nonstop s
    ON s.doc_id = p.doc_id AND s.seg_id = p.seg_id
), ws AS (
  SELECT word,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS deg
  FROM pw GROUP BY word
), scored AS (
  SELECT pw.doc_id, pw.seg_id, pw.phrase,
         SUM(CAST(ROUND(CAST(ws.deg AS DOUBLE) / ws.freq, 8)
                  AS DECIMAL(28,8))) AS pscore
  FROM pw JOIN ws USING (word)
  GROUP BY pw.doc_id, pw.seg_id, pw.phrase
), uniq AS (
  SELECT phrase,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         MAX(pscore) AS score
  FROM scored GROUP BY phrase
)
SELECT phrase,
       CAST(len(string_split(phrase, ' ')) AS INT) AS n_words,
       n_occurrences,
       CAST(ROUND(score, 6) AS DOUBLE) AS score
FROM uniq
ORDER BY score DESC, phrase
LIMIT 20
"""

@query("text_rake_keyphrases", oracle=_RAKE_SQL)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-free word runs; each word
    scores deg/freq (deg = summed length of phrases containing it —
    co-occurrence degree; freq = raw count inside phrases), a phrase
    scores the sum of its words' scores, and the top 20 distinct
    phrases emit with occurrence counts — the zero-supervision
    keyword extractor next to tf-idf (corpus-relative) and PMI
    (pair-level) for corpus summarization and topic tagging.

    Exactness: per-word deg/freq ratios round to DECIMAL(28,8)
    before the phrase sum (order-independent); the phrase score is
    identical across occurrences by construction, so distinct-phrase
    aggregation is stable.

    Scale: tokenization explodes once; segment ids ride a
    doc-PARTITIONED running count; word scores are one vocab-sized
    aggregate joined back broadcast; top-20 is a TakeOrdered."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).withColumn("is_stop", F.col("word").isin(*_RAKE_STOP))
    wseg = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seg = toks.withColumn(
        "seg_id", F.sum(F.when(F.col("is_stop"), 1).otherwise(0)).over(wseg)
    ).filter(~F.col("is_stop"))
    phr = seg.groupBy("doc_id", "seg_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).cast("bigint").alias("plen"),
    )
    pw = phr.join(
        seg.select("doc_id", "seg_id", "word"), ["doc_id", "seg_id"]
    )
    ws = pw.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    scored = (
        pw.join(F.broadcast(ws), "word")
        .groupBy("doc_id", "seg_id", "phrase")
        .agg(
            F.sum(
                F.round(F.col("deg").cast("double") / F.col("freq"), 8).cast(
                    "decimal(28,8)"
                )
            ).alias("pscore")
        )
    )
    uniq = scored.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.max("pscore").alias("score"),  # identical across occurrences
    )
    return (
        uniq.select(
            "phrase",
            F.size(F.split("phrase", " ")).cast("int").alias("n_words"),
            "n_occurrences",
            F.round(F.col("score"), 6).cast("double").alias("score"),
        )
        .orderBy(F.col("score").desc(), "phrase")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient + global transitivity
# ---------------------------------------------------------------------------

_CC_SQL = """
WITH b AS (
  SELECT DISTINCT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         user_id
  FROM events WHERE user_id < 100
), e AS (
  SELECT DISTINCT a.user_id AS u, c.user_id AS v
  FROM b a JOIN b c
    ON a.event_type = c.event_type AND a.h = c.h AND a.user_id < c.user_id
), sym AS (
  SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
), deg AS (
  SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u
), tri AS (
  -- ordered triangles u < v < w: wedge (u<v, u<w with v<w) closed by (v,w)
  SELECT e1.u, e1.v, e2.v AS w
  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
), pertri AS (
  SELECT u AS n FROM tri
  UNION ALL SELECT v AS n FROM tri
  UNION ALL SELECT w AS n FROM tri
), tcount AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM pertri GROUP BY n
)
SELECT d.n AS user_id, d.deg,
       CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.deg >= 2 THEN
         ROUND(2.0 * COALESCE(t.n_triangles, 0) / (d.deg * (d.deg - 1)), 6)
       END AS clustering_coeff
FROM deg d LEFT JOIN tcount t ON t.n = d.n
ORDER BY user_id
"""


@query("graph_clustering_coefficient", oracle=_CC_SQL)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node of the user co-activity
    graph: cc(n) = 2·triangles(n) / (deg(n)·(deg(n)−1)) — how close a
    user's neighborhood is to a clique. Triangles enumerate ONCE in
    canonical u < v < w order (wedge at the minimum vertex closed by
    the (v, w) edge — each triangle counted exactly once, then
    credited to all three corners), the standard oriented-wedge
    algorithm. With graph_kcore_peel (dense cores) and
    graph_adamic_adar (missing links) this completes the cohort-
    structure toolkit: cc says WHICH nodes sit in locally dense
    tissue.

    Exactness: pure integer counting until one final division.

    Scale: the wedge join's fan-out is Σ deg(u over its ordered
    neighbors)² and the closing probe is an equi-join against the
    edge list — the count-triangles-in-MapReduce bound; never
    node-quadratic. user_id < 100 bounds the bench, not the shape."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
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
        .select(F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)  # reused by degrees, wedges, closure
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")),
        )
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("u"),
            F.col("e1.v").alias("v"),
            F.col("e2.v").alias("w"),
        )
    )
    pertri = (
        tri.select(F.col("u").alias("n"))
        .unionAll(tri.select(F.col("v").alias("n")))
        .unionAll(tri.select(F.col("w").alias("n")))
    )
    tcount = pertri.groupBy("n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    out = deg.join(tcount, "n", "left").select(
        F.col("n").alias("user_id"),
        "deg",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            F.round(
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ),
        ).alias("clustering_coeff"),
    )
    return out.orderBy("user_id")
