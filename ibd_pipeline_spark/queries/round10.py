"""Round-10 registry additions.

Nine oracle-attested capability rows widening four families:

- EXACT similarity join (prefix-filter / PPJoin-style Jaccard join —
  the database-literature EXACT counterpart of the approximate LSH
  family: candidates bounded by rare-token prefixes, never all-pairs).
- Vector infrastructure (product-quantization codes — the
  memory-bounded ANN layout; deterministic mechanics, SQL-replayable
  like r10's IVF oracle).
- Attribution (exact Shapley values over journey channel sets — the
  game-theoretic sibling of the r9 Markov removal effects; integer
  24ths keep the driver hash float-free).
- Classical statistics on the distributed-rank spine (tie-corrected
  Spearman ρ, trimmed/winsorized means, one-way ANOVA, sample-ratio-
  mismatch audit, Heaps-law vocabulary growth, file-overlap
  clustering depth).

Shared design rules (same as round6+): exactness first — integer /
decimal-domain sums wherever a float quotient would round, divisions
only at the last projection; every global order runs through
operators/ranking.py, never a single-task window; doc/file/bucket
-count-sized frames may use triangular self-joins instead of
unpartitioned windows so the registry-wide plan audit stays clean.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# Spearman rank correlation (tie-corrected), per group
# ---------------------------------------------------------------------------

_SPEARMAN_SQL = """
WITH r AS (
  SELECT l_linestatus AS g, l_quantity AS x, l_extendedprice AS y
  FROM lineitem
), xr AS (
  SELECT g, x,
         2 * SUM(cnt) OVER (PARTITION BY g ORDER BY x) - cnt + 1 AS rx2
  FROM (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS cnt FROM r GROUP BY g, x)
), yr AS (
  SELECT g, y,
         2 * SUM(cnt) OVER (PARTITION BY g ORDER BY y) - cnt + 1 AS ry2
  FROM (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS cnt FROM r GROUP BY g, y)
), j AS (
  SELECT r.g, xr.rx2, yr.ry2
  FROM r JOIN xr ON xr.g = r.g AND xr.x = r.x
         JOIN yr ON yr.g = r.g AND yr.y = r.y
), m AS (
  SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(rx2 AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(ry2 AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(rx2 AS HUGEINT) * rx2) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(ry2 AS HUGEINT) * ry2) AS HUGEINT) AS syy,
         CAST(SUM(CAST(rx2 AS HUGEINT) * ry2) AS HUGEINT) AS sxy
  FROM j GROUP BY g
)
SELECT g AS l_linestatus, CAST(n AS BIGINT) AS n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS spearman_rho
FROM m ORDER BY l_linestatus
"""


@query("stats_spearman_corr", oracle=_SPEARMAN_SQL)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between quantity and
    price per line status — Pearson over AVERAGE ranks, where the
    average rank of a tied block is pure integer algebra:
    2·r̄(v) = 2·c_le(v) − cnt(v) + 1 (c_le = inclusive cumulative
    count under the value order). Doubling keeps every rank an exact
    BIGINT, and the ×2 scale cancels in the correlation, so the
    moments are exact integers and both engines agree bit-for-bit
    until the single final division.

    Scale: ranks are computed on the DISTINCT-VALUE frame (counts per
    (group, value)) via the distributed grouped prefix-sum — never a
    row-level sort — then broadcast/shuffle-joined back; moment sums
    are one map-side-combined aggregate. No value buffer, no
    single-task window (the in-operator offset window runs over
    partition metadata only)."""
    from ibd_pipeline_spark.operators.ranking import with_grouped_prefix_sum

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_linestatus").alias("g"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )

    def rank2(col: str) -> DataFrame:
        vc = li.groupBy("g", col).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        ps = with_grouped_prefix_sum(vc, ["g"], [col], "cnt")
        return ps.select(
            "g",
            col,
            (2 * F.col("_cw") - F.col("cnt") + 1).alias(f"r{col}2"),
        )

    j = li.join(rank2("x"), ["g", "x"]).join(rank2("y"), ["g", "y"])
    dec = "decimal(38,0)"
    m = j.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("rx2").cast(dec)).alias("sx"),
        F.sum(F.col("ry2").cast(dec)).alias("sy"),
        F.sum((F.col("rx2").cast(dec) * F.col("rx2"))).alias("sxx"),
        F.sum((F.col("ry2").cast(dec) * F.col("ry2"))).alias("syy"),
        F.sum((F.col("rx2").cast(dec) * F.col("ry2"))).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    return m.select(
        F.col("g").alias("l_linestatus"),
        "n",
        F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("spearman_rho"),
    ).orderBy("l_linestatus")


# ---------------------------------------------------------------------------
# Trimmed + winsorized mean per group (prefix-sum rank thresholds)
# ---------------------------------------------------------------------------

_TRIM_SQL = """
WITH r AS (
  SELECT l_returnflag AS g, l_extendedprice AS v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey,
                                     l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
), b AS (
  SELECT g, CAST(v AS DECIMAL(38,4)) AS v, rn, n,
         CAST(FLOOR(0.1 * n) AS BIGINT) AS lo
  FROM r
)
SELECT g AS l_returnflag,
       CAST(MAX(n) AS BIGINT) AS n,
       ROUND(CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo THEN v END)
                  AS DOUBLE) / (MAX(n) - 2 * MAX(lo)), 4) AS trimmed_mean,
       ROUND(CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo THEN v END)
                  + MAX(lo) * MIN(CASE WHEN rn >= lo + 1 THEN v END)
                  + MAX(lo) * MIN(CASE WHEN rn >= n - lo THEN v END)
                  AS DOUBLE) / MAX(n), 4) AS winsorized_mean
FROM b GROUP BY g ORDER BY l_returnflag
"""


@query("stats_trimmed_mean", oracle=_TRIM_SQL)
def stats_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% trimmed and winsorized means per return flag — the robust
    location estimators, as PURE RANK-THRESHOLD conditional
    aggregates over one weight-1 grouped prefix-sum scan (the same
    spine as stats_percentiles): trim drops ranks outside
    (⌊0.1n⌋, n−⌊0.1n⌋]; winsorize clamps them to the boundary values
    v(lo+1) / v(n−lo), both MIN-over-rank-condition lookups. Price
    sums stay in exact decimals; the two divisions happen once, at
    the end — bit-identical to the oracle's windowed ROW_NUMBER
    replay under the same (price, orderkey, linenumber) total order.

    Scale: one range exchange + Arrow running count (bounded memory
    even when a group spans tasks), conditional aggregates map-side
    combine; no per-group value buffer anywhere."""
    from ibd_pipeline_spark.operators.ranking import with_grouped_prefix_sum

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
        F.lit(1).cast("bigint").alias("_one"),
    )
    ps = with_grouped_prefix_sum(
        li, ["g"], ["v", "l_orderkey", "l_linenumber"], "_one"
    )
    rn, n = F.col("_cw"), F.col("_tw")
    lo = F.floor(0.1 * n).cast("bigint")
    # decimal-domain sums: price has 2 decimals, so the cast is exact
    # and the running total is order-independent cross-engine
    vdec = F.col("v").cast("decimal(38,4)")
    core = F.sum(F.when((rn > lo) & (rn <= n - lo), vdec))
    v_lo = F.min(F.when(rn >= lo + 1, vdec))
    v_hi = F.min(F.when(rn >= n - lo, vdec))
    n_, lo_ = F.max(n), F.max(lo)
    return (
        ps.groupBy("g")
        .agg(
            n_.cast("bigint").alias("n"),
            F.round(core.cast("double") / (n_ - 2 * lo_), 4).alias(
                "trimmed_mean"
            ),
            F.round(
                (core + lo_ * v_lo + lo_ * v_hi).cast("double") / n_, 4
            ).alias("winsorized_mean"),
        )
        .select(F.col("g").alias("l_returnflag"), "n", "trimmed_mean",
                "winsorized_mean")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# One-way ANOVA across groups
# ---------------------------------------------------------------------------

_ANOVA_SQL = """
WITH g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DECIMAL(38,4))
           AS sg,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4)) * l_extendedprice)
              AS DECIMAL(38,4)) AS qg
  FROM lineitem GROUP BY l_returnflag
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng, 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS ss_groups,
         CAST(SUM(sg) AS DOUBLE) AS s_all,
         CAST(SUM(qg) AS DOUBLE) AS q_all
  FROM g
), d AS (
  SELECT k, n,
         ss_groups - s_all * s_all / n AS ssb,
         q_all - ss_groups AS ssw
  FROM t
)
SELECT CAST(k AS INT) AS k_groups, n,
       ROUND(ssb / (k - 1), 4) AS ms_between,
       ROUND(ssw / (n - k), 4) AS ms_within,
       ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat,
       ROUND(ssb / (ssb + ssw), 6) AS eta_squared
FROM d
"""


@query("stats_anova_oneway", oracle=_ANOVA_SQL)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of extended price across return flags: F-statistic
    and effect size (η²) from per-group moment sums — count, Σx, Σx²
    in exact DECIMALs (price has 2 decimals, squares 4; nothing
    rounds) — so both engines carry identical numbers into the final
    double-domain sum-of-squares algebra. The per-group Σs²/n step
    runs over the K-ROW group frame in a fixed double expression.

    Scale: ONE map-side-combined aggregate over the fact table; the
    group frame is k rows; everything after is scalar algebra. This
    is the variance decomposition every A/B/C/n-way experiment
    readout needs, at one-scan cost."""
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(38,4)"
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum(F.col("l_extendedprice").cast(dec)).alias("sg"),
        F.sum(F.col("l_extendedprice").cast(dec) * F.col("l_extendedprice"))
        .alias("qg"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        # each group's Σ²/n is a deterministic double; ROUND→DECIMAL
        # before summing so the k-row sum is order-independent
        # cross-engine (a raw double sum at ~1e13 magnitude wobbles
        # past the output rounding under catastrophic cancellation)
        F.sum(
            F.round(
                F.col("sg").cast("double") * F.col("sg").cast("double")
                / F.col("ng"),
                4,
            ).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("ss_groups"),
        F.sum("sg").cast("double").alias("s_all"),
        F.sum("qg").cast("double").alias("q_all"),
    )
    ssb = F.col("ss_groups") - F.col("s_all") * F.col("s_all") / F.col("n")
    ssw = F.col("q_all") - F.col("ss_groups")
    msb = ssb / (F.col("k") - 1)
    msw = ssw / (F.col("n") - F.col("k"))
    return t.select(
        F.col("k").cast("int").alias("k_groups"),
        "n",
        F.round(msb, 4).alias("ms_between"),
        F.round(msw, 4).alias("ms_within"),
        F.round(msb / msw, 6).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_squared"),
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch audit
# ---------------------------------------------------------------------------

_SRM_SQL = """
WITH cust AS (
  SELECT DISTINCT o_custkey FROM orders
), arms AS (
  SELECT CAST(('0x' || substring(md5('srm:' || CAST(o_custkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 2 AS arm
  FROM cust
), c AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM arms
)
SELECT n_a, n_b,
       ROUND(CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b) / (n_a + n_b), 6)
         AS chi2,
       (CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b) / (n_a + n_b)) > 3.841
         AS srm_alarm
FROM c
"""


@query("ab_srm_check", oracle=_SRM_SQL)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit — the experimentation guardrail
    that catches broken randomization before any metric is read:
    units (customers) hash-split 50/50 by the engine-portable md5
    bucket, arm counts compared by the 1-df chi-square
    (n_a−n_b)²/(n_a+n_b) against the 0.05 critical value 3.841.
    Counts are exact integers; the statistic is one double division —
    both engines replay the split AND the verdict bit-for-bit.

    Scale: distinct-unit aggregate + 2-cell count — one shuffle on
    the unit key, constant output. The hash split is the same
    assignment mechanism ab_test_proportion_ztest uses, so this is
    the audit you run NEXT TO every experiment readout."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    cust = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    arms = cust.select(
        md5_bucket(F.col("o_custkey"), F.lit("srm"), 2).alias("arm")
    )
    c = arms.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    chi2 = (
        (F.col("n_a") - F.col("n_b")).cast("double")
        * (F.col("n_a") - F.col("n_b"))
        / (F.col("n_a") + F.col("n_b"))
    )
    return c.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_alarm"),
    )


# ---------------------------------------------------------------------------
# File-overlap clustering depth (layout health metric)
# ---------------------------------------------------------------------------

_OVERLAP_SQL = """
WITH f AS (
  SELECT o_orderkey % 64 AS file_id,
         MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi
  FROM orders GROUP BY 1
), ev AS (
  SELECT file_id, lo AS d, 1 AS delta FROM f
  UNION ALL
  SELECT file_id, hi AS d, -1 AS delta FROM f
), dep AS (
  SELECT file_id, delta,
         SUM(delta) OVER (ORDER BY d, delta DESC, file_id
                          ROWS UNBOUNDED PRECEDING) AS depth
  FROM ev
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       ROUND(AVG(CAST(depth AS DOUBLE)), 4) AS avg_open_depth
FROM dep WHERE delta = 1
"""


@query("maintenance_file_overlap_depth", oracle=_OVERLAP_SQL)
def maintenance_file_overlap_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering depth of a file layout — the OPTIMIZE/Z-ORDER health
    metric: how many files' [min, max] key ranges overlap at once
    (depth 1 = perfectly clustered; high depth = every scan touches
    many files). Files simulated as orderkey%64 buckets with their
    orderdate ranges; depth is the classic +1/−1 boundary sweep —
    running sum over the 2·n_files boundary events, here as a
    TRIANGULAR SELF-JOIN on the file-count-sized boundary frame
    (n ≤ 128 rows → 16k join pairs) so no unpartitioned window
    appears anywhere in the plan. Boundary tie order (+1 before −1 at
    the same date: inclusive intervals overlap at a shared endpoint)
    is pinned by the (date, delta DESC, file_id) total order.

    Scale: the corpus-scale work is the per-file min/max aggregate
    (one map-side-combined pass); the sweep runs over file METADATA —
    at 100 TB that is the transaction log, not the data."""
    orders = load(spark, sf_dir, "orders")
    f = (
        orders.groupBy((F.col("o_orderkey") % 64).alias("file_id"))
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        # file-count-sized; pin it so the boundary union + triangular
        # join don't re-scan orders per reference
        .localCheckpoint(eager=True)
    )
    ev = f.select(
        "file_id", F.col("lo").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        f.select("file_id", F.col("hi").alias("d"), F.lit(-1).alias("delta"))
    )
    a, b = ev.alias("a"), F.broadcast(ev.alias("b"))
    # inclusive running sum under (d, delta DESC, file_id): b precedes
    # or equals a in the sweep order
    before = (
        (F.col("b.d") < F.col("a.d"))
        | ((F.col("b.d") == F.col("a.d")) & (F.col("b.delta") > F.col("a.delta")))
        | (
            (F.col("b.d") == F.col("a.d"))
            & (F.col("b.delta") == F.col("a.delta"))
            & (F.col("b.file_id") <= F.col("a.file_id"))
        )
    )
    dep = (
        a.join(b, before)
        .groupBy("a.file_id", "a.d", "a.delta")
        .agg(F.sum("b.delta").alias("depth"))
    )
    return (
        dep.filter(F.col("delta") == 1)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.max("depth").cast("bigint").alias("max_depth"),
            F.round(F.avg(F.col("depth").cast("double")), 4).alias(
                "avg_open_depth"
            ),
        )
    )


# ---------------------------------------------------------------------------
# EXACT Jaccard similarity join via prefix filtering (PPJoin-style)
# ---------------------------------------------------------------------------

_PFJ_TAU_NUM, _PFJ_TAU_DEN = 3, 5  # tau = 0.6 as an exact fraction

_PREFIX_JACCARD_SQL = """
WITH raw AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), d AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(w) >= 3
                THEN list_transform(range(1, len(w) - 1),
                       i -> array_to_string(list_slice(w, i, i + 2), ' '))
                ELSE [array_to_string(w, ' ')] END) AS toks
  FROM raw
), tf AS (
  SELECT u.tok, CAST(COUNT(*) AS BIGINT) AS freq
  FROM d, unnest(d.toks) AS u(tok) GROUP BY u.tok
), st AS (
  SELECT doc_id, array_agg(tok ORDER BY freq, tok) AS stoks,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT d.doc_id, u.tok, tf.freq
        FROM d, unnest(d.toks) AS u(tok) JOIN tf USING (tok))
  GROUP BY doc_id
), pref AS (
  SELECT doc_id, u.tok
  FROM st, unnest(list_slice(stoks, 1,
         CAST(n - CEIL(0.6 * n) + 1 AS BIGINT))) AS u(tok)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(x.toks, y.toks)) AS BIGINT) AS n_inter,
       CAST(len(list_distinct(list_concat(x.toks, y.toks))) AS BIGINT)
         AS n_union
FROM cand c JOIN d x ON x.doc_id = c.id_a JOIN d y ON y.doc_id = c.id_b
WHERE 5 * len(list_intersect(x.toks, y.toks))
      >= 3 * len(list_distinct(list_concat(x.toks, y.toks)))
ORDER BY id_a, id_b
"""


@query("dedup_prefix_filter_jaccard", oracle=_PREFIX_JACCARD_SQL)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard similarity join (J ≥ 0.6 on 3-gram shingle sets)
    via prefix filtering — the database-literature counterpart of the
    MinHash-LSH family (PPJoin lineage: Xiao et al., WWW'08): order
    every document's shingle set by ASCENDING GLOBAL FREQUENCY
    (rarest first, ties by shingle) and keep only the first
    n − ⌈τ·n⌉ + 1 shingles as its PREFIX; two sets with J ≥ τ MUST
    share a prefix element (pigeonhole on the τ-overlap), so the
    candidate join runs on prefix shingles only — rare by
    construction — and the exact |∩|/|∪| verification touches
    candidates, never all pairs. Unlike LSH this is EXACT: zero
    false negatives, no banding probability. The τ gate is the
    cross-multiplied integer comparison 5·|∩| ≥ 3·|∪|, outputs are
    BIGINTs — no float anywhere.

    Shingles, not word sets: over a small vocabulary nearly every
    pair of word SETS is Jaccard-similar (measured: 71k of 125k
    pairs at sf0.01), which guts the filter; 3-gram shingles are the
    same distinctive unit the MinHash family blocks on.

    Scale: shingle frequencies are one vocab-sized aggregate; the
    prefix join's fan-out is bounded by rare-shingle postings (the
    frequency ordering is exactly what keeps stop-shingles OUT of
    prefixes); verification is per-candidate set algebra. At 100 TB
    this is the exact-dedup sibling you run where LSH recall
    arguments don't fly (dedup_minhash_lsh stays the approximate
    scale path)."""
    par = spark.sparkContext.defaultParallelism
    # words MUST be PHYSICALLY materialized before the gram transform:
    # CollapseProject inlines a projected split(text) straight back
    # into the lambda (measured 30 split() copies in the executed
    # plan), so each gram re-splits the whole text — O(len²) per doc.
    # A projection barrier is not enough; the checkpoint is.
    w = F.col("w")
    nw = F.size(w)
    k = 3
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, i + j + 1) for j in range(k)]
    )
    sh = F.array_distinct(
        F.when(nw >= k, F.transform(F.sequence(F.lit(0), nw - k), gram))
        .otherwise(F.array(F.concat_ws(" ", w)))
    )
    d = (
        load(spark, sf_dir, "documents")
        .repartition(par)  # single-split corpus would serialize
        .select("doc_id", F.split("text", " ").alias("w"))
        .localCheckpoint(eager=True)  # split exactly once (see above)
        .select("doc_id", sh.alias("toks"))
        .localCheckpoint(eager=True)  # verify join reads it twice
    )
    tok = d.select("doc_id", F.explode("toks").alias("tok"))
    tf = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    st = (
        tok.join(tf, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("freq", "tok"))),
                lambda s: s["tok"],
            ).alias("stoks"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    plen = (F.col("n") - F.ceil(0.6 * F.col("n")) + 1).cast("int")
    pref = (
        st.select(
            "doc_id",
            F.explode(F.slice("stoks", F.lit(1), plen)).alias("tok"),
        )
        .localCheckpoint(eager=True)  # self-join: evaluate ONCE
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        # the candidate frame is BYTE-small but each row costs a full
        # shingle-set intersection below — repartition so AQE's
        # size-based coalesce doesn't serialize the verify onto 2
        # tasks (measured 8 s -> ~2 s at sf0.1)
        .repartition(par)
    )
    x = d.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    y = d.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    ni = F.size(F.array_intersect("ta", "tb")).cast("bigint")
    nu = F.size(F.array_union("ta", "tb")).cast("bigint")
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .select("id_a", "id_b", ni.alias("n_inter"), nu.alias("n_union"))
        .filter(
            F.lit(_PFJ_TAU_DEN) * F.col("n_inter")
            >= F.lit(_PFJ_TAU_NUM) * F.col("n_union")
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Product-quantization codes (memory-bounded vector layout)
# ---------------------------------------------------------------------------

_PQ_SUBS, _PQ_SUBDIM, _PQ_CENTS = 8, 8, 16


def _pq_l2_sql(s: int, lhs: str = "a.v", rhs: str = "c.cv") -> str:
    """Left-associated squared-L2 over subspace s — the same addition
    order as the Spark zip_with/aggregate fold."""
    return " + ".join(
        f"({lhs}[{s * _PQ_SUBDIM + j}] - {rhs}[{s * _PQ_SUBDIM + j}])"
        f" * ({lhs}[{s * _PQ_SUBDIM + j}] - {rhs}[{s * _PQ_SUBDIM + j}])"
        for j in range(1, _PQ_SUBDIM + 1)
    )


def _pq_oracle() -> str:
    dists = "\nUNION ALL\n".join(
        f"SELECT a.id, {s} AS s, c.cent_id, {_pq_l2_sql(s)} AS d "
        f"FROM v a CROSS JOIN cents c"
        for s in range(_PQ_SUBS)
    )
    codes = ",\n       ".join(
        f"CAST(MAX(CASE WHEN s = {s} THEN code END) AS INT) AS c{s}"
        for s in range(_PQ_SUBS)
    )
    err = " + ".join(
        f"MAX(CASE WHEN s = {s} THEN d END)" for s in range(_PQ_SUBS)
    )
    return f"""
WITH v AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT id AS cent_id, v AS cv FROM v ORDER BY id LIMIT {_PQ_CENTS}
), dists AS (
{dists}
), best AS (
  SELECT id, s, cent_id AS code, d
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id, s
                                     ORDER BY d, cent_id) AS rn
        FROM dists)
  WHERE rn = 1
)
SELECT id AS vec_id,
       {codes},
       ROUND({err}, 6) AS quant_err
FROM best GROUP BY id ORDER BY vec_id
"""


@query("similarity_pq_codes", oracle=_pq_oracle)
def similarity_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization — the memory-bounded vector layout behind
    billion-scale ANN (Jégou et al., PAMI'11): split the 64-dim
    embedding into 8 subspaces of 8 dims; quantize each subvector to
    its nearest of 16 per-subspace centroids; a vector compresses to
    8 one-byte codes (64× smaller than float32) and distances become
    table lookups. Every mechanism is deterministic — centroids are
    the 16 lowest vec_ids' subvectors (the similarity_ann_ivf
    precedent), assignment is min squared-L2 with ties to the LOWEST
    centroid id, and every distance is the same left-associated
    double fold both engines evaluate identically — so DuckDB
    replays codes AND total quantization error bit-for-bit. The
    error column sums the 8 per-subspace minima as a FIXED-ORDER
    expression over the pivoted aggregates (an agg-sum of doubles
    would be partial-order-dependent cross-engine).

    Scale: centroid table is 16 rows broadcast; assignment is one
    corpus scan × (8 subspaces × 16 centroids) of codegen column
    algebra — no shuffle until the 8-row-per-vector min aggregate,
    which map-side combines. The PQ-coded table is what you persist;
    IVF cells + PQ codes compose into the standard IVF-PQ layout."""
    from ibd_pipeline_spark.operators.similarity import as_double_array

    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), as_double_array("embedding").alias("v")
    )
    cents = (
        emb.orderBy("id")
        .limit(_PQ_CENTS)
        .select(F.col("id").alias("cent_id"), F.col("v").alias("cv"))
    )
    subs = spark.range(_PQ_SUBS).select(F.col("id").cast("int").alias("s"))
    cent_sub = cents.crossJoin(subs).select(
        "cent_id",
        "s",
        F.slice("cv", (F.col("s") * _PQ_SUBDIM + 1).cast("int"),
                F.lit(_PQ_SUBDIM)).alias("cslice"),
    )
    corp_sub = emb.crossJoin(subs).select(
        "id",
        "s",
        F.slice("v", (F.col("s") * _PQ_SUBDIM + 1).cast("int"),
                F.lit(_PQ_SUBDIM)).alias("vslice"),
    )
    dist = F.aggregate(
        F.zip_with("vslice", "cslice", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = (
        corp_sub.join(F.broadcast(cent_sub), "s")
        .select("id", "s", "cent_id", dist.alias("d"))
        .groupBy("id", "s")
        .agg(F.min(F.struct(F.col("d"), F.col("cent_id"))).alias("m"))
        .select("id", "s", F.col("m.cent_id").alias("code"),
                F.col("m.d").alias("d"))
    )
    code_cols = [
        F.max(F.when(F.col("s") == s, F.col("code")))
        .cast("int")
        .alias(f"c{s}")
        for s in range(_PQ_SUBS)
    ]
    dmax = [
        F.max(F.when(F.col("s") == s, F.col("d"))) for s in range(_PQ_SUBS)
    ]
    err = dmax[0]
    for t in dmax[1:]:
        err = err + t
    return (
        best.groupBy("id")
        .agg(*code_cols, F.round(err, 6).alias("quant_err"))
        .select(F.col("id").alias("vec_id"),
                *[f"c{s}" for s in range(_PQ_SUBS)], "quant_err")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Exact Shapley attribution over journey channel sets
# ---------------------------------------------------------------------------

_SHAPLEY_SQL = """
WITH ord AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), fp AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase' THEN rn END) AS prn
  FROM ord GROUP BY user_id
), um AS (
  SELECT f.user_id,
         COALESCE(BIT_OR(CASE o.event_type
                           WHEN 'click' THEN 1 WHEN 'error' THEN 2
                           WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                         END), 0) AS mask
  FROM fp f LEFT JOIN ord o
    ON o.user_id = f.user_id AND o.rn < f.prn
  WHERE f.prn IS NOT NULL
  GROUP BY f.user_id
), mc AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt FROM um GROUP BY mask
), sp AS (
  SELECT CAST(t.range AS INT) AS S FROM range(16) t
), v AS (
  SELECT sp.S,
         COALESCE(SUM(CASE WHEN (mc.mask | sp.S) = sp.S THEN mc.cnt END),
                  0) AS v
  FROM sp LEFT JOIN mc ON TRUE GROUP BY sp.S
), ch AS (
  SELECT * FROM (VALUES ('click', 1), ('error', 2),
                        ('signup', 4), ('view', 8)) c(channel, bit)
), marg AS (
  SELECT ch.channel,
         (CASE bit_count(sp.S) WHEN 0 THEN 6 WHEN 1 THEN 2
                               WHEN 2 THEN 2 ELSE 6 END)
           * (v1.v - v0.v) AS term
  FROM ch JOIN sp ON (sp.S & ch.bit) = 0
  JOIN v v0 ON v0.S = sp.S
  JOIN v v1 ON v1.S = (sp.S | ch.bit)
), phi AS (
  SELECT channel, CAST(SUM(term) AS BIGINT) AS shapley_x24
  FROM marg GROUP BY channel
), tot AS (SELECT SUM(shapley_x24) AS t FROM phi)
SELECT channel, shapley_x24,
       ROUND(CAST(shapley_x24 AS DOUBLE) / tot.t, 6) AS share
FROM phi, tot ORDER BY channel
"""


@query("analytics_shapley_attribution", oracle=_SHAPLEY_SQL)
def analytics_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution over journey CHANNEL SETS —
    the game-theoretic multi-touch model next to the r9 Markov
    removal effects: channels are players, the characteristic
    v(S) = conversions whose pre-purchase touch set ⊆ S, and each
    channel's credit is its average marginal contribution over all
    orderings. With 4 channels the 2⁴ coalition values make the sum
    EXACT: φᵢ·4! = Σ_{S∌i} |S|!·(3−|S|)!·(v(S∪i) − v(S)) is pure
    integer algebra (weights 6/2/2/6), so `shapley_x24` is a BIGINT
    the driver hashes float-free; the share divides once at the end.
    v is monotone by construction (mask-subset counting), so every
    marginal ≥ 0 and shares sum to 1 over v(N) − v(∅).

    Scale: journey construction is the corpus-scale work (one
    user_id window + first-purchase truncation — the exact shape
    analytics_markov_attribution already pays); everything after
    runs on the 16-row mask-count frame. Exponential-in-channels is
    real but irrelevant at k=4 — past ~10 channels you sample
    permutations instead (and lose the exactness this query's
    oracle buys)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ord_ = ev.select(
        "user_id", "event_type", F.row_number().over(w_u).alias("rn")
    )
    fp = ord_.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).alias("prn")
    )
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
    )
    touches = ord_.select("user_id", bit.alias("bit"), "rn")
    um = (
        fp.filter(F.col("prn").isNotNull())
        .alias("f")
        .join(
            touches.alias("o"),
            (F.col("o.user_id") == F.col("f.user_id"))
            & (F.col("o.rn") < F.col("f.prn")),
            "left",
        )
        .groupBy("f.user_id")
        .agg(F.coalesce(F.bit_or("o.bit"), F.lit(0)).alias("mask"))
    )
    mc = um.groupBy("mask").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    sp = spark.range(16).select(F.col("id").cast("int").alias("S"))
    v = (
        sp.join(
            F.broadcast(mc),
            (F.col("mask").bitwiseOR(F.col("S")) == F.col("S")),
            "left",
        )
        .groupBy("S")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("v"))
    )
    ch = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)],
        "channel string, bit int",
    )
    w24 = (
        F.when(F.bit_count(F.col("S")) == 0, 6)
        .when(F.bit_count(F.col("S")) == 1, 2)
        .when(F.bit_count(F.col("S")) == 2, 2)
        .otherwise(6)
    )
    marg = (
        ch.crossJoin(F.broadcast(sp))
        .filter(F.col("S").bitwiseAND(F.col("bit")) == 0)
        .join(
            F.broadcast(v.select(F.col("S").alias("S0"), F.col("v").alias("v0"))),
            F.col("S") == F.col("S0"),
        )
        .join(
            F.broadcast(v.select(F.col("S").alias("S1"), F.col("v").alias("v1"))),
            F.col("S").bitwiseOR(F.col("bit")) == F.col("S1"),
        )
        .select("channel", (w24 * (F.col("v1") - F.col("v0"))).alias("term"))
    )
    phi = marg.groupBy("channel").agg(
        F.sum("term").cast("bigint").alias("shapley_x24")
    )
    tot = phi.agg(F.sum("shapley_x24").alias("t"))
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "shapley_x24",
            F.round(F.col("shapley_x24").cast("double") / F.col("t"), 6)
            .alias("share"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth
# ---------------------------------------------------------------------------

_HEAPS_BUCKETS = 20

_HEAPS_SQL = f"""
WITH raw AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), docs AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_transform(range(1, len(w) - 1),
                     i -> array_to_string(list_slice(w, i, i + 2), ' '))
              ELSE [array_to_string(w, ' ')] END AS toks
  FROM raw
), nd AS (
  SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS doc_cnt
  FROM docs
), tok AS (
  SELECT d.doc_id, u.tok FROM docs d, unnest(d.toks) AS u(tok)
), firsts AS (
  SELECT tok, MIN(doc_id) AS fd FROM tok GROUP BY tok
), vb AS (
  SELECT CAST(FLOOR(fd * {_HEAPS_BUCKETS} / nd.n_docs) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM firsts, nd GROUP BY 1
), tb AS (
  SELECT CAST(FLOOR(doc_id * {_HEAPS_BUCKETS} / nd.n_docs) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM tok, nd GROUP BY 1
), pts AS (
  SELECT tb.b,
         SUM(tb.t) OVER (ORDER BY tb.b) AS n_cum,
         SUM(COALESCE(vb.v, 0)) OVER (ORDER BY tb.b) AS v_cum
  FROM tb LEFT JOIN vb ON vb.b = tb.b
), lp AS (
  SELECT CAST(ROUND(ln(CAST(n_cum AS DOUBLE)), 9) AS DECIMAL(28,9)) AS x,
         CAST(ROUND(ln(CAST(v_cum AS DOUBLE)), 9) AS DECIMAL(28,9)) AS y
  FROM pts
), mm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM lp
), fit AS (
  SELECT k,
         (k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (k * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
         (k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           * (k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / ((k * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (k * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2,
         CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
  FROM mm
), tots AS (
  SELECT CAST(MAX(n_cum) AS BIGINT) AS n_tokens,
         CAST(MAX(v_cum) AS BIGINT) AS vocab
  FROM pts
)
SELECT nd.doc_cnt AS n_docs, tots.n_tokens, tots.vocab,
       ROUND(fit.b, 4) AS heaps_b,
       ROUND((fit.syd - fit.b * fit.sxd) / fit.k, 4) AS heaps_logk,
       ROUND(fit.r2, 4) AS r_squared
FROM nd, tots, fit
"""


@query("text_heaps_law", oracle=_HEAPS_SQL)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: V(N) ≈ k·N^b — the sublinear
    vocabulary scaling every tokenizer-budget and dedup-capacity
    plan leans on. Vocabulary unit = 3-GRAM SHINGLES (the corpus's
    word vocabulary is a closed 31-term set — flat V(N), r² undefined;
    shingle vocabulary genuinely grows). The curve is sampled at 20
    corpus prefixes WITHOUT any sequential scan: a shingle's
    FIRST-OCCURRENCE doc (one min aggregate) assigns it to the bucket
    where it enters the vocabulary, so cumulative (tokens, vocab) per
    bucket is a
    20-row prefix sum — computed here as conditional sums over the
    bucket frame, window-free. The log-log least-squares fit rounds
    ln-values to 9 decimals into DECIMALs BEFORE summing (a raw
    double sum over buckets would be partial-order-dependent
    cross-engine), then solves slope/intercept/R² in fixed double
    algebra.

    Scale: two corpus-scale aggregates (first-occurrence min per
    token — vocab-sized shuffle — and per-bucket token counts);
    everything else is 20-row algebra. doc_id density assumption:
    buckets are doc_id-ranged (FLOOR(id·B/max+1)); sparse ids skew
    bucket widths, not correctness."""
    # words PHYSICALLY materialized (localCheckpoint below): a merely
    # projected split(text) gets CollapseProject-inlined back into the
    # gram lambda and re-splits per gram — the Catalyst
    # nested-expression blowup (measured ~6 s -> ~1 s on 5000 docs)
    w = F.col("w")
    nw = F.size(w)
    gram3 = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, i + j + 1) for j in range(3)]
    )
    shingles = F.when(
        nw >= 3, F.transform(F.sequence(F.lit(0), nw - 3), gram3)
    ).otherwise(F.array(F.concat_ws(" ", w)))
    docs = (
        load(spark, sf_dir, "documents")
        # single-split corpus: widen before the shingle explode or
        # the whole vocab build runs on one task
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.split("text", " ").alias("w"))
        .localCheckpoint(eager=True)  # split exactly once (see above)
        .select("doc_id", shingles.alias("toks"))
        # two consumers below (vocab firsts + bucket token counts):
        # materialize the shingle arrays once
        .localCheckpoint(eager=True)
    )
    nd = docs.agg(
        (F.max("doc_id") + 1).cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("doc_cnt"),
    )
    tok = docs.select("doc_id", F.explode("toks").alias("tok"))
    bkt = lambda c: F.floor(  # noqa: E731
        F.col(c) * _HEAPS_BUCKETS / F.col("n_docs")
    ).cast("bigint")
    firsts = tok.groupBy("tok").agg(F.min("doc_id").alias("fd"))
    vb = (
        firsts.crossJoin(F.broadcast(nd))
        .groupBy(bkt("fd").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )
    tb = (
        tok.crossJoin(F.broadcast(nd))
        .groupBy(bkt("doc_id").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    # 20-row cumulative sums via triangular self-join (window-free)
    base = tb.join(vb, "b", "left").select(
        "b", "t", F.coalesce("v", F.lit(0)).alias("v")
    )
    l, r = base.alias("l"), base.alias("r")
    pts = (
        l.join(r, F.col("r.b") <= F.col("l.b"))
        .groupBy(F.col("l.b").alias("b"))
        .agg(
            F.sum("r.t").alias("n_cum"),
            F.sum("r.v").alias("v_cum"),
        )
    )
    dec = "decimal(28,9)"
    lp = pts.select(
        F.round(F.log(F.col("n_cum").cast("double")), 9).cast(dec).alias("x"),
        F.round(F.log(F.col("v_cum").cast("double")), 9).cast(dec).alias("y"),
    )
    mm = lp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    kd = F.col("k").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = kd * F.col("sxy").cast("double") - sxd * syd
    dxx = kd * F.col("sxx").cast("double") - sxd * sxd
    dyy = kd * F.col("syy").cast("double") - syd * syd
    b = num / dxx
    tots = pts.agg(
        F.max("n_cum").cast("bigint").alias("n_tokens"),
        F.max("v_cum").cast("bigint").alias("vocab"),
    )
    fit = mm.select(
        F.round(b, 4).alias("heaps_b"),
        F.round((syd - b * sxd) / kd, 4).alias("heaps_logk"),
        F.round(num * num / (dxx * dyy), 4).alias("r_squared"),
    )
    return (
        nd.select("doc_cnt")
        .crossJoin(F.broadcast(tots))
        .crossJoin(F.broadcast(fit))
        .select(
            F.col("doc_cnt").alias("n_docs"),
            "n_tokens",
            "vocab",
            "heaps_b",
            "heaps_logk",
            "r_squared",
        )
    )


# ---------------------------------------------------------------------------
# Brown–Forsythe (robust Levene) variance-homogeneity test
# ---------------------------------------------------------------------------

_LEVENE_SQL = """
WITH med AS (
  SELECT l_returnflag AS g,
         CAST(ROUND(quantile_cont(l_extendedprice, 0.5), 4)
              AS DECIMAL(38,4)) AS med
  FROM lineitem GROUP BY l_returnflag
), z AS (
  SELECT li.l_returnflag AS g,
         ABS(CAST(li.l_extendedprice AS DECIMAL(38,4)) - med.med) AS z
  FROM lineitem li JOIN med ON med.g = li.l_returnflag
), grp AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(z) AS DECIMAL(38,4)) AS sz,
         CAST(SUM(CAST(z AS DECIMAL(38,8)) * z) AS DECIMAL(38,8)) AS qz
  FROM z GROUP BY g
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / ng, 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS ss_groups,
         CAST(SUM(sz) AS DOUBLE) AS s_all,
         CAST(SUM(qz) AS DOUBLE) AS q_all
  FROM grp
), d AS (
  SELECT k, n,
         ss_groups - s_all * s_all / n AS ssb,
         q_all - ss_groups AS ssw
  FROM t
)
SELECT CAST(k AS INT) AS k_groups, n,
       ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS levene_w,
       (ssb / (k - 1)) / (ssw / (n - k)) > 3.0 AS variance_heterogeneous
FROM d
"""


@query("stats_levene_test", oracle=_LEVENE_SQL)
def stats_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (the robust Levene variant) for variance
    homogeneity across return flags — THE assumption check behind
    stats_anova_oneway: W = one-way-ANOVA F computed on the absolute
    deviations z = |x − median_g|. Composition showcase: the group
    medians come from the SAME bounded-memory prefix-sum
    quantile_cont replay stats_percentiles uses (rounded to 4
    decimals so z is an exact ≤4-decimal quantity), then the SAME
    decimal-moment ANOVA algebra runs on z — both stages already
    hash-attested on their own, now composed and attested end-to-end.

    Scale: one prefix-sum scan for the k medians (broadcast back as a
    k-row join), one map-side-combined moment aggregate over z; the
    k-row Σ²/n step ROUND→DECIMAL before summing (the ANOVA
    cancellation guard)."""
    from ibd_pipeline_spark.operators.ranking import with_grouped_prefix_sum

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
        F.lit(1).cast("bigint").alias("_one"),
    )
    ps = with_grouped_prefix_sum(
        li, ["g"], ["v", "l_orderkey", "l_linenumber"], "_one"
    )
    cw, n = F.col("_cw"), F.col("_tw")
    p = F.lit(1.0) + F.lit(0.5) * (n - F.lit(1)).cast("double")
    lo_rank = F.floor(p)
    frac = p - lo_rank.cast("double")
    vlo = F.min(F.when(cw >= lo_rank, F.col("v").cast("double")))
    vhi = F.min(F.when(cw >= lo_rank + 1, F.col("v").cast("double")))
    med = ps.groupBy("g").agg(
        F.round(vlo + F.max(frac) * (F.coalesce(vhi, vlo) - vlo), 4)
        .cast("decimal(38,4)")
        .alias("med")
    )
    z = (
        li.join(F.broadcast(med), "g")
        .select("g", F.abs(F.col("v").cast("decimal(38,4)") - F.col("med"))
                .alias("z"))
    )
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("z").cast("decimal(38,4)").alias("sz"),
        F.sum(F.col("z").cast("decimal(38,8)") * F.col("z"))
        .cast("decimal(38,8)")
        .alias("qz"),
    )
    t = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(
            F.round(
                F.col("sz").cast("double") * F.col("sz").cast("double")
                / F.col("ng"),
                4,
            ).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("ss_groups"),
        F.sum("sz").cast("double").alias("s_all"),
        F.sum("qz").cast("double").alias("q_all"),
    )
    ssb = F.col("ss_groups") - F.col("s_all") * F.col("s_all") / F.col("n")
    ssw = F.col("q_all") - F.col("ss_groups")
    w = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return t.select(
        F.col("k").cast("int").alias("k_groups"),
        "n",
        F.round(w, 6).alias("levene_w"),
        (w > 3.0).alias("variance_heterogeneous"),
    )


# ---------------------------------------------------------------------------
# IVF-PQ composed ANN top-k (coarse cells + quantized-distance rerank)
# ---------------------------------------------------------------------------


def _ivfpq_oracle() -> str:
    from ibd_pipeline_spark.queries.similarity import _cos_sql

    pq_dists = "\nUNION ALL\n".join(
        f"SELECT a.id, {s} AS s, c.cent_id, {_pq_l2_sql(s)} AS d "
        f"FROM v a CROSS JOIN cents c"
        for s in range(_PQ_SUBS)
    )
    lut = "\nUNION ALL\n".join(
        f"SELECT q.id AS qid, {s} AS s, c.cent_id, "
        f"CAST(ROUND({_pq_l2_sql(s, 'q.v')}, 9) AS DECIMAL(28,9)) AS d "
        f"FROM v q CROSS JOIN cents c WHERE q.id < 10"
        for s in range(_PQ_SUBS)
    )
    return f"""
WITH v AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT id AS cent_id, v AS cv FROM v ORDER BY id LIMIT {_PQ_CENTS}
), sims AS (
  SELECT v.id, v.v, c.cent_id,
         {_cos_sql("v.v", "c.cv")} AS sim
  FROM v CROSS JOIN cents c
), asgn AS (
  SELECT id AS cid, v AS cv, cent_id AS cell_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                     ORDER BY sim DESC, cent_id) AS rn
        FROM sims)
  WHERE rn = 1
), probe AS (
  SELECT id AS qid, v AS qv, cent_id AS cell_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                     ORDER BY sim DESC, cent_id) AS rn
        FROM sims WHERE id < 10)
  WHERE rn <= 4
), pqd AS (
{pq_dists}
), codes AS (
  SELECT id, s, cent_id AS code
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id, s
                                     ORDER BY d, cent_id) AS rn
        FROM pqd)
  WHERE rn = 1
), lut AS (
{lut}
), cand AS (
  SELECT DISTINCT p.qid, a.cid
  FROM probe p JOIN asgn a ON p.cell_id = a.cell_id AND p.qid <> a.cid
), adc AS (
  SELECT c.qid, c.cid, SUM(l.d) AS adc
  FROM cand c
  JOIN codes k ON k.id = c.cid
  JOIN lut l ON l.qid = c.qid AND l.s = k.s AND l.cent_id = k.code
  GROUP BY c.qid, c.cid
), short AS (
  SELECT qid, cid
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY adc, cid) AS rn FROM adc)
  WHERE rn <= 20
), rer AS (
  SELECT s.qid AS query_id, s.cid AS corpus_id,
         ROUND({_cos_sql("q.v", "b.v")}, 6) AS cosine_sim
  FROM short s JOIN v q ON q.id = s.qid JOIN v b ON b.id = s.cid
), ranked AS (
  SELECT query_id, corpus_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, corpus_id) AS rank
  FROM rer
)
SELECT query_id, corpus_id, cosine_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


@query("similarity_ivfpq_topk", oracle=_ivfpq_oracle)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN top-5 — the standard billion-scale vector
    index layout, assembled from this repo's two attested halves:
    IVF coarse cells (operators/similarity.py:ivf_cells/ivf_probe —
    each query scores only its 4 probed Voronoi cells) and PQ codes
    (8 subspaces × 16 centroids), with the in-cell scan ranked by the
    ASYMMETRIC quantized distance: adc(q, x) = Σ_s ‖q_s −
    centroid(code_s(x))‖² looked up from a per-query 8×16 LUT — the
    PQ table-lookup trick that never touches the full corpus vector.
    The ADC shortlist (top-20 per query, ties to lowest id) is then
    EXACT-reranked by cosine to the final top-5 — the
    recall-restoring rerank every production IVF-PQ deploy runs.
    Every stage is deterministic and the per-subspace LUT distances
    ROUND→DECIMAL before the 8-term sum (agg order independence), so
    DuckDB replays shortlist AND rerank bit-for-bit.

    Scale: corpus-side work is the IVF assignment + PQ encoding (one
    scan each, both broadcast joins — this is the INDEX BUILD you
    persist); per query the scan cost is |cell|·n_probe LUT lookups
    of 8 decimal adds, plus 20 exact vectors — independent of corpus
    size. The LUT frame is queries × 128 rows, broadcast."""
    from ibd_pipeline_spark.operators.similarity import (
        as_double_array,
        cosine,
        ivf_cells,
        ivf_probe,
    )
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    q_raw = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vec")
    )
    c_raw = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("vec")
    )
    cents, cells = ivf_cells(c_raw, _PQ_CENTS)
    # the cell assignment is the PERSISTED INDEX: two consumers below
    # (PQ encoder + candidate join) must not re-run the 16-centroid
    # assignment scan each
    cells = cells.localCheckpoint(eager=True)
    probe = ivf_probe(q_raw, cents, 4)

    subs = spark.range(_PQ_SUBS).select(F.col("id").cast("int").alias("s"))
    cent_sub = cents.crossJoin(subs).select(
        "cent_id",
        "s",
        F.slice("cent_v", (F.col("s") * _PQ_SUBDIM + 1).cast("int"),
                F.lit(_PQ_SUBDIM)).alias("cslice"),
    )
    l2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # PQ-encode the corpus (the persisted index): min-L2 code per
    # (vector, subspace), ties to the lowest centroid id
    codes = (
        cells.crossJoin(F.broadcast(subs))
        .select(
            "cid",
            "s",
            F.slice("cv", (F.col("s") * _PQ_SUBDIM + 1).cast("int"),
                    F.lit(_PQ_SUBDIM)).alias("vslice"),
        )
        .join(F.broadcast(cent_sub), "s")
        .select("cid", "s", "cent_id", l2(F.col("vslice"), F.col("cslice")).alias("d"))
        .groupBy("cid", "s")
        .agg(F.min(F.struct(F.col("d"), F.col("cent_id"))).alias("m"))
        .select("cid", "s", F.col("m.cent_id").alias("code"))
    )
    # per-query distance LUT: 8 subspaces × 16 centroids, decimal
    lut = (
        probe.select("qid", "qv")
        .distinct()
        .crossJoin(F.broadcast(subs))
        .select(
            "qid",
            "s",
            F.slice("qv", (F.col("s") * _PQ_SUBDIM + 1).cast("int"),
                    F.lit(_PQ_SUBDIM)).alias("qslice"),
        )
        .join(F.broadcast(cent_sub), "s")
        .select(
            "qid",
            "s",
            "cent_id",
            F.round(l2(F.col("qslice"), F.col("cslice")), 9)
            .cast("decimal(28,9)")
            .alias("d"),
        )
    )
    cand = (
        probe.select("qid", "cell_id")
        .join(cells.select("cid", "cell_id"), "cell_id")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    k = codes.select(
        F.col("cid").alias("kcid"), F.col("s").alias("ks"), "code"
    )
    lu = lut.select(
        F.col("qid").alias("lqid"),
        F.col("s").alias("ls"),
        F.col("cent_id").alias("lcent"),
        "d",
    )
    adc = (
        cand.join(k, F.col("cid") == F.col("kcid"))
        .join(
            F.broadcast(lu),
            (F.col("qid") == F.col("lqid"))
            & (F.col("ks") == F.col("ls"))
            & (F.col("code") == F.col("lcent")),
        )
        .groupBy("qid", "cid")
        .agg(F.sum("d").alias("adc"))
    )
    w20 = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("cid"))
    short = (
        adc.withColumn("rn", F.row_number().over(w20))
        .filter(F.col("rn") <= 20)
        .select("qid", "cid")
    )
    qv = emb.select(F.col("vec_id").alias("qid"), as_double_array("embedding").alias("qv"))
    bv = emb.select(F.col("vec_id").alias("cid"), as_double_array("embedding").alias("bv"))
    rer = (
        short.join(F.broadcast(qv.filter(F.col("qid") < 10)), "qid")
        .join(bv, "cid")
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("corpus_id"),
            F.round(cosine(F.col("qv"), F.col("bv")), 6).alias("cosine_sim"),
        )
    )
    w5 = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w5).cast("int"))
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test (daily order volume)
# ---------------------------------------------------------------------------

_MK_SQL = """
WITH d AS (
  SELECT CAST(date_trunc('day', CAST(o_orderdate AS TIMESTAMP)) AS DATE)
           AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
), s AS (
  SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
         CAST(COUNT(DISTINCT a.day) + 1 AS BIGINT) AS n
  FROM d a JOIN d b ON b.day > a.day
), ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tt
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY x)
  WHERE t > 1
), v AS (
  SELECT s.n, s.s_stat, ties.tt,
         (CAST(s.n AS DOUBLE) * (s.n - 1) * (2 * s.n + 5) - ties.tt) / 18.0
           AS var_s
  FROM s, ties
)
SELECT n AS n_days, s_stat,
       ROUND(var_s, 4) AS var_s,
       ROUND(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                  ELSE 0.0 END, 6) AS z_stat,
       CASE WHEN s_stat > 0 THEN 'increasing'
            WHEN s_stat < 0 THEN 'decreasing' ELSE 'none' END AS trend
FROM v
"""


@query("stats_mann_kendall", oracle=_MK_SQL)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall nonparametric trend test on daily order volume —
    the monitoring family's distribution-free 'is this metric
    drifting' answer (no linearity or normality assumed, robust to
    spikes): S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected
    variance Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 and the
    continuity-corrected z. S and the tie sums are exact BIGINTs; the
    two divisions happen at output.

    Scale: the corpus-scale work is the day-grain count aggregate;
    the pair sum runs as a triangular self-join over the CALENDAR-
    bounded day frame (365² pairs/year — metadata, and window-free so
    the plan audit stays clean). The parametric twin is
    stats_theil_sen_trend (same frame, slope instead of sign-sum)."""
    orders = load(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    a, b = d.alias("a"), d.alias("b")
    # calendar-bounded frame: broadcast one side (BNLJ, never a
    # partitioned cartesian)
    s = a.join(F.broadcast(b), F.col("b.day") > F.col("a.day")).agg(
        F.sum(
            F.when(F.col("b.x") > F.col("a.x"), 1)
            .when(F.col("b.x") < F.col("a.x"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat"),
        (F.countDistinct("a.day") + 1).cast("bigint").alias("n"),
    )
    ties = (
        d.groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tt")
        )
    )
    v = s.crossJoin(F.broadcast(ties)).withColumn(
        "var_s",
        (
            F.col("n").cast("double")
            * (F.col("n") - 1)
            * (2 * F.col("n") + 5)
            - F.col("tt")
        )
        / 18.0,
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")),
        )
        .otherwise(F.lit(0.0))
    )
    return v.select(
        F.col("n").alias("n_days"),
        "s_stat",
        F.round("var_s", 4).alias("var_s"),
        F.round(z, 6).alias("z_stat"),
        F.when(F.col("s_stat") > 0, "increasing")
        .when(F.col("s_stat") < 0, "decreasing")
        .otherwise("none")
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR control over per-brand return-rate tests
# ---------------------------------------------------------------------------

_BH_Q_NUM, _BH_Q_DEN = 1, 10  # q = 0.10

# Zelen & Severo 26.2.17 polynomial for the standard normal CDF —
# plain double algebra (exp + one polynomial) both engines evaluate
# bit-identically; |error| < 7.5e-8, far inside the ROUND(…, 8).
_PHI_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)


def _phi_tail_sql(z: str) -> str:
    """SQL for P(Z > z), z ≥ 0 (upper tail)."""
    k = f"(1.0 / (1.0 + 0.2316419 * {z}))"
    poly = (
        f"((((({_PHI_B[4]} * {k} + {_PHI_B[3]}) * {k} + {_PHI_B[2]}) * {k}"
        f" + {_PHI_B[1]}) * {k} + {_PHI_B[0]}) * {k})"
    )
    return (
        f"(0.3989422804014327 * exp(-0.5 * {z} * {z}) * {poly})"
    )


_BH_SQL = f"""
WITH b AS (
  SELECT p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt FROM b
), zt AS (
  SELECT brand, n, r,
         ABS((CAST(r AS DOUBLE) / n - CAST(rt AS DOUBLE) / nt)
             / sqrt((CAST(rt AS DOUBLE) / nt) * (1.0 - CAST(rt AS DOUBLE) / nt)
                    / n)) AS az
  FROM b, tot
), pv AS (
  SELECT brand, n, az,
         ROUND(2.0 * {_phi_tail_sql("az")}, 8) AS p_value
  FROM zt
), rk AS (
  SELECT a.brand, a.n, a.az, a.p_value,
         CAST(COUNT(*) AS BIGINT) AS rank,
         CAST(MAX(cnt.m) AS BIGINT) AS m
  FROM pv a
  JOIN pv c ON (c.p_value < a.p_value)
            OR (c.p_value = a.p_value AND c.brand <= a.brand)
  CROSS JOIN (SELECT COUNT(*) AS m FROM pv) cnt
  GROUP BY a.brand, a.n, a.az, a.p_value
), kmax AS (
  SELECT COALESCE(MAX(rank), 0) AS kmax
  FROM rk WHERE p_value * m * {_BH_Q_DEN} <= rank * {_BH_Q_NUM}
)
SELECT brand, n, ROUND(az, 6) AS z_stat, p_value,
       CAST(rank AS INT) AS p_rank,
       rank <= kmax.kmax AS rejected
FROM rk, kmax
ORDER BY brand
"""


@query("stats_benjamini_hochberg", oracle=_BH_SQL)
def stats_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control (q = 0.10) over one z-test per
    part brand (brand return rate vs the corpus rate) — the multiple-
    testing guardrail every metrics platform needs once it runs one
    test per segment: order the m p-values, find the largest k with
    p(k) ≤ k·q/m, reject ranks ≤ k. The BH inequality is evaluated in
    CROSS-MULTIPLIED integer-scaled form (p·m·10 ≤ rank·1), p-values
    come from the Zelen–Severo normal-CDF polynomial (plain exp +
    double algebra both engines evaluate identically, error < 7.5e-8,
    rounded to 8), and ranks come from a triangular self-join over
    the BRAND-bounded frame (catalog metadata, window-free).

    Scale: one fact-dimension join + per-brand counts (map-side
    combined); everything after runs on m = |brands| rows."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("r"),
        )
    )
    tot = b.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("r").cast("bigint").alias("rt"),
    )
    p0 = F.col("rt").cast("double") / F.col("nt")
    az = F.abs(
        (F.col("r").cast("double") / F.col("n") - p0)
        / F.sqrt(p0 * (1.0 - p0) / F.col("n"))
    )
    zt = b.crossJoin(F.broadcast(tot)).select("brand", "n", az.alias("az"))
    k = 1.0 / (1.0 + 0.2316419 * F.col("az"))
    poly = (
        (
            (
                (F.lit(_PHI_B[4]) * k + F.lit(_PHI_B[3])) * k
                + F.lit(_PHI_B[2])
            )
            * k
            + F.lit(_PHI_B[1])
        )
        * k
        + F.lit(_PHI_B[0])
    ) * k
    tail = F.lit(0.3989422804014327) * F.exp(-0.5 * F.col("az") * F.col("az")) * poly
    pv = zt.select(
        "brand", "n", "az", F.round(2.0 * tail, 8).alias("p_value")
    )
    a, c = pv.alias("a"), pv.alias("c")
    rk = (
        # brand-bounded frame: broadcast one side so the non-equi
        # rank join plans as BNLJ, never a partitioned cartesian
        a.join(
            F.broadcast(c),
            (F.col("c.p_value") < F.col("a.p_value"))
            | (
                (F.col("c.p_value") == F.col("a.p_value"))
                & (F.col("c.brand") <= F.col("a.brand"))
            ),
        )
        .groupBy("a.brand", "a.n", "a.az", "a.p_value")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rank"))
    )
    m = pv.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    rk = rk.crossJoin(F.broadcast(m))
    kmax = rk.filter(
        F.col("p_value") * F.col("m") * _BH_Q_DEN
        <= F.col("rank") * _BH_Q_NUM
    ).agg(F.coalesce(F.max("rank"), F.lit(0)).alias("kmax"))
    return (
        rk.crossJoin(F.broadcast(kmax))
        .select(
            F.col("brand"),
            F.col("n"),
            F.round("az", 6).alias("z_stat"),
            "p_value",
            F.col("rank").cast("int").alias("p_rank"),
            (F.col("rank") <= F.col("kmax")).alias("rejected"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# Nearest-as-of join (bidirectional, tolerance-bounded)
# ---------------------------------------------------------------------------

_ASOF_NEAREST_TOL = 7 * 24 * 3600  # 7 days

_ASOF_NEAREST_SQL = f"""
WITH p AS (
  SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS order_ts,
         o_custkey % 50 AS k
  FROM orders WHERE o_orderkey < 100
), m AS (
  SELECT p.o_orderkey, p.order_ts, b.bwd, f.fwd,
         epoch_us(p.order_ts) - epoch_us(b.bwd) AS gb,
         epoch_us(f.fwd) - epoch_us(p.order_ts) AS gf
  FROM p
  LEFT JOIN LATERAL (
    SELECT MAX(CAST(ts AS TIMESTAMP)) AS bwd FROM events
    WHERE user_id = p.k AND CAST(ts AS TIMESTAMP) <= p.order_ts
  ) b ON TRUE
  LEFT JOIN LATERAL (
    SELECT MIN(CAST(ts AS TIMESTAMP)) AS fwd FROM events
    WHERE user_id = p.k AND CAST(ts AS TIMESTAMP) >= p.order_ts
  ) f ON TRUE
), g AS (
  SELECT o_orderkey, order_ts,
         CASE WHEN gb IS NOT NULL AND gb <= CAST({_ASOF_NEAREST_TOL} AS BIGINT) * 1000000
              THEN bwd END AS bwd,
         CASE WHEN gf IS NOT NULL AND gf <= CAST({_ASOF_NEAREST_TOL} AS BIGINT) * 1000000
              THEN fwd END AS fwd,
         gb, gf
  FROM m
)
SELECT o_orderkey, order_ts,
       CASE WHEN bwd IS NOT NULL AND (fwd IS NULL OR gb <= gf)
            THEN bwd ELSE fwd END AS nearest_ts,
       CAST(CASE WHEN bwd IS NOT NULL AND (fwd IS NULL OR gb <= gf)
                 THEN gb // 1000000
                 WHEN fwd IS NOT NULL THEN gf // 1000000
            END AS BIGINT) AS gap_seconds,
       CASE WHEN bwd IS NOT NULL AND (fwd IS NULL OR gb <= gf)
            THEN 'backward'
            WHEN fwd IS NOT NULL THEN 'forward' END AS direction
FROM g ORDER BY o_orderkey
"""


@query("join_asof_nearest_tolerance", oracle=_ASOF_NEAREST_SQL)
def join_asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-as-of join with a 7-day tolerance — the bidirectional
    sibling of events_asof_join (backward-only): each order matches
    its closest event in EITHER direction on the same key, exact
    ties resolving backward, matches past the tolerance nulled (the
    pandas merge_asof `tolerance` contract) — the sensor/trade-quote
    alignment operator Spark lacks natively.

    Composition (operators/joins.py:asof_nearest_join): ONE
    union-and-sort shuffle on the key carries BOTH direction fills —
    a backward last() frame and a forward first() frame over the same
    sorted union — then the nearer side wins by MICROSECOND-exact
    gap comparison (unix_micros / epoch_us on the two engines); only
    the reported gap_seconds floors the true gap (ADVICE r10: the
    earlier per-side second-truncation mis-resolved sub-second
    ties). No range explosion, no second exchange."""
    from ibd_pipeline_spark.operators.joins import asof_nearest_join

    probes = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("order_ts"),
            (F.col("o_custkey") % 50).alias("k"),
        )
    )
    events = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), F.col("ts").alias("event_ts")
    )
    return (
        asof_nearest_join(
            probes,
            events,
            key="k",
            probe_time="order_ts",
            event_time="event_ts",
            tolerance_seconds=_ASOF_NEAREST_TOL,
        )
        .select(
            "o_orderkey",
            "order_ts",
            F.col("nearest_event_ts").alias("nearest_ts"),
            "gap_seconds",
            "direction",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Fano factor / burstiness of event arrivals
# ---------------------------------------------------------------------------

_FANO_SQL = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM h GROUP BY event_type
), d AS (
  SELECT event_type, n_hours, s,
         CAST(s AS DOUBLE) / n_hours AS mu,
         CASE WHEN n_hours > 1 THEN
           (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_hours)
             / (n_hours - 1) END AS vr
  FROM m
)
SELECT event_type, n_hours, s AS n_events,
       ROUND(mu, 6) AS mean_per_hour,
       ROUND(vr / mu, 6) AS fano_factor,
       ROUND(vr / (mu * mu), 6) AS cv_squared,
       ROUND((sqrt(vr) - mu) / (sqrt(vr) + mu), 6) AS burstiness
FROM d ORDER BY event_type
"""


@query("events_fano_burstiness", oracle=_FANO_SQL)
def events_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival burstiness per event type from hourly bucket counts —
    the monitoring trio nothing else in the registry covers: Fano
    factor (var/mean; 1 = Poisson, >1 = overdispersed/bursty), CV²
    (var/mean² — the squared coefficient of variation queueing theory
    keys on), and the Goh–Barabási burstiness B = (σ−μ)/(σ+μ)
    ∈ (−1, 1). Bucket counts are exact BIGINTs, so the (n, Σc, Σc²)
    moments are integers and every statistic is fixed double algebra
    at output.

    Scale: one map-side-combined (type, hour) count — the grain is
    calendar-bounded — then a type-level moment aggregate; no window,
    no join."""
    ev = load(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    m = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    mu = F.col("s").cast("double") / F.col("n_hours")
    # n_hours == 1 → no sample variance; emit NULL, never NaN
    # (ADVICE r10; streaming twin streaming/burstiness.py matches)
    vr = F.when(
        F.col("n_hours") > 1,
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n_hours")
        )
        / (F.col("n_hours") - 1),
    )
    sd = F.sqrt(vr)
    return m.select(
        "event_type",
        "n_hours",
        F.col("s").alias("n_events"),
        F.round(mu, 6).alias("mean_per_hour"),
        F.round(vr / mu, 6).alias("fano_factor"),
        F.round(vr / (mu * mu), 6).alias("cv_squared"),
        F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A/B power analysis: minimum detectable effect at the current size
# ---------------------------------------------------------------------------

_MDE_SQL = """
WITH cust AS (
  SELECT o_custkey,
         MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS converted
  FROM orders GROUP BY o_custkey
), arms AS (
  SELECT converted,
         CAST(('0x' || substring(md5('srm:' || CAST(o_custkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 2 AS arm
  FROM cust
), c AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(converted) AS BIGINT) AS conv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM arms
), d AS (
  SELECT n_a, n_b, conv, n,
         CAST(conv AS DOUBLE) / n AS p0,
         CASE WHEN n_a < n_b THEN n_a ELSE n_b END AS n_arm
  FROM c
)
SELECT n_a, n_b, conv,
       ROUND(p0, 6) AS p0,
       ROUND((1.959963985 + 0.841621234)
             * sqrt(2.0 * p0 * (1.0 - p0) / n_arm), 6) AS mde_abs,
       ROUND((1.959963985 + 0.841621234)
             * sqrt(2.0 * p0 * (1.0 - p0) / n_arm) / p0, 6) AS mde_rel
FROM d
"""


@query("ab_power_mde", oracle=_MDE_SQL)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect at the CURRENT experiment size —
    the 'is this test even worth running' readout that completes the
    experimentation kit (z-test → CUPED → delta-method → SRM → BH →
    power): with α = 0.05 two-sided and 80% power,
    MDE_abs = (z_{0.975} + z_{0.80})·√(2·p̂(1−p̂)/n_arm) on the
    baseline conversion p̂ (customer has an urgent order) under the
    same md5 hash split ab_srm_check audits. Counts are exact
    integers; the z constants are literals; one double formula at
    output — both engines replay the verdict bit-for-bit.

    Scale: one per-customer conversion aggregate + a 2-cell count —
    the same single-shuffle shape as the SRM audit it pairs with."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("converted")
        )
    )
    arms = cust.select(
        "converted", md5_bucket(F.col("o_custkey"), F.lit("srm"), 2).alias("arm")
    )
    c = arms.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum("converted").cast("bigint").alias("conv"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    p0 = F.col("conv").cast("double") / F.col("n")
    n_arm = F.least(F.col("n_a"), F.col("n_b"))
    z = F.lit(1.959963985 + 0.841621234)
    mde = z * F.sqrt(2.0 * p0 * (1.0 - p0) / n_arm)
    return c.select(
        "n_a",
        "n_b",
        "conv",
        F.round(p0, 6).alias("p0"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p0, 6).alias("mde_rel"),
    )


# ---------------------------------------------------------------------------
# Priority sampling for subset-sum estimation
# ---------------------------------------------------------------------------

_PRIO_K = 64
_PRIO_M = 1_000_000

_PRIO_SQL = f"""
WITH w AS (
  SELECT o_orderkey, o_orderpriority AS seg,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS wc,
         CAST(('0x' || substring(md5('prio:' || CAST(o_orderkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % {_PRIO_M} AS h
  FROM orders
), q AS (
  SELECT o_orderkey, seg, wc,
         CAST(wc AS DOUBLE) * {_PRIO_M} / (h + 1) AS prio
  FROM w
), topk1 AS (
  SELECT * FROM q ORDER BY prio DESC, o_orderkey LIMIT {_PRIO_K + 1}
), tau AS (
  SELECT MIN(prio) AS tau FROM topk1
), samp AS (
  SELECT t.seg, t.wc FROM topk1 t, tau
  WHERE t.prio > tau.tau
     OR (t.prio = tau.tau
         AND t.o_orderkey < (SELECT MAX(o_orderkey) FROM topk1 x, tau
                             WHERE x.prio = tau.tau))
), est AS (
  SELECT samp.seg,
         CAST(COUNT(*) AS BIGINT) AS n_sampled,
         SUM(CAST(ROUND(CASE WHEN CAST(samp.wc AS DOUBLE) > tau.tau
                             THEN CAST(samp.wc AS DOUBLE)
                             ELSE tau.tau END, 6) AS DECIMAL(28,6))) AS e
  FROM samp, tau GROUP BY samp.seg
), exact AS (
  SELECT seg, CAST(SUM(wc) AS BIGINT) AS exact_cents FROM w GROUP BY seg
)
SELECT exact.seg AS o_orderpriority,
       COALESCE(est.n_sampled, 0) AS n_sampled,
       ROUND(CAST(COALESCE(est.e, 0) AS DOUBLE) / 100, 2) AS est_total,
       ROUND(CAST(exact_cents AS DOUBLE) / 100, 2) AS exact_total,
       ROUND(ABS(CAST(COALESCE(est.e, 0) AS DOUBLE) / 100
                 - CAST(exact_cents AS DOUBLE) / 100)
             / (CAST(exact_cents AS DOUBLE) / 100), 4) AS rel_err
FROM exact LEFT JOIN est ON est.seg = exact.seg
ORDER BY o_orderpriority
"""


@query("sample_priority_subset_sums", oracle=_PRIO_SQL)
def sample_priority_subset_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM'07) — the
    weighted sample that answers UNBIASED SUBSET-SUM queries after
    the fact: each order draws priority q = w/u (u uniform from the
    engine-portable md5 hash, so both engines draw IDENTICAL
    priorities), the top-k survive, τ = the (k+1)-th priority, and
    any segment's total estimates as Σ max(w, τ) over its sampled
    members — provably unbiased with near-optimal variance, which
    A-Res-style weighted sampling (train_weighted_sample_ares) does
    NOT give you for sums. The audit emits per-priority-segment
    estimate vs exact total and relative error; the per-item
    max(w, τ) terms ROUND→DECIMAL before summing (≤ k doubles would
    otherwise sum in partial order).

    Scale: one scan computes priorities; the top-(k+1) is a
    TakeOrdered (per-task heaps, no global sort, no window); the
    estimator touches k rows. At 100 TB this is THE way to keep a
    64-row summary that still answers 'how much revenue did segment X
    have' unbiasedly — the sketch family's answer to weighted
    GROUP-BY-later queries."""
    orders = load(spark, sf_dir, "orders")
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    w = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("seg"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("wc"),
        md5_bucket(F.col("o_orderkey"), F.lit("prio"), _PRIO_M).alias("h"),
    )
    q = w.select(
        "o_orderkey",
        "seg",
        "wc",
        (F.col("wc").cast("double") * _PRIO_M / (F.col("h") + 1)).alias("prio"),
    )
    topk1 = q.orderBy(F.col("prio").desc(), "o_orderkey").limit(_PRIO_K + 1)
    topk1 = topk1.localCheckpoint(eager=True)  # tiny; consumed thrice
    tau = topk1.agg(F.min("prio").alias("tau"))
    # drop exactly ONE row at τ (the k+1-th); if several tie at τ, the
    # highest orderkey among them is the one TakeOrdered ranked last
    drop_key = (
        topk1.crossJoin(F.broadcast(tau))
        .filter(F.col("prio") == F.col("tau"))
        .agg(F.max("o_orderkey").alias("dk"))
    )
    samp = (
        topk1.crossJoin(F.broadcast(tau))
        .crossJoin(F.broadcast(drop_key))
        .filter(
            (F.col("prio") > F.col("tau"))
            | ((F.col("prio") == F.col("tau")) & (F.col("o_orderkey") < F.col("dk")))
        )
    )
    term = F.round(
        F.when(F.col("wc").cast("double") > F.col("tau"), F.col("wc").cast("double"))
        .otherwise(F.col("tau")),
        6,
    ).cast("decimal(28,6)")
    est = samp.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum(term).alias("e"),
    )
    exact = w.groupBy("seg").agg(F.sum("wc").cast("bigint").alias("exact_cents"))
    ex = F.col("exact_cents").cast("double") / 100
    ee = F.coalesce(F.col("e"), F.lit(0)).cast("double") / 100
    return (
        exact.join(F.broadcast(est), "seg", "left")
        .select(
            F.col("seg").alias("o_orderpriority"),
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
            F.round(ee, 2).alias("est_total"),
            F.round(ex, 2).alias("exact_total"),
            F.round(F.abs(ee - ex) / ex, 4).alias("rel_err"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Extreme-value analysis: Gumbel return levels from daily block maxima
# ---------------------------------------------------------------------------

_GUMBEL_SQL = """
WITH bm AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         CAST(ROUND(MAX(value), 6) AS DECIMAL(28,6)) AS mx
  FROM events GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mx) AS DECIMAL(38,6)) AS s,
         CAST(SUM(CAST(mx AS DECIMAL(38,12)) * mx) AS DECIMAL(38,12)) AS q
  FROM bm
), d AS (
  SELECT n,
         CAST(s AS DOUBLE) / n AS mean,
         sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
              / (n - 1)) AS sd
  FROM m
), fit AS (
  SELECT n, mean, sd,
         sd * sqrt(6.0) / pi() AS beta,
         mean - 0.5772156649015329 * (sd * sqrt(6.0) / pi()) AS mu
  FROM d
)
SELECT n AS n_days,
       ROUND(mean, 4) AS mean_daily_max,
       ROUND(mu, 4) AS gumbel_mu,
       ROUND(beta, 4) AS gumbel_beta,
       ROUND(mu - beta * ln(-ln(1.0 - 1.0 / 30)), 4) AS return_level_30d,
       ROUND(mu - beta * ln(-ln(1.0 - 1.0 / 365)), 4) AS return_level_365d
FROM fit
"""


@query("stats_gumbel_return_level", oracle=_GUMBEL_SQL)
def stats_gumbel_return_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis: Gumbel return levels from daily block
    maxima — the capacity-planning readout ('what value do we exceed
    once per 30 / 365 days?') the monitoring family needs beyond
    percentiles (which say nothing about maxima of FUTURE blocks).
    Method-of-moments Gumbel fit (β = s·√6/π, μ = x̄ − γ·β with the
    Euler–Mascheroni literal), return level z_T = μ − β·ln(−ln(1−1/T))
    — the classical EVT block-maxima recipe (Gumbel 1958; Coles 2001).

    Exactness: daily maxima are exact double MAXes, ROUNDed→DECIMAL
    before the moment sums (the cross-engine order-independence
    rule), the fit is fixed double algebra at output.

    Scale: one map-side-combined day-grain max + one moment aggregate
    over the calendar-bounded frame — no window, no sort, no buffer;
    block size (day) is the knob, not the data volume."""
    ev = load(spark, sf_dir, "events")
    bm = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.round(F.max("value"), 6).cast("decimal(28,6)").alias("mx"))
    m = bm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mx").cast("decimal(38,6)").alias("s"),
        F.sum(F.col("mx").cast("decimal(38,12)") * F.col("mx"))
        .cast("decimal(38,12)")
        .alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    import math

    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta

    def level(t: int):
        return F.round(mu - beta * math.log(-math.log(1.0 - 1.0 / t)), 4)

    return m.select(
        F.col("n").alias("n_days"),
        F.round(mean, 4).alias("mean_daily_max"),
        F.round(mu, 4).alias("gumbel_mu"),
        F.round(beta, 4).alias("gumbel_beta"),
        level(30).alias("return_level_30d"),
        level(365).alias("return_level_365d"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition (bounded peel) of the user co-activity graph
# ---------------------------------------------------------------------------

_KCORE_K, _KCORE_ROUNDS = 3, 4


def _kcore_oracle() -> str:
    head = """
WITH b AS (
  SELECT DISTINCT event_type,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, user_id
  FROM events
), e0 AS MATERIALIZED (
  SELECT DISTINCT a.user_id AS u, c.user_id AS v
  FROM b a JOIN b c
    ON a.event_type = c.event_type AND a.h = c.h
   AND a.user_id < c.user_id
)"""
    body = ""
    prev = "e0"
    for r in range(1, _KCORE_ROUNDS + 1):
        body += f""",
d{r} AS MATERIALIZED (
  SELECT n, CAST(SUM(c) AS BIGINT) AS deg FROM (
    SELECT u AS n, COUNT(*) AS c FROM {prev} GROUP BY u
    UNION ALL
    SELECT v AS n, COUNT(*) AS c FROM {prev} GROUP BY v
  ) GROUP BY n
), a{r} AS MATERIALIZED (
  SELECT n FROM d{r} WHERE deg >= {_KCORE_K}
), e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e
  JOIN a{r} x ON x.n = e.u JOIN a{r} y ON y.n = e.v
)"""
        prev = f"e{r}"
    tail = f"""
SELECT d.n AS user_id, d.deg AS core_degree
FROM (
  SELECT n, CAST(SUM(c) AS BIGINT) AS deg FROM (
    SELECT u AS n, COUNT(*) AS c FROM {prev} GROUP BY u
    UNION ALL
    SELECT v AS n, COUNT(*) AS c FROM {prev} GROUP BY v
  ) GROUP BY n
) d
WHERE d.deg >= {_KCORE_K}
ORDER BY user_id
"""
    return head + body + tail


@query("graph_kcore_peel", oracle=_kcore_oracle)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k = 3, bounded 4-round peel) of the user
    CO-ACTIVITY graph — nodes are users, an edge joins two users
    active in the same (event_type, hour) bucket; the k-core (every
    member keeps ≥ k neighbors INSIDE the core) is the dense-cohort
    extractor behind fraud-ring mining, community seeding, and
    engaged-user carving that degree thresholds alone miss (a
    high-degree node hanging off a sparse fringe is NOT core).
    Each peel round drops nodes whose degree fell below k and
    restricts edges to survivors; like every fixpoint in
    operators/graph.py the round count is FIXED (4 — the peel is
    monotone, so round r output is the exact r-round peel and an
    upper bound on the true core) and the oracle unrolls the same
    rounds as a CTE chain.

    Scale: edge construction is the bucket self-join — co-activity
    buckets are (type × hour)-bounded, so pair fan-out is per-bucket
    quadratic, never user-quadratic (the same blocking argument as
    every dedup family); each peel round is one degree aggregate +
    one semi-join, edge-set-sized."""
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        "user_id",
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

    def degrees(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("u").alias("n"))
            .unionAll(edges.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        )

    for _ in range(_KCORE_ROUNDS):
        alive = degrees(e).filter(F.col("deg") >= _KCORE_K).select("n")
        e = (
            e.join(alive.withColumnRenamed("n", "u"), "u", "semi")
            .join(alive.withColumnRenamed("n", "v"), "v", "semi")
            .select("u", "v")
            .localCheckpoint(eager=True)  # next round reads it twice
        )
    return (
        degrees(e)
        .filter(F.col("deg") >= _KCORE_K)
        .select(F.col("n").alias("user_id"), F.col("deg").alias("core_degree"))
        .orderBy("user_id")
    )
