"""Round-9 additions: distribution-drift and privacy/maintenance
readouts a production data platform runs beside its pipelines —
Wasserstein-1 drift (the earth-mover upgrade of the KS test, riding
the r09 multi-weight distributed prefix-sum), mutual information +
Cramér's V (association strength beyond chi²'s yes/no), k-anonymity
auditing (the privacy face of GDPR tooling), deletion-vector
maintenance planning (the merge-on-read bookkeeping Delta/Iceberg
tables live on), and the round-9 text/dedup/similarity wave.

Reference parity note: no analog in the reference engine
(spark_processor.py computes streaming means/stddevs only); these
belong to SURVEY.md §2.2's capability-gap families.

Cross-engine float discipline follows the registry contract
(queries/__init__.py): exact integers end-to-end where possible;
per-term DECIMAL(28,8) casts before any float sum (order-independent);
ln/sqrt only as single IEEE ops on identical inputs, rounded at the
output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# Wasserstein-1 (earth mover) drift between two event populations
# ---------------------------------------------------------------------------

_W1_SQL = """
WITH p AS (
  SELECT value AS v,
         CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS c1,
         CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS c2
  FROM events
  WHERE event_type IN ('purchase', 'view')
  GROUP BY value
), c AS (
  SELECT v,
         SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
         SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
         SUM(c1) OVER () AS n1,
         SUM(c2) OVER () AS n2,
         LEAD(v) OVER (ORDER BY v) AS v_next
  FROM p
)
SELECT CAST(MAX(n1) AS BIGINT) AS n1,
       CAST(MAX(n2) AS BIGINT) AS n2,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(ROUND(SUM(CAST(
              ABS(cum1 * n2 - cum2 * n1) * (v_next - v)
            AS DECIMAL(28,8))), 4) AS DOUBLE)
         / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE)) AS w1
FROM c
WHERE v_next IS NOT NULL
"""


@query("stats_wasserstein_drift", oracle=_W1_SQL)
def stats_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth mover's) distance between the `value`
    distributions of purchase vs view events — the drift metric that,
    unlike KS's max-gap, weighs HOW FAR mass moved:
    W1 = ∫|F1−F2| dv = Σ over adjacent support points of
    |F1(v)−F2(v)|·(v_next−v).

    Fully distributed: group by value (one shuffle, support-sized
    frame), then ONE multi-weight prefix-sum scan
    (operators/ranking.py:with_global_prefix_sums) carrying c1, c2
    AND a unit weight — the unit's running total is the support row
    number, so the adjacent-point gap comes from an rn ↔ rn+1
    self-join instead of a LEAD window (no single-task WindowExec
    anywhere; the scan is checkpointed once so both join sides read
    the same physical rows).

    Exactness: per-segment mass |cum1·n2 − cum2·n1| is an exact
    integer; its product with the gap is one IEEE multiply on
    identical doubles; segments sum in the decimal domain (dsum
    contract) and divide by the exact n1·n2 once at the end.
    """
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    per_value = (
        ev.groupBy(F.col("value").alias("v"))
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c1"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("c2"),
        )
        .withColumn("one", F.lit(1).cast("bigint"))
    )
    cum = with_global_prefix_sums(per_value, ["v"], ["c1", "c2", "one"])
    a = cum.select(
        "v",
        F.col("_cum_c1").alias("cum1"),
        F.col("_cum_c2").alias("cum2"),
        F.col("_tot_c1").alias("n1"),
        F.col("_tot_c2").alias("n2"),
        F.col("_cum_one").alias("rn"),
    )
    b = cum.select(
        F.col("v").alias("v_next"), (F.col("_cum_one") - 1).alias("rn")
    )
    # inner join drops the last support point (no successor): its
    # segment has zero width, exactly the oracle's v_next IS NOT NULL.
    seg = a.join(b, "rn")
    mass = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    term = mass * (F.col("v_next") - F.col("v"))
    return seg.agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        (
            F.round(F.sum(term.cast("decimal(28,8)")), 4).cast("double")
            / (F.max("n1").cast("double") * F.max("n2").cast("double"))
        ).alias("w1"),
    )


# ---------------------------------------------------------------------------
# Mutual information + Cramér's V (association strength)
# ---------------------------------------------------------------------------

_MI_SQL = """
WITH o AS (
  SELECT event_type AS t, ISODOW(ts) AS dow, CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(obs) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT t) AS BIGINT) AS r_rows,
         CAST(COUNT(DISTINCT dow) AS BIGINT) AS c_cols
  FROM o
), rt AS (SELECT t, CAST(SUM(obs) AS BIGINT) AS row_tot FROM o GROUP BY t),
   ct AS (SELECT dow, CAST(SUM(obs) AS BIGINT) AS col_tot FROM o GROUP BY dow),
   terms AS (
  SELECT CAST(o.obs AS DOUBLE) AS od,
         CAST(rt.row_tot AS DOUBLE) AS rtd,
         CAST(ct.col_tot AS DOUBLE) AS ctd,
         CAST(tot.n AS DOUBLE) AS nd
  FROM o JOIN rt ON rt.t = o.t JOIN ct ON ct.dow = o.dow CROSS JOIN tot
)
SELECT tot.n AS n, tot.r_rows AS r_rows, tot.c_cols AS c_cols,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM o) AS n_cells,
       (SELECT CAST(ROUND(SUM(CAST(
            od / nd * ln(od * nd / (rtd * ctd)) AS DECIMAL(28,8))), 6)
          AS DOUBLE) FROM terms) AS mi_nats,
       (SELECT ROUND(SQRT(
            SUM((od - rtd * ctd / nd) * (od - rtd * ctd / nd)
                / (rtd * ctd / nd))
            / (MAX(nd) * (CASE WHEN tot.r_rows < tot.c_cols
                               THEN tot.r_rows ELSE tot.c_cols END - 1))), 6)
          FROM terms) AS cramers_v
FROM tot
"""


@query("stats_mutual_information", oracle=_MI_SQL)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) and Cramér's V between event_type and
    ISO day-of-week — the association-STRENGTH readouts beside
    stats_chi_square_independence's yes/no: MI = Σ p_ij·ln(p_ij/p_i·p_j)
    over the contingency cells, V = √(χ²/(n·(min(r,c)−1))).

    Margins come from two cell-frame aggregates broadcast back (no
    window at all — the chi² query's window-margin idiom replaced so
    the plan has zero unpartitioned windows even on the cell frame).
    Each MI term is the identical double chain in both engines
    (counts exact, one ln per cell) decimal-cast before the
    order-independent sum; χ² inside V uses the same per-cell decimal
    discipline, with √ as the final single IEEE op.

    Scale: one map-side-combined count shuffle on ~35 keys; margins
    and folds run on the cell frame."""
    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.col("event_type").alias("t"),
        (F.weekday("ts") + F.lit(1)).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("obs"))
    rt = obs.groupBy("t").agg(F.sum("obs").alias("row_tot"))
    ct = obs.groupBy("dow").agg(F.sum("obs").alias("col_tot"))
    tot = obs.agg(
        F.sum("obs").cast("bigint").alias("n"),
        F.countDistinct("t").cast("bigint").alias("r_rows"),
        F.countDistinct("dow").cast("bigint").alias("c_cols"),
    )
    cells = (
        obs.join(F.broadcast(rt), "t")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(tot))
    )
    od = F.col("obs").cast("double")
    rtd = F.col("row_tot").cast("double")
    ctd = F.col("col_tot").cast("double")
    nd = F.col("n").cast("double")
    mi_term = od / nd * F.log(od * nd / (rtd * ctd))
    e = rtd * ctd / nd
    chi_term = (od - e) * (od - e) / e
    return cells.groupBy("n", "r_rows", "c_cols").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.sum(mi_term.cast("decimal(28,8)")), 6)
        .cast("double")
        .alias("mi_nats"),
        F.round(
            F.sqrt(
                F.sum(chi_term.cast("decimal(28,8)")).cast("double")
                / (
                    F.max(nd)
                    * (F.least(F.col("r_rows"), F.col("c_cols")) - 1).cast(
                        "double"
                    )
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (privacy): quasi-identifier group-size profile
# ---------------------------------------------------------------------------

_KANON_SQL = """
WITH qi AS (
  SELECT c_nationkey AS nation, c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
  FROM customer
), g AS (
  SELECT nation, seg, bal_bucket, CAST(COUNT(*) AS BIGINT) AS grp_n
  FROM qi GROUP BY 1, 2, 3
)
SELECT CAST(SUM(grp_n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(grp_n) AS BIGINT) AS k_anonymity,
       CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
         AS rows_below_k5,
       CAST(SUM(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_k5,
       ROUND(CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(grp_n) AS DOUBLE), 6) AS suppress_frac
FROM g
"""


@query("quality_k_anonymity", oracle=_KANON_SQL)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier tuple
    (nation, market segment, account-balance 1k-bucket): the dataset's
    k (smallest QI group), how many rows/groups sit below the k=5
    release threshold, and the suppression fraction a k=5 release
    would pay — the privacy readout next to gdpr_delete_propagation.

    Everything is exact integer arithmetic off ONE group-size
    aggregate (map-side combined, QI-cardinality keys); the only
    division is the final suppress_frac on exact integers.

    Scale: one shuffle at QI cardinality; no windows, no joins."""
    c = load(spark, sf_dir, "customer")
    g = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias(
            "bal_bucket"
        ),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    below = F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(F.lit(0))
    return g.agg(
        F.sum("grp_n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("grp_n").cast("bigint").alias("k_anonymity"),
        F.sum(below).cast("bigint").alias("rows_below_k5"),
        F.sum((F.col("grp_n") < 5).cast("int")).cast("bigint").alias(
            "groups_below_k5"
        ),
        F.round(
            F.sum(below).cast("double") / F.sum("grp_n").cast("double"), 6
        ).alias("suppress_frac"),
    )


# ---------------------------------------------------------------------------
# Deletion-vector maintenance planning (merge-on-read bookkeeping)
# ---------------------------------------------------------------------------

_DV_SQL = """
WITH f AS (
  SELECT l_orderkey // 1000 AS file_id,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) FILTER (l_returnflag = 'R') AS BIGINT) AS n_deleted
  FROM lineitem GROUP BY 1
)
SELECT CAST(file_id AS BIGINT) AS file_id, n_rows, n_deleted,
       n_rows - n_deleted AS n_live,
       CAST(CEIL(n_rows / 8.0) AS BIGINT) AS dv_bytes,
       n_deleted = n_rows AS fully_dead,
       n_deleted * 10 > n_rows * 3 AS rewrite_recommended
FROM f
ORDER BY file_id
"""


@query("maintenance_deletion_vectors", oracle=_DV_SQL)
def maintenance_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector maintenance planner — the merge-on-read
    bookkeeping Delta/Iceberg tables run after a DELETE: per data file
    (simulated as l_orderkey÷1000 row groups), the DV cardinality a
    `l_returnflag='R'` predicate delete would write, the bitmap size
    (1 bit/row), fully-dead files (drop, don't rewrite), and the
    rewrite recommendation once tombstones exceed 30% of the file
    (read amplification beats rewrite cost past that point — the
    compaction trigger, cross-multiplied so the 0.3 threshold stays
    in exact integers).

    Scale: ONE count aggregate keyed by file id — this is metadata
    maintenance, the per-file frame is what a table's add/delete log
    holds; no joins, no windows, booleans and integers only."""
    li = load(spark, sf_dir, "lineitem")
    f = li.groupBy(
        F.floor(F.col("l_orderkey") / 1000).cast("bigint").alias("file_id")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_deleted"),
    )
    return (
        f.select(
            "file_id",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_deleted").cast("bigint").alias("n_deleted"),
            (F.col("n_rows") - F.col("n_deleted"))
            .cast("bigint")
            .alias("n_live"),
            F.ceil(F.col("n_rows") / 8.0).cast("bigint").alias("dv_bytes"),
            (F.col("n_deleted") == F.col("n_rows")).alias("fully_dead"),
            (F.col("n_deleted") * 10 > F.col("n_rows") * 3).alias(
                "rewrite_recommended"
            ),
        )
        .orderBy("file_id")
    )


# ---------------------------------------------------------------------------
# PMI collocations (pointwise mutual information over adjacent pairs)
# ---------------------------------------------------------------------------

_PMI_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), pairs AS (
  SELECT w[i] AS left_tok, w[i + 1] AS right_tok
  FROM toks, UNNEST(range(1, len(w))) t(i)
), c AS (
  SELECT left_tok, right_tok, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM pairs GROUP BY 1, 2
), m AS (
  SELECT left_tok, right_tok, n_pair,
         SUM(n_pair) OVER (PARTITION BY left_tok) AS n_left,
         SUM(n_pair) OVER (PARTITION BY right_tok) AS n_right,
         SUM(n_pair) OVER () AS n_total
  FROM c
)
SELECT left_tok, right_tok, n_pair,
       CAST(n_left AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right,
       ROUND(ln(CAST(n_pair AS DOUBLE) * CAST(n_total AS DOUBLE)
                / (CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE))), 6)
         AS pmi
FROM m
WHERE n_pair >= 20 AND n_pair * n_total > n_left * n_right
ORDER BY left_tok, right_tok
"""


@query("text_pmi_collocations", oracle=_PMI_SQL)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information over adjacent
    token pairs: PMI(a,b) = ln(c(a,b)·N / (c(a,·)·c(·,b))) — the
    classic 'which word pairs co-occur more than chance' readout a
    corpus-curation pipeline runs to find multiword expressions worth
    protecting from tokenization.

    The selection gate is EXACT INTEGER algebra — support c(a,b) ≥ 20
    and positive PMI as the cross-multiplied c·N > c_l·c_r — so the
    result-set boundary never depends on a float comparison; the PMI
    value itself is one ln on identical doubles, rounded at output.
    Output ordered by the pair, not by the float.

    Scale: pairs explode into a map-side-combined hash aggregate
    (shuffle = distinct pair space, Zipf-small); margins are two
    pair-frame windows PARTITIONED by token (vocab-sized groups) plus
    a broadcast total."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    c = (
        d.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.l").alias("left_tok"), F.col("p.r").alias("right_tok")
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    nl = c.groupBy("left_tok").agg(F.sum("n_pair").alias("n_left"))
    nr = c.groupBy("right_tok").agg(F.sum("n_pair").alias("n_right"))
    nt = c.agg(F.sum("n_pair").alias("n_total"))
    m = (
        c.join(F.broadcast(nl), "left_tok")
        .join(F.broadcast(nr), "right_tok")
        .crossJoin(F.broadcast(nt))
    )
    pmi = F.log(
        F.col("n_pair").cast("double")
        * F.col("n_total").cast("double")
        / (F.col("n_left").cast("double") * F.col("n_right").cast("double"))
    )
    return (
        m.filter(
            (F.col("n_pair") >= 20)
            & (
                F.col("n_pair") * F.col("n_total")
                > F.col("n_left") * F.col("n_right")
            )
        )
        .select(
            "left_tok",
            "right_tok",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.col("n_left").cast("bigint").alias("n_left"),
            F.col("n_right").cast("bigint").alias("n_right"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy("left_tok", "right_tok")
    )


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence between source vocabularies
# ---------------------------------------------------------------------------

_JS_SQL = """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok
  FROM documents WHERE source IN ('src0', 'src1')
), c AS (
  SELECT tok,
         CAST(COUNT(*) FILTER (source = 'src0') AS BIGINT) AS c1,
         CAST(COUNT(*) FILTER (source = 'src1') AS BIGINT) AS c2
  FROM toks GROUP BY tok
), n AS (
  SELECT SUM(c1) AS n1, SUM(c2) AS n2,
         COUNT(*) AS vocab,
         COUNT(*) FILTER (c1 > 0 AND c2 > 0) AS vocab_shared
  FROM c
), terms AS (
  SELECT
    CASE WHEN c.c1 > 0 THEN
      CAST(c.c1 AS DOUBLE) / CAST(n.n1 AS DOUBLE)
      * ln((2.0 * CAST(c.c1 AS DOUBLE) * CAST(n.n2 AS DOUBLE))
           / (CAST(c.c1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)
              + CAST(c.c2 AS DOUBLE) * CAST(n.n1 AS DOUBLE)))
    ELSE 0.0 END AS pterm,
    CASE WHEN c.c2 > 0 THEN
      CAST(c.c2 AS DOUBLE) / CAST(n.n2 AS DOUBLE)
      * ln((2.0 * CAST(c.c2 AS DOUBLE) * CAST(n.n1 AS DOUBLE))
           / (CAST(c.c1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)
              + CAST(c.c2 AS DOUBLE) * CAST(n.n1 AS DOUBLE)))
    ELSE 0.0 END AS qterm
  FROM c CROSS JOIN n
)
SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
       CAST(n.vocab AS BIGINT) AS vocab,
       CAST(n.vocab_shared AS BIGINT) AS vocab_shared,
       (SELECT CAST(ROUND(SUM(CAST(0.5 * pterm + 0.5 * qterm
                AS DECIMAL(28,8))), 6) AS DOUBLE) FROM terms) AS js_nats
FROM n
"""


@query("text_jensen_shannon_sources", oracle=_JS_SQL)
def text_jensen_shannon_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the unigram vocabularies of
    two corpus sources (src0 vs src1) — the symmetric, bounded [0, ln2]
    distribution distance a mixture-curation pipeline uses to measure
    how different two ingest feeds actually are (KL is undefined the
    moment one source lacks a word; JS never is).

    Per-token terms use the cross-multiplied form
    p·ln(2·c1·n2 / (c1·n2 + c2·n1)) so every ln argument is a ratio of
    exact integers — one ln per (token, side), identical double chains
    in both engines, decimal-cast before the order-independent sum.

    Scale: one token-explode into a vocab-sized hash aggregate; the
    term fold runs on the vocab frame with a broadcast 1-row total."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    c = toks.groupBy("tok").agg(
        F.count(F.when(F.col("source") == "src0", 1)).alias("c1"),
        F.count(F.when(F.col("source") == "src1", 1)).alias("c2"),
    )
    n = c.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count(F.lit(1)).alias("vocab"),
        F.count(F.when((F.col("c1") > 0) & (F.col("c2") > 0), 1)).alias(
            "vocab_shared"
        ),
    )
    t = c.crossJoin(F.broadcast(n))
    c1d, c2d = F.col("c1").cast("double"), F.col("c2").cast("double")
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    denom = c1d * n2d + c2d * n1d
    pterm = F.when(
        F.col("c1") > 0,
        c1d / n1d * F.log(F.lit(2.0) * c1d * n2d / denom),
    ).otherwise(F.lit(0.0))
    qterm = F.when(
        F.col("c2") > 0,
        c2d / n2d * F.log(F.lit(2.0) * c2d * n1d / denom),
    ).otherwise(F.lit(0.0))
    return t.groupBy("n1", "n2", "vocab", "vocab_shared").agg(
        F.round(
            F.sum((F.lit(0.5) * pterm + F.lit(0.5) * qterm).cast("decimal(28,8)")),
            6,
        )
        .cast("double")
        .alias("js_nats"),
    ).select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.col("vocab").cast("bigint").alias("vocab"),
        F.col("vocab_shared").cast("bigint").alias("vocab_shared"),
        "js_nats",
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier survival estimator (user lifetime with right-censoring)
# ---------------------------------------------------------------------------

_KM_SQL = """
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
         (SELECT SUM(d_events + c_censored) FROM d)
           - COALESCE(SUM(d_events + c_censored) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM d
), s AS (
  SELECT dur, d_events, c_censored, CAST(n_risk AS BIGINT) AS n_risk,
         SUM(CASE WHEN d_events < n_risk THEN
               CAST(ROUND(ln(1.0 - CAST(d_events AS DOUBLE)
                                 / CAST(n_risk AS DOUBLE)), 8)
                    AS DECIMAL(28,8))
             ELSE NULL END) OVER (
           ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS ln_cum,
         MAX(CASE WHEN d_events >= n_risk THEN dur END) OVER (
           ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dead_at
  FROM k
)
SELECT dur, d_events, c_censored, n_risk,
       CASE WHEN dead_at IS NOT NULL THEN 0.0
            ELSE ROUND(EXP(CAST(COALESCE(ln_cum, 0) AS DOUBLE)), 6)
       END AS survival
FROM s
ORDER BY dur
"""


@query("stats_kaplan_meier", oracle=_KM_SQL)
def stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier time-to-conversion survival curve: the "event" is
    a user's FIRST PURCHASE, measured in days from their first
    activity; users who never purchase are right-censored at their
    last observed activity — the product-limit estimator conversion/
    churn analysis runs: S(t) = Π_{s≤t} (1 − d_s/n_s) over event
    times, censored users leaving the risk set without a death.
    (r11: the event was previously "last observed event", which on
    this synthetic corpus censored EVERY user — survival ≡ 1.0, a
    correct but dead readout; conversion gives the curve real drops.)

    Cross-engine determinism: deaths/censorings/at-risk are exact
    integers; each factor enters as ln(1 − d/n) ROUNDED TO 8 DP AND
    CAST TO DECIMAL, so the running product is an exact decimal sum
    (order-independent) with one exp at the output. The d = n
    extinction row (and everything after) is pinned to exactly 0.0
    rather than exp(−inf).

    Scale: user-lifetime aggregation is one user_id shuffle; the
    duration frame is DAY-SPAN-bounded (≤ dataset days — the
    plan-audit allow-list bound), so its cumulative windows run over
    ≤ ~10³ rows of aggregate, never data."""
    from pyspark.sql import Window

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
        F.count(F.when(~F.col("censored"), 1)).alias("d_events"),
        F.count(F.when(F.col("censored"), 1)).alias("c_censored"),
    )
    tot = d.agg(
        F.sum(F.col("d_events") + F.col("c_censored")).alias("n_total")
    )
    # r11: all three prefix quantities (exclusive risk-set cumsum, the
    # ln-factor running sum, the extinction-day running max) ride the
    # block-stitched helpers over the integer duration spine — no
    # unpartitioned window (previously the last allow-list day-grain
    # entry beside interpolate).
    from ibd_pipeline_spark.operators.calendar import (
        month_stitched_cumsum,
        month_stitched_running_extreme,
    )

    blk = F.floor(F.col("dur") / 32)
    cum = month_stitched_cumsum(
        d.withColumn("dc", F.col("d_events") + F.col("c_censored")),
        "dur",
        ["dc"],
        block=blk,
    )
    k = cum.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk", F.col("n_total") - F.col("cum_dc") + F.col("dc")
    )
    ln_factor = F.when(
        F.col("d_events") < F.col("n_risk"),
        F.round(
            F.log(
                F.lit(1.0)
                - F.col("d_events").cast("double")
                / F.col("n_risk").cast("double")
            ),
            8,
        ).cast("decimal(28,8)"),
    )
    base = k.select(
        "dur",
        F.col("d_events").cast("bigint").alias("d_events"),
        F.col("c_censored").cast("bigint").alias("c_censored"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        ln_factor.alias("lnf"),
        F.when(F.col("d_events") >= F.col("n_risk"), F.col("dur")).alias(
            "dead_dur"
        ),
    )
    # sum-over-window is NULL until the first non-null; the stitch adds
    # a 0 offset instead — immaterial here because the output already
    # coalesces ln_cum to 0 (exp(0) = 1 before any event).
    s = month_stitched_cumsum(base, "dur", ["lnf"], block=blk)
    s = month_stitched_running_extreme(
        s, "dur", "dead_dur", "dead_at", kind="max", block=blk
    )
    return s.select(
        "dur",
        "d_events",
        "c_censored",
        "n_risk",
        F.when(F.col("dead_at").isNotNull(), F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(F.coalesce(F.col("cum_lnf"), F.lit(0)).cast("double")), 6
            )
        )
        .alias("survival"),
    ).orderBy("dur")


# ---------------------------------------------------------------------------
# Neyman-optimal stratified sample allocation
# ---------------------------------------------------------------------------

_NEYMAN_SQL = """
WITH s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(n_chars) AS BIGINT) AS sx,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
  FROM documents GROUP BY source
), w AS (
  SELECT source, n_h,
         SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
               / CAST(n_h AS DOUBLE)) / CAST(n_h - 1 AS DOUBLE)) AS sigma
  FROM s
), t AS (
  SELECT source, n_h, sigma, CAST(n_h AS DOUBLE) * sigma AS wt,
         CAST((SELECT CAST(SUM(CAST(CAST(n_h AS DOUBLE) * sigma
                 AS DECIMAL(28,8))) AS DOUBLE) FROM w) AS DOUBLE) AS wt_total
  FROM w
), a AS (
  SELECT source, n_h, sigma, 1000.0 * wt / wt_total AS n_real,
         CAST(FLOOR(1000.0 * wt / wt_total) AS BIGINT) AS n_floor,
         1000.0 * wt / wt_total - FLOOR(1000.0 * wt / wt_total) AS rem
  FROM t
), r AS (
  SELECT source, n_h, sigma, n_floor, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
         CAST(1000 - (SELECT SUM(n_floor) FROM a) AS BIGINT) AS leftover
  FROM a
)
SELECT source, n_h, ROUND(sigma, 6) AS sigma_chars,
       n_floor + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS n_alloc
FROM r
ORDER BY source
"""


@query("train_neyman_allocation", oracle=_NEYMAN_SQL)
def train_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation over document
    sources for a 1000-document budget: n_h ∝ N_h·σ_h (strata that are
    bigger OR more variable in length get more samples — the
    minimum-variance allocation for estimating corpus means), floored
    and topped up by largest remainder so the allocation sums to
    exactly 1000.

    Determinism: per-stratum moments (Σx, Σx²) are exact BIGINTs;
    σ_h is one IEEE sqrt on identical doubles; the weight total sums
    decimal-cast terms (order-independent); every later quotient/floor
    runs on bit-identical doubles, so n_alloc is the same exact
    integer in both engines; the largest-remainder rank breaks float
    ties by source name.

    Scale: one map-side-combined moment aggregate (stratum-count
    keys); the allocation math runs on the stratum frame — the one
    unpartitioned rank window is one row per source (plan-audit
    allow-list bound)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    sigma = F.sqrt(
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double")
            * F.col("sx").cast("double")
            / F.col("n_h").cast("double")
        )
        / (F.col("n_h") - 1).cast("double")
    )
    w = s.select(
        "source", "n_h", sigma.alias("sigma"),
        (F.col("n_h").cast("double") * sigma).alias("wt"),
    )
    wt_total = w.agg(
        F.sum(F.col("wt").cast("decimal(28,8)")).cast("double").alias(
            "wt_total"
        )
    )
    a = w.crossJoin(F.broadcast(wt_total)).select(
        "source",
        "n_h",
        "sigma",
        (F.lit(1000.0) * F.col("wt") / F.col("wt_total")).alias("n_real"),
    )
    a = a.select(
        "source",
        "n_h",
        "sigma",
        F.floor("n_real").cast("bigint").alias("n_floor"),
        (F.col("n_real") - F.floor("n_real")).alias("rem"),
    )
    left = a.agg((F.lit(1000) - F.sum("n_floor")).alias("leftover"))
    w_rk = Window.orderBy(F.col("rem").desc(), "source")
    r = a.crossJoin(F.broadcast(left)).select(
        "source",
        F.col("n_h").cast("bigint").alias("n_h"),
        F.round("sigma", 6).alias("sigma_chars"),
        (
            F.col("n_floor")
            + F.when(
                F.row_number().over(w_rk) <= F.col("leftover"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_alloc"),
    )
    return r.orderBy("source")


# ---------------------------------------------------------------------------
# Inverted-index sparse cosine (document-term postings join)
# ---------------------------------------------------------------------------

_INVIDX_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
  FROM documents WHERE doc_id < 300
), post AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
), norms AS (
  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS nrm FROM post GROUP BY 1
), dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM post a JOIN post b ON b.term = a.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d.id_a, d.id_b, d.dot, na.nrm AS norm_a, nb.nrm AS norm_b,
       ROUND(CAST(d.dot AS DOUBLE)
             / SQRT(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)), 6)
         AS cosine
FROM dots d
JOIN norms na ON na.doc_id = d.id_a
JOIN norms nb ON nb.doc_id = d.id_b
WHERE 100 * d.dot * d.dot > 81 * na.nrm * nb.nrm
ORDER BY d.id_a, d.id_b
"""


@query("similarity_inverted_index_cosine", oracle=_INVIDX_SQL)
def similarity_inverted_index_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse cosine similarity through an INVERTED-INDEX join — the
    scalable alternative to dense all-pairs for bag-of-words vectors:
    explode documents into (doc, term, tf) postings, join postings ON
    TERM (only documents sharing a term ever meet), hash-aggregate the
    products into dot products, attach norms, gate at cosine ≥ 0.9.

    Everything before the output rounding is exact integer algebra —
    dot products and squared norms are BIGINT tf sums, and the 0.9
    gate is the cross-multiplied 100·dot² > 81·‖a‖²·‖b‖², so the
    result-set boundary never touches a float; the cosine value is a
    final single-division-plus-sqrt on identical doubles.

    Scale: the postings join shuffles on TERM; per-term work is
    df(term)² — production prunes the head of the df distribution
    (stopword-like terms contribute no discrimination at quadratic
    cost). This synthetic corpus draws from a ~30-word vocabulary, so
    every term is a head term and df-pruning would empty the index;
    the oracle-bounded doc_id < 300 slice stands in for that prune
    (same role as dedup_minhash_jaccard_estimate's slice) while the
    plan — postings, term join, integer dots — is the production
    shape."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    )
    post = d.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    norms = post.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("nrm")
    )
    a, b = post.alias("a"), post.alias("b")
    dots = (
        a.join(
            b,
            (F.col("b.term") == F.col("a.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot"))
    )
    na = norms.select(
        F.col("doc_id").alias("id_a"), F.col("nrm").alias("norm_a")
    )
    nb = norms.select(
        F.col("doc_id").alias("id_b"), F.col("nrm").alias("norm_b")
    )
    out = (
        dots.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .filter(
            F.lit(100) * F.col("dot") * F.col("dot")
            > F.lit(81) * F.col("norm_a") * F.col("norm_b")
        )
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("dot").cast("bigint").alias("dot"),
        F.col("norm_a").cast("bigint").alias("norm_a"),
        F.col("norm_b").cast("bigint").alias("norm_b"),
        F.round(
            F.col("dot").cast("double")
            / F.sqrt(
                F.col("norm_a").cast("double") * F.col("norm_b").cast("double")
            ),
            6,
        ).alias("cosine"),
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Fellegi–Sunter probabilistic record linkage scoring
# ---------------------------------------------------------------------------

_FS_SQL = """
WITH d AS (
  SELECT doc_id, lang, source, n_chars // 10 AS blk,
         string_split(text, ' ')[1] AS first_tok,
         string_split(text, ' ')[-1] AS last_tok
  FROM documents WHERE doc_id < 500
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d
), u AS (
  SELECT
    (SELECT CAST(SUM(c * c) AS BIGINT) FROM (
       SELECT COUNT(*) AS c FROM d GROUP BY lang)) AS u2_lang,
    (SELECT CAST(SUM(c * c) AS BIGINT) FROM (
       SELECT COUNT(*) AS c FROM d GROUP BY source)) AS u2_source,
    (SELECT CAST(SUM(c * c) AS BIGINT) FROM (
       SELECT COUNT(*) AS c FROM d GROUP BY first_tok)) AS u2_first,
    (SELECT CAST(SUM(c * c) AS BIGINT) FROM (
       SELECT COUNT(*) AS c FROM d GROUP BY last_tok)) AS u2_last,
    (SELECT n_docs FROM n) AS nd
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(a.lang = b.lang AS INT) AS ag_lang,
         CAST(a.source = b.source AS INT) AS ag_source,
         CAST(a.first_tok = b.first_tok AS INT) AS ag_first,
         CAST(a.last_tok = b.last_tok AS INT) AS ag_last
  FROM d a JOIN d b ON b.blk = a.blk AND a.doc_id < b.doc_id
), scored AS (
  SELECT id_a, id_b,
         ag_lang + ag_source + ag_first + ag_last AS n_agree,
         (CASE WHEN ag_lang = 1
               THEN ln(0.95 * CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE)
                       / CAST(u2_lang AS DOUBLE))
               ELSE ln(0.05 / (1.0 - CAST(u2_lang AS DOUBLE)
                               / (CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE)))) END)
       + (CASE WHEN ag_source = 1
               THEN ln(0.95 * CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE)
                       / CAST(u2_source AS DOUBLE))
               ELSE ln(0.05 / (1.0 - CAST(u2_source AS DOUBLE)
                               / (CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE)))) END)
       + (CASE WHEN ag_first = 1
               THEN ln(0.95 * CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE)
                       / CAST(u2_first AS DOUBLE))
               ELSE ln(0.05 / (1.0 - CAST(u2_first AS DOUBLE)
                               / (CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE)))) END)
       + (CASE WHEN ag_last = 1
               THEN ln(0.95 * CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE)
                       / CAST(u2_last AS DOUBLE))
               ELSE ln(0.05 / (1.0 - CAST(u2_last AS DOUBLE)
                               / (CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE)))) END)
         AS score
  FROM pairs CROSS JOIN u
)
SELECT id_a, id_b, CAST(n_agree AS BIGINT) AS n_agree,
       ROUND(score, 6) AS fs_score
FROM scored
WHERE n_agree >= 3
ORDER BY id_a, id_b
"""


@query("dedup_fellegi_sunter_linkage", oracle=_FS_SQL)
def dedup_fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage: blocked candidate
    pairs scored by Σ_field ln(m/u) on agreement, ln((1−m)/(1−u)) on
    disagreement — the classical entity-resolution weight model on top
    of the dedup family's blocking machinery. m is the standard 0.95
    prior; each field's u-probability (chance agreement) is ESTIMATED
    FROM THE DATA as Σ_v c_v²/N² — kept as exact integers (Σc², N²)
    all the way into a single ln per field, so both engines compute
    bit-identical weights.

    Candidates come from n_chars÷10 length blocking (pairs only
    within a block — the sorted-neighborhood/LSH contract, never
    all-pairs); the emission gate is the exact integer n_agree ≥ 3,
    not a float score threshold.

    Scale: blocking bounds pair enumeration; the u-statistics are
    map-side-combined value-frequency aggregates broadcast into the
    pair scorer. The doc_id < 500 slice is the oracle-bounded
    calibration subset (jaccard-estimate precedent); production runs
    the same plan per block partition."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select(
            "doc_id",
            "lang",
            "source",
            F.floor(F.col("n_chars") / 10).alias("blk"),
            F.element_at(F.split("text", " "), 1).alias("first_tok"),
            F.element_at(F.split("text", " "), -1).alias("last_tok"),
        )
    )
    fields = ["lang", "source", "first_tok", "last_tok"]
    u2 = [
        d.groupBy(f).agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias(f"u2_{f}"))
        for f in fields
    ]
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    stats = nd
    for frame in u2:
        stats = stats.crossJoin(F.broadcast(frame))
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("b.blk") == F.col("a.blk"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        *[
            (F.col(f"a.{f}") == F.col(f"b.{f}")).cast("int").alias(f"ag_{f}")
            for f in fields
        ],
    )
    scored = pairs.crossJoin(F.broadcast(stats))
    ndd = F.col("nd").cast("double")
    score = None
    for f in fields:
        u2d = F.col(f"u2_{f}").cast("double")
        w = F.when(
            F.col(f"ag_{f}") == 1,
            F.log(F.lit(0.95) * ndd * ndd / u2d),
        ).otherwise(F.log(F.lit(0.05) / (F.lit(1.0) - u2d / (ndd * ndd))))
        score = w if score is None else score + w
    n_agree = sum(F.col(f"ag_{f}") for f in fields)
    return (
        scored.select(
            "id_a",
            "id_b",
            n_agree.cast("bigint").alias("n_agree"),
            F.round(score, 6).alias("fs_score"),
        )
        .filter(F.col("n_agree") >= 3)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Silhouette score of the given label clustering (bounded audit slice)
# ---------------------------------------------------------------------------

_SIL_SQL = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 200
), p AS (
  SELECT a.vec_id AS i, a.label AS la, b.label AS lb,
         SQRT(CAST((
           SELECT SUM(CAST(FLOOR((a.v[k] - b.v[k]) * (a.v[k] - b.v[k]) * 1e12)
                            AS BIGINT))
           FROM UNNEST(range(1, len(a.v) + 1)) t(k)
         ) AS DOUBLE) / 1e12) AS dist
  FROM e a JOIN e b ON b.vec_id <> a.vec_id
), m AS (
  SELECT i, la, lb,
         CAST(ROUND(SUM(CAST(dist AS DECIMAL(28,8))), 8) AS DOUBLE)
           / COUNT(*) AS mean_d
  FROM p GROUP BY 1, 2, 3
), ab AS (
  SELECT i, la,
         MAX(CASE WHEN lb = la THEN mean_d END) AS a_i,
         MIN(CASE WHEN lb <> la THEN mean_d END) AS b_i
  FROM m GROUP BY 1, 2
), s AS (
  SELECT i, la,
         CASE WHEN a_i IS NULL THEN 0.0
              ELSE (b_i - a_i) / (CASE WHEN a_i > b_i THEN a_i ELSE b_i END)
         END AS sil
  FROM ab
)
SELECT la AS label, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(ROUND(SUM(CAST(sil AS DECIMAL(28,8))), 6) AS DOUBLE) / COUNT(*)
         AS avg_silhouette
FROM s GROUP BY la ORDER BY la
"""


@query("similarity_silhouette_labels", oracle=_SIL_SQL)
def similarity_silhouette_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silhouette quality of the embedding table's GIVEN label
    clustering on the vec_id < 200 audit slice: per point,
    s = (b−a)/max(a,b) with a = mean distance to own cluster and
    b = the nearest other cluster's mean distance — the
    cluster-separation readout you run after any clustering
    (k-means included; labels here play the assignment so the whole
    chain is SQL-attestable rather than rows-only).

    Cross-engine float discipline: elements cast float→double before
    any arithmetic (float ops round differently per engine's
    promotion rules); each squared difference lands as an exact
    integer via FLOOR(t·10¹²) so the 64-term distance sum is
    order-independent; per-pair distance is one sqrt on identical
    doubles; every mean uses the decimal-sum-then-divide (davg)
    idiom. Singleton clusters take silhouette 0 by convention.

    Scale: silhouette is inherently quadratic — the audit runs on a
    bounded sample (the universal practice; sklearn does the same via
    `sample_size`). The slice join broadcasts 200 rows; per-label
    means then reduce |slice|² pair rows in one hash aggregate."""
    e = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )
    a, b = e.alias("a"), e.alias("b")
    d2_scaled = F.aggregate(
        F.zip_with(
            F.col("a.v"),
            F.col("b.v"),
            lambda x, y: F.floor((x - y) * (x - y) * F.lit(1e12)),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    p = a.join(
        F.broadcast(b), F.col("b.vec_id") != F.col("a.vec_id")
    ).select(
        F.col("a.vec_id").alias("i"),
        F.col("a.label").alias("la"),
        F.col("b.label").alias("lb"),
        F.sqrt(d2_scaled.cast("double") / F.lit(1e12)).alias("dist"),
    )
    m = p.groupBy("i", "la", "lb").agg(
        (
            F.round(F.sum(F.col("dist").cast("decimal(28,8)")), 8).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("mean_d")
    )
    ab = m.groupBy("i", "la").agg(
        F.max(F.when(F.col("lb") == F.col("la"), F.col("mean_d"))).alias(
            "a_i"
        ),
        F.min(F.when(F.col("lb") != F.col("la"), F.col("mean_d"))).alias(
            "b_i"
        ),
    )
    sil = F.when(F.col("a_i").isNull(), F.lit(0.0)).otherwise(
        (F.col("b_i") - F.col("a_i")) / F.greatest("a_i", "b_i")
    )
    return (
        ab.select(F.col("la").alias("label"), sil.alias("sil"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            (
                F.round(F.sum(F.col("sil").cast("decimal(28,8)")), 6).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("avg_silhouette"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (absorbing-chain channel credit)
# ---------------------------------------------------------------------------


def _markov_attribution_oracle() -> str:
    """operators/graph.py:absorption_probability unrolled to SQL over
    the variant-tagged chain (BASE + one variant per removed channel),
    16 value-iteration rounds as MATERIALIZED CTEs — the
    markov_stationary-oracle precedent. Transition weights are exact
    integer-count ratios; the per-round float sums match the Spark
    loop within double noise, far inside the 6-dp output rounding."""
    rounds = []
    for k in range(1, 17):
        prev = f"a{k - 1}"
        rounds.append(f"""a{k} AS MATERIALIZED (
  SELECT t.s AS state,
         SUM(t.w * CASE WHEN tg.state IS NOT NULL THEN 1.0
                        ELSE COALESCE(ap.a, 0.0) END) AS a
  FROM trans t
  LEFT JOIN targets tg ON tg.state = t.d
  LEFT JOIN {prev} ap ON ap.state = t.d
  GROUP BY t.s
)""")
    chain = ",\n".join(rounds)
    return f"""
WITH ord AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), fp AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase' THEN rn END) AS prn
  FROM ord GROUP BY user_id
), kept AS (
  SELECT o.user_id, o.event_type, o.rn
  FROM ord o JOIN fp f ON f.user_id = o.user_id
  WHERE f.prn IS NULL OR o.rn <= f.prn
), leads AS (
  SELECT user_id, event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS nxt
  FROM kept
), steps AS (
  SELECT 'START' AS src, event_type AS dst FROM kept WHERE rn = 1
  UNION ALL
  SELECT src, COALESCE(nxt, 'END') AS dst FROM leads
  WHERE NOT (nxt IS NULL AND src = 'purchase')
), channels AS (
  SELECT DISTINCT event_type AS c FROM events WHERE event_type <> 'purchase'
), variants AS (
  SELECT 'BASE' AS v UNION ALL SELECT c FROM channels
), vcounts AS (
  SELECT vr.v, s.src,
         CASE WHEN s.dst = vr.v THEN 'END' ELSE s.dst END AS dst,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM steps s CROSS JOIN variants vr
  WHERE s.src <> vr.v
  GROUP BY 1, 2, 3
), trans AS MATERIALIZED (
  SELECT v || '|' || src AS s, v || '|' || dst AS d,
         n * 1.0 / SUM(n) OVER (PARTITION BY v, src) AS w
  FROM vcounts
), targets AS MATERIALIZED (
  SELECT v || '|purchase' AS state FROM variants
), a0 AS MATERIALIZED (
  SELECT DISTINCT s AS state, 0.0 AS a FROM trans
),
{chain},
base AS (
  SELECT a AS base_a FROM a16 WHERE state = 'BASE|START'
), re AS (
  SELECT string_split(state, '|')[1] AS channel,
         a AS a_removed,
         (SELECT base_a FROM base) AS base_a,
         CASE WHEN 1.0 - a / (SELECT base_a FROM base) > 0.0
              THEN 1.0 - a / (SELECT base_a FROM base) ELSE 0.0 END AS re
  FROM a16
  WHERE state LIKE '%|START' AND state <> 'BASE|START'
), tot AS (
  SELECT CAST(SUM(CAST(re AS DECIMAL(28,12))) AS DOUBLE) AS re_sum FROM re
)
SELECT channel,
       ROUND(base_a, 6) AS conv_base,
       ROUND(a_removed, 6) AS conv_removed,
       ROUND(re, 6) AS removal_effect,
       CASE WHEN t.re_sum > 0 THEN ROUND(re / t.re_sum, 6) END AS attribution
FROM re CROSS JOIN tot t
ORDER BY channel
"""


@query("analytics_markov_attribution", oracle=_markov_attribution_oracle)
def analytics_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: credit each channel
    (event_type) for conversions by how much the chain's
    START→purchase absorption probability DROPS when the channel is
    removed (transitions into it die to END) — the data-driven
    multi-touch model that replaces last-click heuristics.

    Per-user journeys truncate at the first purchase (absorbing);
    users who never purchase end at END (absorbing drop). One
    variant-tagged chain — BASE plus one variant per removed channel,
    states keyed 'variant|state' — feeds a SINGLE absorption fixpoint
    (operators/graph.py:absorption_probability, 16 value-iteration
    rounds) instead of k+1 separate loops. Removal effects clamp at 0
    (removing a dropout-feeder can raise conversion) and normalize to
    attribution shares.

    Hash-attested: transition weights are exact integer-count ratios;
    the fixpoint unrolls to a DuckDB CTE chain
    (_markov_attribution_oracle — the markov_stationary precedent).

    Scale: journey construction is the corpus-scale work (one user_id
    window + counts shuffle); the chain itself is
    (channels+2)·(variants)-sized — fixed cost regardless of event
    volume, like every fixpoint in operators/graph.py."""
    from pyspark.sql import Window

    from ibd_pipeline_spark.operators.graph import absorption_probability

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
    kept = ord_.join(fp, "user_id").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    w_k = Window.partitionBy("user_id").orderBy("rn")
    leads = kept.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w_k).alias("nxt"),
    )
    starts = kept.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("event_type").alias("dst")
    )
    steps = starts.unionByName(
        leads.filter(
            ~(F.col("nxt").isNull() & (F.col("src") == "purchase"))
        ).select("src", F.coalesce("nxt", F.lit("END")).alias("dst"))
    )
    variants = (
        ev.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("v"))
        .distinct()
        .unionByName(
            ev.sparkSession.createDataFrame([("BASE",)], "v string")
        )
    )
    vcounts = (
        steps.crossJoin(F.broadcast(variants))
        .filter(F.col("src") != F.col("v"))
        .groupBy(
            "v",
            "src",
            F.when(F.col("dst") == F.col("v"), F.lit("END"))
            .otherwise(F.col("dst"))
            .alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vtot = vcounts.groupBy("v", "src").agg(F.sum("n").alias("tot"))
    trans = vcounts.join(vtot, ["v", "src"]).select(
        F.concat_ws("|", "v", "src").alias("src_s"),
        F.concat_ws("|", "v", "dst").alias("dst_s"),
        (F.col("n") / F.col("tot")).alias("p"),
    )
    targets = variants.select(
        F.concat_ws("|", "v", F.lit("purchase")).alias("state")
    )
    a = absorption_probability(
        trans, targets, src="src_s", dst="dst_s", prob="p", iters=16
    )
    starts_a = a.filter(F.col("state").endswith("|START")).select(
        F.substring_index("state", "|", 1).alias("variant"), "a"
    )
    base = starts_a.filter(F.col("variant") == "BASE").select(
        F.col("a").alias("base_a")
    )
    re = (
        starts_a.filter(F.col("variant") != "BASE")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("variant").alias("channel"),
            F.col("a").alias("a_removed"),
            "base_a",
            F.greatest(
                F.lit(0.0), F.lit(1.0) - F.col("a") / F.col("base_a")
            ).alias("re"),
        )
    )
    tot = re.agg(
        F.sum(F.col("re").cast("decimal(28,12)"))
        .cast("double")
        .alias("re_sum")
    )
    return (
        re.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round("base_a", 6).alias("conv_base"),
            F.round("a_removed", 6).alias("conv_removed"),
            F.round("re", 6).alias("removal_effect"),
            F.when(
                F.col("re_sum") > 0, F.round(F.col("re") / F.col("re_sum"), 6)
            ).alias("attribution"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Banded range join (equi-key-less interval containment at scale)
# ---------------------------------------------------------------------------

_BANDED_SQL = """
WITH inc AS (
  SELECT event_id AS incident_id,
         CAST(ts AS TIMESTAMP) AS w_start,
         CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS w_end
  FROM events WHERE event_type = 'error' AND event_id % 97 = 0
)
SELECT i.incident_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) FILTER (e.event_type = 'error') AS BIGINT)
         AS n_errors
FROM inc i JOIN events e
  ON CAST(e.ts AS TIMESTAMP) >= i.w_start
 AND CAST(e.ts AS TIMESTAMP) < i.w_end
GROUP BY i.incident_id
ORDER BY i.incident_id
"""


@query("join_banded_range", oracle=_BANDED_SQL)
def join_banded_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join WITHOUT an equi key — events falling inside
    incident windows ([error ts, +1 hour)) — made shuffle-joinable by
    BANDING: both sides tag hour-floor band numbers (a window of
    length ≤ band covers at most 2 bands, so the interval side
    explodes into ≤ 2 rows), the join runs as a plain EQUI join on
    the band, and the exact containment predicate filters after. The
    hand-rolled form of the range-join bin optimization — without it
    this shape is a BroadcastNestedLoopJoin (fine for a small
    interval side) or, worse, a cartesian.

    The oracle runs the plain theta join; banding is provably
    lossless because an event inside [start, start+1h) has its hour
    floor in {floor(start), floor(start)+1}, exactly the two exploded
    bands.

    Scale: shuffle on the band key distributes both sides; per-band
    work is (events in the hour) × (windows touching it) — bounded by
    incident density, never |events|²; skewed hot hours fall to AQE
    skew-split since the join is a plain exchange."""
    ev = load(spark, sf_dir, "events")
    inc = ev.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 97 == 0)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    # interval side: ≤ 2 bands per 1-hour window (band == window size)
    inc_b = inc.select(
        "incident_id",
        "w_start",
        "w_end",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.unix_timestamp("w_start") / 3600),
                    F.floor(F.unix_timestamp("w_end") / 3600),
                )
            )
        ).alias("band"),
    )
    ev_b = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.floor(F.unix_timestamp("ts") / 3600).alias("band"),
    )
    joined = inc_b.join(ev_b, "band").filter(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    return (
        joined.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.when(F.col("event_type") == "error", 1))
            .cast("bigint")
            .alias("n_errors"),
        )
        .orderBy("incident_id")
    )


# ---------------------------------------------------------------------------
# l-diversity audit (sensitive-attribute diversity within QI groups)
# ---------------------------------------------------------------------------

_LDIV_SQL = """
WITH g AS (
  SELECT c_nationkey AS nation,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
         CAST(COUNT(*) AS BIGINT) AS grp_n,
         CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div
  FROM customer GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(grp_n) AS BIGINT) AS n_rows,
       CAST(MIN(l_div) AS BIGINT) AS l_diversity,
       CAST(SUM(CASE WHEN l_div < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_l2,
       CAST(SUM(CASE WHEN l_div < 2 THEN grp_n ELSE 0 END) AS BIGINT)
         AS rows_below_l2,
       ROUND(CAST(SUM(CASE WHEN l_div < 2 THEN grp_n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(grp_n) AS DOUBLE), 6) AS exposed_frac
FROM g
"""


@query("quality_l_diversity", oracle=_LDIV_SQL)
def quality_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's stronger sibling: within
    each quasi-identifier group (nation, balance bucket), how many
    DISTINCT values of the sensitive attribute (market segment)
    appear? A group can be k-anonymous yet fully exposed if every
    member shares the sensitive value (the homogeneity attack);
    l_diversity = the dataset's minimum, with the row mass sitting in
    l < 2 groups as the exposure readout.

    Exact integers off one aggregate carrying COUNT + COUNT DISTINCT
    per QI group; the only division is the final exposed_frac.

    Scale: one shuffle at QI cardinality; the distinct-count is
    per-group (segment values ≤ 5), never global."""
    c = load(spark, sf_dir, "customer")
    g = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias(
            "bal_bucket"
        ),
    ).agg(
        F.count(F.lit(1)).alias("grp_n"),
        F.countDistinct("c_mktsegment").alias("l_div"),
    )
    exposed = F.when(F.col("l_div") < 2, F.col("grp_n")).otherwise(F.lit(0))
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("grp_n").cast("bigint").alias("n_rows"),
        F.min("l_div").cast("bigint").alias("l_diversity"),
        F.sum((F.col("l_div") < 2).cast("int")).cast("bigint").alias(
            "groups_below_l2"
        ),
        F.sum(exposed).cast("bigint").alias("rows_below_l2"),
        F.round(
            F.sum(exposed).cast("double") / F.sum("grp_n").cast("double"), 6
        ).alias("exposed_frac"),
    )


# ---------------------------------------------------------------------------
# t-closeness audit (distributional privacy, completes the trio)
# ---------------------------------------------------------------------------

_TCLOSE_SQL = """
WITH qi AS (
  SELECT c_nationkey AS nation,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
         c_mktsegment AS seg
  FROM customer
), gseg AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS cv FROM qi GROUP BY seg
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM qi
), grp AS (
  SELECT nation, bal_bucket, CAST(COUNT(*) AS BIGINT) AS n_g FROM qi
  GROUP BY 1, 2
), gc AS (
  SELECT nation, bal_bucket, seg, CAST(COUNT(*) AS BIGINT) AS c_gv FROM qi
  GROUP BY 1, 2, 3
), spine AS (
  SELECT g.nation, g.bal_bucket, g.n_g, gl.seg, gl.cv,
         COALESCE(c.c_gv, 0) AS c_gv
  FROM grp g CROSS JOIN gseg gl
  LEFT JOIN gc c ON c.nation = g.nation AND c.bal_bucket = g.bal_bucket
                AND c.seg = gl.seg
), t AS (
  SELECT nation, bal_bucket, n_g,
         CAST(SUM(ABS(c_gv * (SELECT nn FROM n) - cv * n_g)) AS BIGINT)
           AS num
  FROM spine GROUP BY 1, 2, 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       ROUND(MAX(CAST(num AS DOUBLE)
                 / (2.0 * CAST(n_g AS DOUBLE)
                    * CAST((SELECT nn FROM n) AS DOUBLE))), 6) AS max_t,
       CAST(SUM(CASE WHEN 10 * num > 6 * n_g * (SELECT nn FROM n)
                     THEN 1 ELSE 0 END) AS BIGINT) AS groups_above_t03,
       CAST(SUM(CASE WHEN 10 * num > 6 * n_g * (SELECT nn FROM n)
                     THEN n_g ELSE 0 END) AS BIGINT) AS rows_above_t03,
       ROUND(CAST(SUM(CASE WHEN 10 * num > 6 * n_g * (SELECT nn FROM n)
                           THEN n_g ELSE 0 END) AS DOUBLE)
             / CAST((SELECT nn FROM n) AS DOUBLE), 6) AS exposed_frac
FROM t
"""


@query("quality_t_closeness", oracle=_TCLOSE_SQL)
def quality_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the distributional member of the privacy
    trio (k-anonymity: group size; l-diversity: distinct sensitive
    values; t-closeness: the DISTRIBUTION of the sensitive attribute
    within a QI group must stay close to the global one, or the group
    leaks by skew even when l is high). Distance is the categorical
    EMD (total variation): t_g = ½·Σ_v |c_gv/n_g − C_v/N|.

    All-integer core: per (group, segment) term |c_gv·N − C_v·n_g| is
    an exact BIGINT (groups missing a segment contribute C_v·n_g via
    the group × segment spine), t_g's numerator sums exactly, and the
    t > 0.3 release gate is the cross-multiplied 10·num > 6·n_g·N —
    only the reported max_t touches a float, once, at output.

    Scale: two QI-cardinality aggregates + a broadcast segment spine
    (≤ 5 values); no windows, no data-sized joins."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias(
            "bal_bucket"
        ),
        F.col("c_mktsegment").alias("seg"),
    )
    glob = c.groupBy("seg").agg(F.count(F.lit(1)).alias("cv"))
    n = c.agg(F.count(F.lit(1)).alias("nn"))
    grp = c.groupBy("nation", "bal_bucket").agg(
        F.count(F.lit(1)).alias("n_g")
    )
    gc = c.groupBy("nation", "bal_bucket", "seg").agg(
        F.count(F.lit(1)).alias("c_gv")
    )
    spine = (
        grp.crossJoin(F.broadcast(glob))
        .join(gc, ["nation", "bal_bucket", "seg"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "nation",
            "bal_bucket",
            "n_g",
            "nn",
            F.abs(
                F.coalesce("c_gv", F.lit(0)) * F.col("nn")
                - F.col("cv") * F.col("n_g")
            ).alias("term"),
        )
    )
    t = spine.groupBy("nation", "bal_bucket", "n_g", "nn").agg(
        F.sum("term").alias("num")
    )
    above = F.lit(10) * F.col("num") > F.lit(6) * F.col("n_g") * F.col("nn")
    return t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.round(
            F.max(
                F.col("num").cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_g").cast("double")
                    * F.col("nn").cast("double")
                )
            ),
            6,
        ).alias("max_t"),
        F.sum(above.cast("int")).cast("bigint").alias("groups_above_t03"),
        F.sum(F.when(above, F.col("n_g")).otherwise(0))
        .cast("bigint")
        .alias("rows_above_t03"),
        F.round(
            F.sum(F.when(above, F.col("n_g")).otherwise(0)).cast("double")
            / F.max("nn").cast("double"),
            6,
        ).alias("exposed_frac"),
    )


# ---------------------------------------------------------------------------
# Binned-PSI value drift (batch twin of streaming/drift.py)
# ---------------------------------------------------------------------------

_PSI_BINNED_SQL = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS TIMESTAMP)) AS t0, MAX(CAST(ts AS TIMESTAMP)) AS t1
  FROM events
), binned AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 100.0 * 32) AS BIGINT),
                        0), 31) AS bin,
         CAST(ts AS TIMESTAMP) AS tts
  FROM events
), base AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM binned
  WHERE tts < (SELECT t0 + INTERVAL 7 DAY FROM bounds) GROUP BY bin
), cur AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM binned
  WHERE tts >= (SELECT t1 - INTERVAL 7 DAY FROM bounds) GROUP BY bin
), spine AS (
  SELECT CAST(UNNEST(range(0, 32)) AS BIGINT) AS bin
), j AS (
  SELECT s.bin,
         CAST(COALESCE(c.n, 0) AS DOUBLE) AS c,
         CAST(COALESCE(b.n, 0) AS DOUBLE) AS b
  FROM spine s LEFT JOIN cur c ON c.bin = s.bin
  LEFT JOIN base b ON b.bin = s.bin
), tot AS (
  SELECT SUM(c) AS ct, SUM(b) AS bt FROM j
)
SELECT CAST(t.ct AS BIGINT) AS n_current,
       CAST(t.bt AS BIGINT) AS n_baseline,
       CAST(ROUND(SUM(CAST(
         ((CASE WHEN j.c > 0.5 THEN j.c ELSE 0.5 END) / t.ct
          - (CASE WHEN j.b > 0.5 THEN j.b ELSE 0.5 END) / t.bt)
         * ln(((CASE WHEN j.c > 0.5 THEN j.c ELSE 0.5 END) / t.ct)
              / ((CASE WHEN j.b > 0.5 THEN j.b ELSE 0.5 END) / t.bt))
         AS DECIMAL(28,8))), 6) AS DOUBLE) AS psi,
       CAST(ROUND(SUM(CAST(
         ((CASE WHEN j.c > 0.5 THEN j.c ELSE 0.5 END) / t.ct
          - (CASE WHEN j.b > 0.5 THEN j.b ELSE 0.5 END) / t.bt)
         * ln(((CASE WHEN j.c > 0.5 THEN j.c ELSE 0.5 END) / t.ct)
              / ((CASE WHEN j.b > 0.5 THEN j.b ELSE 0.5 END) / t.bt))
         AS DECIMAL(28,8))), 6) AS DOUBLE) > 0.2 AS drift_alarm
FROM j CROSS JOIN tot t
GROUP BY t.ct, t.bt
"""


@query("events_value_psi_binned", oracle=_PSI_BINNED_SQL)
def events_value_psi_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned-PSI value drift, batch twin of the live monitor
    (streaming/drift.py — same value_bin / binned_histogram /
    psi_report code): the last calendar week's `value` distribution
    scored against the first week's over a fixed 32-bin histogram
    with 0.5-count smoothing and the industry 0.2 alarm. This query
    is the hash-attested face of the streaming operator — the stream
    path is proven stream-equals-batch against the SAME expressions
    in tests/test_streaming_drift.py, and this attests those
    expressions against DuckDB.

    Determinism: bin counts are exact integers; p/q are exact-integer
    ratios; one ln per bin on identical doubles; decimal-cast terms
    sum order-independently (dsum contract).

    Scale: two filtered count aggregates over 32 keys (map-side
    combined) + a 32-row spine join — the monitoring readout shape."""
    from ibd_pipeline_spark.streaming.drift import binned_histogram, psi_report

    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    evb = ev.crossJoin(F.broadcast(bounds))
    base = binned_histogram(
        evb.filter(F.col("ts") < F.col("t0") + F.expr("INTERVAL 7 DAY")),
        "value",
    )
    cur = binned_histogram(
        evb.filter(F.col("ts") >= F.col("t1") - F.expr("INTERVAL 7 DAY")),
        "value",
    )
    return psi_report(cur, base)


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval (deterministic resampling)
# ---------------------------------------------------------------------------

# Inverse-CDF thresholds of Poisson(1) scaled to u ∈ [0, 1e6): a row
# enters resample b with multiplicity k when u lands in bin k. Exact
# integers, so both engines draw IDENTICAL resamples.
_POIS = (367879, 735758, 919698, 981011, 996340)

_BOOT_B = 100

_BOOT_SQL = f"""
WITH draws AS (
  SELECT o.o_totalprice AS x, t.b,
         CAST(('0x' || substring(md5(CAST(t.b AS VARCHAR) || ':'
                || CAST(o.o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
           % 1000000 AS u
  FROM orders o, UNNEST(range(0, {_BOOT_B})) t(b)
), mult AS (
  SELECT b, x,
         CASE WHEN u < {_POIS[0]} THEN 0
              WHEN u < {_POIS[1]} THEN 1
              WHEN u < {_POIS[2]} THEN 2
              WHEN u < {_POIS[3]} THEN 3
              WHEN u < {_POIS[4]} THEN 4
              ELSE 5 END AS m
  FROM draws
), means AS (
  SELECT b,
         CAST(ROUND(SUM(CAST(m * x AS DECIMAL(28,8))), 4) AS DOUBLE)
           / SUM(m) AS mb
  FROM mult GROUP BY b HAVING SUM(m) > 0
), pt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,8))), 4) AS DOUBLE)
           / COUNT(o_totalprice) AS point_mean
  FROM orders
)
SELECT pt.n_rows,
       CAST((SELECT COUNT(*) FROM means) AS BIGINT) AS b_resamples,
       pt.point_mean AS point_mean,
       ROUND((SELECT quantile_cont(mb, 0.025) FROM means), 4) AS ci_lo,
       ROUND((SELECT quantile_cont(mb, 0.975) FROM means), 4) AS ci_hi,
       ROUND((SELECT SQRT((CAST(SUM(CAST(mb * mb AS DECIMAL(28,8))) AS DOUBLE)
                  - CAST(SUM(CAST(mb AS DECIMAL(28,8))) AS DOUBLE)
                    * CAST(SUM(CAST(mb AS DECIMAL(28,8))) AS DOUBLE)
                    / COUNT(*))
                 / (COUNT(*) - 1)) FROM means), 6) AS boot_se
FROM pt
"""


@query("stats_bootstrap_ci", oracle=_BOOT_SQL)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean order value
    — the resampling CI that actually distributes: classical
    bootstrap resamples n-with-replacement (impossible to coordinate
    across partitions); the Poisson(1) approximation gives every row
    an INDEPENDENT multiplicity per resample, so the whole B-resample
    ensemble is one explode + one hash aggregate (Chamandy et al.,
    'Estimating Uncertainty for Massive Data Streams', Google 2012).

    Fully deterministic & oracle-replayable: multiplicities come from
    md5(b:orderkey) mod 10⁶ against exact integer Poisson inverse-CDF
    thresholds (both engines draw identical resamples), per-resample
    means use the davg decimal contract, the CI is an exact
    interpolated percentile over the B-row mean frame, and the
    bootstrap SE runs on decimal-cast moments.

    Scale: B× row multiplication feeds straight into a map-side
    combined aggregate keyed by resample id — shuffle is B rows of
    partials per partition, never B× data; B caps the memory of
    nothing (no per-resample state beyond one sum/count). The input
    is repartitioned BEFORE the explode: a compact parquet of orders
    arrives in a handful of splits, and without the fan-out the
    B×n md5 draws serialize onto those few cores (SCALE.md r4
    lesson #5; measured 30 s → ~3 s at sf0.1 on local[32])."""
    o = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    B = _BOOT_B
    draws = o.select(
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey"),
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("b"),
    ).select(
        "x",
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("b").cast("string"),
                            F.lit(":"),
                            F.col("o_orderkey").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000000
        ).alias("u"),
    )
    m = (
        F.when(F.col("u") < _POIS[0], 0)
        .when(F.col("u") < _POIS[1], 1)
        .when(F.col("u") < _POIS[2], 2)
        .when(F.col("u") < _POIS[3], 3)
        .when(F.col("u") < _POIS[4], 4)
        .otherwise(5)
    )
    means = (
        draws.select("b", m.alias("m"), "x")
        .groupBy("b")
        .agg(
            F.sum((F.col("m") * F.col("x")).cast("decimal(28,8)")).alias(
                "sx"
            ),
            F.sum("m").alias("sm"),
        )
        .filter(F.col("sm") > 0)
        .select(
            (
                F.round(F.col("sx"), 4).cast("double") / F.col("sm")
            ).alias("mb")
        )
    )
    pt = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 4
            ).cast("double")
            / F.count("o_totalprice")
        ).alias("point_mean"),
    )
    stats = means.agg(
        F.count(F.lit(1)).cast("bigint").alias("b_resamples"),
        F.round(F.expr("percentile(mb, 0.025)"), 4).alias("ci_lo"),
        F.round(F.expr("percentile(mb, 0.975)"), 4).alias("ci_hi"),
        F.round(
            F.sqrt(
                (
                    F.sum((F.col("mb") * F.col("mb")).cast("decimal(28,8)"))
                    .cast("double")
                    - F.sum(F.col("mb").cast("decimal(28,8)")).cast("double")
                    * F.sum(F.col("mb").cast("decimal(28,8)")).cast("double")
                    / F.count(F.lit(1))
                )
                / (F.count(F.lit(1)) - 1)
            ),
            6,
        ).alias("boot_se"),
    )
    return pt.crossJoin(F.broadcast(stats)).select(
        "n_rows", "b_resamples", "point_mean", "ci_lo", "ci_hi", "boot_se"
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of daily volume (seasonality fingerprint)
# ---------------------------------------------------------------------------

_ACF_SQL = """
WITH dd AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
              AS BIGINT) AS di,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
), muc AS (
  SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mu,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM dd
), denc AS (
  SELECT CAST(SUM(CAST((CAST(dd.x AS DOUBLE) - muc.mu)
                       * (CAST(dd.x AS DOUBLE) - muc.mu) AS DECIMAL(28,8)))
              AS DOUBLE) AS den
  FROM dd CROSS JOIN muc
), numc AS (
  SELECT t.k AS lag_k,
         CAST(SUM(CAST((CAST(a.x AS DOUBLE) - muc.mu)
                       * (CAST(b.x AS DOUBLE) - muc.mu) AS DECIMAL(28,8)))
              AS DOUBLE) AS num,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM UNNEST(range(1, 8)) t(k)
  JOIN dd a ON TRUE JOIN dd b ON b.di = a.di + t.k CROSS JOIN muc
  GROUP BY t.k
)
SELECT CAST(numc.lag_k AS BIGINT) AS lag_k, numc.n_pairs,
       (SELECT n_days FROM muc) AS n_days,
       ROUND(numc.num / (SELECT den FROM denc), 6) AS acf
FROM numc
ORDER BY lag_k
"""


@query("stats_autocorrelation_daily", oracle=_ACF_SQL)
def stats_autocorrelation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily event volume at lags 1–7 —
    the seasonality fingerprint behind the monitoring family: a
    spike at lag 7 confirms the weekly cycle events_seasonal_decompose
    removes; near-zero everywhere says the seasonal-naive backtest
    baseline is as good as it gets.

    ACF_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² over the day-grain
    frame, with a LAG SPINE JOIN (explode k∈1..7, equi-join on
    day+k) instead of a LAG window — no unpartitioned window, and
    gap days pair by CALENDAR distance (a row-LAG silently stretches
    across gaps; the r8 forecast-backtest lesson). Counts are exact
    integers; x̄ and every deviation product are identical double
    chains, decimal-cast before the order-independent sums.

    Scale: the corpus-sized work is one day-grain count aggregate;
    the spine join runs on (days × 7) rows."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.unix_date(F.to_date(F.date_trunc("day", "ts"))).alias("di")
    ).agg(F.count(F.lit(1)).alias("x"))
    mu = d.agg(
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    dm = d.crossJoin(F.broadcast(mu))
    den = dm.agg(
        F.sum(
            (
                (F.col("x").cast("double") - F.col("mu"))
                * (F.col("x").cast("double") - F.col("mu"))
            ).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("den")
    )
    ks = ev.sparkSession.range(1, 8).select(F.col("id").alias("lag_k"))
    b = d.select(F.col("di").alias("dib"), F.col("x").alias("xb"))
    pairs = dm.crossJoin(F.broadcast(ks)).join(
        b, F.col("dib") == F.col("di") + F.col("lag_k")
    )
    num = pairs.groupBy("lag_k").agg(
        F.sum(
            (
                (F.col("x").cast("double") - F.col("mu"))
                * (F.col("xb").cast("double") - F.col("mu"))
            ).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("num"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.max("n_days").alias("n_days"),
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("lag_k").cast("bigint").alias("lag_k"),
            "n_pairs",
            "n_days",
            F.round(F.col("num") / F.col("den"), 6).alias("acf"),
        )
        .orderBy("lag_k")
    )
