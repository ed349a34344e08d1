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
