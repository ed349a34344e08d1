"""Round-8 capability queries — planning probes, monitoring
analytics, and dedup/sketch evaluation, ALL DuckDB-attestable by
construction:

- profile_join_size_estimate / profile_functional_dependencies:
  shuffle-planning and schema-profiling probes, pure integer outputs
  (key sampling through the md5-portable bucket idiom so both
  engines pick identical samples).
- events_forecast_backtest / events_time_weighted_avg /
  stats_theil_sen_trend / events_top_paths: day-grain and
  per-user-window analytics under total orders (calendar-offset
  self-joins instead of row LAGs; (ts, event_id) tiebreaks).
- dedup_blocking_quality: LSH candidates vs the exact shingle-join
  truth with the J-threshold kept in integer space.
- similarity_kcenter_diverse: a deterministic greedy loop unrolled
  to a DuckDB CTE chain (the graph-fixpoint idiom).
- sketch_audience_overlap / analytics_mix_shift_decompose:
  inclusion–exclusion over portable linear-counting occupancy, and
  an exact share/rate decomposition identity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# Distributed join-size estimation (shuffle planning)
# ---------------------------------------------------------------------------

_JOIN_SIZE_SQL = """
WITH c AS (
  SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
), s AS (
  SELECT k, n FROM c
  WHERE CAST(('0x' || substring(md5('7:' || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
), e AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(n * n) AS BIGINT) AS exact_pairs
  FROM c
), se AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS sampled_keys,
         CAST(COALESCE(SUM(n * n), 0) * 10 AS BIGINT) AS est_pairs
  FROM s
)
SELECT e.n_keys, e.exact_pairs, se.sampled_keys, se.est_pairs,
       CAST(ABS(se.est_pairs - e.exact_pairs) * 10000 // e.exact_pairs AS BIGINT)
         AS abs_err_bp
FROM e, se
"""


@query("profile_join_size_estimate", oracle=_JOIN_SIZE_SQL)
def profile_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from a key sample — the planning probe you
    run BEFORE a potentially quadratic join (here the lineitem
    self-join on l_partkey, the classic blowup shape): per-key counts
    once, |A ⋈ A| = Σₖ n(k)² exactly, and the 10%-of-KEYS estimate
    scaled by 1/p next to it with the error in integer basis points.
    Key-sampling (not row-sampling) is what makes the estimator
    unbiased for Σ n² — a row sample deflates heavy keys
    quadratically. The companion to profile_key_skew: skew tells you
    WHERE the hot keys are, this tells you whether the join output
    fits before you launch it.

    Exactness: the sample membership is the md5-portable bucket
    (seed 7, mod 100 < 10) — both engines pick the identical keys —
    and every output column is BIGINT arithmetic (cross-multiplied
    basis points, integer floor-div), so the oracle is exact with no
    float rounding anywhere.

    Scale: one map-side-combined count per key (the same pass any
    shuffle-planning probe pays), then two key-domain-sized
    aggregates to single rows; the estimate needs only the sampled
    10% of the key domain — at 100 TB you run ONLY the `s` branch
    (drop the exact twin, which exists here to attest the estimator)
    and the probe costs one aggregate over a 10% key sample."""
    from ibd_pipeline_spark.operators.sketches import md5_bucket

    c = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    s = c.filter(md5_bucket(F.col("k"), 7, 100) < 10)
    e = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("exact_pairs"),
    )
    se = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("sampled_keys"),
        (F.coalesce(F.sum(F.col("n") * F.col("n")), F.lit(0)) * 10)
        .cast("bigint")
        .alias("est_pairs"),
    )
    return (
        e.crossJoin(F.broadcast(se))
        .select(
            "n_keys",
            "exact_pairs",
            "sampled_keys",
            "est_pairs",
            # integer space on both sides: Spark `div`, DuckDB `//`
            # (Spark `/` is a DOUBLE divide; DuckDB CAST rounds where
            # Spark truncates — profile_key_skew precedent).
            F.expr("abs(est_pairs - exact_pairs) * 10000L div exact_pairs")
            .cast("bigint")
            .alias("abs_err_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest
# ---------------------------------------------------------------------------

_FORECAST_SQL = """
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
), j AS (
  SELECT a.day, a.n_events AS actual, f.n_events AS forecast
  FROM daily a JOIN daily f ON f.day = a.day - INTERVAL 7 DAY
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_days,
       ROUND(AVG(ABS(CAST(actual - forecast AS DOUBLE)) / actual), 6) AS mape,
       ROUND(AVG(2.0 * ABS(CAST(actual - forecast AS DOUBLE))
                 / (actual + forecast)), 6) AS smape,
       ROUND(AVG(CAST(forecast - actual AS DOUBLE)), 6) AS mean_bias
FROM j
"""


@query("events_forecast_backtest", oracle=_FORECAST_SQL)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest on daily event volume:
    forecast(d) = actual(d − 7 calendar days), scored with MAPE,
    sMAPE, and mean bias over every day that has a week-ago
    observation. The third leg of the monitoring trio —
    events_seasonal_decompose says what normal looks like,
    events_cusum_changepoint says where the level shifted, and this
    query says how predictable the series actually is (the baseline
    any fancier forecaster must beat before it earns a deploy).

    The forecast joins the day grain to itself on a CALENDAR offset
    (day − 7), never LAG(7)-over-rows: with gap days present a row
    lag silently compares against whatever happened to be 7 rows ago.
    Error metrics are identical IEEE double expressions in identical
    order on both engines; rounding (6 dp) applies only at the
    output.

    Scale: one shuffle to the day grain, then a day-count-sized
    self-join and a single-row aggregate — event-volume work is the
    first groupBy only."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    a = daily.alias("a")
    f = daily.alias("f")
    j = a.join(
        f, F.col("f.day") == F.date_sub(F.col("a.day"), 7), "inner"
    ).select(
        F.col("a.n_events").alias("actual"),
        F.col("f.n_events").alias("forecast"),
    )
    diff = (F.col("actual") - F.col("forecast")).cast("double")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_days"),
        F.round(F.avg(F.abs(diff) / F.col("actual")), 6).alias("mape"),
        F.round(
            F.avg(
                F.lit(2.0) * F.abs(diff) / (F.col("actual") + F.col("forecast"))
            ),
            6,
        ).alias("smape"),
        F.round(
            F.avg((F.col("forecast") - F.col("actual")).cast("double")), 6
        ).alias("mean_bias"),
    )


# ---------------------------------------------------------------------------
# LSH blocking-quality evaluation (pair completeness / reduction ratio)
# ---------------------------------------------------------------------------


def _blocking_quality_oracle() -> str:
    """The md5-portable LSH pipeline's candidates measured against
    the EXACT truth set (all pairs with shingle-set Jaccard >= 0.5,
    found via the inverted-index shingle join, J-test kept in integer
    space: 2*inter >= union)."""
    from ibd_pipeline_spark.queries.dedup import _mh_cte

    return (
        _mh_cte("src AS (SELECT doc_id, text FROM documents WHERE doc_id < 300)")
        + """
, dh AS (
  SELECT DISTINCT doc_id, h FROM hashed
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM dh GROUP BY 1
), inter AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, COUNT(*) AS ni
  FROM dh l JOIN dh r ON l.h = r.h AND l.doc_id < r.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes a ON a.doc_id = i.id_a
  JOIN sizes b ON b.doc_id = i.id_b
  WHERE 2 * i.ni >= a.n + b.n - i.ni
), m AS (
  SELECT (SELECT COUNT(*) FROM src) AS n_docs,
         (SELECT COUNT(*) FROM cand) AS cand_pairs,
         (SELECT COUNT(*) FROM truth) AS true_pairs,
         (SELECT COUNT(*) FROM truth t
            JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b) AS found_true
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_docs * (n_docs - 1) // 2 AS BIGINT) AS total_pairs,
       CAST(cand_pairs AS BIGINT) AS cand_pairs,
       CAST(true_pairs AS BIGINT) AS true_pairs,
       CAST(found_true AS BIGINT) AS found_true,
       CAST((n_docs * (n_docs - 1) // 2 - cand_pairs) * 10000
            // (n_docs * (n_docs - 1) // 2) AS BIGINT) AS reduction_bp,
       CAST(CASE WHEN true_pairs = 0 THEN 10000
                 ELSE found_true * 10000 // true_pairs END AS BIGINT)
         AS completeness_bp,
       CAST(CASE WHEN cand_pairs = 0 THEN 0
                 ELSE found_true * 10000 // cand_pairs END AS BIGINT)
         AS precision_bp
FROM m
"""
    )


@query("dedup_blocking_quality", oracle=_blocking_quality_oracle)
def dedup_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation of the MinHash-LSH candidate
    generator — the record-linkage acceptance test (pair completeness
    / reduction ratio, Christen's survey metrics): LSH candidates
    measured against the EXACT truth set (every pair with shingle-set
    Jaccard >= 0.5), reporting how many comparisons blocking saved
    (reduction ratio, basis points of the full n*(n-1)/2), how many
    true duplicate pairs the bands caught (pair completeness =
    recall), and how many candidates were worth verifying
    (precision). This is how you TUNE (bands x rows) before trusting
    a dedup pipeline at 100 TB: completeness says whether duplicates
    leak through, reduction says whether the quadratic stage stays
    dead.

    The truth set comes from the inverted-index shingle join (pairs
    sharing >= 1 shingle hash, exact inter/union counts) with the
    J >= 0.5 test kept in INTEGER space (2*inter >= union) — no float
    anywhere, so with the md5-portable signature mode the whole
    relation is hash-attested. On the bounded doc_id < 300 slice the
    exact truth is affordable; at scale you run this audit on exactly
    such a sampled slice — the metrics, not the truth join, are the
    production artifact.

    Scale: the LSH branch is the attested banded shape (never
    all-pairs); the truth branch's shingle join is the audit's
    deliberate quadratic-in-collisions cost, bounded by the slice;
    everything reduces to four single-row counts cross-joined
    broadcast."""
    from ibd_pipeline_spark.operators.dedup import (
        minhash_candidate_pairs,
        release_state,
        shingles,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    cand = minhash_candidate_pairs(d, portable=True)

    dh = (
        d.select("doc_id", F.explode(shingles("text")).alias("g"))
        .select("doc_id", F.substring(F.md5("g"), 1, 8).alias("h"))
        .distinct()
    )
    sizes = dh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    l, r = dh.alias("l"), dh.alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.h") == F.col("r.h"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    truth = (
        inter.join(sizes.withColumnsRenamed({"doc_id": "id_a", "n": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "n": "nb"}), "id_b")
        .filter(2 * F.col("ni") >= F.col("na") + F.col("nb") - F.col("ni"))
        .select("id_a", "id_b")
    )

    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    cc = cand.agg(F.count(F.lit(1)).cast("bigint").alias("cand_pairs"))
    tc = truth.agg(F.count(F.lit(1)).cast("bigint").alias("true_pairs"))
    fc = truth.join(cand, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("found_true")
    )
    out = (
        nd.crossJoin(F.broadcast(cc))
        .crossJoin(F.broadcast(tc))
        .crossJoin(F.broadcast(fc))
        .select(
            "n_docs",
            F.expr("n_docs * (n_docs - 1) div 2").cast("bigint").alias("total_pairs"),
            "cand_pairs",
            "true_pairs",
            "found_true",
            F.expr(
                "(n_docs * (n_docs - 1) div 2 - cand_pairs) * 10000"
                " div (n_docs * (n_docs - 1) div 2)"
            )
            .cast("bigint")
            .alias("reduction_bp"),
            F.when(F.col("true_pairs") == 0, F.lit(10000))
            .otherwise(F.expr("found_true * 10000 div true_pairs"))
            .cast("bigint")
            .alias("completeness_bp"),
            F.when(F.col("cand_pairs") == 0, F.lit(0))
            .otherwise(F.expr("found_true * 10000 div cand_pairs"))
            .cast("bigint")
            .alias("precision_bp"),
        )
    )
    out = out.localCheckpoint(eager=True)
    release_state(cand)
    return out


# ---------------------------------------------------------------------------
# Farthest-point (k-center) diverse subset selection
# ---------------------------------------------------------------------------

_KC_K = 5
_KC_SLICE = 200


def _kcenter_oracle() -> str:
    """Greedy farthest-point traversal unrolled to k CTE stages (the
    fixpoint-unrolling idiom proven on label propagation / PageRank):
    stage r picks the vector maximizing the min cosine distance to
    the r−1 already-selected, ties to the smaller vec_id."""
    dot = (
        "list_aggregate(list_transform(range(1, len(v.emb) + 1), "
        "i -> v.emb[i] * s.emb[i]), 'sum')"
    )
    sql = f"""
WITH v0 AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings WHERE vec_id < {_KC_SLICE}
), n AS (
  SELECT vec_id, label, emb,
         sqrt(list_aggregate(list_transform(emb, x -> x * x), 'sum')) AS nrm
  FROM v0
), c1 AS (
  SELECT vec_id, label, 0.0 AS d FROM n ORDER BY vec_id LIMIT 1
), sel1 AS (SELECT vec_id FROM c1)"""
    for r in range(2, _KC_K + 1):
        sql += f""", m{r} AS (
  SELECT v.vec_id, v.label,
         MIN(1 - {dot} / (v.nrm * s.nrm)) AS d
  FROM n v, n s
  WHERE s.vec_id IN (SELECT vec_id FROM sel{r - 1})
    AND v.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
  GROUP BY v.vec_id, v.label
), c{r} AS (
  SELECT vec_id, label, d FROM m{r} ORDER BY d DESC, vec_id LIMIT 1
), sel{r} AS (
  SELECT vec_id FROM sel{r - 1} UNION ALL SELECT vec_id FROM c{r}
)"""
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS sel_order, vec_id, label, "
        f"ROUND(d, 6) AS dist FROM c{r}"
        for r in range(1, _KC_K + 1)
    )
    return sql + "\n" + sel + "\nORDER BY sel_order"


@query("similarity_kcenter_diverse", oracle=_kcenter_oracle)
def similarity_kcenter_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diverse subset selection by greedy farthest-point traversal
    (the 2-approximate k-center heuristic, Gonzalez 1985): seed with
    the smallest vec_id, then repeatedly take the vector with the
    LARGEST min-cosine-distance to everything already selected. The
    training-data use: pick maximally diverse exemplars (for eval
    sets, annotation batches, curriculum anchors) instead of k-means
    centroids, which over-sample dense regions. Output is the
    selection order with each pick's coverage distance — the dist
    column is the evolving k-center radius, monotonically
    non-increasing from pick 2 on.

    Hash-attested end-to-end: the greedy loop is DETERMINISTIC (seed
    = min id, argmax ties to smaller vec_id, dot product the same
    sequential fold in both engines — the knn-confusion idiom), so
    the k rounds unroll to a DuckDB CTE chain exactly like the graph
    fixpoints. Spark-side per-round state is ONE collected row (the
    new center) — model-state-sized, the kmeans-init precedent.

    Scale: each round is one broadcast of ≤k centers against the
    corpus + a top-1 TakeOrdered — k passes total, never all-pairs.
    The vec_id < 200 slice bounds the attestation, not the shape; at
    100 TB the same loop runs with the candidate argmax computed per
    partition then reduced (TakeOrdered already is that)."""
    v = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _KC_SLICE)
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
        .select(
            "vec_id",
            "label",
            "emb",
            F.sqrt(
                F.aggregate(
                    F.transform("emb", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ).alias("nrm"),
        )
        .localCheckpoint(eager=True)  # k tiny rounds re-read this slice
    )
    first = v.orderBy("vec_id").limit(1).select("vec_id", "label").collect()[0]
    ids = [first.vec_id]
    rows = [(1, first.vec_id, first.label, 0.0)]
    for r in range(2, _KC_K + 1):
        s = v.filter(F.col("vec_id").isin(ids)).select(
            F.col("emb").alias("cemb"), F.col("nrm").alias("cnrm")
        )
        rem = v.filter(~F.col("vec_id").isin(ids))
        dot = F.aggregate(
            F.zip_with("emb", "cemb", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        mind = (
            rem.crossJoin(F.broadcast(s))
            .groupBy("vec_id", "label")
            .agg(F.min(F.lit(1.0) - dot / (F.col("nrm") * F.col("cnrm"))).alias("d"))
        )
        top = mind.orderBy(F.desc("d"), "vec_id").limit(1).collect()[0]
        ids.append(top.vec_id)
        rows.append((r, top.vec_id, top.label, top.d))
    return (
        spark.createDataFrame(
            rows, "sel_order int, vec_id bigint, label int, dist double"
        )
        .select("sel_order", "vec_id", "label", F.round("dist", 6).alias("dist"))
        .orderBy("sel_order")
    )


# ---------------------------------------------------------------------------
# Behavioral path mining (top first-3-event journeys)
# ---------------------------------------------------------------------------

_TOP_PATHS_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
), p AS (
  SELECT user_id, string_agg(event_type, ' > ' ORDER BY rn) AS path
  FROM r WHERE rn <= 3
  GROUP BY user_id
  HAVING COUNT(*) = 3
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path
LIMIT 10
"""


@query("events_top_paths", oracle=_TOP_PATHS_SQL)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: each user's first three events (by
    event time, event_id tiebreak — a total order) joined into a
    'a > b > c' journey string, ranked by user count — the top-10
    onboarding funnels actually taken, the relation behind every
    Sankey/flow diagram. events_transition_matrix gives the
    one-step Markov view; this gives the top full prefixes, which is
    what product questions ('what do users DO first?') actually ask.

    Users with fewer than three events are excluded (their journey
    isn't comparable to a 3-step path). Deterministic: the (ts,
    event_id) order is total, and the final top-10 breaks count ties
    on the path string.

    Scale: one shuffle to (user) for the per-user window (partitioned
    — never a global window), the rn ≤ 3 filter cuts the frame to
    ≤3 rows/user BEFORE the path aggregate, then a path-cardinality
    groupBy and a top-10 TakeOrdered."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    p = (
        r.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda x: x.event_type,
                ),
                " > ",
            ).alias("path"),
            F.count(F.lit(1)).alias("n_steps"),
        )
        .filter(F.col("n_steps") == 3)
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend (median of pairwise slopes)
# ---------------------------------------------------------------------------

_THEIL_SEN_SQL = """
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS di,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), slopes AS (
  SELECT CAST(b.n - a.n AS DOUBLE) / (b.di - a.di) AS slope
  FROM daily a JOIN daily b ON b.di > a.di
), m AS (
  SELECT median(slope) AS slope,
         (SELECT COUNT(*) FROM slopes) AS n_pairs,
         (SELECT COUNT(*) FROM daily) AS n_days
  FROM slopes
)
SELECT CAST(m.n_days AS BIGINT) AS n_days,
       CAST(m.n_pairs AS BIGINT) AS n_pairs,
       ROUND(m.slope, 6) AS slope_per_day,
       ROUND((SELECT median(d.n - m.slope * d.di) FROM daily d), 6)
         AS intercept
FROM m
"""


@query("stats_theil_sen_trend", oracle=_THEIL_SEN_SQL)
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily event volume: the median of
    all pairwise slopes (n_j − n_i)/(day_j − day_i), with the
    matching median intercept — the robust-regression twin of
    agg_corr_regression's OLS line. Up to ~29% of days can be
    corrupted (outages, bot floods) before the estimator budges,
    which is exactly the property a volume-trend alert needs; OLS
    moves on the first bad day.

    Exactness: slopes are identical IEEE double divisions on both
    sides; both engines define median as the continuous 0.5-quantile
    (average of the two middle values for even counts) over the
    identical multiset — Spark `percentile(col, 0.5)` ↔ DuckDB
    `median` — so even the medians agree bit-for-bit; rounding only
    at the output.

    Scale: the all-pairs slope set is DAY-COUNT-bounded (n days →
    n²/2 pairs; ~500 k pairs for three years — trivially parallel
    after the one day-grain shuffle). For multi-decade grains,
    subsample pairs (the classic randomized Theil–Sen) — the
    estimator is the same median over a pair sample."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        (F.unix_date(F.to_date(F.date_trunc("day", "ts")))).alias("di")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("b.di") > F.col("a.di")).select(
        (
            (F.col("b.n") - F.col("a.n")).cast("double")
            / (F.col("b.di") - F.col("a.di"))
        ).alias("slope")
    )
    m = slopes.agg(
        F.expr("percentile(slope, 0.5)").alias("slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    resid = (
        daily.crossJoin(F.broadcast(m))
        .select((F.col("n") - F.col("slope") * F.col("di")).alias("r"))
        .agg(F.expr("percentile(r, 0.5)").alias("intercept"))
    )
    return (
        nd.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(resid))
        .select(
            "n_days",
            "n_pairs",
            F.round("slope", 6).alias("slope_per_day"),
            F.round("intercept", 6).alias("intercept"),
        )
    )


# ---------------------------------------------------------------------------
# Sketch-based audience overlap (inclusion–exclusion)
# ---------------------------------------------------------------------------

_AO_M = 65536
_AUDIENCE_OVERLAP_SQL = f"""
WITH ev AS (
  SELECT DISTINCT event_type AS t, user_id AS u,
         CAST(('0x' || substring(md5('0:' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {_AO_M} AS b
  FROM events
), types AS (
  SELECT DISTINCT t FROM ev
), spine AS (
  SELECT a.t AS type_a, c.t AS type_b
  FROM types a JOIN types c ON a.t < c.t
), occ AS (
  SELECT t, CAST(COUNT(DISTINCT b) AS BIGINT) AS occ FROM ev GROUP BY t
), uin AS (
  SELECT a.t AS type_a, c.t AS type_b,
         CAST(COUNT(DISTINCT a.u) AS BIGINT) AS exact_overlap
  FROM ev a JOIN ev c ON c.u = a.u AND a.t < c.t
  GROUP BY 1, 2
), tbkt AS (
  SELECT DISTINCT t, b FROM ev
), bin AS (
  SELECT a.t AS type_a, c.t AS type_b, CAST(COUNT(*) AS BIGINT) AS nb
  FROM tbkt a JOIN tbkt c ON c.b = a.b AND a.t < c.t
  GROUP BY 1, 2
)
SELECT s.type_a AS type_a, s.type_b AS type_b,
       COALESCE(u.exact_overlap, 0) AS exact_overlap,
       ROUND(
         (CASE WHEN oa.occ < {_AO_M} THEN {_AO_M}.0 * ln({_AO_M}.0 / ({_AO_M} - oa.occ)) END)
         + (CASE WHEN ob.occ < {_AO_M} THEN {_AO_M}.0 * ln({_AO_M}.0 / ({_AO_M} - ob.occ)) END)
         - (CASE WHEN oa.occ + ob.occ - COALESCE(b.nb, 0) < {_AO_M}
            THEN {_AO_M}.0 * ln({_AO_M}.0 / ({_AO_M} - (oa.occ + ob.occ - COALESCE(b.nb, 0)))) END),
         4) AS est_overlap,
       CASE WHEN COALESCE(u.exact_overlap, 0) = 0 THEN NULL
            ELSE ROUND(ABS(
              (CASE WHEN oa.occ < {_AO_M} THEN {_AO_M}.0 * ln({_AO_M}.0 / ({_AO_M} - oa.occ)) END)
              + (CASE WHEN ob.occ < {_AO_M} THEN {_AO_M}.0 * ln({_AO_M}.0 / ({_AO_M} - ob.occ)) END)
              - (CASE WHEN oa.occ + ob.occ - COALESCE(b.nb, 0) < {_AO_M}
                 THEN {_AO_M}.0 * ln({_AO_M}.0 / ({_AO_M} - (oa.occ + ob.occ - COALESCE(b.nb, 0)))) END)
              - u.exact_overlap) / u.exact_overlap, 4) END AS rel_err
FROM spine s
JOIN occ oa ON oa.t = s.type_a
JOIN occ ob ON ob.t = s.type_b
LEFT JOIN uin u ON u.type_a = s.type_a AND u.type_b = s.type_b
LEFT JOIN bin b ON b.type_a = s.type_a AND b.type_b = s.type_b
ORDER BY s.type_a, s.type_b
"""


@query("sketch_audience_overlap", oracle=_AUDIENCE_OVERLAP_SQL)
def sketch_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix by sketch inclusion–exclusion:
    |A ∩ B| ≈ lc(A) + lc(B) − lc(A ∪ B), where lc is the
    linear-counting estimate over each audience's occupied-bucket
    set and the union's occupancy comes from bucket-set algebra
    (occ_A + occ_B − shared buckets) — intersections are exactly
    what mergeable union-only sketches (HLL/LC) cannot answer
    directly, and inclusion–exclusion over THREE union estimates is
    the standard production answer ('how much do the click and
    purchase audiences overlap' without re-scanning raw events).
    The exact overlap rides alongside for the error readout.

    Hash-attested: the md5-portable bucket (the sketch_lc_weekly_union
    idiom) makes occupancy integers identical in both engines, and
    the lc formula is the same IEEE double expression — the whole
    matrix is exact under the 4-dp output rounding.

    Scale: one distinct-projection of (type, user) (map-side
    combined), then every join runs on user-count or bucket-count
    (≤ 65536/type) frames; the exact-overlap self-join exists for
    the error column and is the piece you DROP at 100 TB — the
    sketch branch never touches raw volume twice."""
    ev = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("t"),
            F.col("user_id").alias("u"),
        )
        .distinct()
        .select("t", "u", F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit("0"), F.col("u").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("bigint"), F.lit(_AO_M),
        ).alias("b"))
    )
    types = ev.select("t").distinct()
    ta, tc = types.alias("a"), types.alias("c")
    spine = ta.join(tc, F.col("a.t") < F.col("c.t")).select(
        F.col("a.t").alias("type_a"), F.col("c.t").alias("type_b")
    )
    occ = ev.groupBy("t").agg(F.countDistinct("b").cast("bigint").alias("occ"))
    ea, ec = ev.alias("a"), ev.alias("c")
    uin = (
        ea.join(ec, (F.col("c.u") == F.col("a.u")) & (F.col("a.t") < F.col("c.t")))
        .groupBy(F.col("a.t").alias("type_a"), F.col("c.t").alias("type_b"))
        .agg(F.countDistinct("a.u").cast("bigint").alias("exact_overlap"))
    )
    tbkt = ev.select("t", "b").distinct()
    ba, bc = tbkt.alias("a"), tbkt.alias("c")
    bin_ = (
        ba.join(bc, (F.col("c.b") == F.col("a.b")) & (F.col("a.t") < F.col("c.t")))
        .groupBy(F.col("a.t").alias("type_a"), F.col("c.t").alias("type_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    )
    m = float(_AO_M)
    # Saturated occupancy (x == m) would be ln(m/0) = +inf — the
    # estimator is undefined there; NULL propagates through the
    # inclusion-exclusion sum exactly as in the SQL twin (ADVICE r8).
    lc = lambda x: F.when(  # noqa: E731
        x < _AO_M, F.lit(m) * F.log(F.lit(m) / (F.lit(_AO_M) - x))
    )
    est = (
        lc(F.col("occ_a"))
        + lc(F.col("occ_b"))
        - lc(F.col("occ_a") + F.col("occ_b") - F.coalesce(F.col("nb"), F.lit(0)))
    )
    exact = F.coalesce(F.col("exact_overlap"), F.lit(0))
    return (
        spine.join(
            F.broadcast(occ.withColumnsRenamed({"t": "type_a", "occ": "occ_a"})),
            "type_a",
        )
        .join(
            F.broadcast(occ.withColumnsRenamed({"t": "type_b", "occ": "occ_b"})),
            "type_b",
        )
        .join(F.broadcast(uin), ["type_a", "type_b"], "left")
        .join(F.broadcast(bin_), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            exact.alias("exact_overlap"),
            F.round(est, 4).alias("est_overlap"),
            F.when(exact == 0, F.lit(None).cast("double"))
            .otherwise(F.round(F.abs(est - exact) / exact, 4))
            .alias("rel_err"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Mix-shift contribution decomposition (why did the metric move?)
# ---------------------------------------------------------------------------

_MIX_SHIFT_SQL = """
WITH o AS (
  SELECT c.c_mktsegment AS seg,
         year(o.o_orderdate) AS y,
         CAST(o.o_totalprice AS DOUBLE) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE year(o.o_orderdate) IN (1996, 1999)
), s AS (
  SELECT seg,
         CAST(COUNT(*) FILTER (y = 1996) AS BIGINT) AS n0,
         CAST(COUNT(*) FILTER (y = 1999) AS BIGINT) AS n1,
         SUM(v) FILTER (y = 1996) AS s0,
         SUM(v) FILTER (y = 1999) AS s1
  FROM o GROUP BY seg
), t AS (
  SELECT SUM(n0) AS t0, SUM(n1) AS t1 FROM s
)
SELECT seg,
       ROUND(CAST(s.n0 AS DOUBLE) / t.t0, 6) AS share_base,
       ROUND(CAST(s.n1 AS DOUBLE) / t.t1, 6) AS share_cmp,
       ROUND(s.s0 / s.n0, 4) AS rate_base,
       ROUND(s.s1 / s.n1, 4) AS rate_cmp,
       ROUND((CAST(s.n1 AS DOUBLE) / t.t1 - CAST(s.n0 AS DOUBLE) / t.t0)
             * (s.s0 / s.n0), 4) AS mix_effect,
       ROUND((CAST(s.n1 AS DOUBLE) / t.t1)
             * (s.s1 / s.n1 - s.s0 / s.n0), 4) AS rate_effect
FROM s, t
ORDER BY seg
"""


@query("analytics_mix_shift_decompose", oracle=_MIX_SHIFT_SQL)
def analytics_mix_shift_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift contribution decomposition — the 'why did average
    order value move' answer: between a base and comparison period
    (1996 vs 1999), the overall average decomposes EXACTLY as
    Δavg = Σ_seg [mix_effect + rate_effect] with
    mix_effect = Δshare·rate_base (the metric moved because segment
    weights shifted) and rate_effect = share_cmp·Δrate (it moved
    because segments themselves changed) — the identity
    Σ share₁r₁ − share₀r₀ = Σ (share₁−share₀)r₀ + share₁(r₁−r₀).
    events_period_over_period says THAT the metric moved; this says
    WHO moved it and through which lever.

    Exactness: per-segment counts and sums come from one conditional
    aggregate (FILTER), every ratio is the same IEEE double division
    in the same order on both engines, rounding only at the output.

    Scale: one orders scan with the year predicate pushed down, a
    broadcast customer-dimension join, a segment-grain conditional
    aggregate, and a 1-row total broadcast — no shuffle beyond the
    segment groupBy."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base, cmp_ = 1996, 1999
    j = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").alias("y"),
            F.col("o_totalprice").cast("double").alias("v"),
        )
        .filter(F.col("y").isin(base, cmp_))
    )
    s = j.groupBy("seg").agg(
        F.count(F.when(F.col("y") == base, 1)).cast("bigint").alias("n0"),
        F.count(F.when(F.col("y") == cmp_, 1)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("y") == base, F.col("v"))).alias("s0"),
        F.sum(F.when(F.col("y") == cmp_, F.col("v"))).alias("s1"),
    )
    t = s.agg(
        F.sum("n0").alias("t0"), F.sum("n1").alias("t1")
    )
    sh0 = F.col("n0").cast("double") / F.col("t0")
    sh1 = F.col("n1").cast("double") / F.col("t1")
    r0 = F.col("s0") / F.col("n0")
    r1 = F.col("s1") / F.col("n1")
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "seg",
            F.round(sh0, 6).alias("share_base"),
            F.round(sh1, 6).alias("share_cmp"),
            F.round(r0, 4).alias("rate_base"),
            F.round(r1, 4).alias("rate_cmp"),
            F.round((sh1 - sh0) * r0, 4).alias("mix_effect"),
            F.round(sh1 * (r1 - r0), 4).alias("rate_effect"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP) per day
# ---------------------------------------------------------------------------

_TWAP_SQL = """
WITH e AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(ts AS TIMESTAMP) AS t, event_id, value
  FROM events
), d AS (
  SELECT day, value,
         CAST(date_diff('microsecond', t,
              LEAD(t) OVER (PARTITION BY day ORDER BY t, event_id))
           AS DOUBLE) AS w
  FROM e
), a AS (
  SELECT day,
         CAST(COUNT(*) AS BIGINT) AS n_weighted,
         SUM(value * w) / SUM(w) AS twap,
         AVG(value) AS plain_avg
  FROM d WHERE w IS NOT NULL
  GROUP BY day
  HAVING SUM(w) > 0
)
SELECT day, n_weighted, ROUND(twap, 4) AS twap,
       ROUND(plain_avg, 4) AS plain_avg
FROM a ORDER BY day
"""


@query("events_time_weighted_avg", oracle=_TWAP_SQL)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily time-weighted average of `value` (TWAP): each
    observation is weighted by how long it REMAINED the latest one
    (microseconds to the next event that day, total (ts, event_id)
    order), against the plain average for contrast — the standard
    correction when observations arrive irregularly and a burst of
    readings shouldn't dominate the day (the finance/metrics TWAP,
    and the right way to average gauge metrics sampled on change).
    The last event of each day carries no duration and is excluded
    from the weighted mean (it still counts in plain_avg's source
    rows via the w IS NOT NULL filter — both means run over the
    SAME weighted row set, so the two columns are comparable).

    Exactness: weights are exact integer microsecond differences
    cast to double; both aggregates are the same double sums in both
    engines, rounded at the output.

    Scale: one shuffle to (day) for the partitioned LEAD window —
    never a global window — then a day-grain aggregate."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    e = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.col("ts").alias("t"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("day").orderBy("t", "event_id")
    d = e.select(
        "day",
        "value",
        (
            F.unix_micros(F.lead("t").over(w)) - F.unix_micros("t")
        ).cast("double").alias("w"),
    ).filter(F.col("w").isNotNull())
    return (
        d.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_weighted"),
            (F.sum(F.col("value") * F.col("w")) / F.sum("w")).alias("twap"),
            F.avg("value").alias("plain_avg"),
            F.sum("w").alias("_sw"),
        )
        .filter(F.col("_sw") > 0)
        .select(
            "day",
            "n_weighted",
            F.round("twap", 4).alias("twap"),
            F.round("plain_avg", 4).alias("plain_avg"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Functional-dependency profiling (det → dep violation audit)
# ---------------------------------------------------------------------------

_FD_PAIRS = [
    ("o_orderkey", "o_orderstatus"),     # key → anything: must hold
    ("o_orderkey", "o_orderpriority"),   # key → anything: must hold
    ("o_custkey", "o_orderstatus"),      # expected violated (reorders)
    ("o_orderpriority", "o_orderstatus"),  # expected violated
]

_FD_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{det}' AS determinant, '{dep}' AS dependent,
       CAST(COUNT(*) AS BIGINT) AS n_det_values,
       CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT) AS n_violating,
       CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) * 10000 // COUNT(*) AS BIGINT)
         AS violation_bp,
       COUNT(CASE WHEN nd > 1 THEN 1 END) = 0 AS holds
FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS nd FROM orders GROUP BY {det}) t
"""
    for det, dep in _FD_PAIRS
) + "\nORDER BY determinant, dependent"


@query("profile_functional_dependencies", oracle=_FD_SQL)
def profile_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — for each candidate det → dep
    rule, the number of determinant values, how many map to MORE
    than one dependent value (violations), the violation rate in
    basis points, and the verdict. The schema-inference profiling
    pass (TANE-style single-column check) that tells you which
    'obvious' relationships actually hold before you normalize,
    build dimension tables, or trust a join key: here the o_orderkey
    rules must hold (it's the key), while o_custkey → o_orderstatus
    must not (customers reorder) and o_orderpriority →
    o_orderstatus must not (priorities span statuses) — the profiler
    SURFACES which hold on this data rather than hard-coding them.

    Scale: each rule is one map-side-combined (det, dep) distinct
    aggregate then a det-grain count — the same two-level shape as
    profile_key_candidates; rules are independent scans of a
    two-column projection (column pruning makes each cheap) and
    could share one pass via grouping sets if the rule set grows."""
    o = load(spark, sf_dir, "orders")
    parts = []
    for det, dep in _FD_PAIRS:
        t = o.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        parts.append(
            t.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_det_values"),
                F.count(F.when(F.col("nd") > 1, 1))
                .cast("bigint")
                .alias("n_violating"),
            ).select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_det_values",
                "n_violating",
                F.expr("n_violating * 10000L div n_det_values")
                .cast("bigint")
                .alias("violation_bp"),
                (F.col("n_violating") == 0).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("determinant", "dependent")


# ---------------------------------------------------------------------------
# Exact weighted median per group (distributed prefix-sum consumer)
# ---------------------------------------------------------------------------

_WMEDIAN_SQL = """
WITH r AS (
  SELECT l_returnflag,
         l_extendedprice,
         SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
       CAST(MAX(tw) AS BIGINT) AS total_qty,
       ROUND(MIN(CASE WHEN 2 * cw >= tw THEN l_extendedprice END), 2)
         AS weighted_median
FROM r GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("stats_weighted_median", oracle=_WMEDIAN_SQL)
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median of extended price per return flag,
    weighted by quantity — 'the price a median UNIT ships at', which
    differs from the row median whenever quantity correlates with
    price (percentile() can't weight; approx sketches can't be
    exact). Definition: the smallest value whose inclusive cumulative
    weight reaches half the group total (lower weighted median,
    2·cw ≥ tw kept in INTEGER space — quantities are integral, so
    both the running and total sums are order-independent BIGINTs
    and the oracle is exact).

    Scale: the cumulative weight comes from
    operators/ranking.py:with_grouped_prefix_sum — the distributed
    SCAN: one range exchange on (flag, price, tiebreak) with
    oversized groups split across tasks, a mapInPandas running sum
    with per-group carry (narrow, no second exchange), and a
    P×groups offset broadcast — NEVER the single-task-per-group
    `SUM OVER (PARTITION BY flag ORDER BY …)` the oracle uses, which
    at 100 TB would put each flag's entire history on one task. The
    argmin over qualifying rows is an ordinary aggregate."""
    from ibd_pipeline_spark.operators.ranking import with_grouped_prefix_sum

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    ps = with_grouped_prefix_sum(
        li,
        ["l_returnflag"],
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        "w",
    )
    return (
        ps.groupBy("l_returnflag")
        .agg(
            F.max("_tw").cast("bigint").alias("total_qty"),
            F.round(
                F.min(
                    F.when(
                        2 * F.col("_cw") >= F.col("_tw"),
                        F.col("l_extendedprice"),
                    )
                ),
                2,
            ).alias("weighted_median"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup blocking (window-over-sort-key family)
# ---------------------------------------------------------------------------


def _sorted_neighborhood_oracle() -> str:
    """Sort by normalized text, candidate = pairs within 5 positions
    of the global sort order, verified by exact shingle-set Jaccard
    (reuses the _mh_cte state relation for the hs sets)."""
    from ibd_pipeline_spark.queries.dedup import _mh_cte

    return (
        _mh_cte("src AS (SELECT doc_id, text FROM documents WHERE doc_id < 300)")
        + r"""
, rn AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                    doc_id) AS rn
  FROM src
), scand AS (
  SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
         GREATEST(a.doc_id, b.doc_id) AS id_b
  FROM rn a JOIN rn b ON b.rn BETWEEN a.rn + 1 AND a.rn + 5
), sver AS (
  SELECT c.id_a, c.id_b,
         ROUND(len(list_intersect(x.hs, y.hs)) * 1.0
               / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))),
               6) AS jaccard
  FROM scand c
  JOIN state x ON x.doc_id = c.id_a
  JOIN state y ON y.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard FROM sver
WHERE jaccard >= 0.5
ORDER BY id_a, id_b
"""
    )


@query("dedup_sorted_neighborhood", oracle=_sorted_neighborhood_oracle)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup blocking (Hernández–Stolfo): sort the
    corpus by a normalized key (lowercased whitespace-collapsed
    text), slide a w=5 window over the GLOBAL sort order, verify the
    in-window pairs by exact shingle-set Jaccard (J ≥ 0.5) — the
    third blocking family beside MinHash-LSH (set similarity) and
    SimHash (bit similarity): it catches prefix-edited near-copies
    that land adjacent under the sort even when band hashing splits
    them, and dedup_blocking_quality's metrics apply to it
    unchanged.

    The global sort position comes from
    operators/ranking.py:with_global_row_number — one range exchange
    + offset broadcast, never a single-partition window — and the
    window join is an equi-join on rn against an exploded offset
    sequence (1..w), so the candidate count is exactly w·n and the
    shuffle is on integer rn keys. Verification reuses the
    md5-portable shingle sets, so DuckDB replays sort, window, and
    verify end-to-end.

    Scale: sort = the one range exchange; candidates w·n (linear,
    vs LSH's collision-driven count); verify joins are
    candidate-sized. The classic production posture is multi-pass
    (several sort keys) — each pass is this same plan."""
    from ibd_pipeline_spark.operators.dedup import normalized_text, shingles
    from ibd_pipeline_spark.operators.ranking import with_global_row_number

    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            normalized_text("text").alias("k"),
            F.array_distinct(
                F.transform(shingles("text"), lambda g: F.substring(F.md5(g), 1, 8))
            ).alias("hs"),
        )
    )
    rn = with_global_row_number(d, ["k", "doc_id"], rn_col="rn").select(
        "doc_id", "rn", "hs"
    )
    offs = rn.select(
        "rn",
        F.col("doc_id").alias("id_x"),
        F.col("hs").alias("hs_x"),
        F.explode(F.sequence(F.lit(1), F.lit(5))).alias("off"),
    ).select((F.col("rn") + F.col("off")).alias("rn_y"), "id_x", "hs_x")
    pairs = offs.join(
        rn.select(
            F.col("rn").alias("rn_y"),
            F.col("doc_id").alias("id_y"),
            F.col("hs").alias("hs_y"),
        ),
        "rn_y",
    )
    inter = F.size(F.array_intersect("hs_x", "hs_y"))
    union = F.size("hs_x") + F.size("hs_y") - inter
    return (
        pairs.select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
            F.round(inter * F.lit(1.0) / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Cross-source quantile normalization (distribution matching)
# ---------------------------------------------------------------------------

_QNORM_SQL = """
WITH d AS (
  SELECT doc_id, source, n_chars FROM documents
), g AS (
  SELECT source, n_chars, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rs,
         COUNT(*) OVER (PARTITION BY source) AS ns
  FROM d
), gl AS (
  SELECT n_chars AS norm,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS grn
  FROM d
), n AS (
  SELECT COUNT(*) AS nn FROM d
), t AS (
  SELECT g.source, g.n_chars,
         ((2 * g.rs - 1) * n.nn + 2 * g.ns - 1) // (2 * g.ns) AS gt
  FROM g, n
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(t.n_chars) AS DOUBLE) / COUNT(*), 4) AS mean_raw,
       ROUND(CAST(SUM(gl.norm) AS DOUBLE) / COUNT(*), 4) AS mean_norm
FROM t JOIN gl ON gl.grn = t.gt
GROUP BY t.source ORDER BY t.source
"""


@query("train_quantile_normalize", oracle=_QNORM_SQL)
def train_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization — distribution matching
    for batch-effect correction: each document's length is replaced
    by the POOLED order statistic at its within-source midpoint
    quantile (global rank = ceil((2·rs−1)·N / (2·ns)), all integer),
    so every source ends up with the same length distribution while
    preserving within-source ranking. The preprocessing step before
    cross-source quality comparisons or mixing-weight decisions when
    sources measure 'length/quality' on different scales (the
    microarray quantile-normalization idea applied to corpus stats).
    Output: per source, mean length before and after — after, the
    means converge toward the pooled mean by construction.

    Both ranks come from operators/ranking.py: the within-source
    rank from with_grouped_row_number (one grouped range shuffle,
    oversized sources split across tasks), the pooled order
    statistics from with_global_row_number — never a
    single-partition window. The rank→value lookup is an equi-join
    on integer ranks. All rank math is BIGINT; the only doubles are
    the two output means (exact integer sums divided once).

    Scale: two range exchanges + one integer equi-join — the same
    budget as two global sorts, nothing single-task."""
    from ibd_pipeline_spark.operators.ranking import (
        with_global_row_number,
        with_grouped_row_number,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    g = with_grouped_row_number(
        d, ["source"], ["n_chars", "doc_id"], rn_col="rs", total_col="ns"
    )
    gl = with_global_row_number(
        d, ["n_chars", "doc_id"], rn_col="grn", total_col="nn"
    ).select(F.col("grn"), F.col("n_chars").alias("norm"))
    nrow = d.agg(F.count(F.lit(1)).alias("nn"))
    t = (
        g.crossJoin(F.broadcast(nrow))
        .withColumn(
            "gt",
            F.expr("((2*rs - 1) * nn + 2*ns - 1) div (2*ns)").cast("long"),
        )
        .select("source", "n_chars", "gt")
    )
    return (
        t.join(gl, t["gt"] == gl["grn"])
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_raw"),
            F.round(
                F.sum("norm").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_norm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Distinctive terms per source (log-odds keyness)
# ---------------------------------------------------------------------------

_KEYNESS_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents
), filt AS (
  SELECT source, w FROM tok WHERE len(w) >= 3
), sw AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM filt GROUP BY 1, 2
), st AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM filt GROUP BY 1
), gw AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cg FROM filt GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM filt
), scored AS (
  SELECT sw.source, sw.w, sw.c,
         ln((sw.c + 1.0) / (st.n - sw.c + 1.0))
         - ln((gw.cg - sw.c + 1.0) / (tot.nn - st.n - (gw.cg - sw.c) + 1.0))
           AS lo
  FROM sw JOIN st ON st.source = sw.source
  JOIN gw ON gw.w = sw.w
  CROSS JOIN tot
), ranked AS (
  SELECT source, w, c, lo,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY lo DESC, w) AS rk
  FROM scored
)
SELECT source, w AS term, c AS n_occurrences, ROUND(lo, 6) AS log_odds
FROM ranked WHERE rk <= 3
ORDER BY source, log_odds DESC, term
"""


@query("text_distinctive_terms", oracle=_KEYNESS_SQL)
def text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per source by smoothed log-odds keyness:
    for each (source, token), ln of the add-one-smoothed odds of the
    token INSIDE the source against its odds in the REST of the
    corpus — the corpus-comparison statistic ('what vocabulary makes
    this source itself') behind source fingerprinting, crawl-quality
    triage, and mixture-audit dashboards; tf-idf ranks within a
    document, keyness ranks a SOURCE against the rest. Top-3 terms
    per source.

    Exactness: every count is an exact BIGINT from two hash
    aggregates; the log-odds is the same IEEE double expression on
    both engines (identical parenthesization), ranked under a
    (lo DESC, token) total order and rounded only at the output.

    Scale: token work is one explode + (source, token) hash
    aggregate (map-side combined, shuffle O(vocab×sources) — never
    O(tokens)); the global-term and per-source totals re-join
    broadcast; the rank window runs per source over its vocab-sized
    slice."""
    from pyspark.sql import Window

    tok = (
        load(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("w"),
        )
        .filter(F.length("w") >= 3)
    )
    sw = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    st = tok.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    gw = tok.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("cg"))
    tot = tok.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    lo = F.log((F.col("c") + 1.0) / (F.col("n") - F.col("c") + 1.0)) - F.log(
        (F.col("cg") - F.col("c") + 1.0)
        / (F.col("nn") - F.col("n") - (F.col("cg") - F.col("c")) + 1.0)
    )
    scored = (
        sw.join(F.broadcast(st), "source")
        .join(gw, "w")
        .crossJoin(F.broadcast(tot))
        .select("source", "w", "c", lo.alias("lo"))
    )
    rk = Window.partitionBy("source").orderBy(F.desc("lo"), "w")
    return (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 3)
        .select(
            "source",
            F.col("w").alias("term"),
            F.col("c").alias("n_occurrences"),
            F.round("lo", 6).alias("log_odds"),
        )
        .orderBy("source", F.desc("log_odds"), "term")
    )


# ---------------------------------------------------------------------------
# Per-segment OLS trend (closed-form integer moments)
# ---------------------------------------------------------------------------

_TREND_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM daily GROUP BY 1
)
SELECT event_type,
       n AS n_days,
       ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)
         AS slope_per_day,
       ROUND((sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx) / n, 4)
         AS intercept
FROM m ORDER BY event_type
"""


@query("events_trend_per_type", oracle=_TREND_SQL)
def events_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS volume trend: daily counts per event type, then
    the closed-form least-squares slope/intercept from five exact
    integer moments (n, Σx, Σy, Σxy, Σx²) — 'which event types are
    growing and how fast', the grouped counterpart of
    agg_corr_regression's single global line and the parametric twin
    of stats_theil_sen_trend's robust median slope.

    Exactness: the moments are exact BIGINTs (epoch-day x ≈ 10⁴,
    day counts y — Σx·y over years of days stays far under 2⁶³);
    slope and intercept are single double expressions of those
    integers, identical on both engines, rounded at the output.

    Scale: one shuffle to (type, day), a per-type moment aggregate
    (map-side combined, output |types| rows) — the same two-level
    shape as profile_key_skew; nothing is day-count-serial, no
    window at all."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_date(F.to_date(F.date_trunc("day", "ts"))).alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * F.lit(
        1.0
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# CUPED variance reduction (covariate-adjusted experiment metric)
# ---------------------------------------------------------------------------

_CUPED_SQL = """
WITH pre AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x
  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
), post AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders WHERE year(o_orderdate) = 1999 GROUP BY 1
), j AS (
  SELECT pre.x, post.y FROM pre JOIN post ON post.o_custkey = pre.o_custkey
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM j
), d AS (
  SELECT n,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn
  FROM m
)
SELECT n AS n_customers,
       ROUND(covn / varxn, 6) AS theta,
       ROUND(varyn / (1e4 * n * n), 4) AS var_raw,
       ROUND((varyn - covn * covn / varxn) / (1e4 * n * n), 4)
         AS var_adjusted,
       ROUND(covn * covn / (varxn * varyn), 6) AS variance_reduction
FROM d
"""


@query("ab_cuped_variance_reduction", oracle=_CUPED_SQL)
def ab_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13) — the
    experimentation-platform preprocessing that shrinks an A/B
    metric's variance using pre-experiment behavior: with pre-period
    spend X as the covariate and post-period spend Y as the metric,
    the adjusted metric Y − θ(X − x̄) with θ = cov(X,Y)/var(X) keeps
    the same mean but drops the variance by exactly corr²(X,Y) — the
    readout is how much smaller your experiment can be. Companion to
    ab_test_proportion_ztest: that tests a difference, this makes the
    test cheaper.

    Exactness: per-customer sums are integer CENTS (BIGINT); the
    moment sums run in 128-bit integer space (Spark decimal(38,0) ↔
    DuckDB HUGEINT — exact, order-independent), and θ/variances are
    the same double expressions of those exact integers, rounded only
    at the output (variances reported in squared currency units via
    the 1e4 cents² rescale).

    Scale: two year-pruned aggregates of the orders fact (predicate
    pushed to the scan), one equi-join on customer, one single-row
    moment aggregate — no window, no driver math."""
    o = load(spark, sf_dir, "orders")

    def yearly(yr: int, out: str) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == yr)
            .groupBy("o_custkey")
            .agg(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias(out)
            )
        )

    j = yearly(1996, "x").join(yearly(1999, "y"), "o_custkey").select("x", "y")
    dec = "decimal(38,0)"
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("x"))).alias("sxx"),
        F.sum((F.col("x").cast(dec) * F.col("y"))).alias("sxy"),
        F.sum((F.col("y").cast(dec) * F.col("y"))).alias("syy"),
    )
    nd = F.col("n").cast("double")
    covn = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    varxn = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    varyn = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    return m.select(
        F.col("n").alias("n_customers"),
        F.round(covn / varxn, 6).alias("theta"),
        F.round(varyn / (F.lit(1e4) * F.col("n") * F.col("n")), 4).alias(
            "var_raw"
        ),
        F.round(
            (varyn - covn * covn / varxn) / (F.lit(1e4) * F.col("n") * F.col("n")),
            4,
        ).alias("var_adjusted"),
        F.round(covn * covn / (varxn * varyn), 6).alias("variance_reduction"),
    )


# ---------------------------------------------------------------------------
# Weighted quartiles per group (prefix-sum consumer, 3 thresholds)
# ---------------------------------------------------------------------------

_WQUART_SQL = """
WITH r AS (
  SELECT l_returnflag,
         l_extendedprice,
         SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
       ROUND(MIN(CASE WHEN 4 * cw >= tw THEN l_extendedprice END), 2) AS w_p25,
       ROUND(MIN(CASE WHEN 2 * cw >= tw THEN l_extendedprice END), 2) AS w_p50,
       ROUND(MIN(CASE WHEN 4 * cw >= 3 * tw THEN l_extendedprice END), 2)
         AS w_p75,
       ROUND(MIN(CASE WHEN 4 * cw >= 3 * tw THEN l_extendedprice END)
             - MIN(CASE WHEN 4 * cw >= tw THEN l_extendedprice END), 2)
         AS w_iqr
FROM r GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("stats_weighted_quartiles", oracle=_WQUART_SQL)
def stats_weighted_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted quartiles (p25/p50/p75 + IQR) of extended price per
    return flag, quantity-weighted — the five-number-summary
    extension of stats_weighted_median, and the point of the
    prefix-sum design: ONE distributed scan yields EVERY quantile as
    a row-local integer threshold (4·cw ≥ tw, 2·cw ≥ tw,
    4·cw ≥ 3·tw), where a percentile-function approach pays one pass
    per quantile and can't weight at all.

    Same exactness story as the median: integral quantities keep the
    running and total weights order-independent BIGINTs, so every
    threshold comparison is exact cross-engine.

    Scale: identical plan to stats_weighted_median (range exchange +
    Arrow running sum + offset broadcast from
    operators/ranking.py:with_grouped_prefix_sum) — adding quantiles
    adds conditional aggregates, not passes."""
    from ibd_pipeline_spark.operators.ranking import with_grouped_prefix_sum

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    ps = with_grouped_prefix_sum(
        li,
        ["l_returnflag"],
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        "w",
    )
    price = F.col("l_extendedprice")
    q25 = F.min(F.when(4 * F.col("_cw") >= F.col("_tw"), price))
    q50 = F.min(F.when(2 * F.col("_cw") >= F.col("_tw"), price))
    q75 = F.min(F.when(4 * F.col("_cw") >= 3 * F.col("_tw"), price))
    return (
        ps.groupBy("l_returnflag")
        .agg(
            F.round(q25, 2).alias("w_p25"),
            F.round(q50, 2).alias("w_p50"),
            F.round(q75, 2).alias("w_p75"),
            F.round(q75 - q25, 2).alias("w_iqr"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Delta-method CI for a ratio metric (revenue per order)
# ---------------------------------------------------------------------------

_RATIO_DELTA_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders WHERE year(o_orderdate) = 1999 GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM per_cust
), d AS (
  SELECT n,
         CAST(sx AS DOUBLE) / n AS mx,
         CAST(sy AS DOUBLE) / n AS my,
         (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
           / (n - 1) AS vx,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
           / (n - 1) AS cxy,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
           / (n - 1) AS vy
  FROM m
), r AS (
  SELECT n, mx / my AS ratio,
         sqrt((vx - 2 * (mx / my) * cxy + (mx / my) * (mx / my) * vy)
              / (n * my * my)) AS se_delta,
         sqrt(vx / n) / my AS se_naive
  FROM d
)
SELECT n AS n_customers,
       ROUND(ratio / 100, 6) AS revenue_per_order,
       ROUND(se_delta / 100, 6) AS se_delta,
       ROUND(se_naive / 100, 6) AS se_naive,
       ROUND((ratio - 1.959963984540054 * se_delta) / 100, 4) AS ci_lo,
       ROUND((ratio + 1.959963984540054 * se_delta) / 100, 4) AS ci_hi
FROM r
"""


@query("ab_ratio_metric_delta", oracle=_RATIO_DELTA_SQL)
def ab_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (revenue per
    order, randomization unit = customer): the A/B metric shape where
    naive per-row variance is WRONG because each customer contributes
    correlated numerator and denominator — Var(x̄/ȳ) ≈
    (Sx² − 2R·Sxy + R²·Sy²)/(n·ȳ²), the Deng et al. (KDD'18)
    cluster-randomized correction. Reported beside the naive SE
    (which ignores the covariance and the denominator's variance) and
    a 95% CI; with ab_test_proportion_ztest and
    ab_cuped_variance_reduction this completes the experimentation
    kit: test a proportion, shrink a mean, and get ratio-metric
    uncertainty right.

    Exactness: the CUPED idiom — integer-cent per-customer sums,
    128-bit moment accumulation (decimal(38,0) ↔ HUGEINT), then one
    fixed-order double expression per statistic; z₀.₉₇₅ is written as
    the exact IEEE double both engines parse identically.

    Scale: one year-pruned customer aggregate + one single-row moment
    aggregate — no window, no driver math."""
    o = load(spark, sf_dir, "orders")
    pc = (
        o.filter(F.year("o_orderdate") == 1999)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
    )
    dec = "decimal(38,0)"
    m = pc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    mx, my = sx / n, sy / n
    vx = (F.col("sxx").cast("double") - sx * sx / n) / (n - 1)
    cxy = (F.col("sxy").cast("double") - sx * sy / n) / (n - 1)
    vy = (F.col("syy").cast("double") - sy * sy / n) / (n - 1)
    ratio = mx / my
    se_delta = F.sqrt(
        (vx - 2 * ratio * cxy + ratio * ratio * vy) / (n * my * my)
    )
    se_naive = F.sqrt(vx / n) / my
    z = F.lit(1.959963984540054)
    return m.select(
        n.alias("n_customers"),
        F.round(ratio / 100, 6).alias("revenue_per_order"),
        F.round(se_delta / 100, 6).alias("se_delta"),
        F.round(se_naive / 100, 6).alias("se_naive"),
        F.round((ratio - z * se_delta) / 100, 4).alias("ci_lo"),
        F.round((ratio + z * se_delta) / 100, 4).alias("ci_hi"),
    )
