"""Round-11 registry additions (wave 3): the statistics and
curation operators a production data platform reaches for next —
each absent from the reference (its analytics surface is the six
weather aggregates, `spark_processor.py:154-183`) and from our own
registry until now.

- Welch's unequal-variance t-test — the default two-sample mean
  test (Student's equal-variance assumption is never checked in
  practice; Welch dominates).
- Kendall tau-b — the O(pairs) rank correlation beside Spearman;
  robust to ties via the tau-b denominator.
- Weekly cohort retention triangle — THE product-analytics table;
  first-activity cohorts × weeks-since-signup activity rates.
- Cross-document duplicated n-gram coverage — the Lee et al. 2022
  ("Deduplicating Training Data Makes Language Models Better")
  diagnostic: how much of each document's text is duplicated
  somewhere else in the corpus, at n-gram granularity.
- Two-sample Poisson rate z-test — did an event type's arrival
  RATE drift between the first and second half of the window
  (exposure-corrected, unlike a raw count comparison).

Shared rules as every round: exact integer/decimal algebra wherever
a float sum would be partition-order-dependent; pure-double algebra
only downstream of identical decimal-rounded inputs; divisions at
the last projection; no unpartitioned data windows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query
from ibd_pipeline_spark.queries.round10_stats import _PHI_B, _phi_tail_sql


def _phi_tail_col(az):
    """Spark twin of _phi_tail_sql: P(Z > az) for az >= 0 (Zelen &
    Severo 26.2.17 — plain double algebra, bit-identical engines)."""
    k = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
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
    return F.lit(0.3989422804014327) * F.exp(F.lit(-0.5) * az * az) * poly


# ---------------------------------------------------------------------------
# Welch's two-sample t-test
# ---------------------------------------------------------------------------

_WELCH_SQL = f"""
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE) AS s1,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))
                        * CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE) AS s2
  FROM events WHERE event_type IN ('purchase', 'view')
  GROUP BY event_type
), w AS (
  SELECT
    MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n_a,
    MAX(CASE WHEN event_type = 'view' THEN n END) AS n_b,
    MAX(CASE WHEN event_type = 'purchase' THEN s1 END) AS s1_a,
    MAX(CASE WHEN event_type = 'view' THEN s1 END) AS s1_b,
    MAX(CASE WHEN event_type = 'purchase' THEN s2 END) AS s2_a,
    MAX(CASE WHEN event_type = 'view' THEN s2 END) AS s2_b
  FROM g
), v AS (
  SELECT n_a, n_b,
         s1_a / n_a AS m_a, s1_b / n_b AS m_b,
         (s2_a - s1_a * s1_a / n_a) / (n_a - 1) AS v_a,
         (s2_b - s1_b * s1_b / n_b) / (n_b - 1) AS v_b
  FROM w
), t AS (
  SELECT n_a, n_b, m_a, m_b, v_a, v_b,
         (m_a - m_b) / sqrt(v_a / n_a + v_b / n_b) AS t_stat,
         (v_a / n_a + v_b / n_b) * (v_a / n_a + v_b / n_b)
           / ((v_a / n_a) * (v_a / n_a) / (n_a - 1)
              + (v_b / n_b) * (v_b / n_b) / (n_b - 1)) AS df
  FROM v
)
SELECT n_a, n_b,
       ROUND(m_a, 6) AS mean_a, ROUND(m_b, 6) AS mean_b,
       ROUND(t_stat, 6) AS t_stat, ROUND(df, 2) AS df_welch,
       ROUND(2.0 * {_phi_tail_sql('ABS(t_stat)')}, 8) AS p_value
FROM t
"""


@query("stats_welch_ttest", oracle=_WELCH_SQL)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test: do purchase and
    view events carry different mean values? The default two-sample
    mean test (it never assumes equal variances, so it dominates
    Student's t in practice); df by Welch–Satterthwaite. p-value
    uses the shared normal tail — at df in the thousands t and z
    are indistinguishable at the rounded precision, and both
    engines evaluate the SAME formula so the hash never depends on
    the statistical approximation.

    Exactness: n is exact; Σx and Σx² are exact DECIMAL sums
    rounded in the decimal domain (the davg rule) before casting to
    double; everything downstream is pure double algebra on
    bit-identical inputs. One groupBy = one shuffle of 2 groups
    with map-side partials; scales as a scan.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    dec = F.col("value").cast("decimal(28,8)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum(dec), 4).cast("double").alias("s1"),
        F.round(F.sum(dec * dec), 4).cast("double").alias("s2"),
    )
    pick = lambda c, t: F.max(F.when(F.col("event_type") == t, F.col(c)))
    w = g.agg(
        pick("n", "purchase").alias("n_a"),
        pick("n", "view").alias("n_b"),
        pick("s1", "purchase").alias("s1_a"),
        pick("s1", "view").alias("s1_b"),
        pick("s2", "purchase").alias("s2_a"),
        pick("s2", "view").alias("s2_b"),
    )
    v = w.select(
        "n_a",
        "n_b",
        (F.col("s1_a") / F.col("n_a")).alias("m_a"),
        (F.col("s1_b") / F.col("n_b")).alias("m_b"),
        (
            (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / F.col("n_a"))
            / (F.col("n_a") - 1)
        ).alias("v_a"),
        (
            (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / F.col("n_b"))
            / (F.col("n_b") - 1)
        ).alias("v_b"),
    )
    se2a = F.col("v_a") / F.col("n_a")
    se2b = F.col("v_b") / F.col("n_b")
    t = v.select(
        "n_a",
        "n_b",
        "m_a",
        "m_b",
        ((F.col("m_a") - F.col("m_b")) / F.sqrt(se2a + se2b)).alias("t_stat"),
        (
            (se2a + se2b)
            * (se2a + se2b)
            / (
                se2a * se2a / (F.col("n_a") - 1)
                + se2b * se2b / (F.col("n_b") - 1)
            )
        ).alias("df"),
    )
    return t.select(
        "n_a",
        "n_b",
        F.round("m_a", 6).alias("mean_a"),
        F.round("m_b", 6).alias("mean_b"),
        F.round("t_stat", 6).alias("t_stat"),
        F.round("df", 2).alias("df_welch"),
        F.round(2.0 * _phi_tail_col(F.abs(F.col("t_stat"))), 8).alias(
            "p_value"
        ),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b rank correlation
# ---------------------------------------------------------------------------

_KENDALL_SQL = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE) AS val
  FROM events GROUP BY CAST(ts AS DATE)
), p AS (
  SELECT
    CAST(SUM(CASE WHEN (b.cnt - a.cnt) * (b.val - a.val) > 0
             THEN 1 ELSE 0 END) AS BIGINT) AS conc,
    CAST(SUM(CASE WHEN (b.cnt - a.cnt) * (b.val - a.val) < 0
             THEN 1 ELSE 0 END) AS BIGINT) AS disc,
    CAST(SUM(CASE WHEN b.cnt = a.cnt THEN 1 ELSE 0 END) AS BIGINT) AS tie_x,
    CAST(SUM(CASE WHEN b.val = a.val THEN 1 ELSE 0 END) AS BIGINT) AS tie_y,
    CAST(COUNT(*) AS BIGINT) AS n0
  FROM d a JOIN d b ON a.day < b.day
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d)
SELECT n.n_days, p.conc AS concordant, p.disc AS discordant,
       ROUND((CAST(p.conc AS DOUBLE) - p.disc)
             / sqrt((CAST(p.n0 AS DOUBLE) - p.tie_x)
                    * (CAST(p.n0 AS DOUBLE) - p.tie_y)), 6) AS tau_b,
       ROUND(3.0 * (CAST(p.conc AS DOUBLE) - p.disc)
             / sqrt(CAST(n.n_days AS DOUBLE) * (n.n_days - 1)
                    * (2.0 * n.n_days + 5) / 2.0), 6) AS z_stat
FROM p, n
"""


@query("stats_kendall_tau", oracle=_KENDALL_SQL)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily event volume and daily total
    value — the pair-concordance rank correlation beside Spearman
    (stats_spearman_corr): tau reads directly as P(concordant) −
    P(discordant) and tau-b's denominator corrects for ties, which
    integer daily counts WILL produce. z under the null uses the
    standard no-ties variance n(n−1)(2n+5)/18 on 2(C−D) scale.

    Scale: the pair join is over the DAY-GRAIN frame (one row per
    day — metadata-sized at any corpus size; a year is 66k pairs),
    broadcast-joined. The data pass is one groupBy(day) with exact
    decimal sums. Day count n is data-derived, never assumed.
    """
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.round(F.sum(F.col("value").cast("decimal(28,8)")), 4)
        .cast("double")
        .alias("val"),
    )
    a, b = d.alias("a"), d.alias("b")
    p = (
        a.join(F.broadcast(b), F.col("a.day") < F.col("b.day"))
        .agg(
            F.sum(
                (
                    (F.col("b.cnt") - F.col("a.cnt"))
                    * (F.col("b.val") - F.col("a.val"))
                    > 0
                ).cast("int")
            )
            .cast("bigint")
            .alias("conc"),
            F.sum(
                (
                    (F.col("b.cnt") - F.col("a.cnt"))
                    * (F.col("b.val") - F.col("a.val"))
                    < 0
                ).cast("int")
            )
            .cast("bigint")
            .alias("disc"),
            F.sum((F.col("b.cnt") == F.col("a.cnt")).cast("int"))
            .cast("bigint")
            .alias("tie_x"),
            F.sum((F.col("b.val") == F.col("a.val")).cast("int"))
            .cast("bigint")
            .alias("tie_y"),
            F.count(F.lit(1)).cast("bigint").alias("n0"),
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    out = p.crossJoin(F.broadcast(n))
    cd = F.col("conc").cast("double") - F.col("disc")
    nd = F.col("n_days").cast("double")
    return out.select(
        "n_days",
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.round(
            cd
            / F.sqrt(
                (F.col("n0").cast("double") - F.col("tie_x"))
                * (F.col("n0").cast("double") - F.col("tie_y"))
            ),
            6,
        ).alias("tau_b"),
        F.round(
            3.0 * cd / F.sqrt(nd * (nd - 1) * (2.0 * nd + 5) / 2.0), 6
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention triangle
# ---------------------------------------------------------------------------

_COHORT_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), first_d AS (
  SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id
), size_d AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM first_d GROUP BY cohort_day
), ret AS (
  SELECT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, a.day) AS INT) AS day_offset,
         CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
  FROM act a JOIN first_d f USING (user_id)
  GROUP BY 1, 2
)
SELECT r.cohort_day, r.day_offset, r.active_users, s.cohort_size,
       ROUND(CAST(r.active_users AS DOUBLE) / s.cohort_size, 6)
         AS retention_rate
FROM ret r JOIN size_d s USING (cohort_day)
ORDER BY cohort_day, day_offset
"""


@query("analytics_cohort_retention", oracle=_COHORT_SQL)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — THE product-analytics table:
    users bucketed by first-activity day (the cohort), and for each
    later day the share of the cohort still active. Diagonal reads
    = aging; column reads = product-change impact. Day-grain here
    (the fixture spans 30 days); the week-grain variant is the same
    plan with date_trunc('week') at the act stage.

    Scale: one DISTINCT (user, week) shuffle (the only data-sized
    exchange), then a user-keyed min-reduce and a join back on
    user_id — both co-partitioned on the same key so AQE reuses the
    exchange; the final frame is (weeks × offsets), metadata-sized.
    retention_rate is bigint/bigint in double — exact inputs, same
    quotient bits on both engines.
    """
    ev = load(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    first_d = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    size_d = first_d.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    ret = (
        act.join(first_d, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(
            F.count_distinct(F.col("user_id"))
            .cast("bigint")
            .alias("active_users")
        )
    )
    return (
        ret.join(F.broadcast(size_d), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "active_users",
            "cohort_size",
            F.round(
                F.col("active_users").cast("double") / F.col("cohort_size"),
                6,
            ).alias("retention_rate"),
        )
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# Cross-document duplicated n-gram coverage (Lee et al. 2022)
# ---------------------------------------------------------------------------

_NGRAM_N = 10
_COV_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(t) >= {_NGRAM_N} THEN
      list_transform(generate_series(1, len(t) - {_NGRAM_N - 1}),
                     i -> array_to_string(t[i:i+{_NGRAM_N - 1}], ' '))
    ELSE [] END)) AS gram
  FROM toks
), df AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM sh GROUP BY gram
), cov AS (
  SELECT s.doc_id,
         CAST(COUNT(*) AS BIGINT) AS total_grams,
         CAST(SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_grams
  FROM sh s JOIN df d USING (gram)
  GROUP BY s.doc_id
)
SELECT doc_id, total_grams, dup_grams,
       ROUND(CAST(dup_grams AS DOUBLE) / total_grams, 6) AS dup_coverage
FROM cov
ORDER BY dup_coverage DESC, doc_id
LIMIT 20
"""


@query("dedup_ngram_coverage", oracle=_COV_SQL)
def dedup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated n-gram coverage — the Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models
    Better") corpus diagnostic: for each document, what fraction of
    its distinct 10-grams appears in at least one OTHER document?
    Near-1 coverage = the document is (almost) entirely duplicated
    text; the ranked head is the dedup worklist, and the corpus-
    level mass estimates how much of the training set is repeats.

    Scale: explode distinct grams per doc (one map pass), groupBy
    gram for document frequency (the one data-sized shuffle — gram
    keys hash-partition evenly), join postings back and reduce per
    doc. Never pairwise: cost is O(total grams), not O(docs²).
    Top-20 via TakeOrdered, ties broken by doc_id.
    """
    from ibd_pipeline_spark.catalog import load_wide
    from ibd_pipeline_spark.queries.llmdata import _shingles

    # load_wide (r12): single-split scan serialized the shingle build
    docs = load_wide(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                _shingles(F.split(F.col("text"), " "), _NGRAM_N)
            )
        ).alias("gram"),
    )
    df_counts = sh.groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    cov = (
        sh.join(df_counts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_grams"),
            F.sum((F.col("n_docs") >= 2).cast("int"))
            .cast("bigint")
            .alias("dup_grams"),
        )
    )
    return (
        cov.select(
            "doc_id",
            "total_grams",
            "dup_grams",
            F.round(
                F.col("dup_grams").cast("double") / F.col("total_grams"), 6
            ).alias("dup_coverage"),
        )
        .orderBy(F.col("dup_coverage").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Two-sample Poisson rate z-test (rate drift between window halves)
# ---------------------------------------------------------------------------

_POIS_SQL = f"""
WITH bounds AS (
  SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS d0,
         CAST(MIN(CAST(ts AS DATE)) AS DATE)
           + INTERVAL (CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                                      MAX(CAST(ts AS DATE))) / 2 AS INT)) DAY
           AS split_day
  FROM events
), halves AS (
  SELECT e.event_type,
         CASE WHEN CAST(e.ts AS DATE) <= b.split_day
              THEN 'early' ELSE 'late' END AS half,
         CAST(e.ts AS DATE) AS day
  FROM events e, bounds b
), c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS BIGINT)
           AS c_early,
         CAST(SUM(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS BIGINT)
           AS c_late
  FROM halves GROUP BY event_type
), expo AS (
  SELECT
    CAST(COUNT(DISTINCT CASE WHEN half = 'early' THEN day END) AS BIGINT)
      AS t_early,
    CAST(COUNT(DISTINCT CASE WHEN half = 'late' THEN day END) AS BIGINT)
      AS t_late
  FROM halves
), z AS (
  SELECT c.event_type, c.c_early, c.c_late, e.t_early, e.t_late,
         (CAST(c.c_early AS DOUBLE) / e.t_early
          - CAST(c.c_late AS DOUBLE) / e.t_late)
         / sqrt(CAST(c.c_early AS DOUBLE) / (e.t_early * e.t_early)
                + CAST(c.c_late AS DOUBLE) / (e.t_late * e.t_late)) AS z_stat
  FROM c, expo e
)
SELECT event_type, c_early, c_late, t_early, t_late,
       ROUND(CAST(c_early AS DOUBLE) / t_early, 6) AS rate_early,
       ROUND(CAST(c_late AS DOUBLE) / t_late, 6) AS rate_late,
       ROUND(z_stat, 6) AS z_stat,
       ROUND(2.0 * {_phi_tail_sql('ABS(z_stat)')}, 8) AS p_value
FROM z ORDER BY event_type
"""


@query("stats_poisson_rate_ztest", oracle=_POIS_SQL)
def stats_poisson_rate_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate z-test per event type: did the
    DAILY ARRIVAL RATE drift between the first and second half of
    the observed window? Exposure-corrected (counts divided by the
    actual distinct days in each half, data-derived — an uneven
    split or missing days never biases the test), unlike the naive
    raw-count comparison. z = (λ̂₁−λ̂₂)/√(c₁/T₁² + c₂/T₂²) — the
    standard unconditional rate test; p from the shared normal tail.

    Scale: one scan → per-type counts (5 groups, map-side combine)
    + one distinct-day frame (day-grain). All inputs to the double
    algebra are exact integers.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    )
    bounds = ev.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        F.date_add(
            F.col("d0"),
            (F.datediff(F.col("d1"), F.col("d0")) / 2).cast("int"),
        ).alias("split_day")
    )
    halves = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "day",
        F.when(F.col("day") <= F.col("split_day"), "early")
        .otherwise("late")
        .alias("half"),
    )
    c = halves.groupBy("event_type").agg(
        F.sum((F.col("half") == "early").cast("int"))
        .cast("bigint")
        .alias("c_early"),
        F.sum((F.col("half") == "late").cast("int"))
        .cast("bigint")
        .alias("c_late"),
    )
    expo = halves.agg(
        F.count_distinct(
            F.when(F.col("half") == "early", F.col("day"))
        )
        .cast("bigint")
        .alias("t_early"),
        F.count_distinct(F.when(F.col("half") == "late", F.col("day")))
        .cast("bigint")
        .alias("t_late"),
    )
    z = c.crossJoin(F.broadcast(expo)).select(
        "event_type",
        "c_early",
        "c_late",
        "t_early",
        "t_late",
        (
            (
                F.col("c_early").cast("double") / F.col("t_early")
                - F.col("c_late").cast("double") / F.col("t_late")
            )
            / F.sqrt(
                F.col("c_early").cast("double")
                / (F.col("t_early") * F.col("t_early"))
                + F.col("c_late").cast("double")
                / (F.col("t_late") * F.col("t_late"))
            )
        ).alias("z_stat"),
    )
    return z.select(
        "event_type",
        "c_early",
        "c_late",
        "t_early",
        "t_late",
        F.round(F.col("c_early").cast("double") / F.col("t_early"), 6).alias(
            "rate_early"
        ),
        F.round(F.col("c_late").cast("double") / F.col("t_late"), 6).alias(
            "rate_late"
        ),
        F.round("z_stat", 6).alias("z_stat"),
        F.round(
            2.0 * _phi_tail_col(F.abs(F.col("z_stat"))), 8
        ).alias("p_value"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) and a
# dense (embedding-cosine) ranking
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_POOL = 50
_RRF_LABEL = 0


def _rrf_oracle() -> str:
    from ibd_pipeline_spark.queries.round6 import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )

    tf = ", ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df = ", ".join(
        f"CAST(COUNT(*) FILTER (tf{i} > 0) AS DOUBLE) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    score = " + ".join(
        f"ln(1 + (g.n - g.df{i} + 0.5) / (g.df{i} + 0.5))"
        f" * tf{i} * ({_BM25_K1} + 1)"
        f" / (tf{i} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * t.dl / g.avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), t AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, {tf} FROM d
), g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl, {df} FROM t
), lex AS (
  SELECT doc_id, {score} AS bm25 FROM t, g
), lexr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
  FROM lex
), xk AS (
  SELECT e.vec_id AS doc_id, i - 1 AS k, CAST(e.embedding[i] AS DOUBLE) AS x
  FROM embeddings e, UNNEST(generate_series(1, 64)) t(i)
), cm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m
  FROM embeddings WHERE label = {_RRF_LABEL}
), cent AS (
  SELECT x.k,
         SUM(CAST(FLOOR(x.x * 1e9) AS BIGINT)) / (1e9 * cm.m) AS c
  FROM xk x JOIN embeddings e ON e.vec_id = x.doc_id, cm
  WHERE e.label = {_RRF_LABEL}
  GROUP BY x.k, cm.m
), cn AS (
  SELECT SUM(CAST(FLOOR(c * c * 1e12) AS BIGINT)) AS cn2 FROM cent
), den AS (
  SELECT x.doc_id,
         (CAST(SUM(CAST(FLOOR(x.x * c.c * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
         / (sqrt(CAST(SUM(CAST(FLOOR(x.x * x.x * 1e12) AS BIGINT))
                      AS DOUBLE) / 1e12)
            * sqrt(CAST(cn.cn2 AS DOUBLE) / 1e12)) AS cos
  FROM xk x JOIN cent c USING (k), cn
  GROUP BY x.doc_id, cn.cn2
), denr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r
  FROM den
), fused AS (
  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
         l.r AS lex_rank, v.r AS dense_rank,
         COALESCE(1.0 / ({_RRF_K} + l.r), 0.0)
           + COALESCE(1.0 / ({_RRF_K} + v.r), 0.0) AS rrf_score
  FROM (SELECT * FROM lexr WHERE r <= {_RRF_POOL}) l
  FULL OUTER JOIN (SELECT * FROM denr WHERE r <= {_RRF_POOL}) v
    USING (doc_id)
)
SELECT doc_id, CAST(lex_rank AS INT) AS lex_rank,
       CAST(dense_rank AS INT) AS dense_rank,
       ROUND(rrf_score, 8) AS rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id
LIMIT 10
"""


@query("search_hybrid_rrf", oracle=_rrf_oracle)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack et al.):
    a lexical BM25 ranking (same terms/constants as
    text_bm25_ranking) and a dense embedding ranking (cosine to the
    label-0 centroid — query-by-example) each contribute
    1/(60+rank); the fused top-10 is the modern lexical+dense hybrid
    search result list. RRF is scorer-agnostic — no score
    calibration between BM25's unbounded sums and cosine's [-1,1]
    is needed, which is exactly why it's the production default.

    Exactness: centroid dims and all dot products accumulate in
    fixed point (order-independent integer sums); BM25 reuses the
    attested formula. Ranks: each scorer's top-50 via global
    TakeOrdered (sort-limit, no unpartitioned window), then rank =
    broadcast self-join count within the pool-sized frame.

    Scale: BM25 is a scan + tiny global stats; the dense side is one
    d-explode shuffle keyed by (doc, dim); the fusion frame is
    pool-sized. At 100 TB each ranking's top-k comes from its own
    index path (postings / ANN) and the fusion stays rank-only.
    """
    from ibd_pipeline_spark.queries.round6 import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    tf_cols = [
        F.size(F.filter("toks", lambda x: x == F.lit(t)))
        .cast("double")
        .alias(f"tf{i}")
        for i, t in enumerate(_BM25_TERMS)
    ]
    t = toks.select(
        "doc_id", F.size("toks").cast("double").alias("dl"), *tf_cols
    )
    g = t.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf{i}") > 0, 1))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        term = (
            F.log(
                1
                + (F.col("n") - F.col(f"df{i}") + 0.5)
                / (F.col(f"df{i}") + 0.5)
            )
            * F.col(f"tf{i}")
            * (_BM25_K1 + 1)
            / (
                F.col(f"tf{i}")
                + _BM25_K1
                * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = term if score is None else score + term
    lex = (
        t.crossJoin(F.broadcast(g))
        .select("doc_id", score.alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_POOL)
        .localCheckpoint(eager=True)  # pool-sized; barrier for the rank join
    )
    la, lc = lex.alias("la"), lex.alias("lc")
    lexr = (
        la.join(
            F.broadcast(lc),
            (F.col("lc.bm25") > F.col("la.bm25"))
            | (
                (F.col("lc.bm25") == F.col("la.bm25"))
                & (F.col("lc.doc_id") <= F.col("la.doc_id"))
            ),
        )
        .groupBy("la.doc_id")
        .agg(F.count(F.lit(1)).alias("r"))
    )

    emb = load(spark, sf_dir, "embeddings")
    xk = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.col("label"),
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("k", "x"),
    )
    cm = emb.filter(F.col("label") == _RRF_LABEL).agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    cent = (
        xk.filter(F.col("label") == _RRF_LABEL)
        .groupBy("k")
        .agg(
            F.sum(F.floor(F.col("x") * 1e9).cast("bigint")).alias("s")
        )
        .crossJoin(F.broadcast(cm))
        .select("k", (F.col("s") / (F.lit(1e9) * F.col("m"))).alias("c"))
    )
    cn = cent.agg(
        F.sum(F.floor(F.col("c") * F.col("c") * 1e12).cast("bigint")).alias(
            "cn2"
        )
    )
    den = (
        xk.join(F.broadcast(cent), "k")
        .groupBy("doc_id")
        .agg(
            F.sum(F.floor(F.col("x") * F.col("c") * 1e12).cast("bigint"))
            .alias("ip_fp"),
            F.sum(F.floor(F.col("x") * F.col("x") * 1e12).cast("bigint"))
            .alias("xn2"),
        )
        .crossJoin(F.broadcast(cn))
        .select(
            "doc_id",
            (
                (F.col("ip_fp").cast("double") / 1e12)
                / (
                    F.sqrt(F.col("xn2").cast("double") / 1e12)
                    * F.sqrt(F.col("cn2").cast("double") / 1e12)
                )
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "doc_id")
        .limit(_RRF_POOL)
        .localCheckpoint(eager=True)  # pool-sized
    )
    da, dc = den.alias("da"), den.alias("dc")
    denr = (
        da.join(
            F.broadcast(dc),
            (F.col("dc.cos") > F.col("da.cos"))
            | (
                (F.col("dc.cos") == F.col("da.cos"))
                & (F.col("dc.doc_id") <= F.col("da.doc_id"))
            ),
        )
        .groupBy("da.doc_id")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    fused = lexr.withColumnRenamed("r", "lr").join(
        denr.withColumnRenamed("r", "dr"), "doc_id", "full_outer"
    )
    rrf = F.coalesce(
        F.lit(1.0) / (_RRF_K + F.col("lr")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (_RRF_K + F.col("dr")), F.lit(0.0))
    return (
        fused.select(
            "doc_id",
            F.col("lr").cast("int").alias("lex_rank"),
            F.col("dr").cast("int").alias("dense_rank"),
            F.round(rrf, 8).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation: NDCG@10 + recall@10 of the JL-projected
# ranking against the exact-cosine ground truth
# ---------------------------------------------------------------------------

_NDCG_Q, _NDCG_TOPK = 10, 10


def _ndcg_oracle() -> str:
    from ibd_pipeline_spark.queries.round11 import _jl_proj_sql

    d64 = " + ".join(
        f"q.v[{i}] * c.v[{i}]" for i in range(1, 65)
    )
    qn = " + ".join(f"q.v[{i}] * q.v[{i}]" for i in range(1, 65))
    cn = " + ".join(f"c.v[{i}] * c.v[{i}]" for i in range(1, 65))
    projs = ", ".join(
        f"{p} AS p{j}" for j, p in enumerate(_jl_proj_sql("v", True))
    )
    d16 = " + ".join(f"q.p{j} * c.p{j}" for j in range(16))
    qn16 = " + ".join(f"q.p{j} * q.p{j}" for j in range(16))
    cn16 = " + ".join(f"c.p{j} * c.p{j}" for j in range(16))
    return f"""
WITH v AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), p AS (
  SELECT id, v, {projs} FROM v
), s AS (
  SELECT q.id AS qid, c.id AS cid,
         ({d64}) / (sqrt({qn}) * sqrt({cn})) AS cos64,
         ({d16}) / (sqrt({qn16}) * sqrt({cn16})) AS cos16
  FROM p q JOIN p c ON c.id <> q.id
  WHERE q.id < {_NDCG_Q}
), r AS (
  SELECT qid, cid, cos64, cos16,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cos64 DESC, cid) AS re,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cos16 DESC, cid) AS ra
  FROM s
), agg AS (
  SELECT qid,
         SUM(CASE WHEN ra <= {_NDCG_TOPK} THEN
           CAST(FLOOR(GREATEST(cos64, 0.0) / (ln(ra + 1) / ln(2.0)) * 1e9)
                AS BIGINT) ELSE 0 END) AS dcg_fp,
         SUM(CASE WHEN re <= {_NDCG_TOPK} THEN
           CAST(FLOOR(GREATEST(cos64, 0.0) / (ln(re + 1) / ln(2.0)) * 1e9)
                AS BIGINT) ELSE 0 END) AS idcg_fp,
         CAST(SUM(CASE WHEN ra <= {_NDCG_TOPK} AND re <= {_NDCG_TOPK}
                  THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM r GROUP BY qid
)
SELECT qid AS query_id,
       ROUND(CAST(dcg_fp AS DOUBLE) / 1e9, 6) AS dcg10,
       ROUND(CAST(idcg_fp AS DOUBLE) / 1e9, 6) AS idcg10,
       ROUND(CAST(dcg_fp AS DOUBLE) / idcg_fp, 6) AS ndcg10,
       hits,
       ROUND(CAST(hits AS DOUBLE) / {_NDCG_TOPK}, 4) AS recall10
FROM agg ORDER BY query_id
"""


@query("similarity_ndcg_eval", oracle=_ndcg_oracle)
def similarity_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of an approximate retrieval path:
    NDCG@10 and recall@10 of the JL-projected 16-dim cosine ranking
    (similarity_jl_projection's sign matrix) against the exact
    64-dim cosine ground truth, per query — the metric pair every
    ANN deployment reports. Graded relevance = clamped exact cosine
    (monotone in the exact score, so the ideal ranking IS the exact
    ranking); discount = log2(rank+1).

    Exactness: both scores are fixed-order double chains (the JL
    matrix is embedded as literals in both engines); DCG terms
    quantize at 1e-9 and sum as exact integers, so the per-query
    aggregation never depends on float order.

    Scale: queries broadcast against the corpus scan (the eval runs
    on a query SAMPLE by design — cost is q·n, not n²); per-query
    ranks via qid-partitioned windows. At 100 TB the corpus side
    would come pre-filtered by the candidate generator under test.
    """
    from ibd_pipeline_spark.operators.similarity import as_double_array, dot
    from ibd_pipeline_spark.queries.round11 import _jl_proj_sql

    emb = load(spark, sf_dir, "embeddings")
    projs = _jl_proj_sql("v", False)
    # materialize the projected corpus ONCE: the 16 JL projections are
    # 1024-node literal sums, and without a barrier Catalyst re-analyzes
    # (and codegen re-compiles) that tree on BOTH sides of the q×c join
    # — measured, the wall here was plan compilation, not arithmetic
    from ibd_pipeline_spark.operators.ckpt import literal_barrier

    p = literal_barrier(
        emb.select(
            F.col("vec_id").alias("id"), as_double_array("embedding").alias("v")
        ).select(
            "id", "v", *[F.expr(pp).alias(f"p{j}") for j, pp in enumerate(projs)]
        )
    )
    q = p.filter(F.col("id") < _NDCG_Q).select(
        F.col("id").alias("qid"),
        F.col("v").alias("qv"),
        *[F.col(f"p{j}").alias(f"qp{j}") for j in range(16)],
    )
    c = p.select(
        F.col("id").alias("cid"),
        F.col("v").alias("cv"),
        *[F.col(f"p{j}").alias(f"cp{j}") for j in range(16)],
    )

    def chain(terms):
        acc = None
        for t in terms:
            acc = t if acc is None else acc + t
        return acc

    d64 = chain(
        [
            F.element_at("qv", i) * F.element_at("cv", i)
            for i in range(1, 65)
        ]
    )
    qn = chain(
        [F.element_at("qv", i) * F.element_at("qv", i) for i in range(1, 65)]
    )
    cn = chain(
        [F.element_at("cv", i) * F.element_at("cv", i) for i in range(1, 65)]
    )
    d16 = chain([F.col(f"qp{j}") * F.col(f"cp{j}") for j in range(16)])
    qn16 = chain([F.col(f"qp{j}") * F.col(f"qp{j}") for j in range(16)])
    cn16 = chain([F.col(f"cp{j}") * F.col(f"cp{j}") for j in range(16)])
    s = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            (d64 / (F.sqrt(qn) * F.sqrt(cn))).alias("cos64"),
            (d16 / (F.sqrt(qn16) * F.sqrt(cn16))).alias("cos16"),
        )
    )
    from pyspark.sql import Window as W

    we = W.partitionBy("qid").orderBy(F.col("cos64").desc(), "cid")
    wa = W.partitionBy("qid").orderBy(F.col("cos16").desc(), "cid")
    r = s.withColumn("re", F.row_number().over(we)).withColumn(
        "ra", F.row_number().over(wa)
    )
    gain = F.greatest(F.col("cos64"), F.lit(0.0))
    dterm_a = F.floor(
        gain / (F.log(F.col("ra") + 1) / F.log(F.lit(2.0))) * 1e9
    ).cast("bigint")
    dterm_e = F.floor(
        gain / (F.log(F.col("re") + 1) / F.log(F.lit(2.0))) * 1e9
    ).cast("bigint")
    agg = r.groupBy("qid").agg(
        F.sum(
            F.when(F.col("ra") <= _NDCG_TOPK, dterm_a).otherwise(F.lit(0))
        ).alias("dcg_fp"),
        F.sum(
            F.when(F.col("re") <= _NDCG_TOPK, dterm_e).otherwise(F.lit(0))
        ).alias("idcg_fp"),
        F.sum(
            (
                (F.col("ra") <= _NDCG_TOPK) & (F.col("re") <= _NDCG_TOPK)
            ).cast("int")
        )
        .cast("bigint")
        .alias("hits"),
    )
    return agg.select(
        F.col("qid").alias("query_id"),
        F.round(F.col("dcg_fp").cast("double") / 1e9, 6).alias("dcg10"),
        F.round(F.col("idcg_fp").cast("double") / 1e9, 6).alias("idcg10"),
        F.round(
            F.col("dcg_fp").cast("double") / F.col("idcg_fp"), 6
        ).alias("ndcg10"),
        "hits",
        F.round(F.col("hits").cast("double") / _NDCG_TOPK, 4).alias(
            "recall10"
        ),
    ).orderBy("query_id")
