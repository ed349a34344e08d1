"""Round-11 registry additions (wave 5): the data-curation and
inference operators a production LLM-data platform reaches for next —
each absent from the reference (its analytics surface is the six
weather aggregates, `spark_processor.py:154-183`) and from our own
registry until now.

- DSIR importance weights (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling") — hashed-bigram
  importance weights of every document against a target domain.
- Log-rank test — the two-group survival-curve comparison on the
  KM/Nelson-Aalen lifetime construction (payers vs non-payers).
- Kruskal-Wallis H — the k-group rank ANOVA beside Mann-Whitney's
  two-group form; rank-from-prefix-sum, window-free.
- Ljung-Box portmanteau test — "is the daily series white noise at
  lags 1..8", the model-diagnostics companion to the ACF query.
- Holm-Bonferroni step-down — FWER control beside BH's FDR control,
  over the identical per-brand z-test family.
- Degree assortativity — do hubs link to hubs in the co-activity
  graph (Newman 2002), on the shared (event_type, hour) edge build.
- Good-Turing / Chao1 vocabulary report — smoothed unseen-mass and
  species-richness estimates from the frequency-of-frequencies.
- SemDeDup (Abbas et al. 2023) — semantic near-dup pruning via
  k-means cluster blocking + within-cluster cosine, on the attested
  fixed-point Lloyd assignments.
- Post-stratification — the variance-reduced A/B effect estimator
  (stratify after randomization), completing the experimentation kit
  next to CUPED's covariate form.

Shared rules as every round: exact integer/decimal algebra wherever
a float sum would be partition-order-dependent; pure-double algebra
only downstream of identical decimal-rounded or exact-integer
inputs; divisions at the last projection; no unpartitioned data
windows (scalar frames of test statistics and per-cluster/per-brand
metadata frames are catalog-bounded).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query
from ibd_pipeline_spark.queries.round10_stats import _PHI_B, _phi_tail_sql
from ibd_pipeline_spark.queries.round11b import _phi_tail_col


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed-bigram domain resampling scores)
# ---------------------------------------------------------------------------

_DSIR_B = 256  # hashed feature buckets
_DSIR_SEED = 29

_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
), grams AS (
  SELECT doc_id, lang, l[i] || ' ' || l[i + 1] AS gram
  FROM toks, UNNEST(generate_series(1, len(l) - 1)) t(i)
), hashed AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5('{_DSIR_SEED}:' || gram), 1, 8))
              AS BIGINT) % {_DSIR_B} AS b
  FROM grams
), counts AS (
  SELECT b,
         CAST(COUNT(*) AS BIGINT) AS cr,
         CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS ct
  FROM hashed GROUP BY b
), tots AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt
  FROM counts
), lr AS (
  SELECT b,
         CAST(ROUND(
           ln(CAST(ct + 1 AS DOUBLE) / (nt + {_DSIR_B}))
           - ln(CAST(cr + 1 AS DOUBLE) / (nr + {_DSIR_B})), 10)
           AS DECIMAL(18,10)) AS lw
  FROM counts, tots
), docw AS (
  SELECT h.doc_id, h.lang, SUM(lr.lw) AS w
  FROM hashed h JOIN lr USING (b)
  GROUP BY h.doc_id, h.lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(w) AS DOUBLE) / COUNT(*), 8) AS mean_logw,
       CAST(COUNT(*) FILTER (w > 0) AS BIGINT) AS n_selected
FROM docw GROUP BY lang ORDER BY lang
"""


@query("train_dsir_importance", oracle=_DSIR_SQL)
def train_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): score every document
    against a TARGET domain (lang = 'en' stands in for the quality
    corpus) with hashed-bigram n-gram features — per bucket b,
    lw(b) = ln p̂_target(b) − ln p̂_raw(b) under add-1 smoothing over
    256 buckets; a document's importance weight is the sum of lw over
    its bigram OCCURRENCES. The published recipe for "select web data
    that looks like Wikipedia" at pretraining scale; resampling by
    these weights is importance resampling onto the target. The
    per-language report is its own audit: the target language must
    rank first on mean weight.

    Exactness: bucket counts are exact integers; each bucket's
    log-ratio rounds to DECIMAL(18,10) before any per-doc sum, so doc
    weights are order-independent decimal sums; the per-language mean
    divides a rounded decimal sum by an exact count.

    Scale: gram explode → one 256-key count aggregate (map-side
    combined) → broadcast 256-row weight table back onto the gram
    stream → one doc-key sum. Never materializes a vocabulary: the
    hash trick bounds state at B buckets regardless of corpus size —
    exactly why DSIR scales to CommonCrawl."""
    d = load(spark, sf_dir, "documents")
    # physical barrier before the gram lambdas: CollapseProject would
    # inline the merely-projected split(text) into slice/zip_with and
    # re-split per gram — the r10 prefix-filter lesson (measured here:
    # 2.3 s -> 0.6 s on the sf0.1 gram build)
    from ibd_pipeline_spark.operators.ckpt import literal_barrier

    toks = literal_barrier(
        d.select(
            "doc_id",
            "lang",
            F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
        )
    )
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
    # the hashed gram stream feeds BOTH the bucket counts and the
    # per-doc weight join — materialize it once (it is (doc, lang,
    # int) — far smaller than re-hashing 250k+ md5 grams twice)
    hashed = literal_barrier(
        grams.select(
            "doc_id",
            "lang",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.lit(str(_DSIR_SEED)), F.col("gram")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % _DSIR_B
            ).alias("b"),
        )
    )
    counts = hashed.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("cr"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("bigint").alias("ct"),
    )
    tots = counts.agg(
        F.sum("cr").cast("bigint").alias("nr"),
        F.sum("ct").cast("bigint").alias("nt"),
    )
    lr = counts.crossJoin(F.broadcast(tots)).select(
        "b",
        F.round(
            F.log(
                (F.col("ct") + 1).cast("double") / (F.col("nt") + _DSIR_B)
            )
            - F.log(
                (F.col("cr") + 1).cast("double") / (F.col("nr") + _DSIR_B)
            ),
            10,
        )
        .cast("decimal(18,10)")
        .alias("lw"),
    )
    docw = hashed.join(F.broadcast(lr), "b").groupBy("doc_id", "lang").agg(
        F.sum("lw").alias("w")
    )
    return (
        docw.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            # decimal→double BEFORE any rounding (the NA half-"…50"
            # cross-engine decimal-ROUND lesson)
            F.round(
                F.sum("w").cast("double") / F.count(F.lit(1)), 8
            ).alias("mean_logw"),
            F.count(F.when(F.col("w") > 0, 1))
            .cast("bigint")
            .alias("n_selected"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Log-rank test (payers vs non-payers user-lifetime survival)
# ---------------------------------------------------------------------------

_LOGRANK_SQL = f"""
WITH u AS (
  SELECT user_id,
         MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
         MAX(CAST(ts AS TIMESTAMP)) AS last_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
           AS conv_ts,
         MIN(struct_pack(ts := CAST(ts AS TIMESTAMP), eid := event_id,
                         et := event_type)) AS frow
  FROM events GROUP BY user_id
), lif AS (
  SELECT frow.et = 'view' AS grp1,
         CAST(datediff('day', CAST(first_ts AS DATE),
                       CAST(COALESCE(conv_ts, last_ts) AS DATE))
              AS BIGINT) AS dur,
         conv_ts IS NULL AS censored
  FROM u
), d AS (
  SELECT dur,
         CAST(COUNT(*) FILTER (grp1 AND NOT censored) AS BIGINT) AS d1,
         CAST(COUNT(*) FILTER (NOT grp1 AND NOT censored) AS BIGINT) AS d2,
         CAST(COUNT(*) FILTER (grp1) AS BIGINT) AS a1,
         CAST(COUNT(*) FILTER (NOT grp1) AS BIGINT) AS a2
  FROM lif GROUP BY dur
), k AS (
  SELECT dur, d1, d2,
         CAST((SELECT SUM(a1) FROM d) - COALESCE(SUM(a1) OVER (
             ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS BIGINT) AS n1,
         CAST((SELECT SUM(a2) FROM d) - COALESCE(SUM(a2) OVER (
             ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS BIGINT) AS n2
  FROM d
), terms AS (
  SELECT d1,
         CAST(ROUND(CAST(d1 + d2 AS DOUBLE) * n1 / (n1 + n2), 10)
              AS DECIMAL(28,10)) AS e1,
         CAST(ROUND(
           CASE WHEN n1 + n2 > 1 THEN
             CAST(d1 + d2 AS DOUBLE)
             * (CAST(n1 AS DOUBLE) / (n1 + n2))
             * (1.0 - CAST(n1 AS DOUBLE) / (n1 + n2))
             * (n1 + n2 - d1 - d2) / (n1 + n2 - 1)
           ELSE 0.0 END, 10) AS DECIMAL(28,10)) AS v
  FROM k WHERE d1 + d2 > 0
), s AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         CAST(SUM(e1) AS DOUBLE) AS e1,
         CAST(SUM(v) AS DOUBLE) AS v
  FROM terms
), z AS (
  SELECT o1, e1, v,
         CASE WHEN v > 0
              THEN (CAST(o1 AS DOUBLE) - e1) / sqrt(v) END AS zs
  FROM s
)
SELECT (SELECT CAST(COUNT(*) FILTER (grp1) AS BIGINT) FROM lif)
         AS n_first_view,
       (SELECT CAST(COUNT(*) FILTER (NOT grp1) AS BIGINT) FROM lif)
         AS n_other,
       o1 AS observed_1, ROUND(e1, 6) AS expected_1,
       ROUND(zs, 6) AS z_stat, ROUND(zs * zs, 6) AS chi2,
       CASE WHEN zs IS NOT NULL
            THEN ROUND(2.0 * {_phi_tail_sql("abs(zs)")}, 8) END AS p_value
FROM z
"""


@query("stats_logrank_test", oracle=_LOGRANK_SQL)
def stats_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test comparing time-to-first-purchase
    survival between FIRST-TOUCH cohorts — users whose very first
    event is a 'view' (browsers) vs everyone else — on the identical
    right-censored conversion construction as stats_kaplan_meier /
    stats_nelson_aalen (death = first purchase, days from first
    activity; never-purchasers censored at last activity). At each
    distinct death time t: observed group-1 deaths d1(t) vs
    hypergeometric expectation dt·n1/nt and variance
    dt·(n1/nt)(1−n1/nt)(nt−dt)/(nt−1); z = (O1−E1)/√ΣV — THE
    standard "do these two conversion curves differ" test, which
    neither KM curve alone answers.

    Determinism: the first-touch extractor is MIN over the struct
    (ts, event_id, event_type) — (ts, event_id) is unique per user,
    and both engines order structs lexicographically, so the cohort
    assignment is bit-identical. d and at-risk counts are exact
    integers (at-risk via the block-stitched cumsum, no
    unpartitioned window); each E/V term rounds to DECIMAL(28,10)
    before the order-independent sum; z, chi2 and the Zelen-Severo
    p-value are identical double chains on both engines.

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
        F.min(F.struct("ts", "event_id", "event_type")).alias("frow"),
    )
    lif = u.select(
        (F.col("frow.event_type") == "view").alias("grp1"),
        F.datediff(
            F.to_date(F.coalesce("conv_ts", "last_ts")),
            F.to_date("first_ts"),
        )
        .cast("bigint")
        .alias("dur"),
        F.col("conv_ts").isNull().alias("censored"),
    )
    d = lif.groupBy("dur").agg(
        F.count(F.when(F.col("grp1") & ~F.col("censored"), 1))
        .cast("bigint")
        .alias("d1"),
        F.count(F.when(~F.col("grp1") & ~F.col("censored"), 1))
        .cast("bigint")
        .alias("d2"),
        F.count(F.when(F.col("grp1"), 1)).cast("bigint").alias("a1"),
        F.count(F.when(~F.col("grp1"), 1)).cast("bigint").alias("a2"),
    )
    tot = d.agg(
        F.sum("a1").alias("t1"),
        F.sum("a2").alias("t2"),
    )
    cum = month_stitched_cumsum(
        d, "dur", ["a1", "a2"], block=F.floor(F.col("dur") / 32)
    )
    k = cum.crossJoin(F.broadcast(tot)).select(
        "d1",
        "d2",
        (F.col("t1") - F.col("cum_a1") + F.col("a1"))
        .cast("bigint")
        .alias("n1"),
        (F.col("t2") - F.col("cum_a2") + F.col("a2"))
        .cast("bigint")
        .alias("n2"),
    )
    nt = F.col("n1") + F.col("n2")
    dt = F.col("d1") + F.col("d2")
    p1 = F.col("n1").cast("double") / nt
    terms = k.filter(dt > 0).select(
        "d1",
        F.round(dt.cast("double") * p1, 10)
        .cast("decimal(28,10)")
        .alias("e1"),
        # the nt = 1 guard divides by greatest(nt-1, 1) INSIDE the
        # branch too: whole-stage codegen hoists the division as a
        # common subexpression and evaluates it even on rows the
        # when() rejects — a bare (nt-1) denominator throws
        # DIVIDE_BY_ZERO under ANSI mode on the last at-risk row
        F.round(
            F.when(
                nt > 1,
                dt.cast("double")
                * p1
                * (F.lit(1.0) - p1)
                * (nt - dt)
                / F.greatest(nt - 1, F.lit(1)),
            ).otherwise(F.lit(0.0)),
            10,
        )
        .cast("decimal(28,10)")
        .alias("v"),
    )
    s = terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e1").cast("double").alias("e1"),
        F.sum("v").cast("double").alias("v"),
    )
    npay = lif.agg(
        F.count(F.when(F.col("grp1"), 1)).cast("bigint").alias("n_first_view"),
        F.count(F.when(~F.col("grp1"), 1)).cast("bigint").alias("n_other"),
    )
    # V = 0 (all deaths at one time, or a single-group family) leaves
    # the statistic undefined — NULL, never a divide-by-zero (the
    # ANSI-mode sqrt(0) denominator is hoisted by codegen, so the
    # guard divides by a floored-at-tiny denominator inside)
    zs = F.when(
        F.col("v") > 0,
        (F.col("o1").cast("double") - F.col("e1"))
        / F.sqrt(F.greatest(F.col("v"), F.lit(1e-300))),
    )
    return (
        npay.crossJoin(F.broadcast(s))
        .select(
            "n_first_view",
            "n_other",
            F.col("o1").alias("observed_1"),
            F.round("e1", 6).alias("expected_1"),
            F.round(zs, 6).alias("z_stat"),
            F.round(zs * zs, 6).alias("chi2"),
            F.when(
                zs.isNotNull(),
                F.round(2.0 * _phi_tail_col(F.abs(zs)), 8),
            ).alias("p_value"),
        )
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H (k-group rank ANOVA over event-type values)
# ---------------------------------------------------------------------------

_KW_SQL = """
WITH s AS (
  SELECT value AS v, event_type AS g FROM events WHERE value IS NOT NULL
), r AS (
  SELECT g,
         RANK() OVER (ORDER BY v) + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0
           AS avg_rank
  FROM s
), grp AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(2 * avg_rank) AS BIGINT) AS r2_g
  FROM r GROUP BY g
), nn AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM grp
), ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY v)
), dev AS (
  SELECT SUM(CAST(ROUND(
           n_g * (CAST(r2_g AS DOUBLE) / (2 * n_g) - (n + 1) / 2.0)
               * (CAST(r2_g AS DOUBLE) / (2 * n_g) - (n + 1) / 2.0), 6)
           AS DECIMAL(28,6))) AS ss
  FROM grp, nn
), h AS (
  SELECT CAST(12.0 * CAST(ss AS DOUBLE)
              / (CAST(n AS DOUBLE) * (n + 1)) AS DOUBLE) AS h_raw,
         1.0 - CAST(tie_term AS DOUBLE)
             / (CAST(n AS DOUBLE) * n * n - n) AS c,
         n, k
  FROM dev, nn, ties
)
SELECT n AS n_total, CAST(k AS INT) AS n_groups,
       CAST(k - 1 AS INT) AS df,
       ROUND(h_raw, 6) AS h_stat,
       ROUND(h_raw / c, 6) AS h_corrected,
       ROUND(exp(-(h_raw / c) / 2.0) * (1.0 + (h_raw / c) / 2.0), 8)
         AS p_value
FROM h
"""


@query("stats_kruskal_wallis", oracle=_KW_SQL)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test — does the `value` distribution differ
    across the FIVE event types? The k-group rank ANOVA that drops
    ANOVA's normality assumption, generalizing stats_mann_whitney_u
    beyond two groups: H = 12/(N(N+1))·Σ n_g(r̄_g − (N+1)/2)², tie
    correction C = 1 − Σ(t³−t)/(N³−N), H_c = H/C, p from the
    chi-square survival at df = k−1 = 4 (even df → the closed form
    exp(−x/2)·Σ_{j<df/2}(x/2)^j/j! — no incomplete-gamma needed).

    Exactness: rank sums are exact integers via rank-from-prefix-sum
    (2·avg_rank(v) = 2·cum(v)−t(v)+1 — the r09 MWU pattern, one
    multi-weight distributed scan, no global RANK window); per-group
    squared deviations round to decimal before the k-term sum; the
    p-value chain is plain double algebra on identical inputs.

    Scale: one value-key shuffle for tie groups, one range exchange
    for the prefix scan; everything after runs on k = 5 rows."""
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(F.col("value").alias("v"), F.col("event_type").alias("g"))
    # group list is k = 5 catalog values — one metadata-sized collect
    # (what pivot() does internally, minus pivot's extra agg pass:
    # measured 3.2 s -> 0.4 s for the per-value frame at sf0.1)
    gvals = sorted(r["g"] for r in s.select("g").distinct().collect())
    # Sanitized positional aliases (g__0..g__{k-1}) so a group value
    # colliding with internal column names ('v', 't', 'n', 'k') or
    # containing a quote can't corrupt the plan (ADVICE r11); the
    # value itself travels only inside F.lit, never an f-string expr.
    gcols = [f"g__{i}" for i in range(len(gvals))]
    per_value = s.groupBy("v").agg(
        *[
            F.count(F.when(F.col("g") == F.lit(v), 1))
            .cast("bigint")
            .alias(c)
            for c, v in zip(gcols, gvals)
        ]
    )
    per_value = per_value.withColumn(
        "t", sum(F.col(c) for c in gcols).cast("bigint")
    )
    cum = with_global_prefix_sums(per_value, ["v"], ["t"])
    two_avg_rank = 2 * F.col("_cum_t") - F.col("t") + F.lit(1)
    grp_aggs = []
    for c in gcols:
        grp_aggs.append(F.sum(F.col(c)).cast("bigint").alias(f"n__{c}"))
        grp_aggs.append(
            F.sum(F.col(c) * two_avg_rank).cast("bigint").alias(f"r2__{c}")
        )
    agg = cum.agg(
        *grp_aggs,
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_term"),
    )
    # unpivot the k per-group (n, 2R) pairs back to rows via an
    # explode of struct literals — group names enter as F.lit only
    grp = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(v).alias("g"),
                        F.col(f"n__{c}").alias("n_g"),
                        F.col(f"r2__{c}").alias("r2_g"),
                    )
                    for c, v in zip(gcols, gvals)
                ]
            )
        ).alias("_s")
    ).select("_s.g", "_s.n_g", "_s.r2_g")
    nn = grp.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    ).crossJoin(F.broadcast(agg.select("tie_term")))
    nd = F.col("n").cast("double")
    rbar = F.col("r2_g").cast("double") / (2 * F.col("n_g"))
    dev = rbar - (F.col("n") + 1) / F.lit(2.0)
    ss = (
        grp.crossJoin(F.broadcast(nn))
        .select(
            F.round(F.col("n_g") * dev * dev, 6)
            .cast("decimal(28,6)")
            .alias("term"),
            "n",
            "k",
            "tie_term",
        )
        .groupBy("n", "k", "tie_term")
        .agg(F.sum("term").alias("ss"))
    )
    h = F.lit(12.0) * F.col("ss").cast("double") / (nd * (F.col("n") + 1))
    c = F.lit(1.0) - F.col("tie_term").cast("double") / (nd * nd * nd - nd)
    hc = h / c
    # chi-square survival at df = k-1, built FROM the driver-side k so
    # p_value always matches the emitted df (ADVICE r11: the old form
    # hardcoded the df=4 polynomial while df floated with the data).
    # Even df has the exact closed form exp(-x/2)·Σ_{j<df/2}(x/2)^j/j!;
    # odd df would need the erf branch, which this corpus never takes —
    # fail loudly instead of silently mis-stating p.
    df = len(gvals) - 1
    if df < 2 or df % 2 != 0:
        raise ValueError(
            "stats_kruskal_wallis closed-form p-value requires even "
            f"df >= 2; got k={len(gvals)} groups (df={df}). Use the "
            "regularized-gamma survival for odd df."
        )
    fact = 1.0
    series = F.lit(1.0)
    for j in range(1, df // 2):
        fact *= j
        series = series + F.pow(hc / 2.0, F.lit(float(j))) / F.lit(fact)
    return ss.select(
        F.col("n").alias("n_total"),
        F.col("k").cast("int").alias("n_groups"),
        (F.col("k") - 1).cast("int").alias("df"),
        F.round(h, 6).alias("h_stat"),
        F.round(hc, 6).alias("h_corrected"),
        F.round(F.exp(-hc / 2.0) * series, 8).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test (daily volume, lags 1..8)
# ---------------------------------------------------------------------------

_LB_H = 8

_LB_SQL = f"""
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
              AS DOUBLE) AS num
  FROM UNNEST(range(1, {_LB_H + 1})) t(k)
  JOIN dd a ON TRUE JOIN dd b ON b.di = a.di + t.k CROSS JOIN muc
  GROUP BY t.k
), terms AS (
  SELECT SUM(CAST(ROUND(
           (numc.num / denc.den) * (numc.num / denc.den)
           / ((SELECT n_days FROM muc) - numc.lag_k), 12)
           AS DECIMAL(28,12))) AS tsum
  FROM numc CROSS JOIN denc
), q AS (
  SELECT CAST(n_days AS DOUBLE) * (n_days + 2)
           * CAST(tsum AS DOUBLE) AS q_raw,
         n_days
  FROM terms, muc
)
SELECT n_days, {_LB_H} AS df,
       ROUND(q_raw, 6) AS q_stat,
       ROUND(exp(-q_raw / 2.0)
             * (1.0 + q_raw / 2.0 + (q_raw / 2.0) * (q_raw / 2.0) / 2.0
                + (q_raw / 2.0) * (q_raw / 2.0) * (q_raw / 2.0) / 6.0), 8)
         AS p_value
FROM q
"""


@query("stats_ljung_box", oracle=_LB_SQL)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on daily event volume — "is the
    series white noise at lags 1..8, jointly?": Q = n(n+2)·Σ_k
    ρ̂_k²/(n−k), chi-square with df = 8 under H₀. The one-number
    model diagnostic on top of stats_autocorrelation_daily's per-lag
    curve — run it on forecast RESIDUALS and a significant Q says the
    model left structure on the table. Even df=8 gives the exact
    closed-form survival exp(−x/2)·Σ_{j<4}(x/2)^j/j! — identical
    double algebra on both engines, no incomplete gamma.

    Exactness: the ACF machinery is the attested lag-spine join
    (calendar-distance pairing, no LAG window); each ρ²/(n−k) term
    rounds to DECIMAL(28,12) before the 8-term sum.

    Scale: one day-grain count aggregate; the spine join runs on
    (days × 8) rows; the statistic folds on one row."""
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
    ks = ev.sparkSession.range(1, _LB_H + 1).select(
        F.col("id").alias("lag_k")
    )
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
        F.max("n_days").alias("n_days"),
    )
    rho = F.col("num") / F.col("den")
    terms = (
        num.crossJoin(F.broadcast(den))
        .select(
            F.round(rho * rho / (F.col("n_days") - F.col("lag_k")), 12)
            .cast("decimal(28,12)")
            .alias("term"),
            "n_days",
        )
        .groupBy("n_days")
        .agg(F.sum("term").alias("tsum"))
    )
    q = (
        F.col("n_days").cast("double")
        * (F.col("n_days") + 2)
        * F.col("tsum").cast("double")
    )
    x2 = q / 2.0
    return terms.select(
        "n_days",
        F.lit(_LB_H).alias("df"),
        F.round(q, 6).alias("q_stat"),
        F.round(
            F.exp(-x2)
            * (F.lit(1.0) + x2 + x2 * x2 / 2.0 + x2 * x2 * x2 / 6.0),
            8,
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Holm-Bonferroni step-down (FWER control over the BH z-test family)
# ---------------------------------------------------------------------------

_HOLM_ALPHA_NUM, _HOLM_ALPHA_DEN = 1, 20  # alpha = 0.05, cross-multiplied

_HOLM_SQL = f"""
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
), holm AS (
  SELECT a.brand, a.n, a.az, a.p_value, a.rank, a.m,
         LEAST(1.0, MAX((a.m - c.rank + 1) * c.p_value)) AS holm_p,
         MIN(CASE WHEN c.p_value * (a.m - c.rank + 1) * {_HOLM_ALPHA_DEN}
                       <= {_HOLM_ALPHA_NUM} THEN 1 ELSE 0 END) AS rej
  FROM rk a JOIN rk c ON c.rank <= a.rank
  GROUP BY a.brand, a.n, a.az, a.p_value, a.rank, a.m
)
SELECT brand, n, ROUND(az, 6) AS z_stat, p_value,
       CAST(rank AS INT) AS p_rank,
       ROUND(holm_p, 8) AS holm_p,
       rej = 1 AS rejected
FROM holm ORDER BY brand
"""


@query("stats_holm_bonferroni", oracle=_HOLM_SQL)
def stats_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm-Bonferroni step-down over the SAME per-brand z-test family
    as stats_benjamini_hochberg — the FWER-controlling sibling (no
    false positive at all with prob ≥ 1−α) beside BH's FDR control:
    order the m p-values ascending; reject while p(i) ≤ α/(m−i+1);
    the first failure stops everything after it. Adjusted p̃(i) =
    max_{j≤i} min(1, (m−j+1)·p(j)). Running both on one family is the
    standard analyst report (Holm for ship/no-ship, BH for triage).

    Exactness: p-values are the Zelen-Severo polynomial rounded to 8
    (identical on both engines); ranks and the prefix min/max ride
    TRIANGULAR JOINS over the brand-bounded frame (m = |brands| —
    catalog metadata, window-free); the step-down inequality is
    evaluated cross-multiplied in exact arithmetic (p·(m−i+1)·20 ≤ 1).

    Scale: one fact-dimension join + per-brand counts (map-side
    combined); everything after runs on m rows."""
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
    pv = zt.select(
        "brand", "n", "az",
        F.round(2.0 * _phi_tail_col(F.col("az")), 8).alias("p_value"),
    )
    a, c = pv.alias("a"), pv.alias("c")
    rk = (
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
    ra = rk.select(
        F.col("brand"), F.col("n"), F.col("az"), F.col("p_value"),
        F.col("rank"), F.col("m"),
    ).alias("ra")
    rc = rk.select(
        F.col("rank").alias("c_rank"), F.col("p_value").alias("c_p")
    ).alias("rc")
    holm = (
        ra.join(F.broadcast(rc), F.col("c_rank") <= F.col("rank"))
        .groupBy("brand", "n", "az", "p_value", "rank", "m")
        .agg(
            F.least(
                F.lit(1.0),
                F.max((F.col("m") - F.col("c_rank") + 1) * F.col("c_p")),
            ).alias("holm_p"),
            F.min(
                F.when(
                    F.col("c_p")
                    * (F.col("m") - F.col("c_rank") + 1)
                    * _HOLM_ALPHA_DEN
                    <= _HOLM_ALPHA_NUM,
                    1,
                ).otherwise(0)
            ).alias("rej"),
        )
    )
    return holm.select(
        "brand",
        "n",
        F.round("az", 6).alias("z_stat"),
        "p_value",
        F.col("rank").cast("int").alias("p_rank"),
        F.round("holm_p", 8).alias("holm_p"),
        (F.col("rej") == 1).alias("rejected"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# Degree assortativity of the co-activity graph
# ---------------------------------------------------------------------------

_ASSORT_SQL = """
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
  SELECT u AS nd, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u
), pairs AS (
  SELECT du.deg AS x, dv.deg AS y
  FROM sym JOIN deg du ON du.nd = sym.u JOIN deg dv ON dv.nd = sym.v
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS md,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pairs
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       CAST(md // 2 AS BIGINT) AS n_edges,
       ROUND((CAST(md AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(md AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(md AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS assortativity
FROM s
"""


@query("graph_degree_assortativity", oracle=_ASSORT_SQL)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the user
    co-activity graph (same edge build as graph_kcore_peel /
    graph_adamic_adar: an edge joins two users active in the same
    (event_type, hour) bucket): the Pearson correlation of endpoint
    degrees over DIRECTED edge occurrences (each undirected edge
    counted both ways — the standard symmetrization). Positive =
    hubs attach to hubs (social nets); negative = hub-and-spoke
    (infrastructure). The one-number structure summary next to
    k-core's global peel and the local clustering coefficient.

    Exactness: every moment (Σx, Σx², Σxy over directed edges) is an
    exact BIGINT sum of bounded integers; the correlation is one
    closed-form double chain at output — bit-identical engines.

    Scale: degrees are one edge-key aggregate; the moment pass is two
    hash joins of the edge list against the (node, degree) table —
    broadcastable, since nodes ≪ edges in any dense graph. The
    user_id < 150 slice bounds the bench, not the shape."""
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
        .select(
            F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v")
        )
        .distinct()
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("nd")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    du = deg.select(F.col("nd").alias("nu"), F.col("deg").alias("x"))
    dv = deg.select(F.col("nd").alias("nv"), F.col("deg").alias("y"))
    pairs = sym.join(F.broadcast(du), F.col("u") == F.col("nu")).join(
        F.broadcast(dv), F.col("v") == F.col("nv")
    )
    s = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("md"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    mdd = F.col("md").cast("double")
    num = mdd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        mdd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(mdd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    return nn.crossJoin(F.broadcast(s)).select(
        "n_nodes",
        (F.col("md") / 2).cast("bigint").alias("n_edges"),
        F.round(num / den, 6).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Good-Turing / Chao1 vocabulary richness report
# ---------------------------------------------------------------------------

_GT_SQL = """
WITH toks AS (
  SELECT t.term
  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
), tc AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY term
), fof AS (
  SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tc GROUP BY c
), scal AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM tc
), spine AS (
  SELECT CAST(t.r AS BIGINT) AS r FROM UNNEST(range(1, 6)) t(r)
)
SELECT spine.r,
       COALESCE(f1.n_r, 0) AS n_r,
       COALESCE(f2.n_r, 0) AS n_r_next,
       CASE WHEN COALESCE(f1.n_r, 0) > 0 THEN
         ROUND((spine.r + 1) * CAST(COALESCE(f2.n_r, 0) AS DOUBLE)
               / COALESCE(f1.n_r, 0), 6)
       END AS gt_adjusted_count,
       s.vocab AS vocab_size,
       s.n_tokens AS total_tokens,
       ROUND(s.vocab + CAST(s.n1 AS DOUBLE) * (s.n1 - 1)
             / (2.0 * (s.n2 + 1)), 4) AS chao1_richness,
       ROUND(1.0 - CAST(s.n1 AS DOUBLE) / s.n_tokens, 6) AS gt_coverage
FROM spine
LEFT JOIN fof f1 ON f1.r = spine.r
LEFT JOIN fof f2 ON f2.r = spine.r + 1
CROSS JOIN scal s
ORDER BY spine.r
"""


@query("text_good_turing_vocab", oracle=_GT_SQL)
def text_good_turing_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing + Chao1 species richness over
    the corpus vocabulary — the unseen-mass estimators beside
    text_heaps_law's growth curve and text_vocab_hapax_stats' raw
    counts: from the frequency-of-frequencies N_r, the GT adjusted
    count r* = (r+1)·N_{r+1}/N_r for r = 1..5, the missing-mass
    coverage estimate 1 − N_1/N (what fraction of the next token
    stream is already-seen vocabulary), and the bias-corrected Chao1
    total-vocabulary estimate V + N_1(N_1−1)/(2(N_2+1)). The
    "how much tail is left" report that decides whether more data
    still buys vocabulary.

    Exactness: N_r, V, N are exact integer aggregates; every derived
    statistic is one closed-form double chain at output.

    Scale: token explode → one term-key count (map-side combined) →
    a frequency-of-frequencies aggregate whose domain is tiny; the
    report joins a 5-row literal spine against it."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    tc = toks.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    fof = tc.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    )
    scal = tc.agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    spine = d.sparkSession.range(1, 6).select(F.col("id").alias("r"))
    f1 = fof.select(F.col("r").alias("r1"), F.col("n_r").alias("nr1"))
    f2 = fof.select(F.col("r").alias("r2"), F.col("n_r").alias("nr2"))
    out = (
        spine.join(F.broadcast(f1), F.col("r1") == F.col("r"), "left")
        .join(F.broadcast(f2), F.col("r2") == F.col("r") + 1, "left")
        .crossJoin(F.broadcast(scal))
    )
    n_r = F.coalesce(F.col("nr1"), F.lit(0))
    n_rn = F.coalesce(F.col("nr2"), F.lit(0))
    return out.select(
        "r",
        n_r.alias("n_r"),
        n_rn.alias("n_r_next"),
        F.when(
            n_r > 0,
            F.round((F.col("r") + 1) * n_rn.cast("double") / n_r, 6),
        ).alias("gt_adjusted_count"),
        F.col("vocab").alias("vocab_size"),
        F.col("n_tokens").alias("total_tokens"),
        F.round(
            F.col("vocab")
            + F.col("n1").cast("double")
            * (F.col("n1") - 1)
            / (2.0 * (F.col("n2") + 1)),
            4,
        ).alias("chao1_richness"),
        F.round(
            F.lit(1.0) - F.col("n1").cast("double") / F.col("n_tokens"), 6
        ).alias("gt_coverage"),
    ).orderBy("r")


# ---------------------------------------------------------------------------
# Post-stratification A/B effect estimator
# ---------------------------------------------------------------------------

_PS_SQL = """
WITH s AS (
  SELECT event_type AS g,
         CAST(('0x' || substring(md5('11:' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS arm,
         value AS y
  FROM events WHERE value IS NOT NULL
), cell AS (
  SELECT g,
         CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS na,
         CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS nb,
         SUM(CASE WHEN arm = 0 THEN CAST(y AS DECIMAL(28,8)) END) AS s1a,
         SUM(CASE WHEN arm = 1 THEN CAST(y AS DECIMAL(28,8)) END) AS s1b,
         SUM(CASE WHEN arm = 0 THEN CAST(y AS DECIMAL(28,8))
                                    * CAST(y AS DECIMAL(28,8)) END) AS s2a,
         SUM(CASE WHEN arm = 1 THEN CAST(y AS DECIMAL(28,8))
                                    * CAST(y AS DECIMAL(28,8)) END) AS s2b
  FROM s GROUP BY g
), nn AS (
  SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb,
         SUM(s1a) AS t1a, SUM(s1b) AS t1b, SUM(s2a) AS t2a, SUM(s2b) AS t2b
  FROM cell
), terms AS (
  SELECT
    SUM(CAST(ROUND(
      (CAST(na + nb AS DOUBLE) / (ta + tb))
      * (CAST(s1a AS DOUBLE) / na - CAST(s1b AS DOUBLE) / nb), 12)
      AS DECIMAL(28,12))) AS delta_ps,
    SUM(CAST(ROUND(
      (CAST(na + nb AS DOUBLE) / (ta + tb))
      * (CAST(na + nb AS DOUBLE) / (ta + tb))
      * (((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE)
             / na) / (na - 1)) / na
         + ((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE)
             / nb) / (nb - 1)) / nb), 14)
      AS DECIMAL(28,14))) AS var_ps
  FROM cell CROSS JOIN nn
), raw AS (
  SELECT ta, tb,
         CAST(t1a AS DOUBLE) / ta - CAST(t1b AS DOUBLE) / tb AS delta_raw,
         ((CAST(t2a AS DOUBLE) - CAST(t1a AS DOUBLE) * CAST(t1a AS DOUBLE)
             / ta) / (ta - 1)) / ta
         + ((CAST(t2b AS DOUBLE) - CAST(t1b AS DOUBLE) * CAST(t1b AS DOUBLE)
             / tb) / (tb - 1)) / tb AS var_raw
  FROM nn
)
SELECT ta AS n_a, tb AS n_b,
       ROUND(delta_raw, 6) AS delta_raw,
       ROUND(sqrt(var_raw), 8) AS se_raw,
       ROUND(CAST(delta_ps AS DOUBLE), 6) AS delta_ps,
       ROUND(sqrt(CAST(var_ps AS DOUBLE)), 8) AS se_ps,
       ROUND(100.0 * (1.0 - CAST(var_ps AS DOUBLE) / var_raw), 2)
         AS var_reduction_pct
FROM raw CROSS JOIN terms
"""


@query("ab_post_stratification", oracle=_PS_SQL)
def ab_post_stratification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified A/B effect estimate (Miratrix et al. 2013) —
    the variance-reduction you get for FREE after randomization, no
    pre-period data required (CUPED's sibling: CUPED needs a
    covariate; post-stratification only needs a categorical
    stratum): Δ_ps = Σ_s w_s(ȳ_sa − ȳ_sb) with pooled stratum
    weights w_s = n_s/N and Var = Σ_s w_s²(s²_sa/n_sa + s²_sb/n_sb),
    vs the raw difference-in-means. Arms are the md5('11:'|user)
    hash split shared with ab_msprt_always_valid; strata are the
    five event types. The emitted var_reduction_pct IS the payoff
    readout — how much narrower the CI got for one GROUP BY.

    Exactness: per-(stratum, arm) moments are exact decimal/integer
    sums (map-side combined); each stratum's Δ and variance term
    rounds to decimal before the k-term fold; the raw estimator runs
    on the decimal-sum totals — double algebra only at output.

    Scale: ONE (stratum, arm)-key aggregate over the fact table (10
    cells); everything after is cell-frame algebra."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("11"), F.col("user_id"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    s = ev.select(
        F.col("event_type").alias("g"),
        arm.alias("arm"),
        F.col("value").alias("y"),
    )
    yd = F.col("y").cast("decimal(28,8)")
    cell = s.groupBy("g").agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("na"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("nb"),
        F.sum(F.when(F.col("arm") == 0, yd)).alias("s1a"),
        F.sum(F.when(F.col("arm") == 1, yd)).alias("s1b"),
        F.sum(F.when(F.col("arm") == 0, yd * yd)).alias("s2a"),
        F.sum(F.when(F.col("arm") == 1, yd * yd)).alias("s2b"),
    )
    nn = cell.agg(
        F.sum("na").cast("bigint").alias("ta"),
        F.sum("nb").cast("bigint").alias("tb"),
        F.sum("s1a").alias("t1a"),
        F.sum("s1b").alias("t1b"),
        F.sum("s2a").alias("t2a"),
        F.sum("s2b").alias("t2b"),
    )
    j = cell.crossJoin(F.broadcast(nn))
    w = (F.col("na") + F.col("nb")).cast("double") / (
        F.col("ta") + F.col("tb")
    )
    ma = F.col("s1a").cast("double") / F.col("na")
    mb = F.col("s1b").cast("double") / F.col("nb")
    va = (
        F.col("s2a").cast("double")
        - F.col("s1a").cast("double") * F.col("s1a").cast("double") / F.col("na")
    ) / (F.col("na") - 1)
    vb = (
        F.col("s2b").cast("double")
        - F.col("s1b").cast("double") * F.col("s1b").cast("double") / F.col("nb")
    ) / (F.col("nb") - 1)
    terms = j.select(
        F.round(w * (ma - mb), 12).cast("decimal(28,12)").alias("dt"),
        F.round(w * w * (va / F.col("na") + vb / F.col("nb")), 14)
        .cast("decimal(28,14)")
        .alias("vt"),
    ).agg(F.sum("dt").alias("delta_ps"), F.sum("vt").alias("var_ps"))
    tma = F.col("t1a").cast("double") / F.col("ta")
    tmb = F.col("t1b").cast("double") / F.col("tb")
    tva = (
        F.col("t2a").cast("double")
        - F.col("t1a").cast("double") * F.col("t1a").cast("double") / F.col("ta")
    ) / (F.col("ta") - 1)
    tvb = (
        F.col("t2b").cast("double")
        - F.col("t1b").cast("double") * F.col("t1b").cast("double") / F.col("tb")
    ) / (F.col("tb") - 1)
    raw = nn.select(
        F.col("ta").alias("n_a"),
        F.col("tb").alias("n_b"),
        (tma - tmb).alias("delta_raw"),
        (tva / F.col("ta") + tvb / F.col("tb")).alias("var_raw"),
    )
    return raw.crossJoin(F.broadcast(terms)).select(
        "n_a",
        "n_b",
        F.round("delta_raw", 6).alias("delta_raw"),
        F.round(F.sqrt("var_raw"), 8).alias("se_raw"),
        F.round(F.col("delta_ps").cast("double"), 6).alias("delta_ps"),
        F.round(F.sqrt(F.col("var_ps").cast("double")), 8).alias("se_ps"),
        F.round(
            100.0
            * (F.lit(1.0) - F.col("var_ps").cast("double") / F.col("var_raw")),
            2,
        ).alias("var_reduction_pct"),
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic near-dup pruning via k-means cluster blocking
# ---------------------------------------------------------------------------

_SEM_THETA = "0.30"  # cosine epsilon, calibrated to this corpus (p99)


def _semdedup_oracle() -> str:
    """DuckDB CTE unroll: the identical fixed-point Lloyd fixpoint as
    queries/similarity.py:_kmeans_oracle (k=8, 4 iters, FLOOR·1e12
    BIGINT distances, lowest-id init), extended past the final
    assignment with the within-cluster fixed-point cosine pair scan."""
    from ibd_pipeline_spark.queries.similarity import (
        _KM_DIM,
        _KM_ITERS,
        _KM_K,
    )

    def dist(e: str, c: str) -> str:
        return (
            f"(SELECT SUM(CAST(FLOOR(({e}.v[i]-{c}.cv[i])*({e}.v[i]-{c}.cv[i])"
            f" * 1000000000000.0) AS BIGINT))"
            f" FROM UNNEST(generate_series(1,{_KM_DIM})) t(i))"
        )

    parts = [f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cent_id,
         v AS cv
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings ORDER BY vec_id LIMIT {_KM_K})
)"""]
    for r in range(1, _KM_ITERS + 1):
        parts.append(f""",
a{r} AS (
  SELECT e.vec_id, e.v, c.cent_id, {dist('e', 'c')} AS d
  FROM e CROSS JOIN c{r - 1} c
), b{r} AS (
  SELECT vec_id, v, cent_id, d,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
  FROM a{r}
), m{r} AS (
  SELECT cent_id, i AS pos,
         CAST(SUM(CAST(FLOOR(v[i] * 100000000.0) AS BIGINT)) AS DOUBLE)
           / (100000000.0 * COUNT(*)) AS m
  FROM b{r}, UNNEST(generate_series(1,{_KM_DIM})) t(i)
  WHERE rn = 1 GROUP BY cent_id, i
), c{r} AS (
  SELECT p.cent_id, COALESCE(n.cv, p.cv) AS cv
  FROM c{r - 1} p LEFT JOIN (
    SELECT cent_id, list(m ORDER BY pos) AS cv FROM m{r} GROUP BY cent_id
  ) n USING (cent_id)
)""")
    parts.append(f""",
fa AS (
  SELECT e.vec_id, c.cent_id, {dist('e', 'c')} AS d
  FROM e CROSS JOIN c{_KM_ITERS} c
), fb AS (
  SELECT vec_id, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
  FROM fa
), asg AS (
  SELECT vec_id, cent_id FROM fb WHERE rn = 1
), nf AS (
  SELECT e.vec_id,
         (SELECT SUM(CAST(FLOOR(e.v[i] * e.v[i] * 1000000000000.0)
                          AS BIGINT))
          FROM UNNEST(generate_series(1,{_KM_DIM})) t(i)) AS nfp
  FROM e
), pairs AS (
  SELECT aa.cent_id, aa.vec_id AS ia, ab.vec_id AS ib,
         ROUND(
           CAST((SELECT SUM(CAST(FLOOR(ea.v[i] * eb.v[i] * 1000000000000.0)
                                 AS BIGINT))
                 FROM UNNEST(generate_series(1,{_KM_DIM})) t(i)) AS DOUBLE)
           / sqrt(CAST(na.nfp AS DOUBLE) * CAST(nb.nfp AS DOUBLE)), 9)
           AS cs
  FROM asg aa JOIN asg ab
    ON aa.cent_id = ab.cent_id AND aa.vec_id < ab.vec_id
  JOIN e ea ON ea.vec_id = aa.vec_id
  JOIN e eb ON eb.vec_id = ab.vec_id
  JOIN nf na ON na.vec_id = aa.vec_id
  JOIN nf nb ON nb.vec_id = ab.vec_id
), pc AS (
  SELECT cent_id,
         CAST(COUNT(*) FILTER (cs >= {_SEM_THETA}) AS BIGINT) AS n_dup_pairs,
         CAST(COUNT(DISTINCT CASE WHEN cs >= {_SEM_THETA} THEN ib END)
              AS BIGINT) AS n_pruned,
         ROUND(MAX(cs), 6) AS max_cos
  FROM pairs GROUP BY cent_id
), mem AS (
  SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_members FROM asg
  GROUP BY cent_id
)
SELECT mem.cent_id AS cluster_id, mem.n_members,
       COALESCE(pc.n_dup_pairs, 0) AS n_dup_pairs,
       COALESCE(pc.n_pruned, 0) AS n_pruned,
       mem.n_members - COALESCE(pc.n_pruned, 0) AS n_kept,
       pc.max_cos
FROM mem LEFT JOIN pc USING (cent_id)
ORDER BY cluster_id""")
    return "".join(parts)


@query("dedup_semantic_clusters", oracle=_semdedup_oracle)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning
    with K-MEANS CLUSTER BLOCKING — assign every embedding to a
    centroid (the attested fixed-point Lloyd,
    operators/similarity.py:kmeans_attested — k=8, 4 iters, same
    fixpoint similarity_kmeans_clusters replays), then compare pairs
    ONLY within a cluster and prune any vector with a smaller-id
    neighbor at cosine ≥ ε (ε = 0.30, this corpus's p99). The
    published recipe that cut LAION/C4 30-50% with no quality loss —
    and the third dedup regime in the registry: exact (md5), lexical
    near-dup (MinHash/SimHash), SEMANTIC near-dup (embeddings catch
    paraphrases that share no n-grams).

    Exactness: cluster assignment is the bit-deterministic attested
    fixpoint; pair cosines quantize every dot/norm term by
    FLOOR(·10¹²) into BIGINT sums (order-independent), one double
    division + ROUND(·,9) per pair; the ε compare runs on the
    rounded value, so both engines keep identical pair sets.

    Scale: the cluster self-join bounds candidate pairs at
    Σ_c |c|²/2, never corpus-quadratic; the operator's DEFAULT
    (operators/dedup.py:semdedup_pairs, k=None) derives
    k = max(k_min, ceil(n/target_cluster_size)) — the published
    k ∝ n contract that keeps per-cluster work flat (probe-measured
    linear; fixed k measured quadratic). THIS query pins k = 8
    explicitly because its DuckDB oracle unrolls that exact
    fixpoint. The n·dim dot work stays JVM-side (zip_with/aggregate
    codegen, no UDF)."""
    from ibd_pipeline_spark.operators.dedup import semdedup_pairs
    from ibd_pipeline_spark.queries.similarity import _KM_ITERS, _KM_K

    emb = load(spark, sf_dir, "embeddings")
    # session-cached: shares the one attested Lloyd fixpoint with
    # similarity_kmeans_clusters (same key, same frame)
    pairs = semdedup_pairs(
        emb,
        epsilon=float(_SEM_THETA),
        k=_KM_K,
        iters=_KM_ITERS,
        cache_key=("kmeans_attested", _KM_K, _KM_ITERS),
    )
    assigned = pairs._assigned
    theta = float(_SEM_THETA)
    pc = pairs.groupBy("cluster_id").agg(
        F.count(F.when(F.col("cs") >= theta, 1))
        .cast("bigint")
        .alias("n_dup_pairs"),
        F.countDistinct(F.when(F.col("cs") >= theta, F.col("ib")))
        .cast("bigint")
        .alias("n_pruned"),
        F.round(F.max("cs"), 6).alias("max_cos"),
    )
    mem = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return (
        mem.join(F.broadcast(pc), "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_pruned", F.lit(0)).alias("n_pruned"),
            (F.col("n_members") - F.coalesce("n_pruned", F.lit(0))).alias(
                "n_kept"
            ),
            "max_cos",
        )
        .orderBy("cluster_id")
    )
