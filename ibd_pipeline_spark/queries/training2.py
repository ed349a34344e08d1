"""Training-data assembly, wave 3 (round 5): weighted reservoir
sampling (A-Res / Efraimidis–Spirakis) and per-source nucleus (top-p)
filtering — the two sampling primitives between the registry's
uniform hash gates (stratified_hash_sample, train_lang_balanced_quota)
and its temperature reweighting (train_source_temperature): sample
*proportional to a per-document weight* without replacement, and keep
*the smallest set carrying p of the quality mass*.

Randomness discipline: as everywhere in the registry, 'random' means
md5-derived — u(doc) is a pure function of the data, so both engines
draw the SAME sample and the driver's hash compare is exact; at
100 TB the draw is partitioning-invariant and rerun-stable, which is
what makes a training mix reproducible.

Reference parity note: no analog in the reference engine; SURVEY.md
§2.2 sampling/training-data families.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# md5-uniform in (0, 1]: (first-8-hex-digits + 1) / (2^32 + 1).
_U_SQL = (
    "(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " + 1) / 4294967297.0"
)

_ARES_SQL = f"""
WITH w AS (
  SELECT doc_id, source, n_chars,
         CAST(n_chars AS DOUBLE) AS wt,
         {_U_SQL} AS u
  FROM documents
), r AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY (-ln(u) / wt), doc_id) AS rk
  FROM w
)
SELECT source, doc_id, n_chars, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 5
ORDER BY source, rk
"""


@query("train_weighted_sample_ares", oracle=_ARES_SQL)
def train_weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, 5 docs per source,
    inclusion probability ∝ n_chars (the length-weighted draw that
    token-budget mixes need: sampling documents uniformly
    under-represents long documents' tokens). A-Res: each row draws
    one md5-uniform u and scores -ln(u)/w; the k smallest scores per
    group are exactly a w-weighted draw without replacement
    (Efraimidis–Spirakis 2006) — one window, no iteration, no
    rejection loop.

    Both engines compute the identical score (md5 → one add, one
    divide, one ln, one divide — deterministic IEEE chain), and the
    score itself never leaves the plan: the output is the selected
    (source, doc_id) rows, so there is no float in the hash compare.

    Scale: one shuffle on source (the group key); per-group state is
    the running top-k — at a billion docs per source you'd pre-prune
    with a per-partition top-k before the shuffle (TakeOrdered's
    combiner does this for the global case; per-group, add a salted
    two-stage top-k), noted per the no-silent-caps rule."""
    d = load(spark, sf_dir, "documents")
    u = (
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            + 1
        )
        / F.lit(4294967297.0)
    )
    scored = d.select(
        "source",
        "doc_id",
        "n_chars",
        (-F.log(u) / F.col("n_chars").cast("double")).alias("score"),
    )
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "n_chars", F.col("rk").cast("int").alias("rk"))
        .orderBy("source", "rk")
    )


_NUCLEUS_SQL = """
WITH s AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS mass
  FROM documents
), c AS (
  SELECT source, doc_id, mass,
         SUM(mass) OVER (PARTITION BY source
                         ORDER BY mass DESC, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_mass,
         SUM(mass) OVER (PARTITION BY source) AS tot_mass
  FROM s
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(mass) AS BIGINT) AS kept_mass,
       CAST(MAX(tot_mass) AS BIGINT) AS tot_mass
FROM c
WHERE 10 * (cum_mass - mass) < 9 * tot_mass
GROUP BY source
ORDER BY source
"""


@query("train_nucleus_topp_per_source", oracle=_NUCLEUS_SQL)
def train_nucleus_topp_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) filtering per source: keep the smallest set of
    documents — taken in decreasing mass order — whose cumulative mass
    reaches 90% of the source's total; everything after the crossing
    is the long tail a curation pass drops. A document is kept while
    the mass BEFORE it is under the threshold (so the crossing doc is
    included, the standard top-p convention).

    The 90% threshold is the exact integer comparison
    10·(cum−mass) < 9·tot — masses are integers, so no quotient and
    no float anywhere in the predicate or the output.

    Scale: one shuffle on source; the cumulative window is
    per-source, and the two window sums share the single partition
    pass (same partition key, compatible frames)."""
    d = load(spark, sf_dir, "documents")
    s = d.select("doc_id", "source", F.col("n_chars").cast("bigint").alias("mass"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("mass").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("source")
    c = s.select(
        "source",
        "mass",
        F.sum("mass").over(w_cum).alias("cum_mass"),
        F.sum("mass").over(w_all).alias("tot_mass"),
    )
    return (
        c.filter(
            10 * (F.col("cum_mass") - F.col("mass")) < 9 * F.col("tot_mass")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("mass").cast("bigint").alias("kept_mass"),
            F.max("tot_mass").cast("bigint").alias("tot_mass"),
        )
        .orderBy("source")
    )


def _bpe_round(inp: str, out: str, k: int, learn: bool) -> str:
    """One greedy BPE merge round as SQL CTEs: position explode →
    (learn only) argmax pair → run-parity match selection → rebuild.
    The greedy left-to-right fold (operators/bpe.py:merge_pair) is
    equivalent to choosing the 1st, 3rd, 5th… position of every
    maximal run of consecutive matches — a gaps-and-islands window,
    no recursion needed. All CTEs MATERIALIZED: each is referenced
    twice downstream (the label-prop lesson)."""
    sep = "▁"
    p, ch = f"{out}_pos", f"{out}_ch"
    blocks = [
        f"""{p} AS MATERIALIZED (
  SELECT doc_id, i, syms[i] AS s, syms[i+1] AS nxt
  FROM {inp}, unnest(generate_series(1, len(syms))) AS t(i)
)"""
    ]
    if learn:
        blocks.append(f"""best{k} AS MATERIALIZED (
  SELECT s AS l, nxt AS r, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {p} WHERE nxt IS NOT NULL
  GROUP BY s, nxt
  ORDER BY cnt DESC, s || '{sep}' || nxt
  LIMIT 1
)""")
    blocks.append(f"""{ch} AS MATERIALIZED (
  SELECT doc_id, i, (rk % 2 = 1) AS chosen FROM (
    SELECT doc_id, i,
           ROW_NUMBER() OVER (PARTITION BY doc_id, isl ORDER BY i) AS rk
    FROM (
      SELECT m.doc_id, m.i,
             m.i - ROW_NUMBER() OVER (PARTITION BY m.doc_id ORDER BY m.i)
               AS isl
      FROM {p} m CROSS JOIN best{k} b
      WHERE m.s = b.l AND m.nxt = b.r) a) b
)""")
    blocks.append(f"""{out} AS MATERIALIZED (
  SELECT doc_id, list(sym ORDER BY i) AS syms FROM (
    SELECT p.doc_id, p.i,
           CASE WHEN COALESCE(c.chosen, FALSE)
                THEN p.s || '{sep}' || p.nxt ELSE p.s END AS sym
    FROM {p} p
    LEFT JOIN {ch} c  ON c.doc_id = p.doc_id AND c.i = p.i
    LEFT JOIN {ch} cp ON cp.doc_id = p.doc_id AND cp.i = p.i - 1
    WHERE NOT COALESCE(cp.chosen, FALSE)) x
  GROUP BY doc_id
)""")
    return ",\n".join(blocks)


def _bpe_oracle() -> str:
    """train_bpe_learn_apply unrolled to SQL: 6 learn rounds on the
    5% sample (argmax tie = concatenated-pair string, byte order in
    both engines) + 6 apply rounds over the whole corpus reusing the
    learned best{k}, then the before/after symbol totals. Assumes
    the sample never exhausts (6 merges over a word-soup corpus) —
    the operator's empty-best early exit is unreachable here."""
    learn = ",\n".join(
        _bpe_round(f"s{k - 1}", f"s{k}", k, learn=True) for k in range(1, 7)
    )
    apply_ = ",\n".join(
        _bpe_round("docs" if k == 1 else f"a{k - 1}", f"a{k}", k, learn=False)
        for k in range(1, 7)
    )
    merges = "\n  UNION ALL ".join(
        f"SELECT {k} AS rank, l, r, cnt FROM best{k}" for k in range(1, 7)
    )
    return f"""
WITH docs AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS syms FROM documents
), s0 AS MATERIALIZED (
  SELECT doc_id, syms FROM docs WHERE doc_id % 20 = 0
),
{learn},
{apply_},
tot AS (
  SELECT (SELECT CAST(SUM(len(syms)) AS BIGINT) FROM docs)
           AS total_syms_before,
         (SELECT CAST(SUM(len(syms)) AS BIGINT) FROM a6)
           AS total_syms_after
)
SELECT m.rank, m.l AS "left", m.r AS "right", m.cnt AS pair_freq,
       t.total_syms_before, t.total_syms_after
FROM ({merges}) m CROSS JOIN tot t
ORDER BY m.rank
"""


@query("train_bpe_learn_apply", oracle=_bpe_oracle)
def train_bpe_learn_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full tokenizer-training loop (operators/bpe.py): LEARN the
    top-6 greedy BPE merges on a 5% sample (doc_id % 20 == 0 — merge
    learning is inherently iterative, so it runs on a sample, exactly
    as production tokenizer trainers do), then APPLY the merge table
    to the WHOLE corpus as one scan-only projection (6 nested greedy
    folds per row, rank order, zero shuffle). Output: the merge table
    (rank, left, right, pair_freq) with the corpus-wide compression it
    achieved (total symbols before/after) on every row.

    Rows-only: the learning loop is an iterative fixpoint (kmeans/
    pagerank class); greedy semantics, determinism, losslessness, and
    identity-at-zero-merges are property-tested in tests/test_bpe.py.
    """
    from ibd_pipeline_spark.operators.bpe import bpe_apply, bpe_learn

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe_learn(d.filter(F.col("doc_id") % 20 == 0), n_merges=6)
    applied = bpe_apply(d, merges)
    totals = applied.agg(
        F.sum("n_syms_before").cast("bigint").alias("total_syms_before"),
        F.sum("n_syms_after").cast("bigint").alias("total_syms_after"),
    )
    return (
        merges.crossJoin(F.broadcast(totals))
        .select(
            "rank", "left", "right", "pair_freq",
            "total_syms_before", "total_syms_after",
        )
        .orderBy("rank")
    )



_WATERFILL_SQL = """
WITH src AS (
  SELECT source,
         CAST(SUM(n_chars) AS BIGINT) AS w,
         CAST(1 + (CAST(SUBSTRING(source, 4) AS INT) % 3) AS BIGINT) AS e_max
  FROM documents GROUP BY source
), budgeted AS (
  SELECT *, CAST((17 * (SELECT SUM(w) FROM src)) // 10 AS BIGINT) AS b,
         w * e_max AS cap
  FROM src
), ranked AS (
  SELECT *,
         SUM(cap) OVER (ORDER BY e_max, source
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS capsum_incl,
         SUM(w) OVER (ORDER BY e_max, source
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS w_from_here
  FROM budgeted
), lvl AS (
  SELECT MIN(capsum_incl - cap) AS capsum_before,
         ARG_MIN(w_from_here, capsum_incl - cap) AS w_rest
  FROM ranked
  WHERE b - (capsum_incl - cap) < e_max * w_from_here
)
SELECT r.source, r.w AS tokens, r.e_max,
       CASE WHEN l.capsum_before IS NULL THEN r.cap
            WHEN r.capsum_incl - r.cap < l.capsum_before THEN r.cap
            ELSE CAST((r.w * (r.b - l.capsum_before)) // l.w_rest AS BIGINT)
       END AS alloc_tokens
FROM ranked r CROSS JOIN lvl l
ORDER BY r.source
"""


@query("train_epoch_waterfill", oracle=_WATERFILL_SQL)
def train_epoch_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget waterfilling across sources with per-source epoch
    caps — the mixture-planning step when the training budget exceeds
    one pass over the corpus: every source is sampled proportionally
    to its size (one shared 'water level' λ of epochs) EXCEPT sources
    already at their repetition cap (quality tiers get e_max 1–3,
    derived deterministically from the source id), whose surplus
    redistributes to the rest. Closed form via ONE sort instead of
    iteration: order sources by e_max; the level sits at the first
    source whose cap no longer binds, found with the exact integer
    predicate b − capped_prefix < e_max · remaining_weight; capped
    sources take cap, the rest take w·(b−capped_prefix) DIV w_rest.
    Budget = 1.7× corpus tokens, so tier-1 caps bind and higher tiers
    absorb the surplus — both branches exercised (the all-capped
    branch, level frame all-NULL, is covered by the property test).

    Everything is exact integer arithmetic — the one division is
    integer DIV in both engines (Spark `div`, DuckDB `//`), so the
    oracle match is exact at any scale (no double, no 2⁵³ ceiling).

    Scale: one per-source aggregate (the corpus-sized work), then
    windows over the SOURCE frame — thousands of rows at worst. The
    allocation table is the small broadcast input the samplers
    (A-Res, quota) consume.
    """
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("w"),
        (1 + F.substring("source", 4, 10).cast("int") % 3)
        .cast("bigint")
        .alias("e_max"),
    )
    tot = src.agg(
        F.expr("CAST(17 * SUM(w) DIV 10 AS BIGINT)").alias("b")
    )
    budgeted = src.crossJoin(F.broadcast(tot)).withColumn(
        "cap", F.col("w") * F.col("e_max")
    )
    w_cum = Window.orderBy("e_max", "source").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_rest_w = Window.orderBy("e_max", "source").rowsBetween(
        0, Window.unboundedFollowing
    )
    ranked = budgeted.select(
        "*",
        F.sum("cap").over(w_cum).alias("capsum_incl"),
        F.sum("w").over(w_rest_w).alias("w_from_here"),
    )
    lvl = ranked.filter(
        F.col("b") - (F.col("capsum_incl") - F.col("cap"))
        < F.col("e_max") * F.col("w_from_here")
    ).agg(
        F.min(F.col("capsum_incl") - F.col("cap")).alias("capsum_before"),
        F.min_by(
            F.col("w_from_here"), F.col("capsum_incl") - F.col("cap")
        ).alias("w_rest"),
    )
    r = ranked.crossJoin(F.broadcast(lvl))
    alloc = (
        F.when(F.col("capsum_before").isNull(), F.col("cap"))
        .when(F.col("capsum_incl") - F.col("cap") < F.col("capsum_before"), F.col("cap"))
        .otherwise(
            F.expr("CAST(w * (b - capsum_before) DIV w_rest AS BIGINT)")
        )
    )
    return (
        r.select(
            "source",
            F.col("w").alias("tokens"),
            "e_max",
            alloc.alias("alloc_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Bigram language-model perplexity (train/held-out split by doc parity)
# ---------------------------------------------------------------------------

_BIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
), grams AS (
  SELECT doc_id, source, l[i] AS w1, l[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(l))) t(i)
), train_big AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM grams WHERE doc_id % 2 = 0 GROUP BY w1, w2
), train_ctx AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM train_big GROUP BY w1
), vocab AS (
  SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM train_big
), scored AS (
  SELECT g.doc_id, g.source,
         CAST(ln((COALESCE(tb.c12, 0) + 1.0)
                 / (COALESCE(tc.c1, 0) + (SELECT v FROM vocab)))
              AS DECIMAL(28,10)) AS lp
  FROM grams g
  LEFT JOIN train_big tb ON tb.w1 = g.w1 AND tb.w2 = g.w2
  LEFT JOIN train_ctx tc ON tc.w1 = g.w1
  WHERE g.doc_id % 2 = 1
), per_src AS (
  SELECT source,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(ROUND(SUM(lp), 6) AS DOUBLE) AS lp_sum
  FROM scored GROUP BY source
)
SELECT source, n_docs, n_bigrams,
       ROUND(-lp_sum / n_bigrams, 6) AS cross_entropy_nats,
       ROUND(exp(-lp_sum / n_bigrams), 4) AS perplexity
FROM per_src ORDER BY source
"""


@query("train_bigram_perplexity", oracle=_BIGRAM_SQL)
def train_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram-LM perplexity per source: train an add-1-
    smoothed bigram model on even doc_ids, score odd doc_ids —
    P(w₂|w₁) = (c(w₁,w₂)+1)/(c(w₁)+V) — and report per-source
    cross-entropy and perplexity. The corpus-quality readout one
    level up from train_unigram_logprob_score: bigram surprise
    catches scrambled/boilerplate text a unigram model scores as
    fluent, and per-source perplexity is the standard "which crawl
    slice is OOD for my model" ranking.

    Exactness: counts and V are exact integers; each bigram's
    log-probability is one identical double ln() chain
    decimal-quantized before the per-source fold.

    Scale: gram-postings joins (the DSIR/decontamination shape) —
    the bigram table is vocab²-bounded and Zipf-small; the held-out
    stream left-joins it on the gram key (broadcastable once
    thresholded); no data-sized state anywhere."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
    )
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.zip_with(
                F.slice("l", 1, F.greatest(F.size("l") - 1, F.lit(0))),
                F.slice("l", 2, F.greatest(F.size("l") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("g"),
    ).select("doc_id", "source", "g.w1", "g.w2")
    train_big = (
        grams.filter(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    train_ctx = train_big.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1")
    )
    vocab = train_big.agg(
        F.countDistinct("w2").cast("bigint").alias("v")
    )
    scored = (
        grams.filter(F.col("doc_id") % 2 == 1)
        .join(train_big, ["w1", "w2"], "left")
        .join(train_ctx, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "source",
            F.log(
                (F.coalesce("c12", F.lit(0)) + 1.0)
                / (F.coalesce("c1", F.lit(0)) + F.col("v"))
            )
            .cast("decimal(28,10)")
            .alias("lp"),
        )
    )
    per_src = scored.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.sum("lp"), 6).cast("double").alias("lp_sum"),
    )
    return per_src.select(
        "source",
        "n_docs",
        "n_bigrams",
        F.round(-F.col("lp_sum") / F.col("n_bigrams"), 6).alias(
            "cross_entropy_nats"
        ),
        F.round(F.exp(-F.col("lp_sum") / F.col("n_bigrams")), 4).alias(
            "perplexity"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Rendezvous (HRW) sharding of the document corpus (r13)
# ---------------------------------------------------------------------------

_N_SHARDS = 8

_RENDEZVOUS_SQL = f"""
WITH w AS (
  SELECT doc_id, s.shard,
         CAST(('0x' || substring(md5('hrw13:' || CAST(s.shard AS VARCHAR)
                                  || ':' || CAST(doc_id AS VARCHAR)),
                                 1, 15)) AS BIGINT) AS wt
  FROM documents
  CROSS JOIN (SELECT UNNEST(range(0, {_N_SHARDS})) AS shard) s
), pick AS (
  SELECT doc_id, shard FROM (
    SELECT doc_id, shard,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY wt DESC, shard) AS rk
    FROM w) WHERE rk = 1
), sizes AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pick GROUP BY shard
), tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM sizes
)
SELECT shard, n_docs,
       ROUND(CAST(n_docs AS DOUBLE) * {_N_SHARDS} / n, 6) AS balance_ratio
FROM sizes CROSS JOIN tot ORDER BY shard
"""


@query("train_rendezvous_sharding", oracle=_RENDEZVOUS_SQL)
def train_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding of the corpus
    across 8 shards: every document hashes once per shard and lands
    on its argmax weight — the assignment that moves only 1/(n+1) of
    keys when a shard is added (Thaler–Ravishankar 1996), which plain
    `hash(id) % n` cannot do (mod-n reshuffles nearly everything).
    The shard-assignment primitive for checkpoint/download sharding
    of a training corpus; per-shard sizes + balance ratio audit the
    uniformity the scheme promises.

    Exactness: md5-derived 60-bit integer weights (collision odds
    immaterial, and the (weight, shard) order is total anyway);
    argmax via one struct-max (no window); integer sizes, one
    division.

    Scale: |docs|×|shards| weight rows never materialize — the
    struct-max folds them in the same map-side-combinable aggregate;
    adding shard 9 re-routes ~1/9 of keys, attested by construction."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    shards = d.sparkSession.createDataFrame(
        [(i,) for i in range(_N_SHARDS)], "shard int"
    )
    wt = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit("hrw13"),
                    F.col("shard").cast("string"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    pick = (
        d.crossJoin(F.broadcast(shards))
        .select("doc_id", "shard", wt.alias("wt"))
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(F.col("wt"), (-F.col("shard")).alias("ns"))
            ).alias("m")
        )
        .select("doc_id", (-F.col("m.ns")).cast("int").alias("shard"))
    )
    sizes = pick.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = sizes.agg(F.sum("n_docs").cast("bigint").alias("n"))
    return (
        sizes.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") * _N_SHARDS / F.col("n"), 6
            ).alias("balance_ratio"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Effective sample size of length-proportional sampling weights (r13)
# ---------------------------------------------------------------------------

_ESS_SQL = """
WITH w AS (
  SELECT source, CAST(n_chars AS BIGINT) AS w FROM documents
), agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS sw,
         CAST(SUM(w * w) AS BIGINT) AS sww
  FROM w GROUP BY source
)
SELECT source, n_docs,
       ROUND(CAST(sw AS DOUBLE) * sw / sww, 4) AS ess,
       ROUND(CAST(sw AS DOUBLE) * sw / sww / n_docs, 6) AS ess_ratio,
       ROUND(CAST(sww AS DOUBLE) * n_docs / (CAST(sw AS DOUBLE) * sw)
             - 1.0, 6) AS weight_cv2
FROM agg ORDER BY source
"""


@query("train_sampling_ess", oracle=_ESS_SQL)
def train_sampling_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of LENGTH-proportional sampling
    weights per source: ESS = (Σw)²/Σw² with w = n_chars — the
    diagnostic every weighted-sampling policy owes its users
    (train_source_temperature and train_weighted_sample_ares choose
    weights; this says how many INDEPENDENT draws those weights are
    actually worth — ESS/n collapses toward 1/n when one whale
    document dominates a source). weight_cv² = n·Σw²/(Σw)² − 1 is
    the equivalent skew reading.

    Exactness: pure integer sums off the ingest-time n_chars column
    (the metadata-only scan — no text bytes touched), two divisions.

    Scale: one map-side-combined aggregate on the source key; column
    pruning keeps the scan at two columns."""
    d = load(spark, sf_dir, "documents").select("source", "n_chars")
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sw"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("bigint")
        .alias("sww"),
    )
    swd = F.col("sw").cast("double")
    ess = swd * F.col("sw") / F.col("sww")
    return agg.select(
        "source",
        "n_docs",
        F.round(ess, 4).alias("ess"),
        F.round(ess / F.col("n_docs"), 6).alias("ess_ratio"),
        F.round(
            F.col("sww").cast("double") * F.col("n_docs") / (swd * F.col("sw"))
            - F.lit(1.0),
            6,
        ).alias("weight_cv2"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# (moved from round11c.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

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
# (moved from round10_stats.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

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
# (moved from round11.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

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
# (moved from round8.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

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
# (moved from round9.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

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
