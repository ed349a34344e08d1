"""LLM-corpus curation, wave 3 (round 5): asymmetric containment
contamination (the "eval doc quoted inside a train doc" detector that
symmetric Jaccard misses) and cross-document boilerplate segment
detection (the template/header stripping pass).

Both reuse the registry's established conventions: the space
tokenizer (operators/text.py:23), the doc_id % 10 == 0 eval slice
(llmdata.py decontamination), and the exact-integer threshold idiom
(compare 2·inter ≥ n rather than rounding a quotient — the float
contract in queries/__init__.py).

Reference parity note: no analog in the reference engine; SURVEY.md
§2.2 north-star dedup/text families.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load_wide
from ibd_pipeline_spark.queries import query
from ibd_pipeline_spark.queries.llmdata import _shingles, _shingles_sql

_CONTAIN_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct({_shingles_sql('t', 3)})) AS shingle
  FROM toks
),
e AS (SELECT doc_id AS eval_doc, shingle FROM sh WHERE doc_id % 10 = 0),
en AS (SELECT eval_doc, CAST(COUNT(*) AS BIGINT) AS n_eval FROM e GROUP BY 1),
tr AS (SELECT doc_id AS train_doc, shingle FROM sh WHERE doc_id % 10 <> 0),
pairs AS (
  SELECT train_doc, eval_doc, CAST(COUNT(*) AS BIGINT) AS inter
  FROM tr JOIN e USING (shingle) GROUP BY 1, 2
)
SELECT p.train_doc, p.eval_doc, p.inter, en.n_eval
FROM pairs p JOIN en USING (eval_doc)
WHERE 2 * p.inter >= en.n_eval
ORDER BY p.train_doc, p.eval_doc
"""


@query("train_contamination_containment", oracle=_CONTAIN_SQL)
def train_contamination_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment contamination: flag (train, eval) pairs
    where the train document covers ≥ 50% of the eval document's
    distinct 3-gram shingles — |sh(e) ∩ sh(t)| / |sh(e)| ≥ 0.5. This
    catches an eval item quoted inside a much larger train document,
    which symmetric Jaccard dilutes below any usable threshold (the
    union in its denominator grows with the train doc).

    The threshold is the exact integer comparison 2·inter ≥ n_eval —
    no quotient is ever materialized, so the oracle matches exactly.

    Scale: same join geometry as decontamination — shingling is
    per-row, the eval side is broadcast-sized, and the pair aggregate
    map-side-combines on (train_doc, eval_doc). Pair cardinality is
    bounded by shared-shingle mass, not |train|×|eval|; a hot shingle
    (stop-phrase) would be the skew to cap, exactly as the MinHash
    band join documents."""
    d = load_wide(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(_shingles(F.split("text", " "), 3))).alias(
            "shingle"
        ),
    )
    e = sh.filter(F.col("doc_id") % 10 == 0).withColumnRenamed("doc_id", "eval_doc")
    en = e.groupBy("eval_doc").agg(F.count(F.lit(1)).cast("bigint").alias("n_eval"))
    tr = sh.filter(F.col("doc_id") % 10 != 0).withColumnRenamed(
        "doc_id", "train_doc"
    )
    pairs = (
        tr.join(F.broadcast(e), "shingle")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    return (
        pairs.join(F.broadcast(en), "eval_doc")
        .filter(2 * F.col("inter") >= F.col("n_eval"))
        .select("train_doc", "eval_doc", "inter", "n_eval")
        .orderBy("train_doc", "eval_doc")
    )


_BOILER_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
seg AS (
  SELECT doc_id, array_to_string(t[1 + 4 * (i - 1):4 * i], ' ') AS segment
  FROM toks, unnest(generate_series(1, len(t) // 4)) AS u(i)
),
freq AS (
  SELECT segment, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM seg GROUP BY 1
),
marked AS (
  SELECT s.doc_id, f.df >= 3 AS is_boiler
  FROM seg s JOIN freq f USING (segment)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(COUNT(*) FILTER (is_boiler) AS BIGINT) AS n_boiler
FROM marked
GROUP BY doc_id
HAVING COUNT(*) FILTER (is_boiler) > 0
ORDER BY doc_id
"""


@query("text_boilerplate_sentences", oracle=_BOILER_SQL)
def text_boilerplate_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: chop each document into
    non-overlapping 4-token segments (the fixture corpus has no
    sentence punctuation, so fixed-width segments play the role of
    lines/sentences — on punctuated text you'd swap the chopper for a
    sentence split and keep everything downstream), count each
    segment's document frequency, and report per-document how much of
    its mass is segments shared by ≥ 3 documents — the headers,
    navigation chrome, and license blobs that repeat across a crawl
    and poison next-token training.

    Scale: two shuffles — segment document-frequency (map-side
    combined; the segment string is the key, so the hot-key cap is
    the same stop-phrase salting story as every shingle join) and the
    per-doc rollup on doc_id. The doc-frequency side of the join is
    corpus-sized here; in production you'd threshold it first
    (HAVING df ≥ 3) and broadcast only the boilerplate set — kept
    un-thresholded here so the oracle checks the full join.
    """
    d = load_wide(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    seg = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.floor(F.size("t") / 4).cast("int"))
        ).alias("i"),
        "t",
    ).select(
        "doc_id",
        F.array_join(
            F.slice(F.col("t"), 1 + 4 * (F.col("i") - 1), 4), " "
        ).alias("segment"),
    )
    freq = seg.groupBy("segment").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    marked = seg.join(freq, "segment").select(
        "doc_id", (F.col("df") >= 3).alias("is_boiler")
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.count(F.when(F.col("is_boiler"), 1)).cast("bigint").alias("n_boiler"),
        )
        .filter(F.col("n_boiler") > 0)
        .orderBy("doc_id")
    )


_ZIPF_SQL = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY tok
), ranked AS (
  SELECT freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rank
  FROM tf
), pts AS (
  SELECT LN(CAST(rank AS DOUBLE)) AS x, LN(CAST(freq AS DOUBLE)) AS y
  FROM ranked
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(ROUND(SUM(CAST(x AS DECIMAL(28,8))), 4) AS DOUBLE) AS sx,
         CAST(ROUND(SUM(CAST(y AS DECIMAL(28,8))), 4) AS DOUBLE) AS sy,
         CAST(ROUND(SUM(CAST(x * x AS DECIMAL(28,8))), 4) AS DOUBLE) AS sxx,
         CAST(ROUND(SUM(CAST(x * y AS DECIMAL(28,8))), 4) AS DOUBLE) AS sxy,
         CAST(COUNT(*) AS BIGINT) AS vocab_size
  FROM pts
)
SELECT vocab_size,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_exponent,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
         AS log_intercept
FROM m
"""


@query("text_zipf_fit", oracle=_ZIPF_SQL)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: least-squares slope of
    ln(freq) on ln(rank) — natural text sits near −1; a corpus of
    templated/degenerate text drifts toward 0 (flat) or −2+ (a few
    tokens dominate), making the exponent a one-number corpus-health
    readout next to the vocabulary/hapax stats.

    Floats: each ln() product is cast to DECIMAL per ROW before the
    moment sums (per-row libm ulp noise is 8 decimal places below the
    cast, so both engines see identical decimals; the sums are then
    order-independent — the agg_corr_regression discipline). The
    final slope/intercept round at 4, far above any residual noise.

    Scale: wordcount aggregate (the corpus-sized shuffle), ranks from
    the DISTRIBUTED prefix-sum over the vocabulary frame under the
    (freq DESC, tok) total order — the rank-from-prefix-sum pattern
    that took Spearman/KS/MWU off the unpartitioned-window allow-list
    (this query came off in r12; (tok) is unique after the groupBy so
    a count prefix IS row_number) — then one moment aggregate.
    """
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    d = load_wide(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn("one", F.lit(1).cast("bigint"))
    )
    ranked = with_global_prefix_sums(
        tf, [(-F.col("freq")).alias("negfreq"), F.col("tok")], ["one"]
    ).select("freq", F.col("_cum_one").alias("rank"))
    pts = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum(F.col("x").cast("decimal(28,8)")), 4).cast("double").alias("sx"),
        F.round(F.sum(F.col("y").cast("decimal(28,8)")), 4).cast("double").alias("sy"),
        F.round(F.sum((F.col("x") * F.col("x")).cast("decimal(28,8)")), 4)
        .cast("double")
        .alias("sxx"),
        F.round(F.sum((F.col("x") * F.col("y")).cast("decimal(28,8)")), 4)
        .cast("double")
        .alias("sxy"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "vocab_size",
        F.round(slope, 4).alias("zipf_exponent"),
        F.round((sy - slope * sx) / n, 4).alias("log_intercept"),
    )


_NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct({_shingles_sql('t', 3)})) AS shingle
  FROM toks
),
firsts AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(*) FILTER (f.first_doc = s.doc_id) AS BIGINT) AS n_novel
FROM sh s JOIN firsts f USING (shingle)
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


@query("text_ngram_novelty", oracle=_NOVELTY_SQL)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty against everything ingested before
    it (doc_id plays arrival order): how many of a document's distinct
    3-gram shingles has NO earlier document used? The curve of
    novel-fraction over arrival order is the diminishing-returns
    readout crawl pipelines watch — when marginal novelty collapses,
    more of the same source stops buying training signal.

    One shingle explode + a MIN-per-shingle aggregate + one re-join:
    a document's novelty is the count of shingles whose global first
    appearance is itself. No window over arrival order is needed —
    MIN(doc_id) per shingle carries the whole 'seen before' relation.

    Scale: two shuffles on the shingle key (the count and the
    first-seen join are the same wordcount geometry as TF-IDF); at a
    streaming ingest the firsts table is the persisted append-only
    state, and novelty of a new batch is one broadcast-or-bucketed
    join against it — the same incremental posture as
    dedup_cross_corpus_anti.
    """
    d = load_wide(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(_shingles(F.split("text", " "), 3))).alias(
            "shingle"
        ),
    )
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
            .cast("bigint")
            .alias("n_novel"),
        )
        .orderBy("doc_id")
    )


_CARD_SQL = """
WITH base AS (
  SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS digest
  FROM documents
), top_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY lang ORDER BY n DESC, lang LIMIT 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(*) - COUNT(DISTINCT digest) AS BIGINT) AS n_exact_dups,
       ROUND(percentile_cont(0.5)
         WITHIN GROUP (ORDER BY CAST(n_chars AS DOUBLE)), 4) AS p50_chars,
       ROUND(percentile_cont(0.9)
         WITHIN GROUP (ORDER BY CAST(n_chars AS DOUBLE)), 4) AS p90_chars,
       (SELECT lang FROM top_lang) AS top_lang,
       CAST((1000 * (SELECT n FROM top_lang)) // COUNT(*) AS BIGINT)
         AS top_lang_per_mille
FROM base
"""


@query("train_dataset_card", oracle=_CARD_SQL)
def train_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card in one row — the summary block a curation
    pipeline publishes with every corpus release: volume (docs,
    chars), provenance breadth (sources, languages), exact-duplicate
    mass (count − distinct normalized digests), the length
    distribution's p50/p90 (exact interpolated — the sketch twin
    covers the at-scale form), and the dominant language with its
    per-mille share as an exact integer DIV.

    Everything reduces to ONE aggregate over one scan (Catalyst plans
    the multi-DISTINCT via Expand) plus a 1-row top-language
    broadcast; no metric costs a second pass over the corpus.

    Scale: the honest caveat is the multi-COUNT(DISTINCT) Expand
    (3× row multiplication before the aggregate) — at 100 TB swap
    the distinct counts for their HLL twins (agg_approx_distinct /
    sketch_hll_daily_union are the attested forms) and the exact
    percentiles for the t-digest; this query pins the values those
    sketches approximate.
    """
    d = load_wide(spark, sf_dir, "documents")
    digest = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    base = d.select(
        "lang", "source", F.col("n_chars").cast("bigint").alias("n_chars"),
        digest.alias("digest"),
    )
    top_lang = (
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "lang")
        .limit(1)
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("digest"))
        .cast("bigint")
        .alias("n_exact_dups"),
        F.round(F.percentile(F.col("n_chars").cast("double"), F.lit(0.5)), 4).alias(
            "p50_chars"
        ),
        F.round(F.percentile(F.col("n_chars").cast("double"), F.lit(0.9)), 4).alias(
            "p90_chars"
        ),
    )
    return agg.crossJoin(F.broadcast(top_lang)).select(
        "n_docs",
        "total_chars",
        "n_sources",
        "n_langs",
        "n_exact_dups",
        "p50_chars",
        "p90_chars",
        F.col("lang").alias("top_lang"),
        F.expr("CAST(1000 * n DIV n_docs AS BIGINT)").alias("top_lang_per_mille"),
    )
