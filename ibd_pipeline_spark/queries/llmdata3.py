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
