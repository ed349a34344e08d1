"""Round-6 registry additions: oracle-attested widening of the
LLM-data operator families.

Design notes shared by this module:
- Exactness first: wherever a float quotient would have to round
  (the r05 scale-parity trap, see queries/__init__.py dsum/davg),
  the output is re-expressed in integer space instead — exact
  fractions as (numerator, denominator) BIGINTs, ratios as
  basis-point integers, thresholds as cross-multiplied integer
  comparisons. The driver hash then has zero float wobble room.
- The md5 idiom (operators/sketches.py:md5_bucket) keeps every hash
  engine-portable so sketch-like estimators are oracle-checkable
  EXACTLY, not just statistically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# MinHash Jaccard estimator, oracle-attested
# ---------------------------------------------------------------------------

_MINHASH_FAMILIES = 16

_MINHASH_EST_SQL = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < 400
), s AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM d
), m AS (
  SELECT doc_id, f.f,
         MIN(CAST(('0x' || substring(md5(CAST(f.f AS VARCHAR) || ':' || u.sh_e), 1, 15))
                  AS BIGINT)) AS mh
  FROM s, unnest(s.sh) AS u(sh_e)
  CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),(12),(13),(14),(15)) f(f)
  GROUP BY doc_id, f.f
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
         CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS n_union
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE 10 * len(list_intersect(a.sh, b.sh))
        >= len(list_distinct(list_concat(a.sh, b.sh)))
)
SELECT p.id_a, p.id_b, p.n_inter, p.n_union,
       CAST(SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_match
FROM pairs p
JOIN m ma ON ma.doc_id = p.id_a
JOIN m mb ON mb.doc_id = p.id_b AND mb.f = ma.f
GROUP BY p.id_a, p.id_b, p.n_inter, p.n_union
ORDER BY p.id_a, p.id_b
"""


def _md5_minhash(sh: F.Column, fam: int) -> F.Column:
    """Engine-portable MinHash family: min over the shingle set of the
    first 15 hex digits (60 bits, signed-BIGINT-safe) of
    md5('<fam>:<shingle>'). DuckDB twin inline in the oracle."""
    return F.array_min(
        F.transform(
            sh,
            lambda s: F.conv(
                F.substring(F.md5(F.concat_ws(":", F.lit(str(fam)), s)), 1, 15),
                16,
                10,
            ).cast("bigint"),
        )
    )


@query("dedup_minhash_jaccard_estimate", oracle=_MINHASH_EST_SQL)
def dedup_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard ESTIMATION accuracy, hash-attested end-to-end:
    for every candidate pair (exact J ≥ 0.1 on the bounded doc_id <
    400 subset), the exact intersection/union sizes next to the
    number of agreeing MinHash components (16 md5-portable families —
    E[n_match/16] = J, the estimator the production xxhash64 LSH
    pipeline relies on; operators/dedup.py:46 documents why the fast
    path re-hashes longs instead).

    Everything integer: the J ≥ 0.1 gate is the cross-multiplied
    10·|∩| ≥ |∪|, outputs are (n_inter, n_union, n_match) BIGINTs —
    no float ever rounds, so the DuckDB comparison is exact, making
    this the oracle-attested face of the otherwise rows-only MinHash
    family.

    Scale: the all-pairs join exists ONLY inside the oracle-bounded
    subset (400 docs); at corpus scale pair enumeration is the LSH
    band join (dedup_minhash_lsh), and this query is the estimator-
    calibration audit you run on a sampled slice."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    n = F.size("toks")
    k = 3
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col("toks"), i + j + 1) for j in range(k)]
    )
    sh = F.array_distinct(
        F.when(
            n >= k,
            F.transform(F.sequence(F.lit(0), n - k), gram),
        ).otherwise(F.array(F.concat_ws(" ", F.col("toks"))))
    )
    s = d.select(
        "doc_id",
        sh.alias("sh"),
    ).select(
        "doc_id",
        "sh",
        F.array(
            *[_md5_minhash(F.col("sh"), f) for f in range(_MINHASH_FAMILIES)]
        ).alias("sig"),
    )
    a, b = s.alias("a"), s.alias("b")
    n_inter = F.size(F.array_intersect("a.sh", "b.sh")).cast("bigint")
    n_union = F.size(F.array_union("a.sh", "b.sh")).cast("bigint")
    n_match = F.size(
        F.filter(
            F.zip_with("a.sig", "b.sig", lambda x, y: x == y),
            lambda m: m,
        )
    ).cast("bigint")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            n_inter.alias("n_inter"),
            n_union.alias("n_union"),
            n_match.alias("n_match"),
        )
        .filter(F.lit(10) * F.col("n_inter") >= F.col("n_union"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# BM25 ranking
# ---------------------------------------------------------------------------

_BM25_TERMS = ["table", "join", "spark"]
_BM25_K1 = 1.2
_BM25_B = 0.75

_BM25_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), t AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
         {", ".join(
             f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
             for i, t in enumerate(_BM25_TERMS)
         )}
  FROM d
), g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
         {", ".join(
             f"CAST(COUNT(*) FILTER (tf{i} > 0) AS DOUBLE) AS df{i}"
             for i in range(len(_BM25_TERMS))
         )}
  FROM t
)
SELECT doc_id,
       ROUND(
         {" + ".join(
             f"ln(1 + (g.n - g.df{i} + 0.5) / (g.df{i} + 0.5))"
             f" * tf{i} * ({_BM25_K1} + 1)"
             f" / (tf{i} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * t.dl / g.avgdl))"
             for i in range(len(_BM25_TERMS))
         )}, 4) AS bm25
FROM t, g
ORDER BY bm25 DESC, doc_id
LIMIT 10
"""


@query("text_bm25_ranking", oracle=_BM25_SQL)
def text_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a fixed conjunctive query (the
    Robertson/Spärck Jones Okapi weighting, k1=1.2 b=0.75, Lucene's
    ln(1 + (N-df+0.5)/(df+0.5)) idf) — relevance ranking as one
    Catalyst plan: per-doc term frequencies via higher-order
    list_filter (no explode), corpus stats (N, avgdl, per-term df)
    as ONE aggregate row broadcast back over the scan.

    Scale: two passes over the corpus — one tiny global aggregate,
    one scoring scan + top-k (takeOrdered, no global sort shuffle);
    term stats are O(|terms|) state. The cross join is 1-row
    broadcast, never data-sized."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    # NB: term must be closed over with a ONE-argument lambda factory —
    # a `lambda x, t=term:` default-arg capture makes Spark pass the
    # array INDEX as the second argument, shadowing the default (the
    # minhash_signature lesson, operators/dedup.py:57).
    def tf_of(term: str):
        return F.size(F.filter("toks", lambda x: x == F.lit(term))).cast("double")

    t = docs.select(
        "doc_id",
        F.size("toks").cast("double").alias("dl"),
        *[tf_of(t_).alias(f"tf{i}") for i, t_ in enumerate(_BM25_TERMS)],
    )
    g = t.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf{i}") > 0, 1)).cast("double").alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            F.lit(1.0) + (F.col("n") - F.col(f"df{i}") + F.lit(0.5)) / (F.col(f"df{i}") + F.lit(0.5))
        )
        term = (
            idf
            * F.col(f"tf{i}")
            * F.lit(_BM25_K1 + 1)
            / (
                F.col(f"tf{i}")
                + F.lit(_BM25_K1)
                * (F.lit(1 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl"))
            )
        )
        score = term if score is None else score + term
    return (
        t.crossJoin(F.broadcast(g))
        .select("doc_id", F.round(score, 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Join-key skew profiling
# ---------------------------------------------------------------------------

_SKEW_SQL = """
WITH k AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS total_rows,
       CAST(MAX(cnt) AS BIGINT) AS max_per_key,
       CAST(MAX(cnt) * COUNT(*) * 10000 // SUM(cnt) AS BIGINT) AS skew_bp,
       CAST((MAX(cnt) * COUNT(*) + SUM(cnt) - 1) // SUM(cnt) AS BIGINT)
         AS suggested_salt
FROM k
GROUP BY event_type
ORDER BY event_type
"""


@query("profile_key_skew", oracle=_SKEW_SQL)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnosis — the profiling pass you run
    BEFORE deciding to salt (operators/skew.py): per candidate key
    domain (event_type × user_id here), the key count, max single-key
    row count, skew ratio max/mean in integer basis points, and the
    ceil(max/mean) salt factor the salted-join would use. All integer
    arithmetic (cross-multiplied, floor-div) — exact oracle, no float
    rounding anywhere.

    Scale: one map-side-combined count per (type, key) then a
    per-type reduce — the same two-level aggregate a 100 TB skew
    probe runs; output is O(|types|)."""
    k = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        k.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("cnt").cast("bigint").alias("total_rows"),
            F.max("cnt").cast("bigint").alias("max_per_key"),
        )
        .select(
            "event_type",
            "n_keys",
            "total_rows",
            "max_per_key",
            # `div`, not `/`: Spark `/` on BIGINTs is a DOUBLE divide
            # and DuckDB CAST(double AS BIGINT) ROUNDS where Spark
            # truncates — floor-div in INTEGER space on both sides.
            F.expr("max_per_key * n_keys * 10000L div total_rows")
            .cast("bigint")
            .alias("skew_bp"),
            F.expr("(max_per_key * n_keys + total_rows - 1) div total_rows")
            .cast("bigint")
            .alias("suggested_salt"),
        )
        .orderBy("event_type")
    )
