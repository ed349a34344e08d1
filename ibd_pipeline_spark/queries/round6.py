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
# Carter–Wegman universal-hash mixing: each family f maps the ONE
# md5 digest of a shingle to (a_f·h + b_f) mod p — md5 runs once per
# shingle instead of once per (shingle × family) (r10; the per-family
# md5 made this the registry's slowest query at 11 s). p = 2³¹−1 keeps
# a_f·h < 2⁶² (BIGINT-safe in both engines, DuckDB raises on overflow).
_MINHASH_P = 2147483647
_MINHASH_AB = [
    ((2654435761 * (f + 1)) % _MINHASH_P, (40503 * (f + 7)) % _MINHASH_P)
    for f in range(_MINHASH_FAMILIES)
]
_MINHASH_FAM_VALUES = ", ".join(
    f"({f}, {a}, {b})" for f, (a, b) in enumerate(_MINHASH_AB)
)

_MINHASH_EST_SQL = f"""
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
), sb AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(u.sh_e), 1, 15)) AS BIGINT)
           % {_MINHASH_P} AS hb
  FROM s, unnest(s.sh) AS u(sh_e)
), m AS (
  SELECT doc_id, f.f,
         MIN((f.a * hb + f.b) % {_MINHASH_P}) AS mh
  FROM sb CROSS JOIN (VALUES {_MINHASH_FAM_VALUES}) f(f, a, b)
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


def _md5_shingle_base(sh: F.Column) -> F.Column:
    """ONE engine-portable hash per shingle: first 15 hex digits
    (60 bits, signed-BIGINT-safe) of md5(shingle), reduced mod p so
    every family mix below stays overflow-free. DuckDB twin inline in
    the oracle (`sb` CTE)."""
    return F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
        % _MINHASH_P,
    )


def _minhash_sig(hb: F.Column) -> F.Column:
    """16-component MinHash signature from the per-shingle base
    hashes: family f is min over shingles of (a_f·h + b_f) mod p —
    integer algebra both engines replay exactly; md5 itself ran once
    per shingle in _md5_shingle_base."""
    def fam(a: int, b: int):
        # closure factory, NOT default args: PySpark HOF lambdas are
        # arity-inspected, so extra defaulted params break binding
        return lambda x: (F.lit(a) * x + F.lit(b)) % _MINHASH_P

    return F.array(
        *[F.array_min(F.transform(hb, fam(a, b))) for a, b in _MINHASH_AB]
    )


@query("dedup_minhash_jaccard_estimate", oracle=_MINHASH_EST_SQL)
def dedup_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard ESTIMATION accuracy, hash-attested end-to-end:
    for every candidate pair (exact J ≥ 0.1 on the bounded doc_id <
    400 subset), the exact intersection/union sizes next to the
    number of agreeing MinHash components (16 families — ONE md5 per
    shingle, Carter–Wegman-mixed per family, r10; E[n_match/16] = J,
    the estimator the production xxhash64 LSH pipeline relies on;
    operators/dedup.py:46 documents why the fast path re-hashes longs
    instead).

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
    par = spark.sparkContext.defaultParallelism
    s = (
        # the 400-doc audit slice is ONE parquet split — widen first
        # or the signature build and the pair join serialize on one
        # core (r10: measured 9.9 s -> ~2 s)
        d.repartition(par)
        .select("doc_id", sh.alias("sh"))
        # materialize the per-shingle base hashes as a COLUMN so the
        # md5 runs once, not once per family transform below
        .withColumn("hb", _md5_shingle_base(F.col("sh")))
        .select("doc_id", "sh", _minhash_sig(F.col("hb")).alias("sig"))
        # materialize ONCE: the self-join would otherwise evaluate the
        # whole shingle+md5 subtree twice (once per side)
        .localCheckpoint(eager=True)
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


# ---------------------------------------------------------------------------
# Funnel conversion latency
# ---------------------------------------------------------------------------

_FUNNEL_LAT_SQL = """
WITH f AS (
  SELECT user_id,
         MIN(ts) FILTER (event_type = 'signup')   AS first_signup,
         MIN(ts) FILTER (event_type = 'purchase') AS first_purchase
  FROM events GROUP BY user_id
), lat AS (
  SELECT CAST(date_diff('second', first_signup, first_purchase) AS DOUBLE)
           AS lat_s
  FROM f
  WHERE first_signup IS NOT NULL AND first_purchase > first_signup
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY lat_s), 4) AS p50_s,
       ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY lat_s), 4) AS p90_s,
       CAST(MAX(lat_s) AS BIGINT) AS max_s
FROM lat
"""


@query("events_funnel_latency", oracle=_FUNNEL_LAT_SQL)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the signup→purchase funnel:
    exact p50/p90 latency in seconds across users whose first
    purchase follows their first signup. Same conditional-MIN
    per-user shape as funnel_signup_purchase (one shuffle, never a
    self-join); this query adds the LATENCY quantiles a funnel
    readout needs next to the conversion count.

    Latencies are integer second diffs cast to double, so the exact
    interpolated percentile is a sum of halves — binary-exact in
    both engines (the text_length_percentiles contract).

    Scale: groupBy user_id is the one event-volume shuffle; the
    quantile runs over the (users-sized) latency column — swap in
    approx_percentile when conversions alone exceed a buffer."""
    e = load(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("fs"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fp"),
    )
    lat = f.filter(
        F.col("fs").isNotNull() & (F.col("fp") > F.col("fs"))
    ).select(
        (F.unix_timestamp("fp") - F.unix_timestamp("fs"))
        .cast("double")
        .alias("lat_s")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.percentile("lat_s", F.lit(0.5)), 4).alias("p50_s"),
        F.round(F.percentile("lat_s", F.lit(0.9)), 4).alias("p90_s"),
        F.max("lat_s").cast("bigint").alias("max_s"),
    )


# ---------------------------------------------------------------------------
# Int8 embedding quantization audit
# ---------------------------------------------------------------------------

_QUANT_SQL = """
WITH v AS (
  SELECT label,
         list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                        'max') AS amax,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), q AS (
  SELECT label,
         list_transform(emb, x -> FLOOR(x * 127.0 / amax + 0.5)) AS qs
  FROM v WHERE amax > 0
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(list_aggregate(qs, 'sum')) AS BIGINT) AS sum_q,
       CAST(SUM(len(list_filter(qs, x -> abs(x) = 127))) AS BIGINT)
         AS n_saturated
FROM q
GROUP BY label
ORDER BY label
"""


@query("similarity_quantize_int8", oracle=_QUANT_SQL)
def similarity_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (q = round(x·127/max|x|),
    the faiss/sentence-transformers storage trick that cuts an
    embedding store 4×), audited per label: vector count, the exact
    sum of all quantized components, and how many components
    saturate at ±127.

    Rounding is FLOOR(x + 0.5), not round(): both engines floor the
    identical IEEE double, where Spark's round() would go through
    the shortest-string repr and diverge from DuckDB on half-points
    (the r05 davg lesson). Outputs are BIGINTs — exact oracle.

    Scale: pure per-row projection (higher-order transform, no
    shuffle until the label aggregate); the real store would write
    the int8 array + per-vector scale as columns — same plan minus
    the audit aggregate."""
    emb = load(spark, sf_dir, "embeddings").select(
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    amax = F.array_max(F.transform("emb", lambda x: F.abs(x)))
    q = (
        emb.select("label", "emb", amax.alias("amax"))
        .filter(F.col("amax") > 0)
        .select(
            "label",
            F.transform(
                "emb",
                lambda x: F.floor(x * F.lit(127.0) / F.col("amax") + F.lit(0.5)),
            ).alias("qs"),
        )
    )
    return (
        q.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.aggregate("qs", F.lit(0).cast("long"), lambda a, x: a + x))
            .cast("bigint")
            .alias("sum_q"),
            F.sum(F.size(F.filter("qs", lambda x: F.abs(x) == 127)))
            .cast("bigint")
            .alias("n_saturated"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Quality-aware exact-dedup survivorship
# ---------------------------------------------------------------------------

_SURVIVOR_SQL = """
WITH d AS (
  SELECT doc_id, source, n_chars,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS digest
  FROM documents
), r AS (
  SELECT source, n_chars, doc_id,
         ROW_NUMBER() OVER (PARTITION BY digest
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (rk = 1) AS BIGINT) AS n_survivors,
       CAST(COUNT(*) FILTER (rk > 1) AS BIGINT) AS n_dropped,
       CAST(SUM(n_chars) FILTER (rk = 1) AS BIGINT) AS survivor_chars
FROM r
GROUP BY source
ORDER BY source
"""


@query("dedup_quality_survivor", oracle=_SURVIVOR_SQL)
def dedup_quality_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a SURVIVORSHIP RULE: group by normalized
    content digest (dedup_exact's md5 normalization), keep the
    longest copy, ties to the smallest doc_id — the 'best version
    wins' policy curation pipelines apply instead of arbitrary
    first-seen. Output per source: docs, survivors, dropped, and
    surviving chars — all BIGINT, exact oracle.

    Scale: ONE shuffle on the 128-bit digest (the window partition
    key); rank-1 selection is a streaming window, no second pass.
    The digest groupBy co-partitions with any later per-digest
    join."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
        ).alias("digest"),
    )
    w = Window.partitionBy("digest").orderBy(F.col("n_chars").desc(), "doc_id")
    r = d.select("source", "n_chars", F.row_number().over(w).alias("rk"))
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("rk") == 1, 1)).cast("bigint").alias("n_survivors"),
            F.count(F.when(F.col("rk") > 1, 1)).cast("bigint").alias("n_dropped"),
            F.sum(F.when(F.col("rk") == 1, F.col("n_chars")))
            .cast("bigint")
            .alias("survivor_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Order/lineitem reconciliation audit
# ---------------------------------------------------------------------------

_RECON_SQL = """
WITH li AS (
  SELECT l_orderkey,
         ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                   * (1 - CAST(l_discount AS DECIMAL(8,6)))
                   * (1 + CAST(l_tax AS DECIMAL(8,6)))), 2) AS computed
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderstatus,
         li.computed,
         ROUND(CAST(o.o_totalprice AS DECIMAL(18,6)), 2) AS stated
  FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(computed) AS BIGINT) AS n_with_lines,
       CAST(COUNT(*) FILTER (computed = stated) AS BIGINT) AS n_equal,
       CAST(COUNT(*) FILTER (computed > stated) AS BIGINT) AS n_over,
       CAST(COUNT(*) FILTER (computed < stated) AS BIGINT) AS n_under
FROM j
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("quality_order_reconciliation", oracle=_RECON_SQL)
def quality_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation: recompute each order's
    total from its line items (extendedprice·(1−discount)·(1+tax),
    the TPC-H revenue expression) and compare against the stated
    o_totalprice — the referential data-quality audit that catches
    drift between a rollup and its detail table. Comparison happens
    entirely in the exact DECIMAL domain rounded to cents (the dsum
    contract), so equal/over/under counts are engine-exact.

    Scale: one lineitem aggregate sharing the orderkey shuffle with
    the join; output is O(|statuses|). AQE handles the orders-side
    join strategy."""
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(8,6)"))
                    * (F.lit(1) + F.col("l_tax").cast("decimal(8,6)"))
                ),
                2,
            ).alias("computed")
        )
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice").cast("decimal(18,6)"), 2).alias("stated"),
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left")
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.count("computed").cast("bigint").alias("n_with_lines"),
            F.count(F.when(F.col("computed") == F.col("stated"), 1))
            .cast("bigint")
            .alias("n_equal"),
            F.count(F.when(F.col("computed") > F.col("stated"), 1))
            .cast("bigint")
            .alias("n_over"),
            F.count(F.when(F.col("computed") < F.col("stated"), 1))
            .cast("bigint")
            .alias("n_under"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Inter-arrival time statistics
# ---------------------------------------------------------------------------

_INTERARRIVAL_SQL = """
WITH s AS (
  SELECT event_type, user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
), g AS (
  SELECT event_type,
         CAST(date_diff('second', prev_ts, ts) AS DOUBLE) AS gap_s
  FROM s WHERE prev_ts IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_s), 4) AS p50_s,
       ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY gap_s), 4) AS p90_s
FROM g
GROUP BY event_type
ORDER BY event_type
"""


@query("events_inter_arrival_stats", oracle=_INTERARRIVAL_SQL)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival statistics: exact p50/p90 of the
    gap (seconds) between a user's consecutive events of the same
    type — the cadence profile that sizes session-gap thresholds and
    watermark horizons (events_sessionize_gaps picks its 30-min gap
    from exactly this readout). LAG over (user, type) with event_id
    tiebreak for determinism on equal timestamps.

    Scale: one shuffle on (user_id, event_type) for the window; gaps
    aggregate per type — tiny output. Integer-second diffs keep the
    interpolated percentile binary-exact cross-engine."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        )
        .cast("double")
        .alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return (
        s.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.round(F.percentile("gap_s", F.lit(0.5)), 4).alias("p50_s"),
            F.round(F.percentile("gap_s", F.lit(0.9)), 4).alias("p90_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# kNN label confusion (embedding-space label coherence)
# ---------------------------------------------------------------------------

_KNN_CONFUSION_SQL = """
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings WHERE vec_id < 200
), n AS (
  SELECT vec_id, label,
         sqrt(list_aggregate(list_transform(emb, x -> x * x), 'sum')) AS nrm,
         emb
  FROM v
), p AS (
  SELECT a.vec_id AS qid, a.label AS label_q, b.label AS label_n,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_aggregate(
                      list_transform(range(1, len(a.emb) + 1),
                                     i -> a.emb[i] * b.emb[i]), 'sum')
                    / (a.nrm * b.nrm) DESC,
                    b.vec_id
         ) AS rk
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
)
SELECT label_q, label_n, CAST(COUNT(*) AS BIGINT) AS n
FROM p WHERE rk = 1
GROUP BY label_q, label_n
ORDER BY label_q, label_n
"""


@query("similarity_knn_label_confusion", oracle=_KNN_CONFUSION_SQL)
def similarity_knn_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label coherence: each vector's single nearest
    neighbor by cosine (excluding itself), aggregated into a label
    confusion matrix — the eval that tells you whether embedding
    clusters track labels before trusting embedding-based dedup or
    search. Deterministic: neighbor ties break on vec_id, and the
    dot product is the SAME sequential index-order fold in both
    engines (F.aggregate ↔ list_aggregate) so the doubles compare
    identically.

    Scale: the all-pairs form lives only inside the oracle-bounded
    200-vector slice; the corpus-scale path is the ANN variants
    (similarity_ann_lsh / similarity_ann_ivf) feeding the same
    confusion aggregate."""
    from pyspark.sql import Window

    v = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
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
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with("a.emb", "b.emb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("qid"),
        F.col("a.label").alias("label_q"),
        F.col("b.label").alias("label_n"),
        cos.alias("cos"),
        F.col("b.vec_id").alias("nid"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "nid")
    return (
        pairs.select("label_q", "label_n", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") == 1)
        .groupBy("label_q", "label_n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("label_q", "label_n")
    )


# ---------------------------------------------------------------------------
# Winsorized mean
# ---------------------------------------------------------------------------

_WINSOR_SQL = """
WITH b AS (
  SELECT event_type,
         percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS lo,
         percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS hi
  FROM events GROUP BY event_type
), c AS (
  SELECT e.event_type,
         LEAST(GREATEST(e.value, b.lo), b.hi) AS clipped
  FROM events e JOIN b ON e.event_type = b.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(ROUND(SUM(CAST(clipped AS DECIMAL(28,8))), 4) AS DOUBLE)
         / COUNT(*) AS winsor_mean
FROM c
GROUP BY event_type
ORDER BY event_type
"""


@query("events_value_winsorize", oracle=_WINSOR_SQL)
def events_value_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of event value per type: clip at the exact
    p05/p95 group quantiles, then average — the outlier-robust KPI
    that stops one whale purchase from moving the daily number. The
    mean follows the davg contract (exact decimal sum rounded in the
    decimal domain, THEN divided) so the oracle hash is stable; the
    clip thresholds are interpolated percentiles computed identically
    in both engines.

    Scale: two passes over events sharing one event_type shuffle —
    quantiles per group, then clip+aggregate with the threshold row
    broadcast back. Swap approx_percentile in when a single group's
    values can't buffer (the stats_approx_percentiles trade)."""
    from ibd_pipeline_spark.queries import davg

    e = load(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    c = e.join(F.broadcast(b), "event_type").select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "clipped"
        ),
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            davg(F.col("clipped"), 4).alias("winsor_mean"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Referential-integrity orphan audit
# ---------------------------------------------------------------------------

_ORPHANS_SQL = """
SELECT 'lineitem->orders' AS relation,
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
         AS n_orphans
UNION ALL
SELECT 'orders->customer',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'customer->nation',
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
       CAST((SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
ORDER BY relation
"""


@query("quality_referential_orphans", oracle=_ORPHANS_SQL)
def quality_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    FK relation, the child row count and how many children have no
    parent (left-anti join) — the orphan check every warehouse load
    gate runs. Output: (relation, n_child, n_orphans).

    Scale: each orphan count is one anti join on the FK — broadcast
    when the parent is a dim (nation, customer at this ratio), AQE
    picks SMJ for orders⋈lineitem; the three audits are independent
    branches of one union plan and run concurrently."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")

    def audit(rel: str, child: DataFrame, ck: str, parent: DataFrame, pk: str):
        return child.agg(
            F.lit(rel).alias("relation"),
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
        ).crossJoin(
            child.join(parent, child[ck] == parent[pk], "left_anti").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orphans")
            )
        )

    return (
        audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(audit("customer->nation", c, "c_nationkey", n, "n_nationkey"))
        .orderBy("relation")
    )


# ---------------------------------------------------------------------------
# DAU/WAU stickiness
# ---------------------------------------------------------------------------

_STICKINESS_SQL = """
WITH d AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         user_id
  FROM events
), daily AS (
  SELECT week, day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM d GROUP BY week, day
), weekly AS (
  SELECT week, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM d GROUP BY week
)
SELECT w.week,
       CAST(SUM(dl.dau) AS BIGINT) AS sum_dau,
       w.wau,
       CAST(SUM(dl.dau) * 10000 // (COUNT(dl.day) * w.wau) AS BIGINT)
         AS stickiness_bp
FROM weekly w JOIN daily dl ON dl.week = w.week
GROUP BY w.week, w.wau
ORDER BY w.week
"""


@query("events_stickiness_ratio", oracle=_STICKINESS_SQL)
def events_stickiness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly stickiness (avg DAU / WAU, the product-health ratio):
    per calendar week, the sum of daily distinct actives, the weekly
    distinct actives, and avgDAU/WAU in integer basis points
    (floor-div — exact oracle, no float rounding). Two COUNT
    DISTINCTs sharing one (week/day, user) pre-dedup shuffle.

    Scale: at event volume this is the one dedup shuffle; for the
    rolling/sketched form see events_rolling_active_users (HLL
    unions) — this query pins the exact values the sketches
    approximate."""
    e = load(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("week", "ts")).alias("week"),
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "user_id",
    )
    daily = e.groupBy("week", "day").agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    weekly = e.groupBy("week").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    return (
        weekly.join(daily, "week")
        .groupBy("week", "wau")
        .agg(
            F.sum("dau").cast("bigint").alias("sum_dau"),
            F.count("day").alias("n_days"),
        )
        .select(
            "week",
            "sum_dau",
            "wau",
            F.expr("sum_dau * 10000L div (n_days * wau)")
            .cast("bigint")
            .alias("stickiness_bp"),
        )
        .orderBy("week")
    )
