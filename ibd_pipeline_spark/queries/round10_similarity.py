"""Round-10 similarity additions (split out of round10.py in
r11): EXACT prefix-filter (PPJoin-style) Jaccard join, product-
quantization codes, and the composed IVF-PQ top-k - the memory-
bounded billion-scale ANN layout, fully SQL-replayable."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# EXACT Jaccard similarity join via prefix filtering (PPJoin-style)
# ---------------------------------------------------------------------------

_PFJ_TAU_NUM, _PFJ_TAU_DEN = 3, 5  # tau = 0.6 as an exact fraction

_PREFIX_JACCARD_SQL = """
WITH raw AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), d AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(w) >= 3
                THEN list_transform(range(1, len(w) - 1),
                       i -> array_to_string(list_slice(w, i, i + 2), ' '))
                ELSE [array_to_string(w, ' ')] END) AS toks
  FROM raw
), tf AS (
  SELECT u.tok, CAST(COUNT(*) AS BIGINT) AS freq
  FROM d, unnest(d.toks) AS u(tok) GROUP BY u.tok
), st AS (
  SELECT doc_id, array_agg(tok ORDER BY freq, tok) AS stoks,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT d.doc_id, u.tok, tf.freq
        FROM d, unnest(d.toks) AS u(tok) JOIN tf USING (tok))
  GROUP BY doc_id
), pref AS (
  SELECT doc_id, u.tok
  FROM st, unnest(list_slice(stoks, 1,
         CAST(n - CEIL(0.6 * n) + 1 AS BIGINT))) AS u(tok)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(x.toks, y.toks)) AS BIGINT) AS n_inter,
       CAST(len(list_distinct(list_concat(x.toks, y.toks))) AS BIGINT)
         AS n_union
FROM cand c JOIN d x ON x.doc_id = c.id_a JOIN d y ON y.doc_id = c.id_b
WHERE 5 * len(list_intersect(x.toks, y.toks))
      >= 3 * len(list_distinct(list_concat(x.toks, y.toks)))
ORDER BY id_a, id_b
"""


@query("dedup_prefix_filter_jaccard", oracle=_PREFIX_JACCARD_SQL)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard similarity join (J ≥ 0.6 on 3-gram shingle sets)
    via prefix filtering — the database-literature counterpart of the
    MinHash-LSH family (PPJoin lineage: Xiao et al., WWW'08): order
    every document's shingle set by ASCENDING GLOBAL FREQUENCY
    (rarest first, ties by shingle) and keep only the first
    n − ⌈τ·n⌉ + 1 shingles as its PREFIX; two sets with J ≥ τ MUST
    share a prefix element (pigeonhole on the τ-overlap), so the
    candidate join runs on prefix shingles only — rare by
    construction — and the exact |∩|/|∪| verification touches
    candidates, never all pairs. Unlike LSH this is EXACT: zero
    false negatives, no banding probability. The τ gate is the
    cross-multiplied integer comparison 5·|∩| ≥ 3·|∪|, outputs are
    BIGINTs — no float anywhere.

    Shingles, not word sets: over a small vocabulary nearly every
    pair of word SETS is Jaccard-similar (measured: 71k of 125k
    pairs at sf0.01), which guts the filter; 3-gram shingles are the
    same distinctive unit the MinHash family blocks on.

    Scale: shingle frequencies are one vocab-sized aggregate; the
    prefix join's fan-out is bounded by rare-shingle postings (the
    frequency ordering is exactly what keeps stop-shingles OUT of
    prefixes); verification is per-candidate set algebra. At 100 TB
    this is the exact-dedup sibling you run where LSH recall
    arguments don't fly (dedup_minhash_lsh stays the approximate
    scale path)."""
    par = spark.sparkContext.defaultParallelism
    # words MUST be PHYSICALLY materialized before the gram transform:
    # CollapseProject inlines a projected split(text) straight back
    # into the lambda (measured 30 split() copies in the executed
    # plan), so each gram re-splits the whole text — O(len²) per doc.
    # A projection barrier is not enough; the checkpoint is.
    w = F.col("w")
    nw = F.size(w)
    k = 3
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, i + j + 1) for j in range(k)]
    )
    sh = F.array_distinct(
        F.when(nw >= k, F.transform(F.sequence(F.lit(0), nw - k), gram))
        .otherwise(F.array(F.concat_ws(" ", w)))
    )
    d = (
        load(spark, sf_dir, "documents")
        .repartition(par)  # single-split corpus would serialize
        .select("doc_id", F.split("text", " ").alias("w"))
        .localCheckpoint(eager=True)  # split exactly once (see above)
        .select("doc_id", sh.alias("toks"))
        .localCheckpoint(eager=True)  # verify join reads it twice
    )
    tok = d.select("doc_id", F.explode("toks").alias("tok"))
    tf = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    st = (
        tok.join(tf, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("freq", "tok"))),
                lambda s: s["tok"],
            ).alias("stoks"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    plen = (F.col("n") - F.ceil(0.6 * F.col("n")) + 1).cast("int")
    pref = (
        st.select(
            "doc_id",
            F.explode(F.slice("stoks", F.lit(1), plen)).alias("tok"),
        )
        .localCheckpoint(eager=True)  # self-join: evaluate ONCE
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        # the candidate frame is BYTE-small but each row costs a full
        # shingle-set intersection below — repartition so AQE's
        # size-based coalesce doesn't serialize the verify onto 2
        # tasks (measured 8 s -> ~2 s at sf0.1)
        .repartition(par)
    )
    x = d.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    y = d.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    ni = F.size(F.array_intersect("ta", "tb")).cast("bigint")
    nu = F.size(F.array_union("ta", "tb")).cast("bigint")
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .select("id_a", "id_b", ni.alias("n_inter"), nu.alias("n_union"))
        .filter(
            F.lit(_PFJ_TAU_DEN) * F.col("n_inter")
            >= F.lit(_PFJ_TAU_NUM) * F.col("n_union")
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Product-quantization codes (memory-bounded vector layout)
# ---------------------------------------------------------------------------

_PQ_SUBS, _PQ_SUBDIM, _PQ_CENTS = 8, 8, 16


def _pq_l2_sql(s: int, lhs: str = "a.v", rhs: str = "c.cv") -> str:
    """Left-associated squared-L2 over subspace s — the same addition
    order as the Spark zip_with/aggregate fold."""
    return " + ".join(
        f"({lhs}[{s * _PQ_SUBDIM + j}] - {rhs}[{s * _PQ_SUBDIM + j}])"
        f" * ({lhs}[{s * _PQ_SUBDIM + j}] - {rhs}[{s * _PQ_SUBDIM + j}])"
        for j in range(1, _PQ_SUBDIM + 1)
    )


def _pq_oracle() -> str:
    dists = "\nUNION ALL\n".join(
        f"SELECT a.id, {s} AS s, c.cent_id, {_pq_l2_sql(s)} AS d "
        f"FROM v a CROSS JOIN cents c"
        for s in range(_PQ_SUBS)
    )
    codes = ",\n       ".join(
        f"CAST(MAX(CASE WHEN s = {s} THEN code END) AS INT) AS c{s}"
        for s in range(_PQ_SUBS)
    )
    err = " + ".join(
        f"MAX(CASE WHEN s = {s} THEN d END)" for s in range(_PQ_SUBS)
    )
    return f"""
WITH v AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT id AS cent_id, v AS cv FROM v ORDER BY id LIMIT {_PQ_CENTS}
), dists AS (
{dists}
), best AS (
  SELECT id, s, cent_id AS code, d
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id, s
                                     ORDER BY d, cent_id) AS rn
        FROM dists)
  WHERE rn = 1
)
SELECT id AS vec_id,
       {codes},
       ROUND({err}, 6) AS quant_err
FROM best GROUP BY id ORDER BY vec_id
"""


@query("similarity_pq_codes", oracle=_pq_oracle)
def similarity_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization — the memory-bounded vector layout behind
    billion-scale ANN (Jégou et al., PAMI'11): split the 64-dim
    embedding into 8 subspaces of 8 dims; quantize each subvector to
    its nearest of 16 per-subspace centroids; a vector compresses to
    8 one-byte codes (64× smaller than float32) and distances become
    table lookups. Every mechanism is deterministic — centroids are
    the 16 lowest vec_ids' subvectors (the similarity_ann_ivf
    precedent), assignment is min squared-L2 with ties to the LOWEST
    centroid id, and every distance is the same left-associated
    double fold both engines evaluate identically — so DuckDB
    replays codes AND total quantization error bit-for-bit. The
    error column sums the 8 per-subspace minima as a FIXED-ORDER
    expression over the pivoted aggregates (an agg-sum of doubles
    would be partial-order-dependent cross-engine).

    Scale: centroid table is 16 rows broadcast; assignment is one
    corpus scan × (8 subspaces × 16 centroids) of codegen column
    algebra — no shuffle until the 8-row-per-vector min aggregate,
    which map-side combines. The PQ-coded table is what you persist;
    IVF cells + PQ codes compose into the standard IVF-PQ layout."""
    from ibd_pipeline_spark.operators.similarity import as_double_array

    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), as_double_array("embedding").alias("v")
    )
    cents = (
        emb.orderBy("id")
        .limit(_PQ_CENTS)
        .select(F.col("id").alias("cent_id"), F.col("v").alias("cv"))
    )
    subs = spark.range(_PQ_SUBS).select(F.col("id").cast("int").alias("s"))
    cent_sub = cents.crossJoin(subs).select(
        "cent_id",
        "s",
        F.slice("cv", (F.col("s") * _PQ_SUBDIM + 1).cast("int"),
                F.lit(_PQ_SUBDIM)).alias("cslice"),
    )
    corp_sub = emb.crossJoin(subs).select(
        "id",
        "s",
        F.slice("v", (F.col("s") * _PQ_SUBDIM + 1).cast("int"),
                F.lit(_PQ_SUBDIM)).alias("vslice"),
    )
    dist = F.aggregate(
        F.zip_with("vslice", "cslice", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = (
        corp_sub.join(F.broadcast(cent_sub), "s")
        .select("id", "s", "cent_id", dist.alias("d"))
        .groupBy("id", "s")
        .agg(F.min(F.struct(F.col("d"), F.col("cent_id"))).alias("m"))
        .select("id", "s", F.col("m.cent_id").alias("code"),
                F.col("m.d").alias("d"))
    )
    code_cols = [
        F.max(F.when(F.col("s") == s, F.col("code")))
        .cast("int")
        .alias(f"c{s}")
        for s in range(_PQ_SUBS)
    ]
    dmax = [
        F.max(F.when(F.col("s") == s, F.col("d"))) for s in range(_PQ_SUBS)
    ]
    err = dmax[0]
    for t in dmax[1:]:
        err = err + t
    return (
        best.groupBy("id")
        .agg(*code_cols, F.round(err, 6).alias("quant_err"))
        .select(F.col("id").alias("vec_id"),
                *[f"c{s}" for s in range(_PQ_SUBS)], "quant_err")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# IVF-PQ composed ANN top-k (coarse cells + quantized-distance rerank)
# ---------------------------------------------------------------------------


def _ivfpq_oracle() -> str:
    from ibd_pipeline_spark.queries.similarity import _cos_sql

    pq_dists = "\nUNION ALL\n".join(
        f"SELECT a.id, {s} AS s, c.cent_id, {_pq_l2_sql(s)} AS d "
        f"FROM v a CROSS JOIN cents c"
        for s in range(_PQ_SUBS)
    )
    lut = "\nUNION ALL\n".join(
        f"SELECT q.id AS qid, {s} AS s, c.cent_id, "
        f"CAST(ROUND({_pq_l2_sql(s, 'q.v')}, 9) AS DECIMAL(28,9)) AS d "
        f"FROM v q CROSS JOIN cents c WHERE q.id < 10"
        for s in range(_PQ_SUBS)
    )
    return f"""
WITH v AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT id AS cent_id, v AS cv FROM v ORDER BY id LIMIT {_PQ_CENTS}
), sims AS (
  SELECT v.id, v.v, c.cent_id,
         {_cos_sql("v.v", "c.cv")} AS sim
  FROM v CROSS JOIN cents c
), asgn AS (
  SELECT id AS cid, v AS cv, cent_id AS cell_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                     ORDER BY sim DESC, cent_id) AS rn
        FROM sims)
  WHERE rn = 1
), probe AS (
  SELECT id AS qid, v AS qv, cent_id AS cell_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                     ORDER BY sim DESC, cent_id) AS rn
        FROM sims WHERE id < 10)
  WHERE rn <= 4
), pqd AS (
{pq_dists}
), codes AS (
  SELECT id, s, cent_id AS code
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id, s
                                     ORDER BY d, cent_id) AS rn
        FROM pqd)
  WHERE rn = 1
), lut AS (
{lut}
), cand AS (
  SELECT DISTINCT p.qid, a.cid
  FROM probe p JOIN asgn a ON p.cell_id = a.cell_id AND p.qid <> a.cid
), adc AS (
  SELECT c.qid, c.cid, SUM(l.d) AS adc
  FROM cand c
  JOIN codes k ON k.id = c.cid
  JOIN lut l ON l.qid = c.qid AND l.s = k.s AND l.cent_id = k.code
  GROUP BY c.qid, c.cid
), short AS (
  SELECT qid, cid
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY adc, cid) AS rn FROM adc)
  WHERE rn <= 20
), rer AS (
  SELECT s.qid AS query_id, s.cid AS corpus_id,
         ROUND({_cos_sql("q.v", "b.v")}, 6) AS cosine_sim
  FROM short s JOIN v q ON q.id = s.qid JOIN v b ON b.id = s.cid
), ranked AS (
  SELECT query_id, corpus_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, corpus_id) AS rank
  FROM rer
)
SELECT query_id, corpus_id, cosine_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


@query("similarity_ivfpq_topk", oracle=_ivfpq_oracle)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN top-5 — the standard billion-scale vector
    index layout, assembled from this repo's two attested halves:
    IVF coarse cells (operators/similarity.py:ivf_cells/ivf_probe —
    each query scores only its 4 probed Voronoi cells) and PQ codes
    (8 subspaces × 16 centroids), with the in-cell scan ranked by the
    ASYMMETRIC quantized distance: adc(q, x) = Σ_s ‖q_s −
    centroid(code_s(x))‖² looked up from a per-query 8×16 LUT — the
    PQ table-lookup trick that never touches the full corpus vector.
    The ADC shortlist (top-20 per query, ties to lowest id) is then
    EXACT-reranked by cosine to the final top-5 — the
    recall-restoring rerank every production IVF-PQ deploy runs.
    Every stage is deterministic and the per-subspace LUT distances
    ROUND→DECIMAL before the 8-term sum (agg order independence), so
    DuckDB replays shortlist AND rerank bit-for-bit.

    Scale: corpus-side work is the IVF assignment + PQ encoding (one
    scan each, both broadcast joins — this is the INDEX BUILD you
    persist); per query the scan cost is |cell|·n_probe LUT lookups
    of 8 decimal adds, plus 20 exact vectors — independent of corpus
    size. The LUT frame is queries × 128 rows, broadcast."""
    from ibd_pipeline_spark.operators.similarity import (
        as_double_array,
        cosine,
        ivf_cells,
        ivf_probe,
    )
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    q_raw = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vec")
    )
    c_raw = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("vec")
    )
    cents, cells = ivf_cells(c_raw, _PQ_CENTS)
    # the cell assignment is the PERSISTED INDEX: two consumers below
    # (PQ encoder + candidate join) must not re-run the 16-centroid
    # assignment scan each
    cells = cells.localCheckpoint(eager=True)
    probe = ivf_probe(q_raw, cents, 4)

    subs = spark.range(_PQ_SUBS).select(F.col("id").cast("int").alias("s"))
    cent_sub = cents.crossJoin(subs).select(
        "cent_id",
        "s",
        F.slice("cent_v", (F.col("s") * _PQ_SUBDIM + 1).cast("int"),
                F.lit(_PQ_SUBDIM)).alias("cslice"),
    )
    l2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # PQ-encode the corpus (the persisted index): min-L2 code per
    # (vector, subspace), ties to the lowest centroid id
    codes = (
        cells.crossJoin(F.broadcast(subs))
        .select(
            "cid",
            "s",
            F.slice("cv", (F.col("s") * _PQ_SUBDIM + 1).cast("int"),
                    F.lit(_PQ_SUBDIM)).alias("vslice"),
        )
        .join(F.broadcast(cent_sub), "s")
        .select("cid", "s", "cent_id", l2(F.col("vslice"), F.col("cslice")).alias("d"))
        .groupBy("cid", "s")
        .agg(F.min(F.struct(F.col("d"), F.col("cent_id"))).alias("m"))
        .select("cid", "s", F.col("m.cent_id").alias("code"))
    )
    # per-query distance LUT: 8 subspaces × 16 centroids, decimal
    lut = (
        probe.select("qid", "qv")
        .distinct()
        .crossJoin(F.broadcast(subs))
        .select(
            "qid",
            "s",
            F.slice("qv", (F.col("s") * _PQ_SUBDIM + 1).cast("int"),
                    F.lit(_PQ_SUBDIM)).alias("qslice"),
        )
        .join(F.broadcast(cent_sub), "s")
        .select(
            "qid",
            "s",
            "cent_id",
            F.round(l2(F.col("qslice"), F.col("cslice")), 9)
            .cast("decimal(28,9)")
            .alias("d"),
        )
    )
    cand = (
        probe.select("qid", "cell_id")
        .join(cells.select("cid", "cell_id"), "cell_id")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    k = codes.select(
        F.col("cid").alias("kcid"), F.col("s").alias("ks"), "code"
    )
    lu = lut.select(
        F.col("qid").alias("lqid"),
        F.col("s").alias("ls"),
        F.col("cent_id").alias("lcent"),
        "d",
    )
    adc = (
        cand.join(k, F.col("cid") == F.col("kcid"))
        .join(
            F.broadcast(lu),
            (F.col("qid") == F.col("lqid"))
            & (F.col("ks") == F.col("ls"))
            & (F.col("code") == F.col("lcent")),
        )
        .groupBy("qid", "cid")
        .agg(F.sum("d").alias("adc"))
    )
    w20 = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("cid"))
    short = (
        adc.withColumn("rn", F.row_number().over(w20))
        .filter(F.col("rn") <= 20)
        .select("qid", "cid")
    )
    qv = emb.select(F.col("vec_id").alias("qid"), as_double_array("embedding").alias("qv"))
    bv = emb.select(F.col("vec_id").alias("cid"), as_double_array("embedding").alias("bv"))
    rer = (
        short.join(F.broadcast(qv.filter(F.col("qid") < 10)), "qid")
        .join(bv, "cid")
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("corpus_id"),
            F.round(cosine(F.col("qv"), F.col("bv")), 6).alias("cosine_sim"),
        )
    )
    w5 = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w5).cast("int"))
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


