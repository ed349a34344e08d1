"""Retrieval re-ranking queries (round-12 split): MMR diversity
re-rank and query-likelihood (Dirichlet-smoothed LM) retrieval —
beside BM25/RRF in relational/similarity land. Split out of the
former round12.py; names/semantics unchanged. No reference analog
(`spark_processor.py:153-164`); SURVEY §2.2 rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# Maximal Marginal Relevance diversified re-ranking (search belt)
# ---------------------------------------------------------------------------

_MMR_POOL = 10
_MMR_K = 5
_MMR_LAM = "0.7"


def _mmr_oracle() -> str:
    """DuckDB unroll of the 5-step MMR greedy: quantized-cosine pool,
    pairwise sims, then one argmax CTE per step (the k-means-unroll
    technique applied to a greedy selection)."""
    from ibd_pipeline_spark.queries.similarity import _KM_DIM

    def qdot(a: str, b: str) -> str:
        return (
            f"(SELECT SUM(CAST(FLOOR({a}.v[i] * {b}.v[i] * 1000000000000.0)"
            f" AS BIGINT)) FROM UNNEST(generate_series(1,{_KM_DIM})) t(i))"
        )

    head = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), nf AS (
  SELECT vec_id,
         (SELECT SUM(CAST(FLOOR(e.v[i] * e.v[i] * 1000000000000.0)
                          AS BIGINT))
          FROM UNNEST(generate_series(1,{_KM_DIM})) t(i)) AS nfp
  FROM e
), scoredall AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         ROUND(CAST({qdot('q', 'c')} AS DOUBLE)
               / sqrt(CAST(nq.nfp AS DOUBLE) * nc.nfp), 9) AS rel
  FROM e q JOIN e c ON q.vec_id < 3 AND c.vec_id <> q.vec_id
  JOIN nf nq ON nq.vec_id = q.vec_id
  JOIN nf nc ON nc.vec_id = c.vec_id
), pool AS (
  SELECT qid, cid, rel FROM (
    SELECT qid, cid, rel,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY rel DESC, cid) AS rn
    FROM scoredall
  ) WHERE rn <= {_MMR_POOL}
), pp AS (
  SELECT a.qid, a.cid AS ca, b.cid AS cb,
         ROUND(CAST((SELECT SUM(CAST(FLOOR(ea.v[i] * eb.v[i]
                                           * 1000000000000.0) AS BIGINT))
                     FROM UNNEST(generate_series(1,{_KM_DIM})) t(i))
                    AS DOUBLE)
               / sqrt(CAST(na.nfp AS DOUBLE) * nb.nfp), 9) AS s
  FROM pool a JOIN pool b ON a.qid = b.qid AND a.cid <> b.cid
  JOIN e ea ON ea.vec_id = a.cid JOIN e eb ON eb.vec_id = b.cid
  JOIN nf na ON na.vec_id = a.cid JOIN nf nb ON nb.vec_id = b.cid
), sel1 AS (
  SELECT qid, cid, 1 AS rank, rel AS score FROM (
    SELECT qid, cid, rel,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY rel DESC, cid) AS rn
    FROM pool
  ) WHERE rn = 1
), sall1 AS (SELECT * FROM sel1)"""
    steps = []
    for k in range(2, _MMR_K + 1):
        steps.append(f""",
cand{k} AS (
  SELECT p.qid, p.cid,
         {_MMR_LAM} * p.rel - (1.0 - {_MMR_LAM}) * mx.s AS score
  FROM pool p
  JOIN (SELECT pp.qid, pp.ca AS cid, MAX(pp.s) AS s
        FROM pp JOIN sall{k - 1} sp
          ON sp.qid = pp.qid AND sp.cid = pp.cb
        GROUP BY pp.qid, pp.ca) mx
    ON mx.qid = p.qid AND mx.cid = p.cid
  WHERE NOT EXISTS (SELECT 1 FROM sall{k - 1} sp2
                    WHERE sp2.qid = p.qid AND sp2.cid = p.cid)
), sel{k} AS (
  SELECT qid, cid, {k} AS rank, score FROM (
    SELECT qid, cid, score,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY score DESC, cid) AS rn
    FROM cand{k}
  ) WHERE rn = 1
), sall{k} AS (SELECT * FROM sall{k - 1} UNION ALL SELECT * FROM sel{k})""")
    tail = f"""
SELECT qid AS query_id, CAST(rank AS INT) AS rank, cid AS corpus_id,
       ROUND(score, 6) AS mmr_score
FROM sall{_MMR_K} ORDER BY qid, rank
"""
    return head + "".join(steps) + tail


@query("search_mmr_rerank", oracle=_mmr_oracle)
def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick 5 of the top-10 cosine candidates per query,
    each step maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)
    (λ = 0.7) — the production diversification pass between retrieval
    and display that keeps near-duplicate hits from monopolizing the
    result page (the operator-level fix for what SemDeDup fixes at
    corpus level).

    Determinism: all relevances and pairwise sims are the attested
    fixed-point cosine (FLOOR·10¹² BIGINT sums, ROUND 9); the greedy
    has a total-order tie-break (score DESC, cid) — so the 5-step
    unroll is a pure function DuckDB replays step for step.

    Scale: per query the greedy touches only the POOL (10 candidates,
    45 pairwise sims) — the expensive part is candidate generation,
    which is the ANN layer's job (similarity_ann_*); MMR itself is
    pool-bounded regardless of corpus size. Each step is one
    broadcast join + struct-max over pool-sized frames."""
    from ibd_pipeline_spark.operators.similarity import as_double_array

    lam = float(_MMR_LAM)
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", as_double_array("embedding").alias("v")
    ).withColumn(
        "nfp",
        F.expr(
            "aggregate(transform(v, x -> CAST(FLOOR(x * x * 1e12) AS"
            " BIGINT)), 0L, (acc, t) -> acc + t)"
        ),
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nfp").alias("qn"),
    )
    qdot = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> CAST(FLOOR(x * y * 1e12) AS"
        " BIGINT)), 0L, (acc, t) -> acc + t)"
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            F.round(
                qdot.cast("double")
                / F.sqrt(F.col("qn").cast("double") * F.col("nfp")),
                9,
            ).alias("rel"),
        )
    )
    # pool: top-10 per query via struct-max ranks on a 3-query frame
    from pyspark.sql import Window

    wq = Window.partitionBy("qid").orderBy(F.col("rel").desc(), "cid")
    pool = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _MMR_POOL)
        .drop("rn")
        .localCheckpoint(eager=True)  # reused by 5 greedy steps
    )
    pv = pool.join(
        e.select(F.col("vec_id").alias("cid"), "v", "nfp"), "cid"
    ).select("qid", "cid", "rel", "v", "nfp")
    a = pv.select(
        "qid",
        F.col("cid").alias("ca"),
        F.col("v").alias("va"),
        F.col("nfp").alias("na"),
    )
    b = pv.select(
        F.col("qid").alias("qb"),
        F.col("cid").alias("cb"),
        F.col("v").alias("vb"),
        F.col("nfp").alias("nb"),
    )
    pdot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> CAST(FLOOR(x * y * 1e12) AS"
        " BIGINT)), 0L, (acc, t) -> acc + t)"
    )
    pp = (
        a.join(
            F.broadcast(b),
            (F.col("qid") == F.col("qb")) & (F.col("ca") != F.col("cb")),
        )
        .select(
            "qid",
            "ca",
            "cb",
            F.round(
                pdot.cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb")),
                9,
            ).alias("s"),
        )
        .localCheckpoint(eager=True)  # 45 rows/query; reused 4x
    )
    # greedy unroll
    sel = (
        pool.groupBy("qid")
        .agg(F.max(F.struct("rel", (-F.col("cid")).alias("nc"))).alias("m"))
        .select(
            "qid",
            (-F.col("m.nc")).alias("cid"),
            F.lit(1).alias("rank"),
            F.col("m.rel").alias("score"),
        )
    )
    sall = sel
    for k in range(2, _MMR_K + 1):
        mx = (
            pp.join(
                sall.select(
                    F.col("qid").alias("qs"), F.col("cid").alias("sb")
                ),
                (F.col("qid") == F.col("qs")) & (F.col("cb") == F.col("sb")),
            )
            .groupBy("qid", F.col("ca").alias("cid"))
            .agg(F.max("s").alias("ms"))
        )
        cand = (
            pool.join(mx, ["qid", "cid"])
            .join(
                sall.select(
                    F.col("qid").alias("q2"), F.col("cid").alias("c2")
                ),
                (F.col("qid") == F.col("q2")) & (F.col("cid") == F.col("c2")),
                "left_anti",
            )
            .select(
                "qid",
                "cid",
                (lam * F.col("rel") - (1.0 - lam) * F.col("ms")).alias(
                    "score"
                ),
            )
        )
        pick = (
            cand.groupBy("qid")
            .agg(
                F.max(
                    F.struct("score", (-F.col("cid")).alias("nc"))
                ).alias("m")
            )
            .select(
                "qid",
                (-F.col("m.nc")).alias("cid"),
                F.lit(k).alias("rank"),
                F.col("m.score").alias("score"),
            )
        )
        sall = sall.unionByName(pick).localCheckpoint(eager=True)
    return sall.select(
        F.col("qid").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("cid").alias("corpus_id"),
        F.round("score", 6).alias("mmr_score"),
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing
# ---------------------------------------------------------------------------

_QL_TERMS = ["data", "table", "query", "scan", "fast"]
_QL_MU = 2000


def _ql_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _QL_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
), dl AS (
  SELECT doc_id, CAST(len(l) AS BIGINT) AS dlen FROM toks
), posts AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(l) AS tok FROM toks)
  WHERE tok IN ({terms}) GROUP BY doc_id, tok
), cf AS (
  SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf FROM posts GROUP BY tok
), ct AS (
  SELECT CAST(SUM(dlen) AS BIGINT) AS ctot FROM dl
), qt AS (SELECT unnest([{terms}]) AS tok),
scored AS (
  SELECT dl.doc_id,
         CAST(ln(CAST(COALESCE(p.tf, 0) * ct.ctot + {_QL_MU} * cf.cf
                      AS DOUBLE)
                 / (CAST(dl.dlen + {_QL_MU} AS DOUBLE) * ct.ctot))
              AS DECIMAL(28,10)) AS lp
  FROM dl CROSS JOIN qt
  JOIN cf ON cf.tok = qt.tok
  LEFT JOIN posts p ON p.doc_id = dl.doc_id AND p.tok = qt.tok
  CROSS JOIN ct
), per_doc AS (
  SELECT doc_id,
         CAST(ROUND(SUM(lp), 6) AS DOUBLE) AS ql_score
  FROM scored GROUP BY doc_id
), top AS (
  SELECT doc_id, ql_score,
         ROW_NUMBER() OVER (ORDER BY ql_score DESC, doc_id) AS rk
  FROM per_doc
)
SELECT CAST(rk AS INT) AS rank, doc_id, ROUND(ql_score, 6) AS ql_score
FROM top WHERE rk <= 20 ORDER BY rk
"""


@query("search_query_likelihood", oracle=_ql_oracle)
def search_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001): score(q, d) = Σ_t ln((tf + μ·P(t|C)) / (|d| + μ)),
    μ = 2000 — the language-modeling retrieval family beside BM25
    (search_hybrid_rrf's lexical leg); Dirichlet smoothing is the
    standard choice because it adapts to document length where
    Jelinek-Mercer does not. Top-20 documents for a fixed 5-term
    query.

    Exactness: each term's logarithm is taken of an ALL-INTEGER
    rational ((tf·Ctot + μ·cf) / ((|d|+μ)·Ctot) — exact BIGINTs cast
    to double in one division), so both engines feed ln() identical
    doubles; per-doc sums decimal-quantized; the top-20 is
    TakeOrdered + the 20-row triangular rank (window-free).

    Scale: a postings build filtered to the query terms (the gram
    shuffle touches only matching tokens), a 5-row cf broadcast, and
    a per-doc fold — per-query cost is postings-of-query-terms, the
    inverted-index contract."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
    )
    dl = toks.select(
        "doc_id", F.size("l").cast("bigint").alias("dlen")
    )
    posts = (
        toks.select("doc_id", F.explode("l").alias("tok"))
        .filter(F.col("tok").isin(*_QL_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    cf = posts.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("cf"))
    ct = dl.agg(F.sum("dlen").cast("bigint").alias("ctot"))
    qt = posts.sparkSession.createDataFrame(
        [(t,) for t in _QL_TERMS], "tok string"
    )
    scored = (
        dl.crossJoin(F.broadcast(qt))
        .join(F.broadcast(cf), "tok")
        .join(posts, ["doc_id", "tok"], "left")
        .crossJoin(F.broadcast(ct))
        .select(
            "doc_id",
            F.log(
                (
                    F.coalesce("tf", F.lit(0)) * F.col("ctot")
                    + _QL_MU * F.col("cf")
                ).cast("double")
                / ((F.col("dlen") + _QL_MU).cast("double") * F.col("ctot"))
            )
            .cast("decimal(28,10)")
            .alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.round(F.sum("lp"), 6).cast("double").alias("ql_score")
    )
    top = per_doc.orderBy(F.col("ql_score").desc(), "doc_id").limit(20)
    key = F.struct(
        (-F.col("ql_score")).alias("ns"), F.col("doc_id").alias("d")
    )
    o = top.select(key.alias("_ko"))
    ranked = (
        top.withColumn("_k", key)
        .join(F.broadcast(o), F.col("_ko") <= F.col("_k"))
        .groupBy("doc_id", "ql_score")
        .agg(F.count(F.lit(1)).cast("int").alias("rank"))
    )
    return ranked.select(
        "rank", "doc_id", F.round("ql_score", 6).alias("ql_score")
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# (moved from round11b.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) and a
# dense (embedding-cosine) ranking
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_POOL = 50
_RRF_LABEL = 0


def _rrf_oracle() -> str:
    from ibd_pipeline_spark.queries.text import (
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
    from ibd_pipeline_spark.queries.text import (
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
