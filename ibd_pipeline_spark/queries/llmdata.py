"""Round-4 LLM training-data operators over `documents` / `events` /
`embeddings`: benchmark decontamination, repetition detection,
cross-corpus dedup, unigram log-prob quality scoring, conversation
assembly, and language-balanced quota sampling.

These extend the north-star set (SURVEY.md §2.2 "training-data
pipeline") past what the reference computes at all — each is an
operator a 100 TB pretraining-data pipeline runs daily. All are
oracle-checked (DuckDB list/window functions mirror Spark's
higher-order array functions); the iterative k-means clustering op
lives in queries/similarity.py as rows-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ibd_pipeline_spark.catalog import load, load_wide
from ibd_pipeline_spark.queries import davg, query


def _shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles as ' '-joined strings.

    Built by zip_with-folding n shifted views of the token array
    (shingle i = toks[i] ⊕ toks[i+1] ⊕ … ⊕ toks[i+n-1]) — O(len)
    flat array traversals. The obvious transform(sequence(1, len-n+1),
    i -> array_join(slice(toks, i, n))) form is O(len·n) with a
    per-position slice allocation and measured ~4× slower at bench
    scale. Guarded for short docs: F.sequence/F.slice misbehave on
    negative lengths, so < n tokens short-circuits to []."""
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    acc = F.slice(toks, 1, m)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(toks) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


# SQL twin of _shingles (DuckDB): generate_series(1, len-(n-1)) is a
# LIST scalar there, and t[i:j] is 1-based inclusive slicing.
def _shingles_sql(toks_expr: str, n: int) -> str:
    return (
        f"CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks_expr}) - {n - 1}), "
        f"i -> array_to_string({toks_expr}[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


@query(
    "text_decontaminate_ngram_overlap",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct({_shingles_sql('t', 5)})) AS shingle
  FROM toks
),
eval_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
FROM sh s JOIN eval_sh e USING (shingle)
WHERE s.doc_id % 10 <> 0
GROUP BY s.doc_id
ORDER BY s.doc_id
""",
)
def text_decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    5-token shingle with the held-out eval slice (doc_id % 10 == 0
    plays the benchmark set). Output: contaminated doc → count of
    distinct shared shingles.

    Scale: shingles are per-doc array ops (no shuffle); the overlap
    test is an equi-join on the shingle string. The eval side is
    broadcast — real benchmark suites are MBs against a 100 TB train
    corpus, so the train side never shuffles; contamination counting
    map-side-combines on doc_id. With a giant eval set, drop the
    broadcast hint and the same plan degrades to a hash-partitioned
    join on the shingle. The scan is widened (load_wide): shingling
    is the CPU-bound stage and a single-split file would serialize
    it onto one core."""
    d = load_wide(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(_shingles(F.split("text", " "), 5))).alias(
            "shingle"
        ),
    )
    eval_sh = sh.filter(F.col("doc_id") % 10 == 0).select("shingle").distinct()
    train_sh = sh.filter(F.col("doc_id") % 10 != 0)
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .orderBy("doc_id")
    )


@query(
    "text_repetition_ratio",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id, t, {_shingles_sql('t', 3)} AS s3 FROM toks
)
SELECT doc_id,
       ROUND(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
         AS token_repetition,
       ROUND(CASE WHEN len(s3) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(s3)) AS DOUBLE) / len(s3) END, 6)
         AS trigram_repetition,
       (CASE WHEN len(s3) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(s3)) AS DOUBLE) / len(s3) END) > 0.2
         AS flagged
FROM sh
ORDER BY doc_id
""",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-text detector: per-document repeated-token and
    repeated-trigram ratios (boilerplate, keyword stuffing, and
    decode-loop text score high). The standard pretraining quality
    gate alongside operators.text.quality_score.

    Scale: per-row higher-order array functions — no agg/join
    shuffles; only `text` is read. Shingle and distinct counts are
    materialized ONCE in an inner projection (CollapseProject keeps a
    non-cheap expression that downstream references twice in its own
    project, so `tri_rep` appearing in both the rounded column and
    the flag doesn't recompute the O(n·w) shingling). The scan is
    widened via load_wide: per-row CPU work on a single-split file
    otherwise runs on one core."""
    d = load_wide(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    s3 = _shingles(toks, 3)
    counted = d.select(
        "doc_id",
        F.size(toks).alias("nt"),
        F.size(F.array_distinct(toks)).alias("ut"),
        F.size(s3).alias("n3"),
        F.size(F.array_distinct(s3)).alias("u3"),
    )
    tok_rep = 1.0 - F.col("ut").cast("double") / F.col("nt")
    tri_rep = F.when(F.col("n3") == 0, F.lit(0.0)).otherwise(
        1.0 - F.col("u3").cast("double") / F.col("n3")
    )
    return counted.select(
        "doc_id",
        F.round(tok_rep, 6).alias("token_repetition"),
        F.round(tri_rep, 6).alias("trigram_repetition"),
        (tri_rep > 0.2).alias("flagged"),
    ).orderBy("doc_id")


_NORM_SQL = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


@query(
    "dedup_cross_corpus_anti",
    oracle=f"""
WITH hashed AS (
  SELECT doc_id, source, {_NORM_SQL} AS h FROM documents
),
ref AS (
  SELECT DISTINCT h FROM hashed WHERE source = 'src0'
)
SELECT c.source,
       CAST(COUNT(*) AS BIGINT)                        AS n_candidates,
       CAST(COUNT(*) FILTER (r.h IS NULL) AS BIGINT)   AS n_survivors,
       CAST(COUNT(*) FILTER (r.h IS NOT NULL) AS BIGINT) AS n_dropped
FROM hashed c LEFT JOIN ref r USING (h)
WHERE c.source <> 'src0'
GROUP BY c.source
ORDER BY c.source
""",
)
def dedup_cross_corpus_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus dedup: drop candidate documents whose normalized
    content hash already exists in a reference corpus (source 'src0'
    plays the already-trained-on set — the "don't re-train on what the
    last run saw" gate). Emits per-source survivor accounting.

    Scale: both sides reduce to 128-bit digests before the join — one
    shuffle on the hash, row width independent of document size. The
    left join + FILTER counts survivors and drops in the same pass an
    anti-join would take, without a second aggregate over candidates."""
    d = load(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias("h"),
    )
    ref = hashed.filter(F.col("source") == "src0").select("h").distinct()
    cand = hashed.filter(F.col("source") != "src0")
    joined = cand.join(ref.withColumn("hit", F.lit(1)), "h", "left")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.count(F.when(F.col("hit").isNull(), 1)).alias("n_survivors"),
            F.count("hit").alias("n_dropped"),
        )
        .orderBy("source")
    )


@query(
    "text_unigram_logprob_score",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
vocab AS (
  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
),
total AS (
  SELECT SUM(cnt) AS n FROM vocab
)
SELECT t.doc_id,
       CAST(ROUND(SUM(CAST(-log2(CAST(v.cnt AS DOUBLE) / total.n)
                          AS DECIMAL(28,8))), 4) AS DOUBLE) / COUNT(*)
         AS bits_per_token
FROM tok t JOIN vocab v USING (token), total
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)
def text_unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model surprisal per document (bits/token) —
    the cheap perplexity proxy used to rank pretraining text before
    any neural scorer exists: low = repetitive/common, high = rare
    vocabulary or noise; both tails get gated.

    Scale: pass 1 builds the vocabulary (explode → hash-agg with
    map-side combine — shuffle is O(vocab), not O(tokens)); the corpus
    token total rides a broadcast 1-row aggregate (never a driver
    collect). Pass 2 re-joins counts to exploded tokens — vocab is
    broadcast (web-scale vocabularies are ~10⁷ rows ≈ low GBs; past
    executor memory, remove the hint and the same plan shuffles on
    the token). Per-doc mean uses the exact-decimal-sum form (davg)
    so partial-aggregation order can't flip the rounded digit."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    bits = -F.log2(F.col("cnt").cast("double") / F.col("n"))
    return (
        tok.join(F.broadcast(vocab), "token")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(davg(bits, 4).alias("bits_per_token"))
        .orderBy("doc_id")
    )


@query(
    "train_conversation_assembly",
    oracle="""
SELECT user_id,
       string_agg(event_type, ' | ' ORDER BY ts, event_id) AS dialogue,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def train_conversation_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation assembly: flatten each user's event stream into
    one ordered training row (the chat-template / session-document
    shape SFT pipelines feed tokenizers). Order inside the aggregate
    is pinned by (ts, event_id) — collect_list alone is
    partitioning-dependent, so the struct-sort-then-project idiom is
    mandatory, not cosmetic.

    Scale: exactly one shuffle on user_id; the sort is per-group
    inside the aggregate, never global. Long-tail users (bots) are
    the skew risk — cap turns per user or salt the group key when a
    user's events exceed a task's memory."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                " | ",
            ).alias("dialogue"),
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


@query(
    "train_lang_balanced_quota",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
  FROM documents
)
SELECT doc_id, lang, CAST(rk AS INT) AS rk, n_chars
FROM ranked WHERE rk <= 200
ORDER BY lang, rk
""",
)
def train_lang_balanced_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced sampling: an equal per-language quota (200
    docs) selected by content-hash order — the deterministic,
    partition-invariant version of "uniformly sample N per language"
    used to rebalance multilingual pretraining mixes (md5 ordering is
    a seedless shuffle both engines reproduce bit-identically).

    Scale: one shuffle on lang; rank + cut is the classic top-k per
    group. A language with billions of docs makes that group's sort
    heavy — AQE splits skewed partitions, or pre-filter with a hash
    range (md5 < threshold) to bound each group before ranking."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    return (
        d.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 200)
        .select("doc_id", "lang", F.col("rk").cast("int").alias("rk"), "n_chars")
        .orderBy("lang", "rk")
    )


@query(
    "join_point_in_time_scd2",
    oracle="""
WITH p AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'
),
hist AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS version,
         ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
         ROUND(value, 4) AS state_value
  FROM p
),
probes AS (
  SELECT user_id, event_id AS probe_id, CAST(ts AS TIMESTAMP) AS probe_ts
  FROM events WHERE event_type = 'view' AND event_id % 7 = 0
)
SELECT pr.user_id, pr.probe_id, pr.probe_ts,
       h.version, h.state_value
FROM probes pr JOIN hist h
  ON pr.user_id = h.user_id
 AND pr.probe_ts >= h.valid_from
 AND (h.valid_to IS NULL OR pr.probe_ts < h.valid_to)
ORDER BY pr.user_id, pr.probe_id
""",
)
def join_point_in_time_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each probe event is matched to
    the SCD2 dimension version that was valid AT its event time —
    the feature-store lookup that keeps training features leakage-free
    (a probe never sees a version from its future). Half-open
    [valid_from, valid_to) intervals guarantee exactly one match.

    Scale: equi-join on user_id carries the interval predicate as a
    post-join filter — fan-out per probe is that user's version count,
    never a cross product. Both sides come out of the same events
    scan; the history build is one window pass (see
    events_scd2_history). At warehouse scale the history table is the
    small side and broadcasts."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("h_user"),
            F.row_number().over(w).alias("version"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.round("value", 4).alias("state_value"),
        )
    )
    probes = e.filter(
        (F.col("event_type") == "view") & (F.col("event_id") % 7 == 0)
    ).select("user_id", F.col("event_id").alias("probe_id"), F.col("ts").alias("probe_ts"))
    return (
        probes.join(
            hist,
            (probes["user_id"] == hist["h_user"])
            & (probes["probe_ts"] >= hist["valid_from"])
            & (hist["valid_to"].isNull() | (probes["probe_ts"] < hist["valid_to"])),
        )
        .select("user_id", "probe_id", "probe_ts", "version", "state_value")
        .orderBy("user_id", "probe_id")
    )


@query(
    "join_salted_hot_key",
    oracle="""
WITH seg AS (
  SELECT DISTINCT user_id, user_id % 5 AS segment FROM events
)
SELECT s.segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_value
FROM events e JOIN seg s USING (user_id)
GROUP BY s.segment
ORDER BY s.segment
""",
)
def join_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-dim join through operators.skew.salted_join:
    the fact side gets a random salt, the dim side is exploded across
    all salt values, and the join key becomes (key, salt) — a hot key's
    rows spread over salt_factor tasks instead of one. The salt is an
    execution detail: output equals the plain join (which is exactly
    what the oracle runs), so this attests the pattern's correctness,
    not just its plan shape (plan tests live in
    tests/test_skew_and_text.py).

    Scale: this is the explicit fallback for pathological keys where
    AQE's runtime skew splitting can't help (pre-aggregated inputs,
    streaming state); the dim side inflates salt_factor×, acceptable
    by definition of being the small side."""
    from ibd_pipeline_spark.operators.skew import salted_join

    e = load(spark, sf_dir, "events")
    seg = (
        e.select("user_id").distinct()
        .withColumn("segment", F.col("user_id") % 5)
        .withColumnRenamed("user_id", "seg_user")
    )
    joined = salted_join(e, seg, "user_id", "seg_user", salt_factor=8)
    from ibd_pipeline_spark.queries import dsum

    return (
        joined.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("sum_value"),
        )
        .orderBy("segment")
    )


_CHUNK, _STRIDE = 50, 25


@query(
    "train_chunk_documents",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
  FROM documents
),
chunked AS (
  SELECT doc_id, n,
         CASE WHEN n <= {_CHUNK} THEN 1
              ELSE CAST(ceil((n - {_CHUNK}) / {_STRIDE}.0) AS INT) + 1 END
           AS n_chunks,
         t
  FROM toks
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       array_to_string(t[(1 + {_STRIDE} * i):({_STRIDE} * i + {_CHUNK})], ' ')
         AS chunk_text,
       CAST(LEAST({_CHUNK}, n - {_STRIDE} * i) AS INT) AS n_tokens
FROM chunked, unnest(generate_series(0, n_chunks - 1)) AS u(i)
ORDER BY doc_id, chunk_idx
""",
)
def train_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (50-token chunks, 25-token
    stride): the split step before embedding — long
    documents become overlapping rows so no passage is cut mid-context.
    Last chunk is the remainder (never padded, never dropped).

    Scale: chunk starts come from one sequence() per row and the
    explode multiplies rows by ~n/stride — per-row array ops with no
    shuffle until whatever consumes the chunks. Chunk text via ONE
    slice per chunk (bounded width), not per token."""
    d = load_wide(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks = F.when(n <= _CHUNK, F.lit(1)).otherwise(
        F.ceil((n - _CHUNK) / float(_STRIDE)).cast("int") + 1
    )
    based = d.select("doc_id", toks.alias("t"), n.alias("n"), n_chunks.alias("nc"))
    idx = F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_idx")
    exploded = based.select("doc_id", "t", "n", idx)
    start = F.lit(1) + F.lit(_STRIDE) * F.col("chunk_idx")
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(F.slice("t", start, F.lit(_CHUNK)), " ").alias("chunk_text"),
        F.least(F.lit(_CHUNK), F.col("n") - F.lit(_STRIDE) * F.col("chunk_idx"))
        .cast("int")
        .alias("n_tokens"),
    ).orderBy("doc_id", "chunk_idx")


@query(
    "train_e2e_pipeline",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, text, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
),
gated AS (  -- stage 1: repetition/quality gate
  SELECT doc_id, source, text, t, n
  FROM (
    SELECT *, {_shingles_sql('t', 3)} AS s3 FROM toks
  )
  WHERE n >= 20
    AND (len(s3) = 0 OR
         1.0 - CAST(len(list_distinct(s3)) AS DOUBLE) / len(s3) <= 0.2)
),
eval_sh AS (  -- the benchmark shingle set (eval slice of the raw corpus)
  SELECT DISTINCT unnest(list_distinct({_shingles_sql('t', 5)})) AS shingle
  FROM toks WHERE doc_id % 10 = 0
),
decon AS (  -- stage 2: drop eval-contaminated training docs
  SELECT g.* FROM gated g
  WHERE g.doc_id % 10 <> 0
    AND NOT EXISTS (
      SELECT 1 FROM unnest(list_distinct({_shingles_sql('g.t', 5)})) AS u(sh)
      JOIN eval_sh e ON e.shingle = u.sh
    )
),
ref AS (
  SELECT DISTINCT {_NORM_SQL} AS h FROM documents WHERE source = 'src0'
),
deduped AS (  -- stage 3: drop docs already in the reference corpus
  SELECT d.* FROM decon d
  WHERE d.source = 'src0'
     OR NOT EXISTS (SELECT 1 FROM ref r
                    WHERE r.h = md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g')))))
),
chunked AS (  -- stage 4: 50/25 sliding chunks
  SELECT doc_id, source,
         CASE WHEN n <= {_CHUNK} THEN 1
              ELSE CAST(ceil((n - {_CHUNK}) / {_STRIDE}.0) AS INT) + 1 END
           AS n_chunks,
         n
  FROM deduped
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)      AS n_docs_kept,
       CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
       CAST(SUM(n) AS BIGINT)        AS total_tokens
FROM chunked
GROUP BY source
ORDER BY source
""",
)
def train_e2e_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole preprocessing pass as ONE declarative plan: quality
    gate (≥20 tokens, trigram repetition ≤ 0.2) → benchmark
    decontamination (no shared 5-gram with the eval slice) →
    cross-corpus dedup (normalized hash not already in the reference
    corpus) → sliding-window chunking, reported as per-source
    accounting. Each stage exists standalone in the registry; the
    point of this query is that COMPOSED, Catalyst sees one tree —
    filters fuse with the scan, both anti-joins share the corpus
    read, and no intermediate result is ever materialized (contrast
    a step-per-job orchestrator writing parquet between stages).

    Scale: the eval shingle set is broadcast (benchmarks are MBs);
    the dedup reference reduces to digests; everything else is
    per-row. One shuffle for each anti-join + the final tiny
    aggregate."""
    d = load_wide(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    # Materialize the trigram-shingle counts ONCE in an inner
    # projection (the `text_repetition_ratio` idiom) so the repetition
    # predicate shingles each row a single time instead of three.
    s3 = _shingles(F.col("t"), 3)
    base = d.select(
        "doc_id", "source", "text", toks.alias("t"), n.alias("n")
    ).withColumns({"n_s3": F.size(s3), "n_s3_uniq": F.size(F.array_distinct(s3))})
    gated = base.filter(F.col("n") >= 20).filter(
        F.when(F.col("n_s3") == 0, F.lit(0.0)).otherwise(
            1.0 - F.col("n_s3_uniq").cast("double") / F.col("n_s3")
        )
        <= 0.2
    ).drop("n_s3", "n_s3_uniq")
    sh5 = F.explode(F.array_distinct(_shingles(F.split("text", " "), 5))).alias(
        "shingle"
    )
    eval_sh = (
        d.filter(F.col("doc_id") % 10 == 0).select(sh5).distinct()
    )
    train = gated.filter(F.col("doc_id") % 10 != 0)
    train_sh = train.select("doc_id", F.explode(
        F.array_distinct(_shingles(F.col("t"), 5))
    ).alias("shingle"))
    contaminated = train_sh.join(F.broadcast(eval_sh), "shingle").select(
        "doc_id"
    ).distinct()
    decon = train.join(contaminated, "doc_id", "left_anti")
    norm_h = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    ref = (
        d.filter(F.col("source") == "src0").select(norm_h.alias("h")).distinct()
    )
    deduped = decon.filter(F.col("source") == "src0").unionByName(
        decon.filter(F.col("source") != "src0")
        .withColumn("h", norm_h)
        .join(ref, "h", "left_anti")
        .drop("h")
    )
    n_chunks = F.when(F.col("n") <= _CHUNK, F.lit(1)).otherwise(
        F.ceil((F.col("n") - _CHUNK) / float(_STRIDE)).cast("int") + 1
    )
    return (
        deduped.select("source", F.col("n"), n_chunks.alias("n_chunks"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("n").alias("total_tokens"),
        )
        .orderBy("source")
    )
