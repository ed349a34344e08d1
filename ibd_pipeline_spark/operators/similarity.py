"""Embedding similarity search: brute-force cosine top-k (exact
baseline) and LSH-bucketed ANN (the scale path). North-star operator
set, SURVEY.md §2.2.

Vector math uses higher-order array functions (zip_with + aggregate)
— JVM-side, no Python in the scoring loop. At 100 TB the brute-force
path is the per-bucket verifier, never the global strategy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def as_double_array(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential, deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                              lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """Unit-normalize once at ingest so cosine becomes a plain dot
    product downstream — the right layout for repeated queries."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x / n)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score every pair, keep k per query via row_number.

    Returns (query_id, corpus_id, cosine_sim, rank). Self-matches are
    excluded. Ties broken by corpus id for determinism.

    Scale: O(|Q|·|C|) scoring but |Q| rides a broadcast — the corpus
    is scanned exactly once with no shuffle until the final top-k
    (which is a window over query_id). This is the exact-verification
    building block; use lsh_bucketed_topk for large |Q|.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id).alias("qid"), as_double_array(vec).alias("qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"), as_double_array(vec).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine_sim").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id),
            F.col("cid").alias(corpus_id),
            "cosine_sim",
            "rank",
        )
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH, generated
    from a seeded counter hash (no runtime RNG → plans are stable
    across runs and resumes)."""
    import hashlib
    import struct

    planes: list[list[float]] = []
    for p in range(n_planes):
        row: list[float] = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[:8]
            (u,) = struct.unpack("<q", h)
            row.append(u / float(2**63))  # uniform-ish in [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane = sign(v·h)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(
            dot(vec_col, p) >= 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucket_tables(
    vec_col: Column, dim: int, n_tables: int, bits_per_table: int, seed: int = 42
) -> Column:
    """Multi-table sign-LSH: an array of (table_id << 32 | bucket)
    keys, one per hash table. Candidate = any shared key."""
    keys = []
    for t in range(n_tables):
        planes = random_hyperplanes(dim, bits_per_table, seed=seed + 1000 * t)
        keys.append(
            (F.lit(t).cast("long") * F.lit(2**32).cast("long"))
            + lsh_bucket(vec_col, planes)
        )
    return F.array(*keys)


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_tables: int = 8,
    bits_per_table: int = 6,
    dim: int = 64,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "vec",
) -> DataFrame:
    """ANN top-k via multi-table sign-LSH: L independent hash tables
    of b hyperplane bits each; a corpus vector is a candidate for a
    query iff they share a bucket in ANY table. Score (exact cosine)
    only candidates, keep top-k.

    Recall for a neighbor at angle θ: 1-(1-p^b)^L with
    p = 1-θ/π — e.g. θ=45°, b=6, L=8 → ~74%; raise L for more
    recall at linear cost. On data with *no* angular structure
    (near-orthogonal pairs, p≈0.5) recall is honestly poor — LSH
    only buys what the geometry gives; recall is asserted on
    clustered data in tests/test_similarity.py.

    Scale: explode(bucket_keys) → equi-join on the key replaces the
    cross product; per-table buckets are balanced by construction
    (sign bits of random projections), and the dedup before scoring
    keeps each (query, candidate) pair scored once.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id).alias("qid"), as_double_array(vec).alias("qv")
    ).withColumn(
        "bkey",
        F.explode(lsh_bucket_tables(F.col("qv"), dim, n_tables, bits_per_table)),
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"), as_double_array(vec).alias("cv")
    ).withColumn(
        "bkey",
        F.explode(lsh_bucket_tables(F.col("cv"), dim, n_tables, bits_per_table)),
    )
    candidates = (
        c.join(F.broadcast(q), ["bkey"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", "qv", "cv")
        .dropDuplicates(["qid", "cid"])
    )
    scored = candidates.select(
        "qid", "cid", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine_sim").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id),
            F.col("cid").alias(corpus_id),
            "cosine_sim",
            "rank",
        )
    )
