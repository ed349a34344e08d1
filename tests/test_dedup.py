"""Property tests for the approximate dedup operators (no SQL oracle
— SURVEY.md §5.4): MinHash precision against exact Jaccard, SimHash
invariants, and candidate-generation sanity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ibd_pipeline_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base),
        (1, base),  # exact duplicate of 0
        (2, base.replace("quick", "slow")),  # near-dup of 0
        (3, "completely different text about spark dataframes and shuffles here"),
        (4, base + " with a small suffix appended"),  # near-dup
        (5, "another unrelated document mentioning parquet files and row groups"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_digest_groups_duplicates(spark, docs):
    d = docs.withColumn("digest", D.content_digest("text"))
    groups = d.groupBy("digest").count().filter("count > 1").collect()
    assert len(groups) == 1 and groups[0]["count"] == 2


def test_minhash_identical_docs_always_candidates(spark, docs):
    pairs = D.minhash_candidate_pairs(docs).collect()
    by_pair = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert by_pair.get((0, 1)) == 1.0  # identical docs: J=1, all bands collide
    # near-dups should surface as candidates with high jaccard
    assert any(j >= 0.5 for (a, b), j in by_pair.items() if {a, b} & {2, 4})
    # verified jaccard values must be exact (checked against python)
    def jac(x, y):
        def sh(t):
            w = t.split()
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        a, b = sh(x), sh(y)
        return len(a & b) / len(a | b)

    texts = {r.doc_id: r.text for r in docs.collect()}
    for (a, b), j in by_pair.items():
        assert abs(j - jac(texts[a], texts[b])) < 1e-6


def test_minhash_no_false_negatives_on_fixture(spark, sf_dir):
    """Every high-Jaccard pair (J≥0.7) found by brute force on a
    150-doc slice must be recovered by the LSH path (8 bands × 4 rows
    → P[miss at J=0.7] = (1-0.7⁴)^8 ≈ 10%; assert ≥80% recall to
    keep the test robust)."""
    from ibd_pipeline_spark.catalog import load

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    sh = docs.select("doc_id", D.shingles("text", 3).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    jac = F.size(F.array_intersect("a.sh", "b.sh")).cast("double") / F.size(
        F.array_union("a.sh", "b.sh")
    )
    truth = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jac.alias("j"),
        )
        .filter("j >= 0.7")
        .collect()
    }
    found = {
        (r.id_a, r.id_b)
        for r in D.minhash_candidate_pairs(docs).filter("jaccard >= 0.7").collect()
    }
    if truth:
        recall = len(truth & found) / len(truth)
        assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(truth)} true pairs"


def test_simhash_invariants(spark, docs):
    sigs = {
        r.doc_id: r.sig
        for r in docs.select("doc_id", D.simhash64("text").alias("sig")).collect()
    }
    assert sigs[0] == sigs[1]  # identical text → identical signature
    h = lambda a, b: bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")  # noqa: E731
    assert h(0, 2) <= 16  # near-dup → small hamming distance
    assert h(0, 3) > h(0, 2)  # unrelated doc is farther than near-dup


def test_simhash_pairs_find_near_dups(spark, docs):
    pairs = {(r.id_a, r.id_b): r.hamming for r in D.simhash_near_dup_pairs(docs).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0


def test_near_dup_prune_invariants(spark, sf_dir):
    """End-to-end prune pipeline: survivor counts are monotone
    (near ≤ exact ≤ total), every source survives with ≥ 1 doc, and
    the totals reconcile with the standalone exact-dedup stage."""
    import pyspark.sql.functions as F

    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.operators import dedup as D
    from ibd_pipeline_spark.queries import all_queries

    out = {
        r["source"]: r
        for r in all_queries()["dedup_near_dup_prune"](spark, sf_dir).collect()
    }
    assert out, "no sources"
    for r in out.values():
        assert r["n_after_near"] <= r["n_after_exact"] <= r["n_docs"]
        assert r["n_after_near"] >= 1

    d = load(spark, sf_dir, "documents")
    n_exact_total = (
        d.select(D.content_digest("text").alias("h")).distinct().count()
    )
    assert sum(r["n_after_exact"] for r in out.values()) == n_exact_total


def test_incremental_lsh_identity(spark, sf_dir):
    """Insert-only incremental LSH: pairs over the full corpus must
    equal base-only pairs ∪ delta-touching pairs — the IVM identity
    for candidate generation. Any banding drift between the two modes
    (a changed seed, a missed band) breaks this exactly."""
    import pyspark.sql.functions as F

    from ibd_pipeline_spark.catalog import load
    from ibd_pipeline_spark.operators.dedup import (
        minhash_candidate_pairs,
        release_state,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    gate = F.col("doc_id") % 5 == 0
    base, delta = docs.filter(~gate), docs.filter(gate)

    full = minhash_candidate_pairs(docs)
    base_only = minhash_candidate_pairs(base)
    incr = minhash_candidate_pairs(docs, restrict_to=delta.select("doc_id"))
    try:
        full_p = {(r["id_a"], r["id_b"]) for r in full.collect()}
        base_p = {(r["id_a"], r["id_b"]) for r in base_only.collect()}
        incr_p = {(r["id_a"], r["id_b"]) for r in incr.collect()}
        assert base_p | incr_p == full_p
        assert base_p.isdisjoint(incr_p)
        # every incremental pair touches the delta
        delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
        for a, b in incr_p:
            assert a in delta_ids or b in delta_ids
    finally:
        for df in (full, base_only, incr):
            release_state(df)


def test_simhash_multitable_pigeonhole_guarantee(spark):
    """4 rotations x 16-bit prefixes cover the 4 disjoint 16-bit
    chunks of the signature: ANY pair within Hamming 3 agrees exactly
    on >=1 chunk and MUST be found. Plant flips in the TOP prefix
    bits — exactly where single-prefix blocking goes blind."""
    base = 0x5A5A_C3C3_0F0F_9999
    mask = (1 << 64) - 1

    def signed(u):  # Spark bigint is signed 64-bit
        return u - (1 << 64) if u >= (1 << 63) else u

    rows = [(0, signed(base))]
    # flips at bits 63, 62, 50 (all inside single-table 12-bit prefix
    # territory or first chunk), spread across ids 1..3 with hamming
    # 1, 2, 3 from base
    rows.append((1, signed(base ^ (1 << 63))))
    rows.append((2, signed(base ^ (1 << 63) ^ (1 << 62))))
    rows.append((3, signed(base ^ (1 << 63) ^ (1 << 30) ^ (1 << 5))))
    sig = spark.createDataFrame(rows, "id bigint, sig bigint")
    found = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_pairs_multi_from_sigs(sig, max_hamming=8).collect()
    }
    # every base-vs-flipped pair has hamming <= 3 -> guaranteed found
    assert found[(0, 1)] == 1
    assert found[(0, 2)] == 2
    assert found[(0, 3)] == 3
    # and the single 12-bit-prefix form misses every base-vs-flipped
    # pair (the flip at bit 63 lands inside the prefix, so the blocks
    # differ), demonstrating the recall gap the multi-table scheme
    # closes
    blk = sig.selectExpr("id", "sig", "shiftrightunsigned(sig, 52) AS blk")
    single = {
        (r.id_a, r.id_b)
        for r in blk.alias("l")
        .join(
            blk.alias("r"),
            (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .collect()
    }
    assert all(a != 0 for a, _ in single)


def test_simhash_multitable_recall_at_least_single_table(spark, docs):
    """On the text fixture the multi-table pass finds every pair the
    single-prefix pass finds (same Hamming cutoff, four chances to
    collide instead of one)."""
    single = {
        (r.id_a, r.id_b) for r in D.simhash_near_dup_pairs(docs).collect()
    }
    multi = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_dup_pairs_multi(docs).collect()
    }
    assert single <= multi
