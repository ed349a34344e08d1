"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the north-star dedup suite (SURVEY.md §2.2) for
LLM-training-data pipelines.

Design for 100 TB:
  * exact dedup = hash-groupBy on a content digest — one shuffle on
    a 128-bit key, perfectly parallel;
  * near-dup never compares all O(n²) pairs: MinHash LSH bands (or
    SimHash prefixes) generate candidate buckets, pairs are verified
    only within buckets. All hashing uses Spark's built-in xxhash64 —
    deterministic, JVM-side, no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def normalized_text(text: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    txt = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(txt)), r"\s+", " ")


def content_digest(text: Column | str) -> Column:
    """md5 of normalized text — the exact-dedup grouping key."""
    return F.md5(normalized_text(text))


def shingles(text: Column | str, k: int = 3) -> Column:
    """Word k-gram shingle set (distinct), via higher-order array fns:
    slide a window over the token array with transform(sequence(...)).
    Stays in codegen — no explode, no Python."""
    toks = F.split(F.col(text) if isinstance(text, str) else text, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
    )
    return F.array_distinct(
        F.when(n >= k, F.transform(idx, gram)).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for each of `num_hashes` hash families, the
    minimum hash over the shingle set. Approximates Jaccard
    similarity: P[sig_i matches] = J(A,B).

    Cost shape: the variable-length shingle *strings* are hashed
    exactly once (xxhash64); each additional family re-hashes the
    resulting 8-byte longs — O(shingles + families·shingles·const)
    instead of O(families·shingles·strlen). All JVM-side."""
    base_hashes = F.transform(shingle_col, lambda s: F.xxhash64(s))

    # NB: the family id must be closed over with a one-argument lambda.
    # A two-argument `lambda h, i=i:` looks like a default-arg capture
    # but Spark passes (element, array_index) to binary transform
    # lambdas — the index SHADOWS the default and every "family"
    # becomes the same function (caught by the Hypothesis property
    # test: signature agreement hit 1.0 on a J=0.5 pair).
    def family(fam: int):
        return lambda h: F.xxhash64(h, F.lit(fam))

    return F.array(
        *[
            F.array_min(F.transform(base_hashes, family(i)))
            for i in range(num_hashes)
        ]
    )


def band_keys(sig_col: Column, num_bands: int, rows_per_band: int) -> Column:
    """LSH banding: split the signature into bands and hash each band.
    Docs sharing ANY band key are candidates. For signature length
    n = num_bands * rows_per_band, P[candidate] = 1-(1-J^r)^b."""
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(sig_col, b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                ),
                F.lit(b),
            )
            for b in range(num_bands)
        ]
    )


# ---------------------------------------------------------------------------
# Session-level signature cache (r11, VERDICT #3 — the multimodal
# _cached_asset_frame pattern applied to dedup state): the per-doc
# MinHash state (shingle set + 32 signature minima) is the single
# most expensive artifact in the dedup family, and SIX registry
# queries derive it from the same upstream frames
# (dedup_minhash_lsh, dedup_near_dup_prune,
# dedup_source_overlap_matrix, dedup_minhash_jaccard_estimate,
# dedup_label_propagation, dedup_pagerank_canonical,
# dedup_incremental_lsh). Keyed by (applicationId, semanticHash of
# the input plan, params): semanticHash equates structurally
# identical upstream plans, so two queries that both start from
# documents.filter(doc_id < 150) share ONE eagerly-localCheckpointed
# state frame. Entries from stopped sessions are purged on miss; a
# small LRU cap bounds test-suite churn. At 100 TB this cache is the
# stand-in for a PERSISTED signature table (signatures written once
# at ingest, every dedup job reading them) — session scope is the
# local-mode equivalent.
# ---------------------------------------------------------------------------
_SESSION_STATE_CACHE: "dict[tuple, DataFrame]" = {}
_SESSION_STATE_CAP = 32


def _session_cached_state(docs: DataFrame, params: tuple, build) -> DataFrame:
    spark = docs.sparkSession
    app = spark.sparkContext.applicationId
    try:
        sem = docs._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return build().cache()  # non-classic backend: per-call cache
    key = (app, sem, *params)
    hit = _SESSION_STATE_CACHE.get(key)
    if hit is None:
        for k in [k for k in _SESSION_STATE_CACHE if k[0] != app]:
            del _SESSION_STATE_CACHE[k]
        while len(_SESSION_STATE_CACHE) >= _SESSION_STATE_CAP:
            del _SESSION_STATE_CACHE[next(iter(_SESSION_STATE_CACHE))]
        hit = build().localCheckpoint(eager=True)
        _SESSION_STATE_CACHE[key] = hit
    return hit


def exact_keeper_ids(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Session-cached exact-dedup keeper set: min(id) per content
    digest, id column only (tiny at any scale — one row per distinct
    text). Two registry queries that both stage exact-dedup before
    LSH (dedup_minhash_lsh, dedup_near_dup_prune) build their
    representative frames through THIS shared object, so their
    downstream minhash states hash to the same _SESSION_STATE_CACHE
    key and the shingle aggregation runs once per session. min(id)
    is the same keeper as min(struct(id, text)) because ids are
    unique. Eagerly checkpointed by the session cache."""
    return _session_cached_state(
        docs,
        ("keepers", id_col, text_col),
        lambda: docs.groupBy(content_digest(text_col).alias("h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col),
    )


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    restrict_to: DataFrame | None = None,
    portable: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash LSH, with exact Jaccard
    verification on the (64-bit-hashed) shingle sets of each
    candidate pair. Returns (id_a, id_b, jaccard), id_a < id_b,
    deduplicated across bands.

    Shape chosen for both cluster scale AND codegen sanity:
      1. explode word k-grams → (id, shingle_hash) rows — the string
         is hashed once, immediately, so no stage ever shuffles text;
      2. ONE hash aggregate computes the whole state per doc:
         collect_set(hash) (the verification set) + num_hashes ×
         min(xxhash64(hash, i)) (the signature) — plain aggregates,
         no giant higher-order lambdas for the JIT to chew on;
      3. band keys are multi-arg xxhash64 over signature slices;
      4. bucket equi-join on (band, bucket) → shuffle O(n·bands);
      5. Jaccard on long-hash sets (collision odds ~2⁻⁶⁴ — immaterial)
         via array_intersect sizes, only for bucket-colliding pairs.

    The per-doc state relation is SESSION-cached (r11 — see
    _SESSION_STATE_CACHE above): it feeds banding and both join sides
    of the verification here, and structurally identical invocations
    from other registry queries reuse the same eagerly-checkpointed
    frame instead of re-aggregating shingles. ``release_state`` on
    the result is a no-op for this operator. Mega-buckets
    (boilerplate docs) remain the skew risk: cap or salt upstream if
    a bucket exceeds ~10⁴ docs.

    restrict_to: optional one-column DataFrame of delta doc ids —
    incremental mode: emit only candidate pairs touching those ids
    (the Δ⋈all geometry; base×base pairs are assumed already
    materialized by a previous run). The invariant
    pairs(all) = pairs(base) ∪ pairs(all, restrict_to=Δ) is
    property-tested in tests/test_dedup.py.

    portable=True swaps every hash for the md5_bucket idiom (shingle
    hash = first 32 bits of md5; family i = 32-bit word (i mod 4) of
    md5("<i//4>:h"), so one digest feeds four families and the path
    pays 8 digests per shingle, not 32; band buckets become the
    plain comma-joined minima string) so a DuckDB oracle replays the
    ENTIRE pipeline — shingle hashes, the 32 signature minima, band
    collisions, and the exact-Jaccard verify — value-for-value.
    xxhash64 stays the at-scale default (8-byte JVM hash vs a hex
    round-trip per family)."""
    rows_per_band = num_hashes // num_bands
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(k_shingle)]
    )
    idx = F.sequence(F.lit(0), F.greatest(n - k_shingle, F.lit(0)))
    grams = F.when(n >= k_shingle, F.transform(idx, gram)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )
    if portable:
        # base shingle hash: first 8 md5 hex chars AS A STRING — the
        # set algebra (collect_set + array_intersect) and the family
        # digest input only need a stable token, so the hex→long
        # parse is dead weight here too.
        base_h = F.substring(F.md5(F.col("g")), 1, 8)
        # Family i reads 32-bit word (i mod 4) of digest group (i//4):
        # one md5 digest feeds FOUR families, so the portable path
        # pays 8 digest computations per shingle instead of 32. The
        # digests are materialized in an explicit projection below —
        # guaranteed single evaluation, no reliance on codegen
        # subexpression elimination inside the aggregate. The minima
        # stay 8-char lowercase-hex STRINGS: fixed-width hex orders
        # lexicographically == numerically in both engines, so the
        # per-row hex→long parse (F.conv — the measured hot spot) is
        # skipped entirely; band buckets are string joins anyway.
        fam = lambda i: F.min(  # noqa: E731
            F.substring(F.col(f"d{i // 4}"), 1 + 8 * (i % 4), 8)
        ).alias(f"m{i}")
    else:
        base_h = F.xxhash64("g")
        fam = lambda i: F.min(F.xxhash64("h", F.lit(i))).alias(f"m{i}")  # noqa: E731

    exploded = docs.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("g")
    ).select("id", base_h.alias("h"))
    if portable:
        exploded = exploded.select(
            "id",
            "h",
            *[
                F.md5(
                    F.concat_ws(":", F.lit(str(g)), F.col("h").cast("string"))
                ).alias(f"d{g}")
                for g in range(num_hashes // 4)
            ],
        )

    state = _session_cached_state(
        docs,
        ("minhash", id_col, text_col, k_shingle, num_hashes, portable),
        lambda: exploded.groupBy("id").agg(
            F.collect_set("h").alias("hs"),
            *[fam(i) for i in range(num_hashes)],
        ),
    )
    if portable:
        band_cols = [
            F.concat_ws(
                ",",
                *[
                    F.col(f"m{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            ).alias(f"b{b}")
            for b in range(num_bands)
        ]
    else:
        band_cols = [
            F.xxhash64(
                *[F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)],
                F.lit(b),
            ).alias(f"b{b}")
            for b in range(num_bands)
        ]
    banded = state.select("id", F.posexplode(F.array(*band_cols)).alias("band", "bucket"))
    if restrict_to is not None:
        # Incremental mode: only pairs TOUCHING the delta id set are
        # generated — the delta's band rows join against everyone, so
        # base×base candidates (already materialized by the previous
        # run) are never re-enumerated. This is the LSH form of
        # insert-only incremental view maintenance: cost scales with
        # |Δ|·bands, not |corpus|·bands.
        delta_banded = banded.join(
            restrict_to.select(F.col(restrict_to.columns[0]).alias("id")),
            "id",
            "left_semi",
        )
        d, o = delta_banded.alias("l"), banded.alias("r")
        pairs = (
            d.join(
                o,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.id") != F.col("r.id")),
            )
            .select(
                F.least(F.col("l.id"), F.col("r.id")).alias("id_a"),
                F.greatest(F.col("l.id"), F.col("r.id")).alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        left, right = banded.alias("l"), banded.alias("r")
        pairs = (
            left.join(
                right,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    a = state.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
    b = state.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
    union = F.size(F.array_union("hs_a", "hs_b")).cast("double")
    result = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
    )
    # No release handle: the state frame is SESSION-cached (shared
    # across the six minhash-consuming registry queries) and owned by
    # _SESSION_STATE_CACHE, not this result — release_state() on the
    # result is a harmless no-op.
    return result


def release_state(df: DataFrame) -> bool:
    """Unpersist the cached per-doc state backing a DataFrame returned
    by the SimHash pair operators (no-op on other frames, including
    minhash_candidate_pairs results since r11 — their state is
    session-cached in _SESSION_STATE_CACHE and shared across queries,
    so it deliberately outlives any one result). Returns True if
    blocks were released."""
    state = getattr(df, "_cached_state", None)
    if state is None:
        return False
    state.unpersist()
    return True


def _bit_mask(bit: int) -> Column:
    # 1<<63 overflows signed int64; it is the sign bit itself.
    return F.lit((1 << bit) if bit < 63 else -(2**63)).cast("long")


def simhash64(text: Column | str, ngram: int = 2) -> Column:
    """64-bit SimHash over word n-grams, as pure column algebra.

    For each of the 64 bit positions: sum over shingles of ±1
    depending on that bit of xxhash64(shingle); sign of the sum gives
    the output bit. Near-identical docs differ in few bits (small
    Hamming distance).

    ⚠ Expression-form trade-off: the 64 per-bit aggregate() calls each
    inline the tokenize+hash subtree (CollapseProject re-substitutes
    common subexpressions), and the resulting mega-expression exceeds
    codegen limits and falls back to interpreted eval — fine for tests
    and small frames, ~100× too slow on a corpus. Use
    simhash_signatures() (explode + one hash-aggregate, identical
    output) for anything sized; simhash_near_dup_pairs does.
    """
    sh = shingles(text, ngram)
    h = F.transform(sh, lambda s: F.xxhash64(s))

    def bit_sign_sum(bit: int) -> Column:
        # +1 when bit set, -1 otherwise, summed across shingles.
        return F.aggregate(
            h,
            F.lit(0),
            lambda acc, x: acc
            + F.when(x.bitwiseAND(_bit_mask(bit)) != 0, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for bit in range(64):
        out = out + F.when(bit_sign_sum(bit) > 0, _bit_mask(bit)).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", ngram: int = 2
) -> DataFrame:
    """SimHash signatures as a distributed plan: tokenize + hash each
    document ONCE (explode the shingle-hash array), then one
    map-side-combined hash-aggregate computes all 64 per-bit ±1 sums
    as ordinary sum(when(...)) columns, and a final projection folds
    them into the signature. Output: (id, sig) with id named after
    `id_col`.

    Bit-for-bit identical to the simhash64 expression (same shingle
    set, same xxhash64, same sign rule — asserted in tests), but every
    operator stays in whole-stage codegen: the explode is linear in
    corpus tokens, the aggregate is 64 longs of state per doc. This is
    the form that survives a 100 TB corpus; the shuffle key is the doc
    id, so it co-partitions with any downstream per-doc join."""
    h = F.transform(shingles(text_col, ngram), lambda s: F.xxhash64(s))
    # Tokenize+hash is the dominant cost and runs in the SCAN stage;
    # a small corpus arrives as 1-2 parquet splits and would serialize
    # it on 1-2 cores. Fan the rows out first when the source has
    # fewer splits than the cluster has slots. r16: the split count
    # comes from the zero-job file-size heuristic
    # (_estimated_scan_splits) — the old df.rdd.getNumPartitions()
    # "metadata check" actually launches a DataFrame→RDD conversion
    # job (~1 s of wall per call on Spark 4, the _estimated_scan_splits
    # docstring's own measurement). Non-file-backed frames return a
    # large sentinel and stay untouched — at real scale the input has
    # plenty of splits and no exchange is added; the repartition is a
    # perf-only branch either way (per-doc aggregates are
    # partition-invariant).
    from ibd_pipeline_spark.operators.similarity import _estimated_scan_splits

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    if _estimated_scan_splits(docs) < max(2, parallelism // 2):
        docs = docs.repartition(parallelism)
    exploded = docs.select(F.col(id_col).alias("id"), F.explode(h).alias("hv"))
    sums = exploded.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("hv").bitwiseAND(_bit_mask(b)) != 0, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig + F.when(F.col(f"b{b}") > 0, _bit_mask(b)).otherwise(
            F.lit(0).cast("long")
        )
    return sums.select("id", sig.alias("sig"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    prefix_bits: int = 12,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the top `prefix_bits` of
    the signature (near-dups almost always share the prefix), verify
    Hamming distance within blocks.

    Scale: prefix blocking bounds the join the same way LSH bands do.
    For higher recall at scale, use simhash_near_dup_pairs_multi —
    the rotate-and-reblock multi-table scheme.

    The signature frame is persisted so the self-join's two sides
    share ONE tokenize+hash pass (no ReusedExchange fires for this
    shape — verified on the formatted plan); callers release with
    release_state(result), the minhash_candidate_pairs contract.
    """
    from pyspark import StorageLevel

    sig = (
        simhash_signatures(docs, id_col, text_col)
        .withColumn("blk", F.shiftrightunsigned("sig", 64 - prefix_bits))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    l, r = sig.alias("l"), sig.alias("r")
    result = (
        l.join(r, (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            hamming64(F.col("l.sig"), F.col("r.sig")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    result._cached_state = sig  # release handle; see release_state()
    return result


def simhash_signatures_md5(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", ngram: int = 2
) -> DataFrame:
    """Engine-PORTABLE SimHash signatures: 32-bit, per-shingle hash =
    first 8 hex digits of md5 (the md5_bucket idiom from
    operators/sketches.py) instead of xxhash64 — every step is exact
    integer algebra DuckDB can replay, which makes the whole
    near-dup pipeline (signature → chunk blocking → Hamming verify)
    hash-attestable against a SQL oracle.

    Same distributed plan shape as simhash_signatures (explode the
    shingle set once, ONE map-side-combined hash-aggregate with 32
    ±1 sums, fold to the signature); the xxhash64 64-bit form stays
    the library default for throughput (8-byte JVM hash, no hex
    round-trip) — use THIS form when cross-engine reproducibility
    matters more than the constant factor. Output: (id, sig), sig a
    non-negative 32-bit value in a bigint."""
    grams = shingles(text_col, ngram)
    hv = F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("bigint")
    # zero-job split estimate — see simhash_signatures (r16): the old
    # df.rdd.getNumPartitions() check launched a conversion job.
    from ibd_pipeline_spark.operators.similarity import _estimated_scan_splits

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    if _estimated_scan_splits(docs) < max(2, parallelism // 2):
        docs = docs.repartition(parallelism)
    exploded = docs.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("_g")
    ).select("id", hv.alias("hv"))
    sums = exploded.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftrightunsigned(F.col("hv"), b).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(32)
        ]
    )
    sig = F.lit(0).cast("bigint")
    for b in range(32):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sums.select("id", sig.alias("sig"))


def simhash32_pairs(
    sig: DataFrame,
    max_hamming: int = 4,
    tables: int = 4,
    chunk_bits: int = 8,
) -> DataFrame:
    """Chunk-banded near-dup join over 32-bit portable signatures:
    block table t on chunk t = (sig >> chunk_bits·t) & (2^chunk_bits−1)
    — the Manku rotate-and-reblock guarantee in its join form (a pair
    within Hamming < tables agrees exactly on ≥ 1 chunk by
    pigeonhole), verified once with bit_count(xor). Defaults scale
    the 64-bit scheme down 2×: 4 tables × 8-bit chunks, Hamming ≤ 4
    of 32 (the same 12.5% dissimilarity budget as 8 of 64).

    Returns (id_a, id_b, hamming). The signature frame is persisted
    so the banded self-join's two sides share one signature pass;
    callers release with release_state(result)."""
    from pyspark import StorageLevel

    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    mask = (1 << chunk_bits) - 1
    blocks = F.array(
        *[
            F.shiftrightunsigned(F.col("sig"), t * chunk_bits).bitwiseAND(
                F.lit(mask)
            )
            for t in range(tables)
        ]
    )
    band = sig.select("id", "sig", F.posexplode(blocks).alias("t", "blk"))
    l, r = band.alias("l"), band.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.t") == F.col("r.t"))
            & (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .distinct()
    )
    result = cand.select(
        "id_a",
        "id_b",
        hamming64(F.col("sig_a"), F.col("sig_b")).cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    result._cached_state = sig  # release handle; see release_state()
    return result


def _rotl64(col: Column, r: int) -> Column:
    """Rotate a 64-bit signature left by r bits (r in 1..63)."""
    return F.shiftleft(col, r).bitwiseOR(F.shiftrightunsigned(col, 64 - r))


def simhash_near_dup_pairs_multi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    tables: int = 4,
    prefix_bits: int = 16,
) -> DataFrame:
    """Multi-table SimHash near-dup pairs: the standard
    rotate-and-reblock scheme (Manku/Jain/Sarma, WWW'07 — the Google
    simhash dedup paper). The 64-bit signature is rotated left by
    64·t/tables for each table t and blocked on the top `prefix_bits`
    of each rotation; a pair is a candidate if it collides in ANY
    table, and candidates are Hamming-verified once.

    Recall: with the defaults (4 tables × disjoint 16-bit chunks),
    any pair with Hamming ≤ 3 agrees EXACTLY on at least one chunk
    (pigeonhole: 3 flipped bits touch ≤ 3 of the 4 chunks) — a
    guarantee the single-prefix form lacks, and strictly more recall
    than it for any budget (table 0 with prefix 16 ⊃ the 12-bit
    prefix blocks). At Hamming 4-8 collisions remain probabilistic
    but four chances beat one; the recall ordering is
    property-tested on planted flips.

    Scale: signatures are computed by the same one-pass hash-agg plan
    (simhash_signatures); the band-row explode multiplies the
    (id, sig) table — 16 bytes/row — by `tables`, NOT the corpus, and
    the per-table self-join is bounded by block occupancy exactly
    like MinHash LSH bands. Candidate pairs dedup on (id_a, id_b)
    before the single Hamming verify projection.
    """
    sig = simhash_signatures(docs, id_col, text_col)
    return simhash_pairs_multi_from_sigs(sig, max_hamming, tables, prefix_bits)


def simhash_pairs_multi_from_sigs(
    sig: DataFrame,
    max_hamming: int = 8,
    tables: int = 4,
    prefix_bits: int = 16,
) -> DataFrame:
    """The rotate-and-reblock candidate join over a precomputed
    (id, sig) signature frame — split out so the pigeonhole recall
    guarantee is testable on planted exact bit flips (see
    simhash_near_dup_pairs_multi for the scheme and scale notes).
    The signature frame is persisted so the banded self-join's two
    sides share one upstream signature pass; callers release with
    release_state(result)."""
    from pyspark import StorageLevel

    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    step = 64 // tables
    blocks = F.array(
        *[
            F.shiftrightunsigned(
                _rotl64(F.col("sig"), t * step) if t else F.col("sig"),
                64 - prefix_bits,
            )
            for t in range(tables)
        ]
    )
    band = sig.select("id", "sig", F.posexplode(blocks).alias("t", "blk"))
    l, r = band.alias("l"), band.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.t") == F.col("r.t"))
            & (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .distinct()
    )
    result = cand.select(
        "id_a",
        "id_b",
        hamming64(F.col("sig_a"), F.col("sig_b")).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    result._cached_state = sig  # release handle; see release_state()
    return result


def semdedup_pairs(
    vectors: DataFrame,
    epsilon: float = 0.30,
    k: "int | None" = None,
    iters: int = 4,
    target_cluster_size: int = 1000,
    k_min: int = 8,
    id_col: str = "vec_id",
    vec: str = "embedding",
    cache_key: "tuple | None" = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) candidate machinery: k-means
    cluster blocking + within-cluster fixed-point cosine pair scan.
    Returns (cluster_id, ia, ib, cs) for every within-cluster pair
    ia < ib with its ROUND(cos, 9); callers filter cs >= epsilon for
    prune sets or aggregate per cluster (dedup_semantic_clusters).
    The returned frame also exposes the assignment via
    `result._assigned` (vec_id, cluster_id) so consumers don't rerun
    the fixpoint.

    SCALE-SAFE DEFAULT (r11 VERDICT #3): with k=None the cluster
    count is derived as k = max(k_min, ceil(n / target_cluster_size))
    — the published k ∝ n contract that holds per-cluster size (and
    hence candidate pairs, Σ_c |c|²/2) LINEAR in corpus size. The r11
    probe measured fixed k=8 under a 4× corpus going quadratic
    (pairs ×16) while k scaled 8→32 stayed linear (pairs ×4); an
    operator whose default silently goes quadratic at scale is the
    named degradation mode, so the derived k is the default and a
    fixed k is the explicit opt-in (the attested registry query pins
    k=8 because its DuckDB oracle unrolls that exact fixpoint).
    Determinism: kmeans_attested inits from the k lowest ids — no
    RNG — so a derived k is just as replayable given n.

    Exactness contract (shared with the oracle): per-dim products
    quantized FLOOR(·10¹²) into BIGINT sums (order-independent),
    one double division + ROUND(·,9) per pair."""
    import math

    from ibd_pipeline_spark.operators import similarity as S

    if k is None:
        n = vectors.count()
        k = max(k_min, math.ceil(n / target_cluster_size))
    build = lambda: S.kmeans_attested(  # noqa: E731
        vectors, k=k, iters=iters, id_col=id_col, vec=vec
    )
    if cache_key is not None:
        assigned = _session_cached_state(vectors, cache_key, build)
    else:
        assigned = build()
    assigned = assigned.select(F.col(id_col).alias("vec_id"), "cluster_id")
    # r15 note: a columnar-expanded codegen dot (the
    # cosine_near_dup_pairs optimization) was A/B-measured HERE and
    # lost (2.7 s fold vs 2.8-4.3 s columnar): this pair scan is a
    # cluster-keyed self-JOIN, so the expansion widens the shuffled
    # rows 64× — unlike the broadcast-side pair verify where only the
    # probe widens. The interpreted fold stays.
    vecs = vectors.select(
        F.col(id_col).alias("vec_id"),
        S.as_double_array(vec).alias("v"),
    ).withColumn(
        "nfp",
        F.expr(
            "aggregate(transform(v, x -> CAST(FLOOR(x * x * 1e12) AS"
            " BIGINT)), 0L, (acc, t) -> acc + t)"
        ),
    )
    j = assigned.join(vecs, "vec_id")
    a = j.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("ia"),
        F.col("v").alias("va"),
        F.col("nfp").alias("nfa"),
    )
    b = j.select(
        F.col("cluster_id").alias("cb"),
        F.col("vec_id").alias("ib"),
        F.col("v").alias("vb"),
        F.col("nfp").alias("nfb"),
    )
    dot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> CAST(FLOOR(x * y * 1e12) AS"
        " BIGINT)), 0L, (acc, t) -> acc + t)"
    )
    pairs = a.join(
        b,
        (F.col("cluster_id") == F.col("cb")) & (F.col("ia") < F.col("ib")),
    ).select(
        "cluster_id",
        "ia",
        "ib",
        F.round(
            dot.cast("double")
            / F.sqrt(
                F.col("nfa").cast("double") * F.col("nfb").cast("double")
            ),
            9,
        ).alias("cs"),
    )
    pairs._assigned = assigned  # share the fixpoint with consumers
    return pairs
