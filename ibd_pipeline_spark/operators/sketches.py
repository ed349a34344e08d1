"""Distributed sketch structures built from first principles on the
DataFrame API (round 5, wave 3): a Count-Min sketch and a Bloom
filter whose hash functions are the engine-portable md5 idiom, plus
Spark's built-in DataSketches HLL aggregates wrapped for mergeable
rollups.

Why hand-built sketches when Spark has `approx_count_distinct` and a
(JVM-internal) BloomFilter? Because the md5-derived forms are pure
functions of the data — identical in any engine, partitioning, and
rerun — which makes them (a) DuckDB-oracle-checkable exactly, and
(b) safe to persist and probe from a different system later (a CMS
table written by this engine can be probed by anything that can md5).
The built-in HLL path is kept alongside for the case where only
Spark reads the sketch (binary DataSketches payload, far tighter
memory).

Scale notes per structure are on each builder.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

CMS_DEPTH = 4
CMS_WIDTH = 512

BLOOM_BITS = 8192
BLOOM_HASHES = 3


def md5_bucket(col: Column, seed: Column | int, mod: int) -> Column:
    """Engine-portable hash bucket: first 8 hex digits of
    md5(seed:value) mod `mod`. DuckDB twin:
    ``('0x' || substring(md5(seed || ':' || v), 1, 8))::BIGINT % mod``.
    """
    seed_c = F.lit(seed) if isinstance(seed, int) else seed
    keyed = F.concat_ws(":", seed_c.cast("string"), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("bigint") % mod
    )


def cms_build(counts: DataFrame, key: str, weight: str) -> DataFrame:
    """Count-Min sketch as a (seed, bucket, cnt) DataFrame, built from
    an already-aggregated (key, weight) frame. depth=4 rows of
    width=512 counters; every counter is the sum of the weights whose
    key hashes into it under that row's seed.

    Scale: the input aggregate is the only row-count-proportional
    shuffle; the sketch build explodes DEPTH rows per *distinct* key
    (not per occurrence) and reduces to at most DEPTH×WIDTH = 2048
    counters — the output is fixed-size no matter the corpus, which is
    the entire point of a sketch. Counters are exact sums, so the
    classic CMS guarantee holds deterministically: estimate ≥ truth,
    and overestimate ≤ colliding mass.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("seed")
    return (
        counts.select(F.col(key), F.col(weight), seeds)
        .select(
            "seed",
            md5_bucket(F.col(key), F.col("seed"), CMS_WIDTH).alias("bucket"),
            F.col(weight),
        )
        .groupBy("seed", "bucket")
        .agg(F.sum(weight).cast("bigint").alias("cnt"))
    )


def cms_probe(cms: DataFrame, probes: DataFrame, key: str) -> DataFrame:
    """Estimate each probe key's count: min over the DEPTH rows of the
    counter its hash lands in. The probe frame is expected to be small
    (top-k candidates, an allowlist) — it is broadcast; the sketch
    side is at most DEPTH×WIDTH rows, so the join never shuffles
    anything data-sized.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("seed")
    probe_buckets = probes.select(
        F.col(key), seeds
    ).select(
        F.col(key),
        F.col("seed"),
        md5_bucket(F.col(key), F.col("seed"), CMS_WIDTH).alias("bucket"),
    )
    return (
        cms.join(F.broadcast(probe_buckets), ["seed", "bucket"])
        .groupBy(key)
        .agg(F.min("cnt").cast("bigint").alias("cms_estimate"))
    )


def bloom_positions(col: Column) -> list[Column]:
    """The BLOOM_HASHES bit positions of a key — each an independent
    md5-derived bucket in [0, BLOOM_BITS)."""
    return [
        md5_bucket(col, j, BLOOM_BITS).alias(f"pos{j}")
        for j in range(BLOOM_HASHES)
    ]


def bloom_build(keys: DataFrame, key: str) -> DataFrame:
    """Bloom filter over a (small) key set as a ONE-ROW DataFrame
    holding the sorted distinct set of set bit positions. Intended for
    broadcast: the array is at most min(|keys|·k, 8192) ints. The
    aggregation never touches the driver — the single row rides a
    broadcast join into the probe side.

    At 100 TB the filter side must stay broadcast-sized (an eval set,
    a blocklist); for a big filter side you'd shard the bit space and
    turn the probe into a bucketed join on position-shard — same
    algebra, noted here for the scale path.
    """
    exploded = keys.select(
        F.explode(F.array(*bloom_positions(F.col(key)))).alias("pos")
    )
    return exploded.agg(F.sort_array(F.collect_set("pos")).alias("bloom_bits"))


def bloom_maybe_contains(bits_col: str, key: Column) -> Column:
    """Membership probe: all k positions set ⇒ 'maybe present' (false
    positives possible, false negatives impossible)."""
    cond = F.lit(True)
    for pos in bloom_positions(key):
        cond = cond & F.array_contains(F.col(bits_col), pos)
    return cond


def hll_daily_weekly(events: DataFrame, ts: str = "ts", uid: str = "user_id") -> DataFrame:
    """Mergeable distinct-user rollup on Spark's DataSketches HLL
    aggregates: one sketch per day, weekly estimates from a UNION of
    day sketches, side by side with a direct weekly sketch and the
    exact distinct count.

    This is the partial-aggregation pattern that makes 100 TB distinct
    counting tractable: day partials are built once (map-side
    combinable, fixed bytes per day), and any coarser grain —
    week/month/rolling-28d — is a cheap union of partials instead of a
    re-scan. The query asserts the algebra by construction: the union
    estimate must equal the direct estimate because DataSketches HLL
    union is exact over sketches with the same lgK.
    """
    day = events.select(
        F.to_date(F.date_trunc("day", ts)).alias("day"),
        F.to_date(F.date_trunc("week", ts)).alias("week"),
        F.col(uid),
    )
    per_day = day.groupBy("week", "day").agg(
        F.hll_sketch_agg(uid).alias("day_sketch")
    )
    weekly_union = per_day.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("day_sketch"))
        .cast("bigint")
        .alias("est_union_of_days"),
        F.count(F.lit(1)).cast("int").alias("n_days"),
    )
    weekly_direct = day.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(uid))
        .cast("bigint")
        .alias("est_direct"),
        F.countDistinct(uid).cast("bigint").alias("exact_users"),
    )
    return (
        weekly_union.join(weekly_direct, "week")
        .select("week", "n_days", "est_union_of_days", "est_direct", "exact_users")
        .orderBy("week")
    )
