"""Streaming Count-Min heavy hitters: the batch CMS
(operators/sketches.py) run as an UNBOUNDED streaming aggregation.

The structural insight that makes this safe without a watermark: a
streaming groupBy normally accumulates state per *distinct key seen*
— unbounded on an open token stream, which is why every other
unbounded aggregate in this engine carries a watermark. The CMS
bucket space is FIXED (depth × width = 2048 counters), so hashing the
key before the groupBy turns an unbounded-state aggregation into a
bounded-state one: the state store holds at most 2048 rows forever,
no TTL needed, while still answering (over-approximate) frequency
queries for ANY key — including keys first seen hours ago that a
windowed count would have expired.

This is the streaming face of the same sketch: counters built here
are bit-identical to a batch cms_build over the same rows (grouped
SUMs commute with micro-batching), which is exactly what the
stream-equals-batch test asserts. The md5 hash rows mean a CMS
snapshot written by the stream can be probed by any engine.

Reference parity note: the reference's streaming job aggregates
fixed 5-minute windows (spark_processor.py:95-117); this operator
covers the all-time-frequency shape it cannot express.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ibd_pipeline_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH, md5_bucket


def cms_stream(tokens: DataFrame, key: str) -> DataFrame:
    """Streaming CMS build over a token stream: explode the DEPTH hash
    rows per token and maintain the (seed, bucket) counters as a
    streaming aggregate. Emit with outputMode 'update' (changed
    counters per micro-batch) or 'complete' (the whole 2048-row
    sketch — it is tiny by construction, so complete mode is actually
    reasonable here, unlike for data-sized aggregates).

    The per-row weight is 1 (a token occurrence stream); pre-weighted
    streams can add a weight column and swap count → sum upstream.

    Scale: per micro-batch the map side combines into ≤2048 partials
    per task; the shuffle and the state store are both fixed-size
    regardless of stream rate or key cardinality.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("seed")
    return (
        tokens.select(F.col(key), seeds)
        .select(
            "seed",
            md5_bucket(F.col(key), F.col("seed"), CMS_WIDTH).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
