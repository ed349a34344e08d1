"""Registry entries for multimodal binary-column processing.

Assets are synthesized deterministically (no media tables in the
fixtures); rows-only checks — the unit tests assert determinism and
batch-shape properties.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.operators import multimodal as M
from ibd_pipeline_spark.queries import query


@query("multimodal_feature_extract")  # rows-only: synthesized binary assets
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary
    content columns — REAL decode: assets are valid PNGs
    (synthesize_image_assets) and fake_decode=False routes every blob
    through the stdlib-zlib PNG codec (operators/png.py — gray/RGB/
    RGBA, all five scanline filters), no imaging library involved.
    Planted-image correctness (known means, gradient edges, resize
    invariants) is property-tested in tests/test_png.py."""
    assets = M.synthesize_image_assets(spark, n=48)
    return M.extract_features(assets, fake_decode=False).orderBy("asset_id")


@query("multimodal_resize")  # rows-only: synthesized binary assets
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize pass, REAL: stdlib PNG decode → nearest-neighbor
    resample → grayscale PNG re-encode per blob (operators/png.py)
    over mapInPandas — the standard pre-embedding normalization
    stage, running actual pixels in this container."""
    assets = M.synthesize_image_assets(spark, n=48)
    return (
        M.resize_images(assets, 224, 224, fake=False)
        .select("asset_id", "width", "height", F.length("content").alias("n_bytes"))
        .orderBy("asset_id")
    )


@query("multimodal_frame_sample")  # rows-only: synthesized binary assets
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1 video row → N frame rows, extraction
    stubbed): the row-explosion contract of media preprocessing with
    typed frame timestamps."""
    assets = M.synthesize_assets(spark, n=64)
    return (
        M.sample_video_frames(assets, every_ms=1000)
        .select("asset_id", "frame_index", "frame_ts_ms", F.length("frame").alias("n_bytes"))
        .orderBy("asset_id", "frame_index")
    )


@query("multimodal_video_metadata")  # rows-only: synthesized binary assets
def multimodal_video_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ISO-BMFF container parsing over Arrow batches: walk the
    MP4 box framing, decode mvhd timescale/duration — no media
    library needed for metadata (frame decode stays codec-gated).
    Structurally valid synthesized MP4s, like the audio path's WAVs."""
    assets = M.synthesize_video_assets(spark, n=24)
    return M.extract_video_metadata(assets).orderBy("asset_id")


@query("multimodal_audio_features")  # rows-only: synthesized binary assets
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode over Arrow batches: valid RIFF/WAV blobs
    (stdlib wave codec — nothing stubbed) → sample-rate / duration /
    RMS / peak per clip. The one modality whose media path runs
    end-to-end against true encoded bytes in this container."""
    assets = M.synthesize_audio_assets(spark, n=48)
    return M.extract_audio_features(assets).orderBy("asset_id")


@query("multimodal_metadata_profile")  # rows-only: synthesized binary assets
def multimodal_metadata_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only profile over the asset table — the
    column-pruned path that never reads blob bytes. Rows-only like
    the rest of the multimodal family: inputs are synthesized binary
    assets, not fixture tables, so there is no shared relation for a
    DuckDB oracle to scan; determinism is asserted in
    tests/test_multimodal.py."""
    assets = M.synthesize_assets(spark, n=64)
    prof = M.metadata_profile(assets)
    return prof.select(
        "media_type",
        "n_assets",
        F.round("avg_bytes", 4).alias("avg_bytes"),
        F.round("avg_width", 4).alias("avg_width"),
        F.round("avg_duration_ms", 4).alias("avg_duration_ms"),
    )


@query("multimodal_phash_near_dup")
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (aHash) near-duplicate detection over binary image
    content: every synthesized asset gets a planted near-copy (three
    deterministic byte flips — the re-encode/watermark stand-in), and
    the prefix-blocked Hamming pair search must recover exactly the
    planted pairs. Output: (id_a, id_b, hamming) per recovered pair —
    rows-only (the signature comes from an Arrow mapInPandas decode
    stage; locality + recovery are property-tested in
    tests/test_multimodal.py).

    This is the IMAGE twin of the text near-dup family: content
    digests (dedup_exact) break on a single changed byte; aHash's
    Hamming distance is the structural similarity that survives small
    edits. Scale notes on operators/multimodal.py:
    phash_near_dup_pairs (simhash-geometry prefix blocking).
    """
    import pyspark.sql.functions as F

    base = M.synthesize_assets(spark, n=48).select(
        (F.col("asset_id") * 2).alias("asset_id"), "media_type", "content"
    )
    # the 3-byte deterministic perturbation runs in the same Arrow
    # stage style as the decode (byte-exact surgery isn't a JVM
    # binary-function strength)
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("media_type", StringType()),
            StructField("content", BinaryType()),
        ]
    )

    def perturb_batches(it):
        import pandas as pd

        for pdf in it:
            out_ids, out_media, out_content = [], [], []
            for aid, media, content in zip(
                pdf["asset_id"], pdf["media_type"], pdf["content"]
            ):
                b = bytearray(bytes(content))
                for k in range(3):
                    pos = (int(aid) * 131 + k * 977) % len(b)
                    b[pos] ^= 0xFF
                out_ids.append(int(aid) + 1)
                out_media.append(media)
                out_content.append(bytes(b))
            yield pd.DataFrame(
                {
                    "asset_id": out_ids,
                    "media_type": out_media,
                    "content": out_content,
                }
            )

    copies = base.mapInPandas(perturb_batches, schema)
    assets = base.unionByName(copies)
    return (
        M.phash_near_dup_pairs(assets, max_hamming=8)
        .orderBy("id_a", "id_b")
    )
