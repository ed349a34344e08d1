"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (north-star set, SURVEY.md §2.2).

What's real here (and tested): the schema contract, the Arrow-batched
mapInPandas plumbing, batch shapes, partition sizing for large blobs.
What's stubbed: actual codec work — the image/audio libraries aren't
in this container, so decode_image() raises NotImplementedError
unless given the deterministic fake decoder, exactly as the build
contract prescribes.

Scale design for binary columns:
  * store blobs in Parquet binary columns NEXT TO their metadata —
    readers that only need metadata never touch blob bytes (column
    pruning);
  * cap spark.sql.files.maxPartitionBytes so a partition of blobs
    fits executor memory; for >100 MB media, store a reference
    (uri, offset, length) instead and stream in the UDF;
  * all per-blob compute goes through mapInPandas (Arrow batches),
    never row-at-a-time Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Contract schema for a multimodal asset row. content_bytes is
# precomputed at ingest (len of the blob) so metadata-only queries
# never have to touch the binary column — see metadata_profile.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("content", BinaryType()),  # opaque encoded bytes
        StructField("content_bytes", LongType()),  # len(content), ingest-time
        StructField("width", IntegerType()),  # media metadata (nullable)
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("source_uri", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content_sha256", StringType()),
        StructField("content_bytes", LongType()),
        StructField("feat_mean", StringType()),  # stub feature payload
    ]
)


def synthesize_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake assets: content = seeded pseudo-random bytes
    tagged with plausible metadata. Stands in for a real
    images/ parquet directory."""
    rows = []
    for i in range(n):
        media = ("image", "audio", "video")[i % 3]
        blob = hashlib.sha512(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                media,
                bytearray(blob),
                len(blob),
                64 + i % 512 if media == "image" else None,
                64 + (i * 3) % 512 if media == "image" else None,
                1000 + i * 37 if media != "image" else None,
                f"synthetic://assets/{media}/{i}",
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _pil():
    """Optional-import hook for a real imaging library. Returns the
    PIL.Image module when pillow is installed, else None — the
    container default. Tests exercise both branches (real branch
    skips when pillow is absent)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(content: bytes, fake: bool = False) -> dict:
    """Decode an encoded image to pixel statistics.

    fake=True computes deterministic pseudo-features from the bytes so
    the distributed plumbing is testable end-to-end with no codec.
    fake=False decodes for real when pillow is installed (guarded
    import); in this container (no imaging libs) it raises
    NotImplementedError, per the build contract."""
    if fake:
        h = hashlib.sha256(content).digest()
        return {"mean_luma": h[0] / 255.0, "edge_score": h[1] / 255.0}
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "image decode requires pillow, not present in this environment; "
            "pass fake=True for the deterministic stand-in"
        )
    import io

    with Image.open(io.BytesIO(content)) as im:
        gray = im.convert("L")
        px = list(gray.getdata())
        mean = sum(px) / (255.0 * len(px)) if px else 0.0
        # crude edge proxy: mean absolute horizontal neighbor delta
        w = gray.width
        diffs = [abs(px[i] - px[i - 1]) for i in range(1, len(px)) if i % w]
        edge = (sum(diffs) / (255.0 * len(diffs))) if diffs else 0.0
        return {"mean_luma": mean, "edge_score": edge}


def extract_features(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Per-asset feature extraction via mapInPandas: Arrow-batched,
    one pandas frame per input batch, blob bytes never cross the
    driver. The decode call is the stub; the batch shape, schema and
    partitioning are the real production pattern."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for content in pdf["content"]:
                b = bytes(content)
                d = decode_image(b, fake=fake_decode)
                feats.append(
                    (
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        f"{d['mean_luma']:.6f}",
                    )
                )
            out = pd.DataFrame(
                feats, columns=["content_sha256", "content_bytes", "feat_mean"]
            )
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_images(
    assets: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = True
) -> DataFrame:
    """Image resize over mapInPandas — the standard pre-embedding
    normalization pass.

    Decode/encode is fake by default (this container has no imaging
    libs): the fake path emits a deterministic pseudo-resized payload
    (sha512-seeded bytes of the right nominal size) so schema,
    batching, and partition behavior are testable. fake=False resizes
    for real when pillow is installed (guarded import) — the
    Spark-side plumbing is identical either way."""

    def _fake_resize(content: bytes) -> bytes:
        h = hashlib.sha512(content).digest()
        need = max(1, (target_w * target_h) // 256)
        return (h * ((need // len(h)) + 1))[:need]

    def _real_resize(content: bytes) -> bytes:
        import io

        Image = _pil()
        with Image.open(io.BytesIO(content)) as im:
            out = io.BytesIO()
            im.resize((target_w, target_h)).save(out, format=im.format or "PNG")
            return out.getvalue()

    if not fake and _pil() is None:
        raise NotImplementedError(
            "real resize requires pillow, not present in this environment; "
            "pass fake=True for the deterministic stand-in"
        )
    resize_fn = _fake_resize if fake else _real_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            imgs = pdf[pdf["media_type"] == "image"]
            if imgs.empty:
                continue
            yield pd.DataFrame(
                {
                    "asset_id": imgs["asset_id"].values,
                    "width": target_w,
                    "height": target_h,
                    "content": [resize_fn(bytes(b)) for b in imgs["content"]],
                }
            )

    return assets.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_video_frames(
    assets: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Video frame sampling (1 row in → N frame rows out) over
    mapInPandas — the fan-out shape of media preprocessing.

    STUB frame extraction (no ffmpeg here): fake frames are
    deterministic digests of (content, index); the row-explosion
    contract (duration_ms // every_ms frames per video, typed
    timestamps) is the real, tested part."""
    if not fake:
        raise NotImplementedError("real frame sampling requires ffmpeg/av")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["media_type"] == "video"]
            out = {"asset_id": [], "frame_index": [], "frame_ts_ms": [], "frame": []}
            for _, row in vids.iterrows():
                n_frames = max(1, int(row["duration_ms"]) // every_ms)
                blob = bytes(row["content"])
                for i in range(n_frames):
                    out["asset_id"].append(row["asset_id"])
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame"].append(
                        hashlib.sha256(blob + i.to_bytes(4, "little")).digest()
                    )
            if out["asset_id"]:
                yield pd.DataFrame(out)

    return assets.mapInPandas(batches, FRAME_SCHEMA)


def metadata_profile(assets: DataFrame) -> DataFrame:
    """Metadata-only profile — touches ONLY metadata columns (size
    comes from the ingest-time content_bytes column, never
    length(content)), so parquet column pruning reads zero blob
    bytes; the query that must stay cheap at 100 TB."""
    return (
        assets.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.avg("content_bytes").alias("avg_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("media_type")
    )
