"""Multimodal plumbing: schema, mapInPandas batch shape, deterministic stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shovel_spark.io import multimodal as mm


def test_feature_extraction_shape_and_determinism(spark):
    media = mm.synth_media(spark, n=60, seed=9)
    f1 = mm.extract_image_features(media).sort("media_id").collect()
    f2 = mm.extract_image_features(media).sort("media_id").collect()
    assert f1 == f2  # deterministic stub decode
    assert len(f1) == 60
    r = f1[0]
    assert r.n_bytes == 256  # 4 × sha2-hex(64)
    assert r.width % 32 == 0 and r.height % 32 == 0
    assert 0 < r.byte_entropy <= 8.0
    assert r.phash is not None


def test_binary_column_not_in_feature_output(spark):
    media = mm.synth_media(spark, n=5)
    cols = mm.extract_image_features(media).columns
    assert "data" not in cols  # media bytes never enter a shuffle


def test_resize_stub_raises_cleanly(spark):
    media = mm.synth_media(spark, n=3)
    with pytest.raises(Exception, match="image codec not available"):
        mm.resize_images(media, 224, 224).collect()


def test_video_frame_sampling_fanout(spark):
    media = mm.synth_media(spark, n=30).filter(F.col("kind") == "video")
    n_videos = media.count()
    frames = mm.sample_video_frames(media)
    assert frames.count() > n_videos  # 1→N fan-out
    assert set(frames.columns) == {"media_id", "frame_idx", "mime"}
