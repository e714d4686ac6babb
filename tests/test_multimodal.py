"""Multimodal plumbing: schemas, batch shapes, deterministic fake decode."""

import pytest

from goffish_v3_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


def test_extract_features_shape_and_determinism(spark):
    media = synthesize_media(spark, n=30)
    out = extract_features(media, out_dim=16).collect()
    assert len(out) == 30
    assert all(len(r.features) == 16 for r in out)
    assert all(0.0 <= x < 1.0 for r in out for x in r.features)
    again = {r.media_id: r.features for r in extract_features(media, out_dim=16).collect()}
    assert all(again[r.media_id] == r.features for r in out)


def test_real_decode_is_stubbed(spark):
    media = synthesize_media(spark, n=3)
    with pytest.raises(Exception) as exc:
        extract_features(media, decode="real").collect()
    assert "NotImplementedError" in str(exc.value) or "real media decoding" in str(exc.value)


def test_sample_frames_only_videos(spark):
    media = synthesize_media(spark, n=30)
    frames = sample_frames(media, every_ms=250, max_frames=4).collect()
    video_ids = {r.media_id for r in media.filter("kind = 'video'").collect()}
    assert {r.media_id for r in frames} <= video_ids
    assert all(r.frame_ts_ms == r.frame_idx * 250 for r in frames)
    assert all(len(r.frame) == 32 for r in frames)


def test_resize_rewrites_image_metadata(spark):
    media = synthesize_media(spark, n=30)
    out = resize_images(media, width=32, height=32).collect()
    for r in out:
        if r.kind == "image":
            assert (r.width, r.height) == (32, 32)
        else:
            assert (r.width, r.height) != (32, 32) or r.kind == "image"
