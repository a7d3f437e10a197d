"""Multimodal plumbing: schema contract, mapInPandas batch shape, frame
sampling fan-out, and the stubbed decode boundary."""

from __future__ import annotations

import pytest

from instagram_data_pipeline_spark.extensions.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_feature,
    real_decode,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", ("image/png", 64, 64, None)),
        (2, "image", b"\xff\xd8 jpeg-ish", ("image/jpeg", 32, 32, None)),
        (3, "audio", b"RIFF fake wav", ("audio/wav", None, None, 2500)),
        (4, "video", b"\x00\x00ftyp fake mp4", ("video/mp4", 640, 480, 3500)),
        (5, "image", None, ("image/png", 1, 1, None)),  # null payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_contract(media):
    feats = extract_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[1].n_bytes == len(b"\x89PNG fake bytes")
    assert rows[5].n_bytes == 0  # null payload handled
    assert len(rows[1].feature) == 8
    # deterministic: same payload -> same digest + feature
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert again[1].payload_digest == rows[1].payload_digest
    assert again[1].feature == rows[1].feature


def test_fake_feature_deterministic_and_bounded():
    a = fake_feature(b"abc123", "image")
    assert a == fake_feature(b"abc123", "image")
    assert all(0.0 <= x < 1.0 for x in a)


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"bytes", "image")


def test_resize_plumbing_stub(media):
    from instagram_data_pipeline_spark.extensions.multimodal import resize_images

    out = resize_images(media, 224, 224).collect()
    assert {r.media_id for r in out} == {1, 2, 5}  # images only
    for r in out:
        assert (r.width, r.height) == (224, 224)
        assert r.resized is False  # stub passthrough is explicit


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_ms=1000).collect()
    # video row has duration 3500ms -> ts 0,1000,2000,3000
    ts = sorted(r.frame_ts_ms for r in frames)
    assert ts == [0, 1000, 2000, 3000]
    assert all(r.media_id == 4 for r in frames)
