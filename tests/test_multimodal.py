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


# ---------------------------------------------------------------------------
# Real decode path: pure-Python PPM/BMP codecs (extensions.codecs)
# ---------------------------------------------------------------------------

def _gradient_ppm(w, h):
    from instagram_data_pipeline_spark.extensions.codecs import encode_ppm

    pixels = [[((r * 40) % 256, (c * 40) % 256, (r + c) % 256)
               for c in range(w)] for r in range(h)]
    return encode_ppm(w, h, pixels), pixels


def test_ppm_roundtrip_byte_exact():
    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_ppm,
        encode_ppm,
    )

    data, pixels = _gradient_ppm(4, 3)
    w, h, got = decode_ppm(data)
    assert (w, h, got) == (4, 3, pixels)
    assert encode_ppm(w, h, got) == data  # byte-exact roundtrip
    # comment + whitespace tolerant header
    commented = b"P6\n# a comment\n4 3\n255\n" + data.split(b"255\n", 1)[1]
    assert decode_ppm(commented)[2] == pixels


def test_bmp_roundtrip_byte_exact():
    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_bmp24,
        encode_bmp24,
    )

    _, pixels = _gradient_ppm(3, 2)  # odd width exercises row padding
    data = encode_bmp24(3, 2, pixels)
    w, h, got = decode_bmp24(data)
    assert (w, h, got) == (3, 2, pixels)
    assert encode_bmp24(w, h, got) == data


def test_resize_images_real_kernel_byte_exact(spark):
    """The multimodal resize operator with the REAL codec kernel: output
    payloads must equal the pure-Python expected bytes exactly."""
    from instagram_data_pipeline_spark.extensions.codecs import (
        encode_bmp24,
        encode_ppm,
        image_resizer,
        resize_nearest,
    )
    from instagram_data_pipeline_spark.extensions.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    ppm, ppm_pix = _gradient_ppm(4, 4)
    bmp = encode_bmp24(4, 4, ppm_pix)
    media = spark.createDataFrame(
        [
            (1, "image", ppm, ("image/x-portable-pixmap", 4, 4, None)),
            (2, "image", bmp, ("image/bmp", 4, 4, None)),
            (3, "audio", b"RIFF", ("audio/wav", None, None, 100)),
        ],
        MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in
           resize_images(media, 2, 2, decoder=image_resizer).collect()}
    assert set(out) == {1, 2}
    assert all(r.resized is True for r in out.values())
    want = resize_nearest(ppm_pix, 2, 2)
    assert bytes(out[1].payload) == encode_ppm(2, 2, want)
    assert bytes(out[2].payload) == encode_bmp24(2, 2, want)


def test_extract_features_mean_rgb_real_kernel(spark):
    from instagram_data_pipeline_spark.extensions.codecs import mean_rgb_feature
    from instagram_data_pipeline_spark.extensions.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    ppm, pixels = _gradient_ppm(2, 2)
    media = spark.createDataFrame(
        [
            (1, "image", ppm, ("image/x-portable-pixmap", 2, 2, None)),
            (2, "audio", b"RIFF", ("audio/wav", None, None, 9)),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in
            extract_features(media, decoder=mean_rgb_feature).collect()}
    flat = [px for row in pixels for px in row]
    want_r = sum(p[0] for p in flat) / 4 / 255.0
    assert rows[1].feature[0] == pytest.approx(want_r, abs=1e-6)
    assert rows[1].feature[3] == pytest.approx(2 / 4096.0, abs=1e-7)
    assert len(rows[2].feature) == 5  # non-image falls back to byte-fold


def test_wav_roundtrip_byte_exact():
    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    payload = encode_wav_pcm16(8000, samples)
    rate, got = decode_wav_pcm16(payload)
    assert rate == 8000 and got == samples
    # canonical re-encode is byte-identical
    assert encode_wav_pcm16(rate, got) == payload


def test_wav_decoder_skips_extra_chunks():
    import struct

    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    payload = encode_wav_pcm16(16000, [7, -7, 9])
    # splice a LIST chunk (odd length -> exercises word alignment)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = payload[:12] + extra + payload[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8
    ) + spliced[8:]
    rate, got = decode_wav_pcm16(spliced)
    assert rate == 16000 and got == [7, -7, 9]


def test_wav_decoder_rejects_stereo():
    import struct

    import pytest as _pytest

    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_wav_pcm16,
    )

    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with _pytest.raises(ValueError):
        decode_wav_pcm16(payload)
