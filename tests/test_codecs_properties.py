"""Property-based tests for the round-4 codecs and encode kernels:
PNG/JPEG round trips, BPE encode vs a scan-based reference, portable
HLL vs exact counts. The codec properties are pure Python (hundreds of
examples are cheap); the Spark-backed properties use the shared session
with bounded examples like tests/test_properties.py."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=150, deadline=None)
SPARK_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rgb = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


@st.composite
def images(draw, max_dim=10):
    w = draw(st.integers(1, max_dim))
    h = draw(st.integers(1, max_dim))
    px = draw(
        st.lists(
            st.lists(rgb, min_size=w, max_size=w), min_size=h, max_size=h
        )
    )
    return w, h, px


@given(images())
@SETTINGS
def test_png_roundtrip_identity(img):
    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_png,
        encode_png,
    )

    w, h, px = img
    assert decode_png(encode_png(w, h, px)) == (w, h, px)


@given(images())
@SETTINGS
def test_bmp_roundtrip_identity(img):
    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_bmp24,
        encode_bmp24,
    )

    w, h, px = img
    assert decode_bmp24(encode_bmp24(w, h, px)) == (w, h, px)


@given(rgb, st.integers(1, 16), st.integers(1, 16),
       st.sampled_from([75, 85, 90, 95]))
@settings(max_examples=80, deadline=None)
def test_jpeg_solid_matches_prediction_any_quality(color, w, h, quality):
    from instagram_data_pipeline_spark.extensions.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        predict_solid_roundtrip,
    )

    r, g, b = color
    px = [[(r, g, b)] * w] * h
    dw, dh, dec = decode_jpeg_baseline(
        encode_jpeg_baseline(w, h, px, quality)
    )
    assert (dw, dh) == (w, h)
    assert {p for row in dec for p in row} == {
        predict_solid_roundtrip(r, g, b, quality)
    }


@given(images(max_dim=12))
@settings(max_examples=40, deadline=None)
def test_jpeg_random_image_bounded_error(img):
    """Random noise is JPEG's worst case; quality 90 must still keep
    every channel within a sane bound and preserve dimensions."""
    from instagram_data_pipeline_spark.extensions.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    w, h, px = img
    dw, dh, dec = decode_jpeg_baseline(encode_jpeg_baseline(w, h, px, 90))
    assert (dw, dh) == (w, h)
    worst = max(
        abs(a - b)
        for ro, rd in zip(px, dec)
        for po, pd in zip(ro, rd)
        for a, b in zip(po, pd)
    )
    assert worst <= 64, worst


# ---------------------------------------------------------------------------
# BPE encode vs reference: the chained-replace expression must equal a
# straightforward scan-based greedy merge for arbitrary words/merges.
# ---------------------------------------------------------------------------


def _ref_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + ["</w>"]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@st.composite
def words_and_merges(draw):
    words = draw(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=8),
            min_size=1,
            max_size=4,
        )
    )
    # merges over symbols that can actually arise: build progressively
    pool = ["a", "b", "c", "</w>"]
    merges: list[tuple[str, str]] = []
    for _ in range(draw(st.integers(0, 5))):
        a = draw(st.sampled_from(pool))
        b = draw(st.sampled_from(pool))
        merges.append((a, b))
        pool.append(a + b)
    return words, merges


@given(words_and_merges())
@SPARK_SETTINGS
def test_bpe_encode_matches_reference_scan(spark, wm):
    from instagram_data_pipeline_spark.extensions.bpe import bpe_encode

    words, merges = wm
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    got = bpe_encode(docs, merges).first()
    want = [s for w in words for s in _ref_bpe(w, merges)]
    assert got.subword_text.split(" ") == want
    assert got.n_subwords == len(want)


# ---------------------------------------------------------------------------
# Portable HLL: estimate within bounds for arbitrary key sets.
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(0, 100_000), min_size=1, max_size=400))
@SPARK_SETTINGS
def test_portable_hll_tracks_exact_on_random_keys(spark, keys):
    from instagram_data_pipeline_spark.extensions.sketches import (
        portable_hll_distinct,
    )

    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    df = df.selectExpr("'g' AS grp", "user_id")
    got = portable_hll_distinct(df, ["grp"], "user_id", p=12).first()
    exact = len(set(keys))
    # m=4096, n <= 400 -> deep linear-counting regime: very tight
    assert abs(got.approx_users - exact) <= max(2, 0.03 * exact)


# ---------------------------------------------------------------------------
# Compressed audio: G.711 mu-law + IMA ADPCM (round 4, audio half of
# the stubbed-modality closure)
# ---------------------------------------------------------------------------

pcm16 = st.integers(-32768, 32767)


def test_ulaw_codebook_idempotent():
    """encode(decode(code)) == code for every code whose decoded value
    is nonzero (0x7F and 0xFF both decode to 0, which re-encodes to the
    canonical positive-zero code 0xFF)."""
    from instagram_data_pipeline_spark.extensions.codecs import (
        ulaw_decode,
        ulaw_encode,
    )

    for code in range(256):
        val = ulaw_decode(bytes([code]))[0]
        if val != 0:
            assert ulaw_encode([val]) == bytes([code])
    assert ulaw_decode(b"\xff") == [0]
    assert ulaw_decode(b"\x7f") == [0]
    assert ulaw_encode([0]) == b"\xff"


def test_ulaw_itu_extremes():
    from instagram_data_pipeline_spark.extensions.codecs import ulaw_decode

    # G.711 table extremes: codes 0x00/0x80 are the +-max segment
    assert ulaw_decode(b"\x00") == [-32124]
    assert ulaw_decode(b"\x80") == [32124]


@given(st.lists(pcm16, max_size=200))
@SETTINGS
def test_ulaw_roundtrip_error_bound_and_monotone(samples):
    """Reconstruction error is bounded by half the top-segment step
    (1024), the sign is preserved, and the expander applied through the
    WAV container equals the raw expander."""
    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_wav,
        encode_wav_ulaw,
        ulaw_decode,
        ulaw_encode,
    )

    rt = ulaw_decode(ulaw_encode(samples))
    for orig, rec in zip(samples, rt):
        assert abs(orig - rec) <= 1024
        if orig > 0:
            assert rec >= 0
        if orig < 0:
            assert rec <= 0
    rate, via_wav = decode_wav(encode_wav_ulaw(8000, samples))
    assert rate == 8000 and via_wav == rt


@given(st.lists(pcm16, max_size=200))
@SETTINGS
def test_ima_adpcm_decode_is_deterministic_inverse(samples):
    """The decoder reproduces the encoder's internal predictor sequence
    bit-exactly (ADPCM is lossy vs the INPUT, but decode-of-encode is a
    pure function), first sample is carried verbatim in the block
    header, and the WAV container round-trips."""
    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_wav,
        encode_wav_ima,
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    blob = ima_adpcm_encode(samples)
    out = ima_adpcm_decode(blob, len(samples))
    assert len(out) == len(samples)
    if samples:
        assert out[0] == samples[0]
    assert ima_adpcm_decode(blob, len(samples)) == out
    rate, via_wav = decode_wav(encode_wav_ima(8000, samples))
    assert rate == 8000 and via_wav == out


def test_ima_adpcm_tracks_smooth_signal():
    """On a band-limited signal (the codec's design target) the
    4-bit-per-sample reconstruction stays within ~5% RMS of full
    scale."""
    import math

    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_wav,
        encode_wav_ima,
    )

    sig = [int(8000 * math.sin(i / 10)) for i in range(500)]
    _, out = decode_wav(encode_wav_ima(8000, sig))
    rms = math.sqrt(
        sum((a - b) ** 2 for a, b in zip(sig, out)) / len(sig)
    )
    assert rms < 1600  # ~5% of 32768 full scale


@given(st.lists(pcm16, max_size=64), st.sampled_from([8000, 16000, 44100]))
@SETTINGS
def test_decode_wav_dispatches_all_three_formats(samples, rate):
    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_wav,
        encode_wav_ima,
        encode_wav_pcm16,
        encode_wav_ulaw,
        ulaw_decode,
        ulaw_encode,
    )

    assert decode_wav(encode_wav_pcm16(rate, samples)) == (rate, samples)
    assert decode_wav(encode_wav_ulaw(rate, samples)) == (
        rate,
        ulaw_decode(ulaw_encode(samples)),
    )
    r, out = decode_wav(encode_wav_ima(rate, samples))
    assert r == rate and len(out) == len(samples)


# ---------------------------------------------------------------------------
# Compressed video: MJPEG/AVI container (round 4, video half of the
# stubbed-modality closure)
# ---------------------------------------------------------------------------


@given(
    st.integers(1, 6), st.integers(1, 6), st.integers(0, 5),
    st.sampled_from([1, 10, 30]), st.integers(0, 255),
)
@SETTINGS
def test_avi_mjpeg_container_roundtrip(w, h, n_frames, fps, seed):
    """Container metadata and frame count/order survive the RIFF round
    trip; every decoded solid frame equals the JPEG arithmetic
    prediction for its own color (frames are not mixed up)."""
    from instagram_data_pipeline_spark.extensions.codecs import (
        avi_mjpeg_frames,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from instagram_data_pipeline_spark.extensions.jpeg import (
        predict_solid_roundtrip,
    )

    colors = [
        ((seed + 41 * f) % 256, (seed + 59 * f) % 256, (seed + 83 * f) % 256)
        for f in range(n_frames)
    ]
    frames = [[[c] * w] * h for c in colors]
    blob = encode_avi_mjpeg(w, h, fps, frames)
    dw, dh, dfps, decoded = decode_avi_mjpeg(blob)
    assert (dw, dh, dfps, len(decoded)) == (w, h, fps, n_frames)
    for c, px in zip(colors, decoded):
        pred = predict_solid_roundtrip(*c)
        assert all(p == pred for row in px for p in row)
    # payload extraction yields valid per-frame JPEGs without decode
    _, _, _, payloads = avi_mjpeg_frames(blob)
    assert len(payloads) == n_frames
    assert all(p[:2] == b"\xff\xd8" for p in payloads)


def test_avi_mjpeg_rejects_non_avi():
    import pytest

    from instagram_data_pipeline_spark.extensions.codecs import (
        avi_mjpeg_frames,
        encode_wav_pcm16,
    )

    with pytest.raises(ValueError):
        avi_mjpeg_frames(encode_wav_pcm16(8000, [1, 2, 3]))


# ---------------------------------------------------------------------------
# FLAC subset codec (round 9): lossless round trip under arbitrary
# 16-bit signals, every subframe strategy (constant / fixed / verbatim
# escape), multi-frame block splits, CRC + MD5 corruption detection,
# and real compression on predictor-friendly signals.
# ---------------------------------------------------------------------------

pcm16 = st.integers(-32768, 32767)


@given(
    st.lists(pcm16, min_size=1, max_size=400),
    st.sampled_from([64, 192, 4096]),
    st.sampled_from([8000, 44100, 96000]),
)
@SETTINGS
def test_flac_roundtrip_identity(samples, block_size, rate):
    from instagram_data_pipeline_spark.extensions.flac import (
        decode_flac, encode_flac,
    )

    blob = encode_flac(rate, samples, block_size=block_size)
    assert blob[:4] == b"fLaC"
    got_rate, got = decode_flac(blob)
    assert got_rate == rate and got == samples


def test_flac_subframe_strategies_and_compression():
    from instagram_data_pipeline_spark.extensions.flac import (
        decode_flac, encode_flac,
    )

    # constant signal: CONSTANT subframe, tiny payload
    const = [123] * 1000
    blob = encode_flac(8000, const)
    assert decode_flac(blob) == (8000, const)
    assert len(blob) < 60

    # pure linear ramp: the order-2 predictor zeroes every residual
    ramp = [i * 4 - 8192 for i in range(4096)]
    blob = encode_flac(8000, ramp)
    assert decode_flac(blob) == (8000, ramp)
    assert len(blob) < 2 * len(ramp) // 8  # >8:1 vs raw PCM16

    # alternating extremes: worst case for polynomial predictors —
    # the escape/verbatim path must hold losslessness anyway
    evil = [32767 if i % 2 == 0 else -32768 for i in range(500)]
    blob = encode_flac(8000, evil, block_size=128)
    assert decode_flac(blob) == (8000, evil)


def test_flac_corruption_detected_never_misdecoded():
    import pytest as _pytest

    from instagram_data_pipeline_spark.extensions.flac import (
        decode_flac, encode_flac,
    )

    samples = [(i * 7) % 2000 - 1000 for i in range(300)]
    blob = bytearray(encode_flac(8000, samples, block_size=128))
    # flip one data bit in the LAST frame: CRC-16 (or MD5) must catch it
    blob[-5] ^= 0x10
    with _pytest.raises(ValueError):
        decode_flac(bytes(blob))
    # flip a bit inside the frame header: CRC-8 must catch it
    blob2 = bytearray(encode_flac(8000, samples, block_size=128))
    # frame starts right after 4 (marker) + 4 (block hdr) + 34 bytes
    blob2[42 + 2] ^= 0x01
    with _pytest.raises(ValueError):
        decode_flac(bytes(blob2))


@given(st.lists(pcm16, min_size=1, max_size=120))
@SETTINGS
def test_decode_audio_dispatches_wav_and_flac(samples):
    from instagram_data_pipeline_spark.extensions.codecs import (
        decode_audio, encode_wav_pcm16,
    )
    from instagram_data_pipeline_spark.extensions.flac import encode_flac

    assert decode_audio(encode_wav_pcm16(8000, samples)) == (8000, samples)
    assert decode_audio(encode_flac(8000, samples)) == (8000, samples)


# ---------------------------------------------------------------------------
# FLAC stereo + configurable bit depth (round 10, VERDICT r9 Next #7):
# round-trip property over (channels, bps) strategies, per-frame
# channel-decorrelation correctness (including the mid/side parity
# reconstruction), and the ADVICE-r9 field-width validation (oversized
# block_size/sample_rate must RAISE, never truncate into a well-formed
# but wrong stream).
# ---------------------------------------------------------------------------

@st.composite
def pcm_any_depth(draw):
    bps = draw(st.sampled_from([8, 12, 16, 20, 24]))
    channels = draw(st.sampled_from([1, 2]))
    n = draw(st.integers(1, 150))  # inter-channel samples
    hi = (1 << (bps - 1)) - 1
    samples = draw(
        st.lists(
            st.integers(-hi - 1, hi),
            min_size=n * channels, max_size=n * channels,
        )
    )
    return bps, channels, samples


@given(pcm_any_depth(), st.sampled_from([16, 64, 4096]))
@SETTINGS
def test_flac_roundtrip_all_depths_and_channels(cfg, block_size):
    from instagram_data_pipeline_spark.extensions.flac import (
        decode_flac_full, encode_flac,
    )

    bps, channels, samples = cfg
    blob = encode_flac(
        44100, samples, block_size=block_size, bps=bps, channels=channels
    )
    assert decode_flac_full(blob) == (44100, channels, bps, samples)


def test_flac_stereo_decorrelation_modes_and_compression():
    """Correlated stereo must round-trip through the side-channel
    assignments and beat independent coding; anti-correlated and
    parity-tripping signals exercise the mid/side floor-division
    reconstruction exactly."""
    import math

    from instagram_data_pipeline_spark.extensions.flac import (
        decode_flac_full, encode_flac,
    )

    n = 3000
    left = [int(12000 * math.sin(i / 13)) for i in range(n)]
    # near-duplicate right channel: side signal is tiny
    right = [v + (i % 3) - 1 for i, v in enumerate(left)]
    inter = [v for pair in zip(left, right) for v in pair]
    blob = encode_flac(44100, inter, block_size=512, channels=2)
    assert decode_flac_full(blob) == (44100, 2, 16, inter)
    # genuinely smaller than raw PCM16 stereo
    assert len(blob) < len(inter) * 2 // 2

    # odd/even parity mix (l+r odd) pins the mid/side (m<<1 | s&1)
    # reconstruction; +/- extremes pin side's bps+1 range
    evil_l = [32767, -32768, 1, 0, -1, 32767] * 200
    evil_r = [-32768, 32767, 0, 1, -2, 32766] * 200
    inter = [v for pair in zip(evil_l, evil_r) for v in pair]
    blob = encode_flac(8000, inter, block_size=128, channels=2)
    assert decode_flac_full(blob) == (8000, 2, 16, inter)


def test_flac_field_width_validation_raises_not_truncates():
    import pytest as _pytest

    from instagram_data_pipeline_spark.extensions.flac import encode_flac

    s = [0, 1, -1, 5] * 10
    with _pytest.raises(ValueError, match="block_size"):
        encode_flac(8000, s, block_size=15)
    with _pytest.raises(ValueError, match="block_size"):
        encode_flac(8000, s, block_size=65536)
    with _pytest.raises(ValueError, match="sample_rate"):
        encode_flac(0, s)
    with _pytest.raises(ValueError, match="sample_rate"):
        encode_flac(1 << 20, s)
    with _pytest.raises(ValueError, match="bps"):
        encode_flac(8000, s, bps=14)
    with _pytest.raises(ValueError, match="channels"):
        encode_flac(8000, s, channels=3)
    with _pytest.raises(ValueError, match="multiple"):
        encode_flac(8000, [1, 2, 3], channels=2)
    with _pytest.raises(ValueError, match="range"):
        encode_flac(8000, [300], bps=8)
