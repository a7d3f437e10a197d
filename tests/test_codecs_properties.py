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
