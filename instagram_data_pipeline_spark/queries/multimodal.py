"""Multimodal query: binary image columns through the real mapInPandas
decode path (SURVEY §2.12 north star; VERDICT r2 "What's missing" #2).

``multimodal_image_stats`` synthesizes a deterministic PPM image per
document (solid color + dimensions derived from ``md5(text)``), carries
it as an opaque ``binary`` column, then runs the REAL pure-Python codec
(:mod:`..extensions.codecs`) through :func:`..extensions.multimodal.
extract_features`:

    md5 -> (r,g,b,w,h) -> encode_ppm in a mapInPandas kernel
        -> binary payload column -> decode_ppm + mean-RGB feature
        -> recover (r,g,b,w,h) from the DECODED pixels only

The oracle predicts the decoded stats from md5 arithmetic alone, so a
hash-green row proves the encode->binary->decode round trip is lossless
— the Spark side never shortcuts past the payload bytes (the rgb/dim
columns are dropped before feature extraction).

Scale notes: payload synthesis and decode are per-row kernels inside
``mapInPandas`` (iterator form, one Arrow batch at a time — no partition
materialization); everything else is JVM-side codegen. Media bytes never
pass through a shuffle: the stats projection drops the payload before
any downstream exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_testdata
from . import register

# hex-pair -> int, engine-portable (memory rule: conv() on the Spark
# side == strpos-arithmetic on the DuckDB side; no 0x casts in DuckDB)
_DUCK_HEXPAIR = (
    "((strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr({h}, {i1}, 1)) - 1)"
)


def _duck_channel(i: int) -> str:
    return _DUCK_HEXPAIR.format(h="x", i=i, i1=i + 1)


_MEDIA_SCHEMA = "media_id long, kind string, payload binary"


def synthesize_ppm_media(docs: DataFrame) -> DataFrame:
    """documents -> (media_id, kind, payload) with a deterministic solid
    PPM image per row: color = first 3 bytes of md5(text), width =
    4 + r % 5, height = 3 + g % 4. The only columns that survive are the
    id and the opaque payload bytes."""
    hexed = docs.select(
        F.col("doc_id").alias("media_id"),
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("x"),
    ).select(
        "media_id",
        *[
            F.conv(F.substring("x", 1 + 2 * i, 2), 16, 10)
            .cast("int")
            .alias(c)
            for i, c in enumerate(["r", "g", "b"])
        ],
    ).select(
        "media_id",
        "r",
        "g",
        "b",
        (F.lit(4) + F.col("r") % 5).alias("w"),
        (F.lit(3) + F.col("g") % 4).alias("h"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..extensions.codecs import encode_ppm

        for pdf in batches:
            payloads = [
                encode_ppm(w, h, [[(r, g, b)] * w] * h)
                for r, g, b, w, h in zip(
                    pdf["r"], pdf["g"], pdf["b"], pdf["w"], pdf["h"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return hexed.mapInPandas(encode, schema=_MEDIA_SCHEMA)


@register(
    "multimodal_frame_sample",
    f"""
WITH m AS (
  SELECT doc_id AS media_id, md5(COALESCE(text, '')) AS x FROM documents
), v AS (
  SELECT media_id,
         500 + ({_duck_channel(1)} % 40) * 250 AS duration_ms
  FROM m
)
SELECT media_id, CAST(unnest(
         generate_series(0, duration_ms - 1, 1000)) AS BIGINT) AS frame_ts_ms
FROM v
""",
    doc="video frame-sampling plan: one row per sampled timestamp via "
        "sequence+explode (fan-out stays JVM-side; the decoder kernel "
        "only ever sees (payload, ts) pairs). Deterministic synthetic "
        "durations from md5 arithmetic; oracle = generate_series.",
    tags=("multimodal", "video", "explode"),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.multimodal import sample_frames

    docs = load_testdata(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("x"),
    ).select(
        "media_id",
        F.lit("video").alias("kind"),
        F.unhex("x").alias("payload"),  # opaque stand-in bytes
        F.struct(
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (
                F.lit(500)
                + (F.conv(F.substring("x", 1, 2), 16, 10).cast("int") % 40)
                * 250
            ).alias("duration_ms"),
        ).alias("meta"),
    )
    frames = sample_frames(media, every_ms=1000)
    return frames.select(
        "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    )


@register(
    "multimodal_image_stats",
    f"""
WITH m AS (
  SELECT doc_id AS media_id, md5(COALESCE(text, '')) AS x FROM documents
), rgb AS (
  SELECT media_id,
         {_duck_channel(1)} AS r,
         {_duck_channel(3)} AS g,
         {_duck_channel(5)} AS b
  FROM m
), dims AS (
  SELECT media_id, r, g, b,
         4 + r % 5 AS width, 3 + g % 4 AS height
  FROM rgb
)
SELECT media_id,
       CAST(9 + length(CAST(width AS VARCHAR))
              + length(CAST(height AS VARCHAR))
              + 3 * width * height AS INT) AS n_bytes,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(r AS INT) AS mean_r, CAST(g AS INT) AS mean_g,
       CAST(b AS INT) AS mean_b
FROM dims
""",
    doc="binary image columns end-to-end: deterministic PPM payloads "
        "synthesized per document, decoded back via the real pure-Python "
        "codec inside mapInPandas; oracle predicts the decoded stats "
        "from md5 arithmetic (hash-green == lossless round trip)",
    tags=("multimodal", "binary", "mapInPandas"),
)
def q_multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.codecs import mean_rgb_feature
    from ..extensions.multimodal import extract_features

    media = synthesize_ppm_media(load_testdata(spark, sf_dir, "documents"))
    feats = extract_features(media, decoder=mean_rgb_feature)

    # recover integer stats from the float32 feature vector; float32
    # relative error (~6e-8) stays far below the 0.5 rounding margin
    def chan(i: int, scale: int):
        return F.round(F.element_at("feature", i) * scale).cast("int")

    return feats.select(
        "media_id",
        F.col("n_bytes").cast("int").alias("n_bytes"),
        chan(4, 4096).alias("width"),
        chan(5, 4096).alias("height"),
        chan(1, 255).alias("mean_r"),
        chan(2, 255).alias("mean_g"),
        chan(3, 255).alias("mean_b"),
    )


# ---------------------------------------------------------------------------
# Compressed-image twins of the PPM path (round 4: the last stubbed
# modality closed). PNG is lossless -> the oracle is the same md5
# arithmetic as PPM. JPEG is lossy but DETERMINISTIC: a solid-color
# image quantizes to a DC-only block whose decode is exact integer/
# float arithmetic the oracle reproduces step-by-step (see
# extensions/jpeg.py module doc for the rounding contract) — a
# hash-green row proves the full Huffman/DCT encode -> binary ->
# parse/decode pipeline lands on the arithmetic prediction.
# ---------------------------------------------------------------------------


def _synthesize_solid_media(docs: DataFrame, fmt: str) -> DataFrame:
    """documents -> (media_id, kind, payload): solid-color image in
    ``fmt`` with color = md5 bytes 1-3 and format-specific dims (PNG
    5+b%6 x 4+r%5; JPEG 4+r%9 x 3+g%7, exercising non-multiple-of-8
    padding). Only the id and opaque payload bytes survive."""
    hexed = docs.select(
        F.col("doc_id").alias("media_id"),
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("x"),
    ).select(
        "media_id",
        *[
            F.conv(F.substring("x", 1 + 2 * i, 2), 16, 10)
            .cast("int")
            .alias(c)
            for i, c in enumerate(["r", "g", "b"])
        ],
    )
    if fmt == "png":
        hexed = hexed.select(
            "media_id", "r", "g", "b",
            (F.lit(5) + F.col("b") % 6).alias("w"),
            (F.lit(4) + F.col("r") % 5).alias("h"),
        )
    else:  # jpeg
        hexed = hexed.select(
            "media_id", "r", "g", "b",
            (F.lit(4) + F.col("r") % 9).alias("w"),
            (F.lit(3) + F.col("g") % 7).alias("h"),
        )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..extensions.codecs import encode_png
        from ..extensions.jpeg import encode_jpeg_baseline

        enc = encode_png if fmt == "png" else encode_jpeg_baseline
        for pdf in batches:
            payloads = [
                enc(int(w), int(h), [[(int(r), int(g), int(b))] * int(w)] * int(h))
                for r, g, b, w, h in zip(
                    pdf["r"], pdf["g"], pdf["b"], pdf["w"], pdf["h"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return hexed.mapInPandas(encode, schema=_MEDIA_SCHEMA)


def _decoded_solid_stats(media: DataFrame) -> DataFrame:
    """Shared recovery: real sniff+decode inside mapInPandas, then
    integer stats back out of the float32 feature vector (float32
    relative error ~6e-8 stays far below the 0.5 rounding margin)."""
    from ..extensions.codecs import mean_rgb_feature
    from ..extensions.multimodal import extract_features

    feats = extract_features(media, decoder=mean_rgb_feature)

    def chan(i: int, scale: int):
        return F.round(F.element_at("feature", i) * scale).cast("int")

    return feats.select(
        "media_id",
        chan(4, 4096).alias("width"),
        chan(5, 4096).alias("height"),
        chan(1, 255).alias("mean_r"),
        chan(2, 255).alias("mean_g"),
        chan(3, 255).alias("mean_b"),
    )


@register(
    "multimodal_png_stats",
    f"""
WITH m AS (
  SELECT doc_id AS media_id, md5(COALESCE(text, '')) AS x FROM documents
), rgb AS (
  SELECT media_id,
         {_duck_channel(1)} AS r,
         {_duck_channel(3)} AS g,
         {_duck_channel(5)} AS b
  FROM m
)
SELECT media_id,
       CAST(5 + b % 6 AS INT) AS width, CAST(4 + r % 5 AS INT) AS height,
       CAST(r AS INT) AS mean_r, CAST(g AS INT) AS mean_g,
       CAST(b AS INT) AS mean_b
FROM rgb
""",
    doc="PNG through the real stdlib-zlib codec: deterministic payloads "
        "synthesized per document (chunk framing, CRCs, row filters), "
        "decoded back inside mapInPandas; PNG is lossless so the oracle "
        "is pure md5 arithmetic — hash-green == bit-exact round trip "
        "through a compressed format",
    tags=("multimodal", "binary", "png", "mapInPandas"),
)
def q_multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _synthesize_solid_media(
        load_testdata(spark, sf_dir, "documents"), "png"
    )
    return _decoded_solid_stats(media)


# expression shapes below mirror extensions/jpeg.py VERBATIM (same
# literals, same association order — IEEE doubles make them identical
# across engines); quality 90 scales both Annex K tables to DC quant 3
_JPEG_DC_Q = 3


def _jpeg_chan_sql(v: str) -> str:
    q = _JPEG_DC_Q
    return (
        f"FLOOR(FLOOR(8.0*({v} - 128.0)/{q} + 0.5 + 1e-9)*{q}/8.0"
        " + 128.0 + 0.5 + 1e-9)"
    )


@register(
    "multimodal_jpeg_stats",
    f"""
WITH m AS (
  SELECT doc_id AS media_id, md5(COALESCE(text, '')) AS x FROM documents
), rgb AS (
  SELECT media_id,
         {_duck_channel(1)} AS r,
         {_duck_channel(3)} AS g,
         {_duck_channel(5)} AS b
  FROM m
), dims AS (
  SELECT media_id, r, g, b,
         4 + r % 9 AS width, 3 + g % 7 AS height
  FROM rgb
), ycc AS (
  SELECT media_id, width, height,
    LEAST(255.0, GREATEST(0.0,
      FLOOR(0.299::DOUBLE*r + 0.587::DOUBLE*g + 0.114::DOUBLE*b + 0.5))) AS y,
    LEAST(255.0, GREATEST(0.0,
      FLOOR(128.0 + (-0.168736::DOUBLE*r - 0.331264::DOUBLE*g + 0.5::DOUBLE*b) + 0.5))) AS cb,
    LEAST(255.0, GREATEST(0.0,
      FLOOR(128.0 + (0.5::DOUBLE*r - 0.418688::DOUBLE*g - 0.081312::DOUBLE*b) + 0.5))) AS cr
  FROM dims
), dq AS (
  SELECT media_id, width, height,
    {_jpeg_chan_sql('y')} AS yd,
    {_jpeg_chan_sql('cb')} AS cbd,
    {_jpeg_chan_sql('cr')} AS crd
  FROM ycc
)
SELECT media_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
  CAST(LEAST(255.0, GREATEST(0.0,
    FLOOR(yd + 1.402::DOUBLE*(crd - 128.0) + 0.5))) AS INT) AS mean_r,
  CAST(LEAST(255.0, GREATEST(0.0,
    FLOOR(yd - 0.344136::DOUBLE*(cbd - 128.0) - 0.714136::DOUBLE*(crd - 128.0) + 0.5)))
    AS INT) AS mean_g,
  CAST(LEAST(255.0, GREATEST(0.0,
    FLOOR(yd + 1.772::DOUBLE*(cbd - 128.0) + 0.5))) AS INT) AS mean_b
FROM dq
""",
    doc="baseline JFIF JPEG through the real pure-numpy codec (Annex K "
        "Huffman + DCT, quality 90, non-multiple-of-8 dims exercising "
        "edge padding): solid payloads encode lossy-but-deterministically "
        "to DC-only blocks, and the oracle replays the exact "
        "YCbCr -> quantize -> dequantize -> RGB arithmetic in SQL — "
        "hash-green proves the entropy-coded round trip lands on the "
        "arithmetic prediction",
    tags=("multimodal", "binary", "jpeg", "mapInPandas"),
)
def q_multimodal_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _synthesize_solid_media(
        load_testdata(spark, sf_dir, "documents"), "jpeg"
    )
    return _decoded_solid_stats(media)


# ---------------------------------------------------------------------------
# Audio twin of the image path: deterministic WAV/PCM16 payload per doc
# (samples derived from doc_id), carried as opaque binary, decoded by
# the REAL RIFF parser, stats recovered from the DECODED samples only.
# The oracle predicts every stat from the synthesis formula with exact
# integer arithmetic — a hash-green row proves the encode -> binary ->
# decode round trip bit-faithful.
# ---------------------------------------------------------------------------
_AUDIO_RATE = 8000


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """documents -> (media_id, kind, payload): n = 50 + doc_id % 50
    samples, sample i = ((doc_id * 31 + i * 97) % 65536) - 32768."""
    ids = docs.select(F.col("doc_id").alias("media_id"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..extensions.codecs import encode_wav_pcm16

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 50 + mid % 50
                samples = [
                    ((mid * 31 + i * 97) % 65536) - 32768 for i in range(n)
                ]
                payloads.append(encode_wav_pcm16(_AUDIO_RATE, samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "wav",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(encode, schema=_MEDIA_SCHEMA)


@register(
    "multimodal_audio_stats",
    f"""
WITH s AS (
  SELECT doc_id, unnest(generate_series(0, 50 + doc_id % 50 - 1)) AS i
  FROM documents
), v AS (
  SELECT doc_id, ((doc_id * 31 + i * 97) % 65536) - 32768 AS x FROM s
)
SELECT doc_id AS media_id,
       COUNT(*) AS n_samples,
       {_AUDIO_RATE} AS sample_rate,
       CAST(COUNT(*) * 1000000 // {_AUDIO_RATE} AS BIGINT) AS duration_us,
       CAST(MAX(ABS(x)) AS INT) AS peak,
       CAST(SUM(x * x) AS BIGINT) AS sum_sq
FROM v GROUP BY doc_id
""",
    doc="audio through the real WAV/PCM16 codec: synthesized payloads "
        "decoded in mapInPandas, integer-exact stats (count, usec "
        "duration, peak, sum of squares) hash-matched against the "
        "synthesis formula in SQL — proves the binary round trip",
    tags=("multimodal", "audio"),
)
def q_multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.multimodal import audio_stats

    docs = load_testdata(spark, sf_dir, "documents")
    return audio_stats(synthesize_wav_media(docs))


# ---------------------------------------------------------------------------
# Compressed-audio twins of the PCM path (round 4: the compressed-AUDIO
# half of the stubbed-modality seam closed). G.711 mu-law decode is
# pure integer arithmetic — (((mantissa<<3)+132)<<exponent)-132 — so
# the oracle replays encoder+expander exactly in SQL: a hash-green row
# proves the real compress -> RIFF container -> parse -> expand
# pipeline lands on the arithmetic prediction. IMA ADPCM (stateful
# predictor) is covered by round-trip tests in tests/test_codecs_
# properties.py and a rows-only container check here is NOT registered:
# its decode is sequential state SQL can't replay, and the rows-only
# tier would add no evidence beyond the pytest round trip.
# ---------------------------------------------------------------------------


def synthesize_ulaw_media(docs: DataFrame) -> DataFrame:
    """documents -> (media_id, kind, payload): the SAME synthesis
    formula as :func:`synthesize_wav_media` (n = 50 + doc_id % 50,
    sample i = ((doc_id*31 + i*97) % 65536) - 32768) but compressed
    2:1 through the real G.711 encoder into a fmt-tag-7 WAV."""
    ids = docs.select(F.col("doc_id").alias("media_id"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..extensions.codecs import encode_wav_ulaw

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 50 + mid % 50
                samples = [
                    ((mid * 31 + i * 97) % 65536) - 32768 for i in range(n)
                ]
                payloads.append(encode_wav_ulaw(_AUDIO_RATE, samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "wav",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(encode, schema=_MEDIA_SCHEMA)


@register(
    "multimodal_ulaw_stats",
    f"""
WITH s AS (
  SELECT doc_id, unnest(generate_series(0, 50 + doc_id % 50 - 1)) AS i
  FROM documents
), v AS (
  SELECT doc_id, ((doc_id * 31 + i * 97) % 65536) - 32768 AS x FROM s
), m AS (
  SELECT doc_id,
         LEAST(ABS(x), 32635) + 132 AS mag,
         CASE WHEN x < 0 THEN -1 ELSE 1 END AS sgn
  FROM v
), e AS (
  SELECT doc_id, sgn, mag,
         CASE WHEN mag < 256 THEN 0 WHEN mag < 512 THEN 1
              WHEN mag < 1024 THEN 2 WHEN mag < 2048 THEN 3
              WHEN mag < 4096 THEN 4 WHEN mag < 8192 THEN 5
              WHEN mag < 16384 THEN 6 ELSE 7 END AS ex
  FROM m
), d AS (
  SELECT doc_id,
         sgn * (((mag // CAST(POWER(2, ex + 3) AS BIGINT)) % 16) * 8 + 132)
             * CAST(POWER(2, ex) AS BIGINT) - sgn * 132 AS y
  FROM e
)
SELECT doc_id AS media_id,
       COUNT(*) AS n_samples,
       {_AUDIO_RATE} AS sample_rate,
       CAST(COUNT(*) * 1000000 // {_AUDIO_RATE} AS BIGINT) AS duration_us,
       CAST(MAX(ABS(y)) AS INT) AS peak,
       CAST(SUM(y * y) AS BIGINT) AS sum_sq
FROM d GROUP BY doc_id
""",
    doc="audio through the real G.711 mu-law codec (WAV fmt tag 7, a "
        "genuinely compressed 8-bit wire format): PCM16 synthesis -> "
        "2:1 compression -> RIFF container -> parse -> expand, with the "
        "oracle replaying the compressor's segment/mantissa arithmetic "
        "and the expander formula step-by-step in SQL — hash-green == "
        "the full compressed-audio round trip is bit-exact",
    tags=("multimodal", "audio", "ulaw", "mapInPandas"),
)
def q_multimodal_ulaw_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.multimodal import audio_stats

    docs = load_testdata(spark, sf_dir, "documents")
    return audio_stats(synthesize_ulaw_media(docs))


# ---------------------------------------------------------------------------
# Compressed VIDEO (round 4: the last stubbed modality closed). MJPEG
# in a real AVI/RIFF container: every frame is a baseline JPEG, so a
# solid-color frame decodes to the SAME arithmetic prediction the
# multimodal_jpeg_stats oracle replays — here per (media_id, frame).
# Container parse returns raw JPEG payloads frame-by-frame
# (codecs.avi_mjpeg_frames), so sampling skips decode for unsampled
# frames; this query decodes every frame to prove the full pipeline.
# ---------------------------------------------------------------------------

_MJPEG_FPS = 10
_FRAME_STATS_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, fps int, "
    "mean_r int, mean_g int, mean_b int"
)


def synthesize_mjpeg_media(docs: DataFrame) -> DataFrame:
    """documents -> (media_id, kind, payload): an AVI of
    n = 2 + b % 3 solid MJPEG frames, frame f colored
    ((r+41f)%256, (g+59f)%256, (b+83f)%256) at the same
    non-multiple-of-8 dims the JPEG query uses (4+r%9 x 3+g%7)."""
    hexed = docs.select(
        F.col("doc_id").alias("media_id"),
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("x"),
    ).select(
        "media_id",
        *[
            F.conv(F.substring("x", 1 + 2 * i, 2), 16, 10)
            .cast("int")
            .alias(c)
            for i, c in enumerate(["r", "g", "b"])
        ],
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..extensions.codecs import encode_avi_mjpeg

        for pdf in batches:
            payloads = []
            for r, g, b in zip(pdf["r"], pdf["g"], pdf["b"]):
                r, g, b = int(r), int(g), int(b)
                w, h = 4 + r % 9, 3 + g % 7
                frames = [
                    [[((r + 41 * f) % 256, (g + 59 * f) % 256,
                       (b + 83 * f) % 256)] * w] * h
                    for f in range(2 + b % 3)
                ]
                payloads.append(encode_avi_mjpeg(w, h, _MJPEG_FPS, frames))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "payload": payloads,
                }
            )

    return hexed.mapInPandas(encode, schema=_MEDIA_SCHEMA)


def mjpeg_frame_stats(media: DataFrame) -> DataFrame:
    """Real container parse + per-frame JPEG decode inside mapInPandas:
    one row per (media_id, frame_idx) with integer mean channels."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..extensions.codecs import avi_mjpeg_frames
        from ..extensions.jpeg import decode_jpeg_baseline

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, fps, payloads = avi_mjpeg_frames(payload)
                for i, p in enumerate(payloads):
                    fw, fh, px = decode_jpeg_baseline(p)
                    n = max(fw * fh, 1)
                    sums = [0, 0, 0]
                    for row in px:
                        for cr, cg, cb in row:
                            sums[0] += cr
                            sums[1] += cg
                            sums[2] += cb
                    rows.append(
                        (mid, i, fw, fh, fps,
                         sums[0] // n, sums[1] // n, sums[2] // n)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height", "fps",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return media.mapInPandas(op, schema=_FRAME_STATS_SCHEMA)


@register(
    "multimodal_mjpeg_stats",
    f"""
WITH m AS (
  SELECT doc_id AS media_id, md5(COALESCE(text, '')) AS x FROM documents
), rgb AS (
  SELECT media_id,
         {_duck_channel(1)} AS r,
         {_duck_channel(3)} AS g,
         {_duck_channel(5)} AS b
  FROM m
), fr AS (
  SELECT media_id, r, g, b,
         4 + r % 9 AS width, 3 + g % 7 AS height,
         unnest(generate_series(0, 2 + b % 3 - 1)) AS frame_idx
  FROM rgb
), col AS (
  SELECT media_id, frame_idx, width, height,
         (r + 41 * frame_idx) % 256 AS fr_,
         (g + 59 * frame_idx) % 256 AS fg_,
         (b + 83 * frame_idx) % 256 AS fb_
  FROM fr
), ycc AS (
  SELECT media_id, frame_idx, width, height,
    LEAST(255.0, GREATEST(0.0,
      FLOOR(0.299::DOUBLE*fr_ + 0.587::DOUBLE*fg_ + 0.114::DOUBLE*fb_ + 0.5))) AS y,
    LEAST(255.0, GREATEST(0.0,
      FLOOR(128.0 + (-0.168736::DOUBLE*fr_ - 0.331264::DOUBLE*fg_ + 0.5::DOUBLE*fb_) + 0.5))) AS cb,
    LEAST(255.0, GREATEST(0.0,
      FLOOR(128.0 + (0.5::DOUBLE*fr_ - 0.418688::DOUBLE*fg_ - 0.081312::DOUBLE*fb_) + 0.5))) AS cr
  FROM col
), dq AS (
  SELECT media_id, frame_idx, width, height,
    {_jpeg_chan_sql('y')} AS yd,
    {_jpeg_chan_sql('cb')} AS cbd,
    {_jpeg_chan_sql('cr')} AS crd
  FROM ycc
)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
  CAST(width AS INT) AS width, CAST(height AS INT) AS height,
  {_MJPEG_FPS} AS fps,
  CAST(LEAST(255.0, GREATEST(0.0,
    FLOOR(yd + 1.402::DOUBLE*(crd - 128.0) + 0.5))) AS INT) AS mean_r,
  CAST(LEAST(255.0, GREATEST(0.0,
    FLOOR(yd - 0.344136::DOUBLE*(cbd - 128.0) - 0.714136::DOUBLE*(crd - 128.0) + 0.5)))
    AS INT) AS mean_g,
  CAST(LEAST(255.0, GREATEST(0.0,
    FLOOR(yd + 1.772::DOUBLE*(cbd - 128.0) + 0.5))) AS INT) AS mean_b
FROM dq
""",
    doc="compressed video through the real MJPEG/AVI path: multi-frame "
        "AVI payloads synthesized per document, the RIFF container "
        "parsed and every frame JPEG-decoded inside mapInPandas, with "
        "the oracle replaying the per-frame quantization arithmetic in "
        "SQL — hash-green proves container framing, per-frame Huffman/"
        "DCT decode, and frame ordering all land on the prediction",
    tags=("multimodal", "binary", "video", "mjpeg", "mapInPandas"),
)
def q_multimodal_mjpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_mjpeg_media(load_testdata(spark, sf_dir, "documents"))
    return mjpeg_frame_stats(media)


# ---------------------------------------------------------------------------
# FLAC subset (VERDICT r8 Next #6: one genuinely-compressed
# perceptual-adjacent codec to shrink the MP3/AAC seam). The SAME
# synthesis formula as the WAV/mu-law twins, compressed through real
# fixed-predictor + Rice-residual FLAC frames (extensions/flac.py:
# spec frame headers, CRC-8/CRC-16 verified, STREAMINFO MD5 checked on
# decode). FLAC is LOSSLESS, so the oracle's prediction of the decoded
# stats from the synthesis formula is exact — the predictor/residual
# arithmetic must cancel to the identity, and a hash-green row proves
# it did, bit-for-bit, through a genuinely compressed wire format
# (smaller_than_wav must come back TRUE for every payload: the FLAC
# blob replaces a 44+2n-byte PCM16 WAV, and the bound holds for EVERY
# reachable frame — brute-force-enumerated over all (wrap-phase, n)
# classes of the synthesis signal, worst margin 5 bytes at n=50 with
# the modular wrap's +/-65536 outlier in-frame; wrap-free frames
# compress ~3:1).
# ---------------------------------------------------------------------------


def synthesize_flac_media(docs: DataFrame) -> DataFrame:
    """documents -> (media_id, kind, payload): the shared synthesis
    formula (n = 50 + doc_id % 50, sample i = ((doc_id*31 + i*97) %
    65536) - 32768) encoded through the real FLAC subset encoder."""
    ids = docs.select(F.col("doc_id").alias("media_id"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..extensions.flac import encode_flac

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 50 + mid % 50
                samples = [
                    ((mid * 31 + i * 97) % 65536) - 32768 for i in range(n)
                ]
                payloads.append(encode_flac(_AUDIO_RATE, samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "flac",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(encode, schema=_MEDIA_SCHEMA)


@register(
    "multimodal_flac_stats",
    f"""
WITH s AS (
  SELECT doc_id, unnest(generate_series(0, 50 + doc_id % 50 - 1)) AS i
  FROM documents
), v AS (
  SELECT doc_id, ((doc_id * 31 + i * 97) % 65536) - 32768 AS x FROM s
)
SELECT doc_id AS media_id,
       COUNT(*) AS n_samples,
       {_AUDIO_RATE} AS sample_rate,
       CAST(COUNT(*) * 1000000 // {_AUDIO_RATE} AS BIGINT) AS duration_us,
       CAST(MAX(ABS(x)) AS INT) AS peak,
       CAST(SUM(x * x) AS BIGINT) AS sum_sq,
       TRUE AS smaller_than_wav
FROM v GROUP BY doc_id
""",
    doc="audio through the real FLAC subset codec (fixed polynomial "
        "predictors + Rice-coded residuals, CRC-8/CRC-16 + STREAMINFO "
        "MD5 verified on decode): synthesis -> compressed frames -> "
        "parse -> reconstruct; losslessness makes the synthesis "
        "formula the exact oracle, and smaller_than_wav=TRUE pins that "
        "every payload genuinely compressed below the PCM16 WAV it "
        "replaces (bound enumerated exact over the fixture space)",
    tags=("multimodal", "audio", "flac", "mapInPandas"),
)
def q_multimodal_flac_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.multimodal import audio_stats

    docs = load_testdata(spark, sf_dir, "documents")
    return audio_stats(synthesize_flac_media(docs), with_size=True)
