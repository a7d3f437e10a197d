"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (SURVEY §2.12).

The container has no image/audio codecs, so the decode kernels are
STUBBED (clearly marked below) behind a pluggable decoder; everything
Spark-side is real and tested: the schema contract, Arrow batch shape,
``mapInPandas`` operator signatures, and partitioning behavior.

Scale design: media bytes dominate row size, so
* media tables should set a small ``spark.sql.files.maxPartitionBytes``
  relative to text tables (few rows per task, bounded executor memory);
* feature extraction is ``mapInPandas`` (iterator form) so one Python
  worker processes a stream of Arrow batches without materializing the
  partition;
* derived features are written to a separate table keyed by media_id —
  never carried alongside the raw bytes through later shuffles.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, payload_digest string, "
    "feature array<float>"
)


def real_decode(payload: bytes, kind: str) -> Any:
    """STUB for PERCEPTUAL-CODEC AUDIO/VIDEO (MP3/AAC/H.264...):
    librosa/ffmpeg are unavailable in this environment, and a
    psychoacoustic decoder cannot be honestly reimplemented inline.
    Every IMAGE format has a REAL pure-Python path — see :mod:`codecs`
    (PPM/BMP/PNG decode) and :mod:`jpeg` (baseline JFIF), used via
    ``extract_features(decoder=codecs.mean_rgb_feature)`` /
    ``resize_images(decoder=codecs.image_resizer)``. AUDIO decodes via
    ``codecs.decode_audio`` (WAV PCM16, G.711 mu-law, IMA ADPCM, and
    the FLAC subset in :mod:`.flac` — mu-law/ADPCM/FLAC genuinely
    compressed, FLAC losslessly so) and MJPEG/AVI video via
    ``codecs`` + :mod:`jpeg` frame decode. The remaining seam is
    exactly the perceptual (lossy-transform) family."""
    raise NotImplementedError(
        "perceptual audio/video codecs (MP3/AAC/H.264) not installed; "
        "plug a decoder via extract_features(decoder=...); images "
        "(PPM/BMP/PNG/JPEG), audio (WAV PCM16/mu-law/ADPCM + FLAC "
        "subset) and MJPEG/AVI video have real codecs in "
        "extensions.codecs / extensions.jpeg / extensions.flac"
    )


def fake_feature(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes of the payload folded into a
    fixed-dim vector. Replaces the model/codec in tests."""
    acc = [0] * dim
    for i, b in enumerate(payload or b""):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [float(x) / 997.0 for x in acc]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = fake_feature,
) -> DataFrame:
    """Batched feature extraction over binary payloads via mapInPandas.

    One Arrow batch in -> one pandas frame out; the decoder sees raw
    bytes. Hash digest is computed JVM-side (cheap, avoids shipping
    payloads twice)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "payload_digest": [
                        hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feature": [
                        decoder(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, payload binary, width int, height int, resized boolean"
)


def resize_images(
    media: DataFrame,
    target_width: int,
    target_height: int,
    decoder=None,
) -> DataFrame:
    """Image-resize operator plumbing: image rows flow through a
    mapInPandas kernel that would decode -> resize -> re-encode.

    The codec is STUBBED (no PIL in this environment): the default
    kernel passes bytes through untouched and records the target dims,
    flagging `resized=false` so downstream knows the payload is
    original. Inject a real decoder to flip the flag; the Spark plan,
    schema contract, and batch shape are identical either way."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, resized = [], []
            for payload in pdf["payload"]:
                if decoder is None:
                    out_payload.append(payload)  # passthrough stub
                    resized.append(False)
                else:
                    out_payload.append(
                        decoder(payload, target_width, target_height)
                    )
                    resized.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": target_width,
                    "height": target_height,
                    "resized": resized,
                }
            )

    images = media.filter(F.col("kind") == "image")
    return images.mapInPandas(op, schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (the decode itself is the pluggable kernel). Built-in
    sequence/explode does the fan-out — the expensive part stays JVM-side
    and the decoder only ever sees (payload, ts) pairs."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


AUDIO_SCHEMA = (
    "media_id long, n_samples long, sample_rate int, duration_us long, "
    "peak int, sum_sq long"
)

AUDIO_SIZED_SCHEMA = AUDIO_SCHEMA + ", smaller_than_wav boolean"


def audio_stats(media: DataFrame, with_size: bool = False) -> DataFrame:
    """Decode audio payloads (any wire format ``codecs.decode_audio``
    speaks: WAV PCM16 / mu-law / IMA ADPCM, FLAC) and emit
    integer-exact audio stats through ``mapInPandas`` (iterator form,
    one Arrow batch at a time).

    The stats are deliberately INTEGER (sample count, microsecond
    duration via integer division, peak amplitude, sum of squared
    samples) so downstream checks — and the SQL oracle that predicts
    them from the synthesis formula — are exact across engines; RMS is
    ``sqrt(sum_sq / n)`` for whoever wants the float. With
    ``with_size=True`` an extra ``smaller_than_wav`` boolean records
    whether the wire payload beat the PCM16 WAV container it replaces
    (2n data bytes + the 44-byte RIFF header) — the assertable
    footprint of a genuinely compressed codec. The comparison is
    container-to-container: a frame holding a step discontinuity can
    exceed RAW sample bytes under subset FLAC (partition order 0 can't
    isolate one huge residual from an otherwise-flat frame), while the
    WAV bound holds for every reachable fixture frame (enumerated
    exactly in the flac query's construction)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_audio

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_audio(payload)
                n = len(samples)
                row = (
                    mid,
                    n,
                    rate,
                    n * 1_000_000 // rate,
                    max((abs(s) for s in samples), default=0),
                    sum(s * s for s in samples),
                )
                if with_size:
                    row += (len(payload) < 2 * n + 44,)
                rows.append(row)
            cols = [
                "media_id", "n_samples", "sample_rate",
                "duration_us", "peak", "sum_sq",
            ]
            if with_size:
                cols.append("smaller_than_wav")
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        op, schema=AUDIO_SIZED_SCHEMA if with_size else AUDIO_SCHEMA
    )
