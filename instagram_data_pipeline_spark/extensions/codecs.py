"""Pure-Python image codecs: uncompressed (PPM P6, BMP 24bpp), PNG
(stdlib zlib — lossless, full filter support) and baseline JPEG
(:mod:`.jpeg`, numpy DCT + Annex K Huffman).

The sandbox ships no PIL/ffmpeg, but none of these formats need a codec
library — so the multimodal operators (:mod:`multimodal`) get REAL
decode -> transform -> re-encode paths for the formats real corpora use,
exercised byte-exactly (PPM/BMP/PNG) or prediction-exactly (JPEG) in
tests.

These run inside mapInPandas workers on payloads of one Arrow batch at a
time; pixel work is plain Python (fine for tests and small media — a
production deployment swaps in a vectorized decoder through the same
function signatures).
"""

from __future__ import annotations

import struct

Pixels = list[list[tuple[int, int, int]]]  # rows of (r, g, b)


# ---------------------------------------------------------------------------
# PPM (P6, binary, maxval 255)
# ---------------------------------------------------------------------------

def decode_ppm(data: bytes) -> tuple[int, int, Pixels]:
    """Parse binary PPM (P6): header tokens separated by whitespace or
    ``#`` comments, then raw RGB triples row-major top-down."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(data) and not data[i : i + 1].isspace():
            i += 1
        tokens.append(data[start:i])
    i += 1  # single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    need = width * height * 3
    raw = data[i : i + need]
    if len(raw) != need:
        raise ValueError("truncated PPM payload")
    pixels: Pixels = []
    for r in range(height):
        row = []
        base = r * width * 3
        for c in range(width):
            o = base + c * 3
            row.append((raw[o], raw[o + 1], raw[o + 2]))
        pixels.append(row)
    return width, height, pixels


def encode_ppm(width: int, height: int, pixels: Pixels) -> bytes:
    out = bytearray(f"P6\n{width} {height}\n255\n".encode())
    for row in pixels:
        for r, g, b in row:
            out += bytes((r, g, b))
    return bytes(out)


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24bpp, uncompressed, bottom-up)
# ---------------------------------------------------------------------------

def decode_bmp24(data: bytes) -> tuple[int, int, Pixels]:
    """Parse the classic 54-byte-header uncompressed 24-bit BMP: rows are
    bottom-up, BGR order, padded to 4-byte boundaries."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    (header_size, width, height) = struct.unpack_from("<Iii", data, 14)
    (planes, bpp) = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24bpp supported (bpp={bpp})")
    if height <= 0:
        raise ValueError("top-down BMP (negative height) not supported")
    row_stride = (width * 3 + 3) & ~3
    pixels: Pixels = []
    for r in range(height):
        # bottom-up: last stored row is the top row of the image
        base = pixel_offset + (height - 1 - r) * row_stride
        row = []
        for c in range(width):
            o = base + c * 3
            b, g, rr = data[o], data[o + 1], data[o + 2]
            row.append((rr, g, b))
        pixels.append(row)
    return width, height, pixels


def encode_bmp24(width: int, height: int, pixels: Pixels) -> bytes:
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    body = bytearray()
    for r in range(height - 1, -1, -1):  # stored bottom-up
        for rr, g, b in pixels[r]:
            body += bytes((b, g, rr))
        body += pad
    file_size = 54 + len(body)
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    return bytes(header + dib + body)


# ---------------------------------------------------------------------------
# PNG (RGB truecolor, 8-bit, non-interlaced) — stdlib zlib is the whole
# compression story, so PNG needs no external codec: chunk framing +
# per-row filters. Lossless, hence byte-exact round trips like PPM/BMP.
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: Pixels) -> bytes:
    """RGB8 truecolor, filter type 0 on every row, one IDAT chunk."""
    import zlib

    raw = bytearray()
    for row in pixels:
        raw.append(0)  # filter: None
        for r, g, b in row:
            raw += bytes((r, g, b))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, Pixels]:
    """Parse RGB8 truecolor non-interlaced PNG; all five standard row
    filters (None/Sub/Up/Average/Paeth) are reconstructed, so files from
    real encoders (which pick filters adaptively) decode too. IDAT
    chunks concatenate into one zlib stream per spec."""
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if (depth, color) != (8, 2):
                raise ValueError(
                    f"only 8-bit RGB truecolor supported (depth={depth}, "
                    f"color type {color})"
                )
            if interlace != 0:
                raise ValueError("Adam7 interlacing unsupported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    pixels: Pixels = []
    prev = bytearray(stride)
    for r in range(height):
        base = r * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        pixels.append(
            [
                (line[3 * c], line[3 * c + 1], line[3 * c + 2])
                for c in range(width)
            ]
        )
        prev = line
    return width, height, pixels


# ---------------------------------------------------------------------------
# Transform + operator adapters
# ---------------------------------------------------------------------------

def resize_nearest(pixels: Pixels, tw: int, th: int) -> Pixels:
    """Nearest-neighbor resize: source index = floor(i * src / dst)."""
    sh, sw = len(pixels), len(pixels[0]) if pixels else 0
    return [
        [pixels[(r * sh) // th][(c * sw) // tw] for c in range(tw)]
        for r in range(th)
    ]


def _decode_jpeg(data: bytes) -> tuple[int, int, Pixels]:
    from .jpeg import decode_jpeg_baseline

    return decode_jpeg_baseline(data)


def _encode_jpeg(width: int, height: int, pixels: Pixels) -> bytes:
    from .jpeg import encode_jpeg_baseline

    return encode_jpeg_baseline(width, height, pixels)


_FORMATS = {
    "ppm": (decode_ppm, encode_ppm),
    "bmp": (decode_bmp24, encode_bmp24),
    "png": (decode_png, encode_png),
    "jpeg": (_decode_jpeg, _encode_jpeg),
}


def sniff_format(payload: bytes) -> str | None:
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == _PNG_MAGIC:
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def image_resizer(payload: bytes, tw: int, th: int) -> bytes:
    """Real resize kernel for :func:`multimodal.resize_images`: decode
    (format sniffed from magic bytes) -> nearest-neighbor resize ->
    re-encode in the same format."""
    fmt = sniff_format(payload)
    if fmt is None:
        raise ValueError(
            "unsupported image format (PPM/BMP/PNG/JPEG supported)"
        )
    dec, enc = _FORMATS[fmt]
    _, _, pixels = dec(payload)
    return enc(tw, th, resize_nearest(pixels, tw, th))


def mean_rgb_feature(payload: bytes, kind: str) -> list[float]:
    """Real feature kernel for :func:`multimodal.extract_features` on
    PPM/BMP/PNG/JPEG images: [mean_r, mean_g, mean_b, width, height]
    normalized to [0, 1] (dims divided by 4096). Non-image payloads fall
    back to the deterministic byte-fold feature."""
    fmt = sniff_format(payload or b"") if kind == "image" else None
    if fmt is None:
        from .multimodal import fake_feature

        return fake_feature(payload, kind, dim=5)
    dec, _ = _FORMATS[fmt]
    w, h, pixels = dec(payload)
    n = max(w * h, 1)
    sums = [0, 0, 0]
    for row in pixels:
        for r, g, b in row:
            sums[0] += r
            sums[1] += g
            sums[2] += b
    return [
        sums[0] / n / 255.0,
        sums[1] / n / 255.0,
        sums[2] / n / 255.0,
        w / 4096.0,
        h / 4096.0,
    ]


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM16 mono little-endian) — the audio analog of the PPM
# path: an uncompressed container needing no codec library, so the
# multimodal audio operators get one REAL encode -> binary -> decode
# round trip. Compressed audio stays behind the pluggable-decoder seam.
# ---------------------------------------------------------------------------

def encode_wav_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Minimal canonical RIFF/WAVE: fmt chunk (PCM, mono, 16-bit) then
    one data chunk of little-endian int16 samples."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(data: bytes) -> tuple[int, list[int]]:
    """Parse RIFF/WAVE with PCM16 mono; walks the chunk list (extra
    chunks are skipped, as the container allows). Returns
    ``(sample_rate, samples)``."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if (fmt_tag, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = list(struct.unpack(f"<{clen // 2}h", body))
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, samples


# ---------------------------------------------------------------------------
# Compressed audio: G.711 mu-law (WAV fmt tag 7) and IMA ADPCM (fmt tag
# 0x11). Closes the compressed-AUDIO half of the stubbed-modality seam:
# both are real, widely-deployed compressed formats (telephony / game
# audio) decodable without any codec library. mu-law decode is pure
# integer arithmetic, so the driver oracle can replay it in SQL; ADPCM
# is stateful per-sample (predictor + step index) and is verified by
# round-trip error-bound and known-sequence tests instead.
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def ulaw_encode(samples: list[int]) -> bytes:
    """G.711 mu-law compressor: PCM16 -> one byte per sample
    (sign | exponent<<4 | mantissa, ones-complemented per the spec)."""
    out = bytearray()
    for s in samples:
        sign = 0x80 if s < 0 else 0
        mag = min(-s if s < 0 else s, _ULAW_CLIP) + _ULAW_BIAS
        e = 7
        for exp in range(8):
            if mag < (256 << exp):
                e = exp
                break
        mantissa = (mag >> (e + 3)) & 0x0F
        out.append(~(sign | (e << 4) | mantissa) & 0xFF)
    return bytes(out)


def ulaw_decode(codes: bytes) -> list[int]:
    """G.711 mu-law expander; exact integer arithmetic
    (((mantissa<<3)+BIAS)<<exponent)-BIAS, negated when the sign bit of
    the complemented code is set."""
    out = []
    for c in codes:
        u = ~c & 0xFF
        e = (u >> 4) & 0x07
        mag = ((((u & 0x0F) << 3) + _ULAW_BIAS) << e) - _ULAW_BIAS
        out.append(-mag if u & 0x80 else mag)
    return out


# IMA/DVI ADPCM step table (the standard 89-entry table) and index
# adjustment table — 4 bits/sample, stateful predictor.
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _ima_step_nibble(diff: int, step: int) -> tuple[int, int]:
    """Quantize one difference against the current step; returns
    (nibble, reconstructed_diff) using the shift-add form every IMA
    implementation shares (bit-exact, no division)."""
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    delta = step >> 3
    if diff >= step:
        nibble |= 4
        diff -= step
        delta += step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
        delta += step >> 1
    if diff >= step >> 2:
        nibble |= 1
        delta += step >> 2
    return nibble, (-delta if nibble & 8 else delta)


def _ima_decode_nibble(nibble: int, step: int) -> int:
    delta = step >> 3
    if nibble & 4:
        delta += step
    if nibble & 2:
        delta += step >> 1
    if nibble & 1:
        delta += step >> 2
    return -delta if nibble & 8 else delta


def ima_adpcm_encode(samples: list[int]) -> bytes:
    """IMA ADPCM (mono, one block): 4-byte header (initial predictor
    int16, step index, reserved) then two samples per byte, low nibble
    first. The first sample seeds the predictor and is NOT re-coded as
    a nibble (the standard WAV layout)."""
    if not samples:
        return struct.pack("<hBB", 0, 0, 0)
    predictor = samples[0]
    index = 0
    out = bytearray(struct.pack("<hBB", predictor, index, 0))
    nibbles = []
    for s in samples[1:]:
        step = _IMA_STEPS[index]
        nibble, rdiff = _ima_step_nibble(s - predictor, step)
        predictor = _ima_clamp16(predictor + rdiff)
        index = max(0, min(88, index + _IMA_INDEX_ADJ[nibble & 7]))
        nibbles.append(nibble)
    for i in range(0, len(nibbles), 2):
        lo = nibbles[i]
        hi = nibbles[i + 1] if i + 1 < len(nibbles) else 0
        out.append(lo | (hi << 4))
    return bytes(out)


def ima_adpcm_decode(data: bytes, n_samples: int) -> list[int]:
    """Inverse of :func:`ima_adpcm_encode` — bit-exact reconstruction of
    the encoder's predictor sequence."""
    if n_samples <= 0:
        return []
    predictor, index, _ = struct.unpack("<hBB", data[:4])
    out = [predictor]
    nibbles = []
    for b in data[4:]:
        nibbles.append(b & 0x0F)
        nibbles.append(b >> 4)
    for nibble in nibbles[: n_samples - 1]:
        step = _IMA_STEPS[index]
        predictor = _ima_clamp16(predictor + _ima_decode_nibble(nibble, step))
        index = max(0, min(88, index + _IMA_INDEX_ADJ[nibble & 7]))
        out.append(predictor)
    return out


_WAV_FMT_PCM16 = 1
_WAV_FMT_ULAW = 7
_WAV_FMT_IMA = 0x11


def encode_wav_ulaw(sample_rate: int, samples: list[int]) -> bytes:
    """RIFF/WAVE container, fmt tag 7 (G.711 mu-law, mono, 8 bits):
    compresses the PCM16 samples 2:1 through :func:`ulaw_encode`."""
    data = ulaw_encode(samples)
    fmt = struct.pack("<HHIIHH", _WAV_FMT_ULAW, 1, sample_rate,
                      sample_rate, 1, 8)
    pad = b"\x00" if len(data) & 1 else b""
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima(sample_rate: int, samples: list[int]) -> bytes:
    """RIFF/WAVE container, fmt tag 0x11 (IMA ADPCM, mono, 4 bits), one
    block holding all samples; the ``fact`` chunk carries the sample
    count as the spec requires for compressed formats."""
    data = ima_adpcm_encode(samples)
    block_align = len(data)
    fmt = struct.pack(
        "<HHIIHHHH", _WAV_FMT_IMA, 1, sample_rate,
        (sample_rate + 1) // 2, block_align, 4, 2, len(samples) or 1,
    )
    fact = struct.pack("<I", len(samples))
    pad = b"\x00" if len(data) & 1 else b""
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """General RIFF/WAVE decoder dispatching on the fmt tag: PCM16
    passthrough, G.711 mu-law expansion, IMA ADPCM block decode. Always
    returns mono PCM16 ``(sample_rate, samples)`` so every downstream
    operator is agnostic to which wire format the payload used."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_tag, sample_rate, n_samples, raw = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate = struct.unpack("<HHI", body[:8])
            if channels != 1:
                raise ValueError("only mono supported")
        elif cid == b"fact":
            (n_samples,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            raw = body
        pos += 8 + clen + (clen & 1)
    if fmt_tag is None or sample_rate is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_tag == _WAV_FMT_PCM16:
        return sample_rate, list(struct.unpack(f"<{len(raw) // 2}h", raw))
    if fmt_tag == _WAV_FMT_ULAW:
        return sample_rate, ulaw_decode(raw)
    if fmt_tag == _WAV_FMT_IMA:
        if n_samples is None:
            raise ValueError("IMA ADPCM requires a fact chunk")
        return sample_rate, ima_adpcm_decode(raw, n_samples)
    raise ValueError(f"unsupported WAV fmt tag {fmt_tag}")


def decode_audio(data: bytes) -> tuple[int, list[int]]:
    """Container-agnostic audio decode dispatching on the magic bytes:
    RIFF/WAVE (PCM16, mu-law, IMA ADPCM via :func:`decode_wav`) or a
    FLAC subset stream (fixed predictors + Rice residuals,
    :mod:`.flac`). Always mono PCM16 ``(sample_rate, samples)``, so
    downstream stats operators are wire-format agnostic."""
    if data[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(data)
    return decode_wav(data)


# ---------------------------------------------------------------------------
# Compressed video: MJPEG in an AVI (RIFF) container — closes the
# compressed-VIDEO half of the stubbed-modality seam. Motion-JPEG is a
# real interchange format (cameras, capture cards) whose frames are
# plain baseline JPEGs, so the existing :mod:`jpeg` codec does the
# per-frame work; this layer is the container: 'hdrl' stream headers,
# 'movi' frame chunks, 'idx1' index. Frame extraction returns the raw
# JPEG payloads first so frame SAMPLING can skip decode entirely for
# unsampled frames (the 100 TB-relevant property: decode cost scales
# with frames KEPT, not frames stored).
# ---------------------------------------------------------------------------

def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _riff_list(ltype: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", ltype + body)


def encode_avi_mjpeg(
    width: int, height: int, fps: int, frames: list[Pixels]
) -> bytes:
    """Minimal standard AVI: avih + one 'vids'/'MJPG' stream (strh with
    scale/rate = 1/fps, strf BITMAPINFOHEADER), every frame a '00dc'
    chunk holding a baseline JPEG, then an idx1 index."""
    from .jpeg import encode_jpeg_baseline

    payloads = [encode_jpeg_baseline(width, height, px) for px in frames]
    max_bytes = max((len(p) for p in payloads), default=0)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1), max_bytes * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIiI4H",
            0, 0, 0, 0, 1, max(fps, 1), 0, len(frames), max_bytes,
            -1, 0, 0, 0, width, height,
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(
            b"strl",
            _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf),
        ),
    )
    movi_chunks = [_riff_chunk(b"00dc", p) for p in payloads]
    movi = _riff_list(b"movi", b"".join(movi_chunks))
    idx, off = [], 4  # offsets relative to the movi list type fourcc
    for p, ch in zip(payloads, movi_chunks):
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(p)))
        off += len(ch)
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", b"".join(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_mjpeg_frames(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse the AVI container WITHOUT decoding frames: returns
    ``(width, height, fps, [jpeg_payload, ...])``. Walks the top-level
    chunk list, reads dims/rate from avih/strh, and collects '00dc'
    payloads from the movi list."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    fps = 0
    payloads: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, fps
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos:pos + 4]
            (clen,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body = buf[pos + 8:pos + 8 + clen]
            if cid == b"LIST":
                walk(body[4:])
            elif cid == b"avih":
                width, height = struct.unpack("<II", body[32:40])
            elif cid == b"strh" and body[:4] == b"vids":
                # dwScale/dwRate at offsets 20/24 within strh (after
                # fccType+fccHandler+flags+priority+language+initial)
                scale, rate = struct.unpack("<II", body[20:28])
                fps = rate // max(scale, 1)
            elif cid == b"00dc":
                payloads.append(body)
            pos += 8 + clen + (clen & 1)

    walk(data[12:])
    if width is None:
        raise ValueError("missing avih header")
    return width, height, fps, payloads


def decode_avi_mjpeg(
    data: bytes,
) -> tuple[int, int, int, list[Pixels]]:
    """Full decode: container parse + per-frame baseline-JPEG decode."""
    from .jpeg import decode_jpeg_baseline

    width, height, fps, payloads = avi_mjpeg_frames(data)
    frames = []
    for p in payloads:
        w, h, px = decode_jpeg_baseline(p)
        if (w, h) != (width, height):
            raise ValueError("frame dims disagree with container header")
        frames.append(px)
    return width, height, fps, frames
