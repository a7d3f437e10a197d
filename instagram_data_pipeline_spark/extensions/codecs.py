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
