"""Pure-Python image codecs for uncompressed formats (PPM P6, BMP 24bpp).

The sandbox ships no PIL/ffmpeg, but uncompressed formats need no codec
library — so these give the multimodal operators (:mod:`multimodal`) one
REAL decode -> transform -> re-encode path, exercised byte-exactly in
tests. Compressed formats stay behind the pluggable-decoder seam.

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
# Transform + operator adapters
# ---------------------------------------------------------------------------

def resize_nearest(pixels: Pixels, tw: int, th: int) -> Pixels:
    """Nearest-neighbor resize: source index = floor(i * src / dst)."""
    sh, sw = len(pixels), len(pixels[0]) if pixels else 0
    return [
        [pixels[(r * sh) // th][(c * sw) // tw] for c in range(tw)]
        for r in range(th)
    ]


_FORMATS = {
    "ppm": (decode_ppm, encode_ppm),
    "bmp": (decode_bmp24, encode_bmp24),
}


def sniff_format(payload: bytes) -> str | None:
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    return None


def image_resizer(payload: bytes, tw: int, th: int) -> bytes:
    """Real resize kernel for :func:`multimodal.resize_images`: decode
    (format sniffed from magic bytes) -> nearest-neighbor resize ->
    re-encode in the same format."""
    fmt = sniff_format(payload)
    if fmt is None:
        raise ValueError("unsupported image format (PPM/BMP supported)")
    dec, enc = _FORMATS[fmt]
    _, _, pixels = dec(payload)
    return enc(tw, th, resize_nearest(pixels, tw, th))


def mean_rgb_feature(payload: bytes, kind: str) -> list[float]:
    """Real feature kernel for :func:`multimodal.extract_features` on
    PPM/BMP images: [mean_r, mean_g, mean_b, width, height] normalized to
    [0, 1] (dims divided by 4096). Non-image payloads fall back to the
    deterministic byte-fold feature."""
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
