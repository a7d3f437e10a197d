"""FLAC subset codec, pure stdlib (VERDICT r8 Next #6): the
"genuinely compressed audio" seam-closer where MP3/AAC cannot be done
honestly without perceptual-model DSP libraries.

Implements the lossless *subset* profile of the FLAC format
(https://xiph.org/flac/format.html) sufficient for real compressed
audio round trips:

* STREAMINFO metadata block (sample rate / channels / bps / total
  samples / MD5 of the unencoded PCM, verified on decode);
* frames with spec frame headers (sync code, UTF-8-coded frame number,
  CRC-8) and frame-level CRC-16 — both CHECKED on decode, so bitstream
  corruption is detected, not silently mis-decoded;
* subframe types CONSTANT, VERBATIM, and FIXED orders 0-4 (the
  polynomial predictors 0, s1, 2s1-s2, 3s1-3s2+s3, 4s1-6s2+4s3-s4);
* residuals Rice-coded (coding method 0, 4-bit parameter, partition
  order 0) with the 0b1111 escape to raw binary when Rice would
  inflate.

Mono, 16-bit only — the synthesis fixtures' shape; the frame layer is
format-true, so widening to stereo/other depths is additive. The
encoder picks the best fixed order per frame by residual magnitude
(libFLAC's estimation heuristic) and the Rice parameter from the mean
absolute residual.

No reference analog (the reference stores no media;
`instagram_scraper.py:181-190` keeps only a profile-pic URL string) —
this is SURVEY §2.12's multimodal column family: compressed payloads
as opaque binary columns, decoded executor-side in Arrow-batched
``mapInPandas`` (`extensions/multimodal.py`).
"""

from __future__ import annotations

import hashlib
import struct

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# Bit IO (MSB-first, as the FLAC bitstream requires)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0, "unaligned bitstream"
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        out = 0
        while nbits > 0:
            if self.byte >= len(self.data):
                raise ValueError("flac: truncated bitstream")
            avail = 8 - self.bit
            take = min(avail, nbits)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            nbits -= take
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


# ---------------------------------------------------------------------------
# CRCs (FLAC frame-header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                (crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1
            ) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (spec 9.1.5)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad UTF-8 frame number")
    n = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 continuation byte")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else ((-r) << 1) - 1


def _best_fixed_order(samples: list[int], max_order: int = 4) -> int:
    """libFLAC's heuristic: pick the fixed order minimizing the sum of
    absolute residuals (computed by repeated differencing)."""
    max_order = min(max_order, len(samples) - 1, 4)
    diff = list(samples)
    best_order, best_cost = 0, sum(abs(x) for x in diff)
    for order in range(1, max_order + 1):
        diff = [diff[i] - diff[i - 1] for i in range(1, len(diff))]
        cost = sum(abs(x) for x in diff)
        if cost < best_cost:
            best_order, best_cost = order, cost
    return best_order


def _rice_param(residuals: list[int], bps: int) -> int:
    """Rice parameter from the mean absolute zigzagged residual."""
    if not residuals:
        return 0
    mean = sum(_zigzag(r) for r in residuals) / len(residuals)
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    return k


def _write_residuals(
    bw: _BitWriter, residuals: list[int], bps: int
) -> None:
    """Residual coding method 0 (4-bit Rice), partition order 0, with
    the 0b1111 escape to fixed-width raw when Rice would inflate."""
    bw.write(0, 2)  # coding method 0
    bw.write(0, 4)  # partition order 0
    k = _rice_param(residuals, bps)
    rice_bits = sum((_zigzag(r) >> k) + 1 + k for r in residuals)
    # escape: raw residuals at a width covering the widest value
    raw_width = max(
        (max(abs(r) for r in residuals).bit_length() + 1)
        if residuals else 1,
        1,
    )
    if rice_bits <= 5 + raw_width * len(residuals):
        bw.write(k, 4)
        for r in residuals:
            u = _zigzag(r)
            bw.write_unary(u >> k)
            bw.write(u, k)
    else:
        bw.write(0xF, 4)  # escape code
        bw.write(raw_width, 5)
        for r in residuals:
            bw.write(r, raw_width)


def _encode_subframe(bw: _BitWriter, samples: list[int], bps: int) -> None:
    if len(set(samples)) == 1:
        bw.write(0, 1)          # padding
        bw.write(0b000000, 6)   # CONSTANT
        bw.write(0, 1)          # no wasted bits
        bw.write(samples[0], bps)
        return
    order = _best_fixed_order(samples)
    coefs = _FIXED_COEFS[order]
    residuals = [
        samples[i]
        - sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]
    # VERBATIM when prediction can't beat raw (tiny/noisy frames)
    k = _rice_param(residuals, bps)
    est = order * bps + sum((_zigzag(r) >> k) + 1 + k for r in residuals)
    if est >= len(samples) * bps:
        bw.write(0, 1)
        bw.write(0b000001, 6)   # VERBATIM
        bw.write(0, 1)
        for s in samples:
            bw.write(s, bps)
        return
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)  # FIXED, order 0-4
    bw.write(0, 1)
    for s in samples[:order]:      # warm-up
        bw.write(s, bps)
    _write_residuals(bw, residuals, bps)


def encode_flac(
    sample_rate: int,
    samples: list[int],
    block_size: int = 4096,
    bps: int = 16,
) -> bytes:
    """Mono 16-bit PCM -> FLAC subset bitstream (fixed predictors +
    Rice residuals, one subframe per frame, STREAMINFO MD5 stamped)."""
    for s in samples:
        if not -(1 << (bps - 1)) <= s < (1 << (bps - 1)):
            raise ValueError(f"sample {s} out of {bps}-bit range")
    out = bytearray(b"fLaC")
    md5 = hashlib.md5(
        b"".join(struct.pack("<h", s) for s in samples)
    ).digest()
    si = _BitWriter()
    si.write(block_size, 16)        # min block size
    si.write(block_size, 16)        # max block size
    si.write(0, 24)                 # min frame size unknown
    si.write(0, 24)                 # max frame size unknown
    si.write(sample_rate, 20)
    si.write(0, 3)                  # channels - 1 (mono)
    si.write(bps - 1, 5)
    si.write(len(samples), 36)
    body = si.bytes() + md5
    out.append(0x80)                # last metadata block, type 0
    out += len(body).to_bytes(3, "big")
    out += body

    for fno, at in enumerate(range(0, len(samples), block_size)):
        frame = samples[at: at + block_size]
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)  # sync
        bw.write(0, 1)                  # reserved
        bw.write(0, 1)                  # fixed-blocksize strategy
        bw.write(0b0111, 4)             # blocksize: 16-bit at end
        bw.write(0b0000, 4)             # sample rate: from STREAMINFO
        bw.write(0b0000, 4)             # channels: 1, independent
        bw.write(0b100, 3)              # sample size: 16 bits
        bw.write(0, 1)                  # reserved
        for b in _utf8_number(fno):
            bw.write(b, 8)
        bw.write(len(frame) - 1, 16)
        header = bw.bytes()
        header += bytes([_crc8(header)])

        bw2 = _BitWriter()
        _encode_subframe(bw2, frame, bps)
        bw2.align()
        payload = header + bw2.bytes()
        out += payload + _crc16(payload).to_bytes(2, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_flac(data: bytes) -> tuple[int, list[int]]:
    """FLAC subset bitstream -> (sample_rate, samples). Verifies the
    frame-header CRC-8, the frame CRC-16, and the STREAMINFO MD5 of
    the decoded PCM — corruption raises, never mis-decodes."""
    if data[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC marker")
    pos = 4
    info = None
    while True:  # metadata blocks
        hdr = data[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        blen = int.from_bytes(data[pos + 1: pos + 4], "big")
        body = data[pos + 4: pos + 4 + blen]
        if btype == 0:
            br = _BitReader(body)
            br.read(16)  # min block size
            br.read(16)  # max block size
            br.read(24)
            br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            info = (rate, channels, bps, total, md5)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("flac: no STREAMINFO block")
    rate, channels, bps, total, md5 = info
    if channels != 1 or bps != 16:
        raise ValueError("flac subset decoder: mono 16-bit only")

    samples: list[int] = []
    while len(samples) < total:
        frame_start = pos
        br = _BitReader(data, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        if ch_code != 0:
            raise ValueError("flac subset decoder: mono only")
        _read_utf8_number(br)
        if bs_code == 0b0110:
            bsize = br.read(8) + 1
        elif bs_code == 0b0111:
            bsize = br.read(16) + 1
        elif bs_code == 0b0001:
            bsize = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bsize = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bsize = 256 << (bs_code - 8)
        else:
            raise ValueError(f"flac: reserved blocksize code {bs_code}")
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        if ss_code == 0b100:
            fbps = 16
        else:
            raise ValueError("flac subset decoder: 16-bit only")
        # header CRC-8 covers everything before the CRC byte
        br.align()
        crc_at = br.byte
        if _crc8(data[frame_start:crc_at]) != data[crc_at]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        br.byte += 1

        frame = _decode_subframe(br, bsize, fbps)
        br.align()
        got16 = int.from_bytes(data[br.byte: br.byte + 2], "big")
        if _crc16(data[frame_start: br.byte]) != got16:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = br.byte + 2
        samples.extend(frame)

    samples = samples[:total]
    want = hashlib.md5(
        b"".join(struct.pack("<h", s) for s in samples)
    ).digest()
    if md5 != bytes(16) and md5 != want:
        raise ValueError("flac: decoded-PCM MD5 mismatch")
    return rate, samples


def _decode_subframe(br: _BitReader, bsize: int, bps: int) -> list[int]:
    if br.read(1) != 0:
        raise ValueError("flac: bad subframe padding bit")
    stype = br.read(6)
    if br.read(1) != 0:
        raise ValueError("flac subset decoder: wasted bits unsupported")
    if stype == 0b000000:  # CONSTANT
        return [br.read_signed(bps)] * bsize
    if stype == 0b000001:  # VERBATIM
        return [br.read_signed(bps) for _ in range(bsize)]
    if 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
        order = stype & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        residuals = _read_residuals(br, bsize - order)
        coefs = _FIXED_COEFS[order]
        out = list(warm)
        for r in residuals:
            pred = sum(c * out[-j - 1] for j, c in enumerate(coefs))
            out.append(pred + r)
        return out
    raise ValueError(
        f"flac subset decoder: subframe type {stype:06b} unsupported"
    )


def _read_residuals(br: _BitReader, n: int) -> list[int]:
    method = br.read(2)
    if method != 0:
        raise ValueError("flac subset decoder: Rice2 unsupported")
    porder = br.read(4)
    if porder != 0:
        raise ValueError("flac subset decoder: partition order 0 only")
    k = br.read(4)
    out = []
    if k == 0xF:  # escape: raw fixed-width
        width = br.read(5)
        for _ in range(n):
            out.append(br.read_signed(width) if width else 0)
        return out
    for _ in range(n):
        q = br.read_unary()
        u = (q << k) | br.read(k)
        out.append((u >> 1) if u % 2 == 0 else -((u + 1) >> 1))
    return out
