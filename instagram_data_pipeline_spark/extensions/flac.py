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

* mono AND stereo, at 8/12/16/20/24-bit depths (round 10 — VERDICT r9
  Next #7): stereo frames pick the cheapest channel assignment per
  frame among independent, left/side, right/side, and mid/side
  (spec 9.1.3; the side channel carries bps+1 bits), estimated with
  the same order/Rice cost model the subframe encoder uses.

PCM in and out is channel-INTERLEAVED (L0 R0 L1 R1 ...), the layout
the STREAMINFO MD5 is defined over (samples packed little-endian
signed at ceil(bps/8) bytes, libFLAC's convention). The encoder picks
the best fixed order per frame by residual magnitude (libFLAC's
estimation heuristic) and the Rice parameter from the mean absolute
residual.

No reference analog (the reference stores no media;
`instagram_scraper.py:181-190` keeps only a profile-pic URL string) —
this is SURVEY §2.12's multimodal column family: compressed payloads
as opaque binary columns, decoded executor-side in Arrow-batched
``mapInPandas`` (`extensions/multimodal.py`).
"""

from __future__ import annotations

import hashlib

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

# frame-header sample-size codes (spec 9.1.4); 0b000 = from STREAMINFO
_BPS_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}
_CODE_BPS = {v: k for k, v in _BPS_CODE.items()}

# stereo channel assignments (spec 9.1.3): code -> (bps delta of
# subframe 0, bps delta of subframe 1); the side channel gets +1 bit
_CH_INDEPENDENT, _CH_LEFT_SIDE, _CH_RIGHT_SIDE, _CH_MID_SIDE = (
    0b0001, 0b1000, 0b1001, 0b1010,
)


def _pack_pcm(samples: list[int], bps: int) -> bytes:
    """Interleaved PCM -> the byte layout the STREAMINFO MD5 is
    defined over: little-endian signed, ceil(bps/8) bytes per sample
    (for bps=16 this is exactly ``struct.pack('<h', s)``)."""
    nbytes = (bps + 7) // 8
    mask = (1 << (8 * nbytes)) - 1
    return b"".join(
        (s & mask).to_bytes(nbytes, "little") for s in samples
    )


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


def _estimate_subframe_bits(samples: list[int], bps: int) -> int:
    """Bit cost _encode_subframe would spend — the channel-assignment
    chooser runs this over each candidate signal pair (libFLAC's
    estimate-then-pick shape, spec 9.1.3)."""
    if len(set(samples)) == 1:
        return 8 + bps  # CONSTANT
    order = _best_fixed_order(samples)
    coefs = _FIXED_COEFS[order]
    residuals = [
        samples[i]
        - sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]
    k = _rice_param(residuals, bps)
    est = order * bps + sum((_zigzag(r) >> k) + 1 + k for r in residuals)
    return 8 + min(est, len(samples) * bps)  # VERBATIM fallback


def encode_flac(
    sample_rate: int,
    samples: list[int],
    block_size: int = 4096,
    bps: int = 16,
    channels: int = 1,
) -> bytes:
    """Interleaved PCM -> FLAC subset bitstream (fixed predictors +
    Rice residuals, per-frame stereo decorrelation, STREAMINFO MD5
    stamped). ``samples`` is channel-interleaved for ``channels=2``.

    Field-width contracts are VALIDATED, not truncated (ADVICE r9:
    an oversized block_size/sample_rate used to truncate silently in
    the 16/20-bit STREAMINFO fields, producing a well-formed but
    wrong stream)."""
    if not 16 <= block_size <= 65535:
        raise ValueError(
            f"flac: block_size {block_size} outside [16, 65535] "
            f"(16-bit STREAMINFO/frame field)"
        )
    if not 1 <= sample_rate <= (1 << 20) - 1:
        raise ValueError(
            f"flac: sample_rate {sample_rate} outside [1, 2^20-1] "
            f"(20-bit STREAMINFO field)"
        )
    if bps not in _BPS_CODE:
        raise ValueError(
            f"flac subset encoder: bps {bps} not in "
            f"{sorted(_BPS_CODE)}"
        )
    if channels not in (1, 2):
        raise ValueError(
            f"flac subset encoder: {channels} channels unsupported "
            f"(mono or stereo)"
        )
    if len(samples) % channels:
        raise ValueError(
            f"flac: {len(samples)} interleaved samples not a "
            f"multiple of {channels} channels"
        )
    lo, hi = -(1 << (bps - 1)), 1 << (bps - 1)
    for s in samples:
        if not lo <= s < hi:
            raise ValueError(f"sample {s} out of {bps}-bit range")
    n_inter = len(samples) // channels  # inter-channel sample count
    if n_inter >= 1 << 36:
        raise ValueError("flac: total samples exceed the 36-bit field")
    out = bytearray(b"fLaC")
    md5 = hashlib.md5(_pack_pcm(samples, bps)).digest()
    si = _BitWriter()
    si.write(block_size, 16)        # min block size
    si.write(block_size, 16)        # max block size
    si.write(0, 24)                 # min frame size unknown
    si.write(0, 24)                 # max frame size unknown
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_inter, 36)
    body = si.bytes() + md5
    out.append(0x80)                # last metadata block, type 0
    out += len(body).to_bytes(3, "big")
    out += body

    chans = [samples[c::channels] for c in range(channels)]
    for fno, at in enumerate(range(0, n_inter, block_size)):
        parts = [ch[at: at + block_size] for ch in chans]
        if channels == 1:
            ch_code, subs = 0b0000, [(parts[0], bps)]
        else:
            left, right = parts
            side = [a - b for a, b in zip(left, right)]
            mid = [(a + b) >> 1 for a, b in zip(left, right)]
            cands: dict[int, list[tuple[list[int], int]]] = {
                _CH_INDEPENDENT: [(left, bps), (right, bps)],
                _CH_LEFT_SIDE: [(left, bps), (side, bps + 1)],
                _CH_RIGHT_SIDE: [(side, bps + 1), (right, bps)],
                _CH_MID_SIDE: [(mid, bps), (side, bps + 1)],
            }
            ch_code, subs = min(
                cands.items(),
                key=lambda kv: sum(
                    _estimate_subframe_bits(sig, b) for sig, b in kv[1]
                ),
            )
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)  # sync
        bw.write(0, 1)                  # reserved
        bw.write(0, 1)                  # fixed-blocksize strategy
        bw.write(0b0111, 4)             # blocksize: 16-bit at end
        bw.write(0b0000, 4)             # sample rate: from STREAMINFO
        bw.write(ch_code, 4)            # channel assignment
        bw.write(_BPS_CODE[bps], 3)     # sample size
        bw.write(0, 1)                  # reserved
        for b in _utf8_number(fno):
            bw.write(b, 8)
        bw.write(len(parts[0]) - 1, 16)
        header = bw.bytes()
        header += bytes([_crc8(header)])

        bw2 = _BitWriter()
        for sig, sbps in subs:
            _encode_subframe(bw2, sig, sbps)
        bw2.align()
        payload = header + bw2.bytes()
        out += payload + _crc16(payload).to_bytes(2, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_flac(data: bytes) -> tuple[int, list[int]]:
    """FLAC subset bitstream -> (sample_rate, interleaved samples) —
    the historical mono-shaped return; see :func:`decode_flac_full`
    for channels/bps."""
    rate, _channels, _bps, samples = decode_flac_full(data)
    return rate, samples


def decode_flac_full(data: bytes) -> tuple[int, int, int, list[int]]:
    """FLAC subset bitstream -> (sample_rate, channels, bps,
    interleaved samples). Verifies the frame-header CRC-8, the frame
    CRC-16, and the STREAMINFO MD5 of the decoded PCM — corruption
    raises, never mis-decodes."""
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
    if channels not in (1, 2):
        raise ValueError("flac subset decoder: mono/stereo only")
    if bps not in _BPS_CODE:
        raise ValueError(
            f"flac subset decoder: {bps}-bit unsupported "
            f"(have {sorted(_BPS_CODE)})"
        )

    samples: list[int] = []  # interleaved
    decoded = 0  # inter-channel sample count
    while decoded < total:
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
        if ch_code == 0b0000:
            n_sub, frame_ch = 1, 1
        elif ch_code in (
            _CH_INDEPENDENT, _CH_LEFT_SIDE, _CH_RIGHT_SIDE, _CH_MID_SIDE,
        ):
            n_sub, frame_ch = 2, 2
        else:
            raise ValueError(
                f"flac subset decoder: channel assignment "
                f"{ch_code:04b} unsupported"
            )
        if frame_ch != channels:
            raise ValueError(
                "flac: frame channel count disagrees with STREAMINFO"
            )
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
        if ss_code == 0b000:
            fbps = bps  # from STREAMINFO
        elif ss_code in _CODE_BPS:
            fbps = _CODE_BPS[ss_code]
            if fbps != bps:
                raise ValueError(
                    "flac: frame sample size disagrees with STREAMINFO"
                )
        else:
            raise ValueError(
                f"flac: reserved sample-size code {ss_code:03b}"
            )
        # header CRC-8 covers everything before the CRC byte
        br.align()
        crc_at = br.byte
        if _crc8(data[frame_start:crc_at]) != data[crc_at]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        br.byte += 1

        # side channels (the difference signal) carry one extra bit
        sub_bps = [fbps] * n_sub
        if ch_code == _CH_LEFT_SIDE or ch_code == _CH_MID_SIDE:
            sub_bps[1] += 1
        elif ch_code == _CH_RIGHT_SIDE:
            sub_bps[0] += 1
        subs = [_decode_subframe(br, bsize, b) for b in sub_bps]
        br.align()
        got16 = int.from_bytes(data[br.byte: br.byte + 2], "big")
        if _crc16(data[frame_start: br.byte]) != got16:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = br.byte + 2

        if channels == 1:
            frame = subs[0]
        else:
            if ch_code == _CH_INDEPENDENT:
                left, right = subs
            elif ch_code == _CH_LEFT_SIDE:
                left = subs[0]
                right = [a - s for a, s in zip(left, subs[1])]
            elif ch_code == _CH_RIGHT_SIDE:
                right = subs[1]
                left = [b + s for b, s in zip(right, subs[0])]
            else:  # mid/side: (mid<<1 | side&1) reconstructs l+r
                left, right = [], []
                for mid_v, s in zip(subs[0], subs[1]):
                    m2 = (mid_v << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
            frame = [v for pair in zip(left, right) for v in pair]
        samples.extend(frame)
        decoded += bsize

    samples = samples[: total * channels]
    want = hashlib.md5(_pack_pcm(samples, bps)).digest()
    if md5 != bytes(16) and md5 != want:
        raise ValueError("flac: decoded-PCM MD5 mismatch")
    return rate, channels, bps, samples


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
