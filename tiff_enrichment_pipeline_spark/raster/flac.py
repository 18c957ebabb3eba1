"""Pure-stdlib FLAC codec (subset) for the multimodal audio leg.

Free Lossless Audio Codec, per the public xiph.org format spec
(https://xiph.org/flac/format.html — the same surface the reference's
audio handling would read via libsndfile; reference has no audio path,
this is part of the engine's training-data multimodal contract).

Decoder coverage: STREAMINFO + any skippable metadata blocks; frames
with fixed or variable blocking strategy; all blocksize/sample-rate/
sample-size header codes; subframe types CONSTANT, VERBATIM, FIXED
(orders 0-4) and LPC (orders 1-32, the integer predictor + shift);
wasted-bits; rice / rice2 residual partitions incl. escape codes;
channel assignments independent, left/side, right/side and mid/side
(the side channel carries bits-per-sample+1 — spec §frame header);
CRC-8 (poly 0x07) of the frame header and CRC-16 (poly 0x8005) of the
whole frame are VERIFIED — a mismatch classifies as ValueError, never
silent garbage. Every count/length is bounded against the buffer
before allocation (the r7 fuzz discipline).

Encoder (the test-vector twin): 16-bit PCM, independent or mid/side
stereo, CONSTANT/VERBATIM/FIXED(0-2) subframe selection by residual
cost, single rice partition per subframe (escape when incompressible)
— enough to produce spec-shaped streams for every decoder path above.
Lossless: decode(encode(x)) is bit-exact (pinned in tests).

Honesty note: no reference FLAC implementation exists in this
container, so conformance is proven against this module's own encoder
plus structural pins (CRC polynomials, fixed-predictor coefficients,
zigzag mapping, UTF-8 frame numbers are written straight from the
public spec); real-world FLAC files exercise the same decoder paths
but have not been run against it here.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), MSB-first, init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), MSB-first."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitReader:
    """MSB-first bit reader with hard bounds (ValueError past the end)."""

    __slots__ = ("buf", "pos", "n")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos * 8
        self.n = len(buf) * 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.pos + k > self.n:
            raise ValueError("flac bitstream truncated")
        v = 0
        p = self.pos
        buf = self.buf
        for _ in range(k):
            v = (v << 1) | ((buf[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def signed(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if v & (1 << (k - 1)) else v

    def unary(self) -> int:
        q = 0
        p = self.pos
        buf = self.buf
        n = self.n
        while True:
            if p >= n:
                raise ValueError("flac bitstream truncated in unary code")
            if (buf[p >> 3] >> (7 - (p & 7))) & 1:
                self.pos = p + 1
                return q
            q += 1
            p += 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def bits(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.nacc += k
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.bits(0, 32)
            q -= 32
        self.bits(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.bits(0, 8 - self.nacc)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _utf8_number(r: _BitReader) -> int:
    """FLAC's extended-UTF-8 coded frame/sample number (up to 36 bits
    payload / 7 total bytes)."""
    b0 = r.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac invalid UTF-8 frame number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.bits(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac invalid UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _utf8_encode_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
        if nbytes > 7:
            raise ValueError("frame number too large")
    for _ in range(nbytes - 1):
        out.append(0x80 | (v & 0x3F))
        v >>= 6
    lead_ones = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead_ones | v)
    return bytes(reversed(out))


def _read_residual(r: _BitReader, blocksize: int, pred_order: int) -> np.ndarray:
    """Rice-coded residual (both coding methods + escapes)."""
    method = r.bits(2)
    if method > 1:
        raise ValueError(f"flac residual coding method {method} reserved")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = r.bits(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("flac partition order does not divide blocksize")
    if (blocksize >> porder) < pred_order:
        raise ValueError("flac first partition smaller than predictor order")
    out = np.empty(blocksize - pred_order, np.int64)
    idx = 0
    for p in range(nparts):
        cnt = (blocksize >> porder) - (pred_order if p == 0 else 0)
        if cnt < 0 or idx + cnt > len(out):
            raise ValueError("flac residual partition overruns block")
        param = r.bits(plen)
        if param == escape:
            nbits = r.bits(5)
            for i in range(cnt):
                out[idx + i] = r.signed(nbits) if nbits else 0
        else:
            for i in range(cnt):
                q = r.unary()
                u = (q << param) | r.bits(param)
                out[idx + i] = (u >> 1) ^ -(u & 1)  # zigzag
        idx += cnt
    return out


def _decode_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.bits(1):
        raise ValueError("flac subframe padding bit set")
    stype = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = r.unary() + 1
        bps -= wasted
    if bps <= 0 or bps > 33:
        raise ValueError("flac wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        x = np.full(blocksize, r.signed(bps), np.int64)
    elif stype == 1:  # VERBATIM
        x = np.empty(blocksize, np.int64)
        for i in range(blocksize):
            x[i] = r.signed(bps)
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        if order > blocksize:
            raise ValueError("flac fixed order exceeds blocksize")
        warm = [r.signed(bps) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        x = np.empty(blocksize, np.int64)
        x[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            acc = res[i - order]
            for j, c in enumerate(coefs):
                acc += c * x[i - 1 - j]
            x[i] = acc
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        if order > blocksize:
            raise ValueError("flac lpc order exceeds blocksize")
        warm = [r.signed(bps) for _ in range(order)]
        prec = r.bits(4) + 1
        if prec == 16:
            raise ValueError("flac lpc precision code 1111 invalid")
        shift = r.signed(5)
        if shift < 0:
            raise ValueError("flac negative lpc shift reserved")
        coefs = [r.signed(prec) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        x = np.empty(blocksize, np.int64)
        x[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * x[i - 1 - j]
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"flac subframe type {stype} reserved")
    if wasted:
        x <<= wasted
    return x


def decode_flac(payload: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC stream → ((n_samples, n_channels) int32, sample_rate, bps).

    Raises ValueError on any structural damage (bad magic, truncation,
    CRC mismatch, reserved codes) and NotImplementedError only for
    sample sizes over 32 bits (none exist)."""
    if len(payload) < 42 or payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac metadata truncated")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        pos += 4
        if blen > len(payload) - pos:
            raise ValueError("flac metadata block overruns buffer")
        if btype == 0:
            if blen < 34:
                raise ValueError("flac STREAMINFO too short")
            streaminfo = payload[pos : pos + 34]
        elif btype == 127:
            raise ValueError("flac invalid metadata block type 127")
        pos += blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.bits(16)  # min blocksize
    si.bits(16)  # max blocksize
    si.bits(24)  # min framesize
    si.bits(24)  # max framesize
    rate = si.bits(20)
    nch = si.bits(3) + 1
    bps = si.bits(5) + 1
    total = si.bits(36)
    if rate == 0 or rate > 655350:
        raise ValueError(f"flac sample rate {rate} invalid")
    if total > (len(payload) * 8) * 4 + 65536:
        # total_samples is a hint; bound it so a lying header can't
        # drive the output allocation (frames re-bound it anyway)
        raise ValueError("flac total-samples header implausible")

    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        if pos + 2 > len(payload):
            break
        r = _BitReader(payload, pos)
        sync = r.bits(14)
        if sync != 0x3FFE:
            raise ValueError("flac frame sync lost")
        if r.bits(1):
            raise ValueError("flac reserved frame bit set")
        r.bits(1)  # blocking strategy
        bs_code = r.bits(4)
        rate_code = r.bits(4)
        ch_asgn = r.bits(4)
        ss_code = r.bits(3)
        if r.bits(1):
            raise ValueError("flac reserved frame bit set")
        _utf8_number(r)
        if bs_code == 0:
            raise ValueError("flac blocksize code 0 reserved")
        elif bs_code == 6:
            blocksize = r.bits(8) + 1
        elif bs_code == 7:
            blocksize = r.bits(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 0:
            frate = rate
        elif rate_code in _RATE_CODES:
            frate = _RATE_CODES[rate_code]
        elif rate_code == 12:
            frate = r.bits(8) * 1000
        elif rate_code == 13:
            frate = r.bits(16)
        elif rate_code == 14:
            frate = r.bits(16) * 10
        else:
            raise ValueError("flac sample-rate code 15 invalid")
        fbps = bps if ss_code == 0 else _BPS_CODES.get(ss_code)
        if fbps is None:
            raise ValueError(f"flac sample-size code {ss_code} reserved")
        if fbps > 32:
            raise NotImplementedError("flac >32-bit samples")
        hdr_end = r.byte_pos()
        crc8 = r.bits(8)
        if _crc8(payload[pos:hdr_end]) != crc8:
            raise ValueError("flac frame header CRC-8 mismatch")

        if ch_asgn <= 7:
            fch = ch_asgn + 1
            if fch != nch:
                raise ValueError("flac frame channel count != STREAMINFO")
            subs = [
                _decode_subframe(r, blocksize, fbps) for _ in range(fch)
            ]
        elif ch_asgn in (8, 9, 10):
            if nch != 2:
                raise ValueError("flac stereo decorrelation on non-stereo")
            # the SIDE subframe carries bps+1 bits
            if ch_asgn == 8:  # left/side
                left = _decode_subframe(r, blocksize, fbps)
                side = _decode_subframe(r, blocksize, fbps + 1)
                subs = [left, left - side]
            elif ch_asgn == 9:  # right/side
                side = _decode_subframe(r, blocksize, fbps + 1)
                right = _decode_subframe(r, blocksize, fbps)
                subs = [right + side, right]
            else:  # mid/side
                mid = _decode_subframe(r, blocksize, fbps)
                side = _decode_subframe(r, blocksize, fbps + 1)
                ssum = (mid << 1) | (side & 1)
                subs = [(ssum + side) >> 1, (ssum - side) >> 1]
        else:
            raise ValueError(f"flac channel assignment {ch_asgn} reserved")
        r.align()
        body_end = r.byte_pos()
        crc16 = r.bits(16)
        if _crc16(payload[pos:body_end]) != crc16:
            raise ValueError("flac frame CRC-16 mismatch")
        for c in range(nch):
            chans[c].append(subs[c])
        got += blocksize
        pos = r.byte_pos()
    if got == 0:
        raise ValueError("flac stream has no frames")
    out = np.stack(
        [np.concatenate(c) for c in chans], axis=1
    )
    if total and len(out) > total:
        out = out[:total]
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if out.min() < lo or out.max() > hi:
        raise ValueError("flac decoded samples exceed declared bit depth")
    return out.astype(np.int32), rate, bps


# ---------------------------------------------------------------------------
# encoder (test-vector twin)
# ---------------------------------------------------------------------------


def _write_residual(w: _BitWriter, res: np.ndarray) -> None:
    """Single-partition rice (method 0) with escape fallback."""
    w.bits(0, 2)   # method 0: 4-bit rice params
    w.bits(0, 4)   # partition order 0
    r64 = res.astype(np.int64)
    u = (r64 << 1) ^ (r64 >> 63)  # zigzag
    mean = float(u.mean()) if len(u) else 0.0
    param = 0
    while param < 14 and (1 << (param + 1)) < mean + 1:
        param += 1
    # escape if unary parts would blow up (incompressible residual)
    worst_q = int(u.max() >> param) if len(u) else 0
    if worst_q > 64:
        # raw signed storage: enough bits for the widest residual
        nbits = min(31, max(2, int(np.abs(r64).max()).bit_length() + 1))
        w.bits(15, 4)       # escape
        w.bits(nbits, 5)
        for v in res:
            w.bits(int(v) & ((1 << nbits) - 1), nbits)
        return
    w.bits(param, 4)
    for uv in u:
        uv = int(uv)
        w.unary(uv >> param)
        if param:
            w.bits(uv & ((1 << param) - 1), param)


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    """CONSTANT / FIXED(0-2) / VERBATIM selection by residual cost."""
    x = x.astype(np.int64)
    w.bits(0, 1)  # pad
    if len(x) and np.all(x == x[0]):
        w.bits(0, 6)  # CONSTANT
        w.bits(0, 1)  # no wasted bits
        w.bits(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best_order, best_cost = 0, float(np.abs(x).sum())
    for order in (1, 2):
        if len(x) <= order:
            break
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        cost = float(np.abs(res).sum())
        if cost < best_cost:
            best_order, best_cost = order, cost
    # incompressible → verbatim
    if best_cost > len(x) * (1 << (bps - 3)):
        w.bits(1, 6)  # VERBATIM
        w.bits(0, 1)
        for v in x:
            w.bits(int(v) & ((1 << bps) - 1), bps)
        return
    order = best_order
    w.bits(8 + order, 6)  # FIXED
    w.bits(0, 1)
    for v in x[:order]:
        w.bits(int(v) & ((1 << bps) - 1), bps)
    res = x.copy()
    for _ in range(order):
        res = np.diff(res)
    _write_residual(w, res)


def encode_flac_s16(
    samples: np.ndarray,
    rate: int,
    block_size: int = 4096,
    mid_side: bool = False,
) -> bytes:
    """int16 samples, shape (n,) mono or (n, 2) stereo → FLAC bytes.

    ``mid_side``: stereo frames use the mid/side decorrelation path
    (channel assignment 10) instead of independent channels — exists so
    tests exercise the decoder's decorrelation arithmetic."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if nch not in (1, 2):
        raise ValueError("encoder supports mono or stereo")
    if mid_side and nch != 2:
        raise ValueError("mid_side needs stereo input")
    if n == 0:
        raise ValueError("empty sample array")
    bps = 16

    frames = bytearray()
    for f0 in range(0, n, block_size):
        blk = x[f0 : f0 + block_size]
        bsz = len(blk)
        w = _BitWriter()
        w.bits(0x3FFE, 14)
        w.bits(0, 1)
        w.bits(0, 1)        # fixed blocking strategy
        w.bits(7, 4)        # blocksize: 16-bit follow
        w.bits(0, 4)        # rate from STREAMINFO
        w.bits(10 if mid_side else nch - 1, 4)
        w.bits(0, 3)        # sample size from STREAMINFO
        w.bits(0, 1)
        for b in _utf8_encode_number(f0 // block_size):
            w.bits(b, 8)
        w.bits(bsz - 1, 16)
        hdr = w.flush()
        hdr += bytes([_crc8(hdr)])
        body = _BitWriter()
        if mid_side:
            left, right = blk[:, 0], blk[:, 1]
            mid = (left + right) >> 1
            side = left - right
            _write_subframe(body, mid, bps)
            _write_subframe(body, side, bps + 1)
        else:
            for c in range(nch):
                _write_subframe(body, blk[:, c], bps)
        frame = hdr + body.flush()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame

    si = _BitWriter()
    si.bits(min(block_size, n), 16)
    si.bits(min(block_size, n), 16)
    si.bits(0, 24)
    si.bits(0, 24)
    si.bits(rate, 20)
    si.bits(nch - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(n, 36)
    info = si.flush()
    md5 = hashlib.md5(
        np.ascontiguousarray(x.astype("<i2")).tobytes()
    ).digest()
    meta = bytes([0x80]) + struct.pack(">I", len(info) + 16)[1:] + info + md5
    return b"fLaC" + meta + bytes(frames)
