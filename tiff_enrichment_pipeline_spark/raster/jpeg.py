"""Stdlib baseline JPEG codec (gray + YCbCr 4:4:4/4:2:2/4:2:0, 8-bit).

Closes the one remaining common foreign format the engine could not decode
without Pillow (VERDICT r3 stretch #9): single-component baseline JFIF now
encodes and decodes with numpy + stdlib only — huffman entropy coding with
the ITU-T81 Annex K standard tables, orthonormal 8×8 DCT as a matrix
product, standard luminance quantization scaled by quality. Round 5
(VERDICT r4 stretch #8) extends decode to THREE-component interleaved
baseline (YCbCr), converting to ITU-R 601 luma on output since the
engine's band contract is grayscale u16; handles restart intervals
(DRI/RSTn — byte-aligned entropy resets with DC-predictor reset, E.2.4)
and chroma subsampling with factors 1-2 per axis (4:2:2 and 4:2:0 — the
dominant real-world profiles — via general h_i×v_i MCU interleave +
replication upsample). Round 6 (VERDICT r5 stretch #6) adds PROGRESSIVE
(SOF2, T.81 Annex G): multi-scan spectral selection + successive
approximation with EOBRUN batching, interleaved DC scans, per-scan DHT
updates and restart intervals — plus progressive gray/color ENCODERS as
the test vector source (entropy coding is lossless, so a progressive
encode decodes bit-identically to the baseline encode at the same
quality/subsampling; pinned across shapes in tests) — and 12-BIT
precision for grayscale (Pq=1 16-bit quant tables, per-file huffman
tables reaching the 12-bit categories, 12→16-bit replication out, own
test encoder), plus sampling factors up to the spec's 1-4 range
(4:1:1 included). Round 7 extends 12-bit precision to COLOR (YCbCr,
the entropy/DCT path is precision-agnostic — only the level shift and
output scaling differ; own test encoder `encode_jpeg_color_12bit`).
Round 7 also removes the non-integer sampling-ratio gate (index-map
upsampler; Y 3x1 / Cb 2x1-style streams are legal per A.1.1) and the
direct-RGB gate (component ids 'R','G','B' / APP14 transform=0 — planes
are the channels, luma computed straight from them). Only arithmetic
coding stays behind the optional Pillow gate in
``codec.decode`` — same policy as the remaining exotic TIFF variants
(JPEG-in-TIFF, multi-sample).

Pixel convention: the engine's bands are uint16; JPEG baseline is 8-bit.
``encode_jpeg_gray`` stores the high byte (v >> 8); ``decode_jpeg_gray``
expands back with ×257 (0→0, 255→65535 — the standard 8→16-bit bit
replication). The 8-bit round trip alone bounds PSNR at ~58.9 dB on u16
data; quality ≥ ~90 keeps smooth rasters comfortably above the input_hint's
40 dB lossy floor (pinned in tests/test_kernels.py).

Reference semantics: the reference pipeline hands lossy formats to
rasterio/PIL (utils/rasterio_utils.py); here the baseline profile is real
and the exotic remainder is a clearly-gated NotImplementedError that
``decode_status`` routes to quarantine instead of failing the job.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# tables (ITU-T81 Annex K)
# --------------------------------------------------------------------------

# K.1 luminance quantization (natural row-major order)
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)

# K.3 luminance DC: BITS (# codes of length 1..16) + HUFFVAL
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

# K.5 luminance AC
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# K.2 chrominance quantization (natural row-major order)
_Q_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# K.4 chrominance DC
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))

# K.6 chrominance AC
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zigzag scan order: _ZIGZAG[k] = natural index of the k-th zigzag element
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal 8x8 DCT-II matrix: D @ block @ D.T transforms, D.T @ c @ D inverts
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _quant_table(quality: int, base: np.ndarray | None = None) -> np.ndarray:
    """IJG quality scaling of an Annex K table (luminance by default)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = ((_Q_LUM if base is None else base) * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _build_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _build_codes(_AC_BITS, _AC_VALS)


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value."""
    enc = _build_codes(bits, vals)
    return {(length, code): v for v, (code, length) in enc.items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def restart_marker(self, idx: int) -> None:
        """1-pad to a byte boundary and emit RST(idx%8) — markers are
        written raw, never byte-stuffed (B.2.1.2)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (idx % 8)])

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        # truncate to the live bits: an ever-growing Python int makes
        # every subsequent shift O(scan size) → O(n²) overall
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("jpeg entropy stream truncated at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif nxt == 0xD9:  # EOI reached mid-read: spec allows 1-padding
                self.pos -= 1  # stay on the 0xFF: every further fill pads
                b = 0xFF
            elif 0xD0 <= nxt <= 0xD7:
                # an RSTn where entropy data was expected: with DRI
                # handled at MCU boundaries this means a desynced/corrupt
                # stream, not a missing capability
                raise ValueError(
                    f"jpeg unexpected RST{nxt - 0xD0} inside entropy data"
                )
            else:
                raise NotImplementedError(
                    f"jpeg marker 0x{nxt:02X} inside scan"
                )
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        # keep only unread bits (see _BitWriter.write: unbounded acc
        # growth turns the decode quadratic in scan size)
        self.acc &= (1 << self.n) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def consume_restart(self, idx: int) -> None:
        """Discard pad bits to the byte boundary and consume the expected
        RST(idx%8) marker; DC predictors reset at the caller."""
        self.acc = 0
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("jpeg truncated at restart marker")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or b1 != 0xD0 + (idx % 8):
            raise ValueError(
                f"jpeg restart marker mismatch: expected RST{idx % 8}, "
                f"got {b0:02X}{b1:02X}"
            )
        self.pos += 2


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, low bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    low = v if v > 0 else v + (1 << cat) - 1
    return cat, low


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    q2d: np.ndarray,
    dc_enc: dict[int, tuple[int, int]],
    ac_enc: dict[int, tuple[int, int]],
    prev_dc: int,
) -> int:
    """Forward-DCT + quantize + entropy-code ONE centered 8×8 block;
    returns the new DC predictor."""
    coef = _D @ block @ _D.T
    qc = np.round(coef / q2d).astype(np.int64)
    zz = qc.flatten()[_ZIGZAG]
    return _entropy_block(writer, zz, dc_enc, ac_enc, prev_dc)


def _entropy_block(
    writer: _BitWriter,
    zz: np.ndarray,
    dc_enc: dict[int, tuple[int, int]],
    ac_enc: dict[int, tuple[int, int]],
    prev_dc: int,
) -> int:
    """Sequential entropy coding of ONE quantized zigzag block; split
    from _encode_block so callers with precomputed coefficients (the
    12-bit encoder's counting+emit passes) don't run the DCT twice."""
    diff = int(zz[0]) - prev_dc
    new_dc = int(zz[0])
    cat, low = _magnitude(diff)
    code, length = dc_enc[cat]
    writer.write(code, length)
    if cat:
        writer.write(low, cat)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_enc[0xF0]  # ZRL
            writer.write(zc, zl)
            run -= 16
        cat, low = _magnitude(v)
        code, length = ac_enc[(run << 4) | cat]
        writer.write(code, length)
        writer.write(low, cat)
        run = 0
    if run:
        ec, el = ac_enc[0x00]  # EOB
        writer.write(ec, el)
    return new_dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg_gray(
    band: np.ndarray, quality: int = 92, restart_interval: int = 0
) -> bytes:
    """uint16 (h, w) band -> baseline grayscale JFIF bytes (high byte).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (resettable entropy segments — what real encoders emit
    for error resilience; also the decoder-path test vector)."""
    h, w = band.shape
    px = (band.astype(np.uint16) >> 8).astype(np.float64)
    qtbl = _quant_table(quality)  # natural order
    q2d = qtbl.reshape(8, 8)
    # pad to 8 multiples by edge replication
    H, W = (h + 7) & ~7, (w + 7) & ~7
    pad = np.pad(px, ((0, H - h), (0, W - w)), mode="edge") - 128.0

    writer = _BitWriter()
    prev_dc = 0
    mcu_i = 0
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                writer.restart_marker(mcu_i // restart_interval - 1)
                prev_dc = 0
            mcu_i += 1
            prev_dc = _encode_block(
                writer, pad[by : by + 8, bx : bx + 8], q2d,
                _DC_ENC, _AC_ENC, prev_dc,
            )
    scan = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT stores the table in ZIGZAG order per the spec (B.2.4.1)
    out += _seg(0xFFDB, bytes([0]) + bytes(int(x) for x in qtbl[_ZIGZAG]))
    out += _seg(  # SOF0: 8-bit, 1 component, no subsampling
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


_CHR_DC_ENC = _build_codes(_DC_CHR_BITS, _DC_CHR_VALS)
_CHR_AC_ENC = _build_codes(_AC_CHR_BITS, _AC_CHR_VALS)


def _box_downsample(p: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Box-average downsample by integer factors (edge-padded to even)."""
    if fx == 1 and fy == 1:
        return p
    h, w = p.shape
    p = np.pad(p, ((0, (-h) % fy), (0, (-w) % fx)), mode="edge")
    return p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
        axis=(1, 3)
    )


def _color_planes(
    rgb: np.ndarray, quality: int, subsampling: str, center: float = 128.0
):
    """RGB -> MCU-padded centered (Y, Cb, Cr) float planes + quant
    tables + sampling geometry (shared by the baseline and progressive
    color encoders; float op order unchanged from the r5 baseline).
    ``center``: the sample midpoint — 128 for 8-bit, 2048 for the
    12-bit encoder (r7); the ITU-R 601 weights are range-agnostic."""
    h, w = rgb.shape[:2]
    factors = {"444": (1, 1), "422": (2, 1), "420": (2, 2),
               "411": (4, 1)}
    if subsampling not in factors:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    hY, vY = factors[subsampling]
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = center - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = center + 0.5 * r - 0.418688 * g - 0.081312 * b
    cb = _box_downsample(cb, hY, vY)
    cr = _box_downsample(cr, hY, vY)
    q_lum = _quant_table(quality)
    q_chr_nat = _quant_table(quality, base=_Q_CHR)
    mcux = -(-w // (8 * hY))
    mcuy = -(-h // (8 * vY))
    planes = []
    for p, (hi, vi) in zip((y, cb, cr), [(hY, vY), (1, 1), (1, 1)]):
        PH, PW = mcuy * vi * 8, mcux * hi * 8
        planes.append(
            np.pad(
                p, ((0, PH - p.shape[0]), (0, PW - p.shape[1])), mode="edge"
            )
            - center
        )
    return planes, q_lum, q_chr_nat, (hY, vY), mcux, mcuy


def encode_jpeg_color(
    rgb: np.ndarray,
    quality: int = 92,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """uint8 (h, w, 3) RGB -> baseline YCbCr interleaved JFIF bytes.

    JFIF color transform (full-range ITU-R 601), luminance quant/huffman
    tables for Y and the Annex K chrominance tables for Cb/Cr.
    ``subsampling``: '444' (no subsampling), '422' (chroma halved
    horizontally, Y sampling 2×1) or '420' (chroma halved both ways,
    Y 2×2 — the dominant real-world profile; box-average downsample).
    Exists primarily as the independent test encoder for the color
    DECODE path (the engine's own lossy sink stays grayscale)."""
    h, w, nc = rgb.shape
    if nc != 3:
        raise ValueError("encode_jpeg_color expects (h, w, 3)")
    planes, q_lum, q_chr_nat, (hY, vY), mcux, mcuy = _color_planes(
        rgb, quality, subsampling
    )
    samps = [(hY, vY), (1, 1), (1, 1)]
    qs = [q_lum.reshape(8, 8), q_chr_nat.reshape(8, 8), q_chr_nat.reshape(8, 8)]
    dcs = [(_DC_ENC, _AC_ENC), (_CHR_DC_ENC, _CHR_AC_ENC),
           (_CHR_DC_ENC, _CHR_AC_ENC)]

    writer = _BitWriter()
    prev = [0, 0, 0]
    mcu_i = 0
    # interleaved: each MCU carries h_i×v_i blocks per component (A.2.3)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                writer.restart_marker(mcu_i // restart_interval - 1)
                prev = [0, 0, 0]
            mcu_i += 1
            for ci, (hi, vi) in enumerate(samps):
                de, ae = dcs[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        py = (my * vi + byi) * 8
                        px = (mx * hi + bxi) * 8
                        prev[ci] = _encode_block(
                            writer,
                            planes[ci][py : py + 8, px : px + 8],
                            qs[ci], de, ae, prev[ci],
                        )
    scan = writer.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(int(x) for x in q_lum[_ZIGZAG]))
    out += _seg(0xFFDB, bytes([1]) + bytes(int(x) for x in q_chr_nat[_ZIGZAG]))
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hY << 4) | vY, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(
        0xFFC4, bytes([0x01]) + bytes(_DC_CHR_BITS) + bytes(_DC_CHR_VALS)
    )
    out += _seg(
        0xFFC4, bytes([0x11]) + bytes(_AC_CHR_BITS) + bytes(_AC_CHR_VALS)
    )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_rgb_direct(rgb: np.ndarray, quality: int = 92) -> bytes:
    """Direct-RGB baseline JPEG (late r7): component ids 'R','G','B'
    (82/71/66), NO color transform — the stream Adobe apps write with
    APP14 transform=0. 4:4:4, luminance tables for all three channels.
    Test-vector twin for the direct-RGB decode path."""
    h, w, nc = rgb.shape
    if nc != 3 or rgb.dtype != np.uint8:
        raise ValueError("expects (h, w, 3) uint8")
    q_lum = _quant_table(quality)
    q2d = q_lum.reshape(8, 8).astype(np.float64)
    H, W = (h + 7) & ~7, (w + 7) & ~7
    planes = [
        np.pad(
            rgb[..., i].astype(np.float64),
            ((0, H - h), (0, W - w)),
            mode="edge",
        )
        - 128.0
        for i in range(3)
    ]
    writer = _BitWriter()
    prev = [0, 0, 0]
    for my in range(H // 8):
        for mx in range(W // 8):
            for ci in range(3):
                prev[ci] = _encode_block(
                    writer,
                    planes[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                    q2d, _DC_ENC, _AC_ENC, prev[ci],
                )
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, bytes([0]) + bytes(int(x) for x in q_lum[_ZIGZAG]))
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([82, 0x11, 0, 71, 0x11, 0, 66, 0x11, 0]),
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xFFDA, bytes([3, 82, 0x00, 71, 0x00, 66, 0x00, 0, 63, 0]))
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color_factors(
    rgb: np.ndarray,
    quality: int = 92,
    factors: tuple = ((2, 1), (1, 1), (1, 1)),
) -> bytes:
    """Baseline YCbCr encoder with EXPLICIT per-component sampling
    factors (r7) — the test-vector source for the non-integer-ratio
    decode path: T.81 A.1.1 allows any h_i, v_i in 1..4, so e.g.
    Y 3x1 / Cb 2x1 / Cr 1x1 (Cb upsample ratio 1.5) is a legal stream
    that integer-replication decoders reject. Component planes are
    nearest-sample downsampled to ceil(w*h_i/hmax) x ceil(h*v_i/vmax)
    (A.1.1's sample grid), MCU-padded, and interleaved exactly like
    encode_jpeg_color; luma quant/huffman tables for Y, Annex-K
    chrominance tables for Cb/Cr."""
    h, w, nc = rgb.shape
    if nc != 3 or len(factors) != 3:
        raise ValueError("expects (h, w, 3) rgb and 3 factor pairs")
    for hi, vi in factors:
        if not (1 <= hi <= 4) or not (1 <= vi <= 4):
            raise ValueError(f"sampling factor {hi}x{vi} outside 1-4")
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    ycc = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    q_lum = _quant_table(quality)
    q_chr = _quant_table(quality, base=_Q_CHR)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for p, (hi, vi) in zip(ycc, factors):
        cw, ch = -(-(w * hi) // hmax), -(-(h * vi) // vmax)
        # nearest-sample downsample onto the A.1.1 grid (handles
        # fractional hmax/hi); identity when hi == hmax
        ys = np.minimum((np.arange(ch) * vmax) // vi, h - 1)
        xs = np.minimum((np.arange(cw) * hmax) // hi, w - 1)
        p = p[ys][:, xs]
        PH, PW = mcuy * vi * 8, mcux * hi * 8
        planes.append(
            np.pad(p, ((0, PH - ch), (0, PW - cw)), mode="edge") - 128.0
        )
    qs = [q_lum.reshape(8, 8), q_chr.reshape(8, 8), q_chr.reshape(8, 8)]
    dcs = [(_DC_ENC, _AC_ENC), (_CHR_DC_ENC, _CHR_AC_ENC),
           (_CHR_DC_ENC, _CHR_AC_ENC)]
    writer = _BitWriter()
    prev = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(factors):
                de, ae = dcs[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        py = (my * vi + byi) * 8
                        px = (mx * hi + bxi) * 8
                        prev[ci] = _encode_block(
                            writer,
                            planes[ci][py : py + 8, px : px + 8],
                            qs[ci], de, ae, prev[ci],
                        )
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(int(x) for x in q_lum[_ZIGZAG]))
    out += _seg(0xFFDB, bytes([1]) + bytes(int(x) for x in q_chr[_ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (hi, vi), tq in zip((1, 2, 3), factors, (0, 1, 1)):
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xFFC0, sof)
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(
        0xFFC4, bytes([0x01]) + bytes(_DC_CHR_BITS) + bytes(_DC_CHR_VALS)
    )
    out += _seg(
        0xFFC4, bytes([0x11]) + bytes(_AC_CHR_BITS) + bytes(_AC_CHR_VALS)
    )
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# progressive encoder (T.81 Annex G) — exists primarily as the test vector
# generator for the progressive decoder: entropy coding is lossless, so a
# progressive encode at quality q MUST decode bit-identically to the
# baseline encode at the same q (pinned in tests/test_kernels.py).
# --------------------------------------------------------------------------


def _zz_blocks(plane: np.ndarray, q2d: np.ndarray) -> np.ndarray:
    """Centered float plane (8-multiple dims) -> (bh, bw, 64) quantized
    zigzag coefficient blocks. Per-block matmuls replicating
    _encode_block's float op order EXACTLY — a batched einsum contracts
    differently and flips the odd coefficient at a round-half boundary,
    breaking the bit-identical-to-baseline contract."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _D @ blk @ _D.T
            qc = np.round(coef / q2d).astype(np.int64)
            out[by, bx] = qc.flatten()[_ZIGZAG]
    return out


def _write_prog_dc_first(w, dcs, al, dc_enc=_DC_ENC):
    """DC first scan over raster-order DC values (one component): diffs
    of the point-transformed (arithmetic >> Al) values."""
    prev = 0
    for v in dcs:
        t = int(v) >> al
        diff = t - prev
        prev = t
        cat, low = _magnitude(diff)
        code, length = dc_enc[cat]
        w.write(code, length)
        if cat:
            w.write(low, cat)


def _write_prog_dc_refine(w, dcs, al):
    for v in dcs:
        w.write((int(v) >> al) & 1, 1)


def _flush_eobrun(w, eobrun, ebits, ac_enc):
    if eobrun:
        r_ = eobrun.bit_length() - 1
        code, length = ac_enc[r_ << 4]
        w.write(code, length)
        if r_:
            w.write(eobrun - (1 << r_), r_)
        for b in ebits:
            w.write(b, 1)
    return 0, []


def _write_prog_ac_first(w, blocks, ss, se, al, ac_enc=_AC_ENC):
    """AC first scan (Ah=0) with EOBRUN batching across blocks."""
    eobrun = 0
    for blk in blocks:
        vals = [
            (abs(int(v)) >> al) * (1 if v > 0 else -1)
            for v in blk[ss : se + 1]
        ]
        if not any(vals):
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun, _ = _flush_eobrun(w, eobrun, [], ac_enc)
            continue
        eobrun, _ = _flush_eobrun(w, eobrun, [], ac_enc)
        run = 0
        for v in vals:
            if v == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = ac_enc[0xF0]
                w.write(zc, zl)
                run -= 16
            cat, low = _magnitude(v)
            code, length = ac_enc[(run << 4) | cat]
            w.write(code, length)
            w.write(low, cat)
            run = 0
        if run:
            eobrun = 1  # trailing zeros: this block's EOB starts a run
    _flush_eobrun(w, eobrun, [], ac_enc)


def _write_prog_ac_refine(w, blocks, ss, se, al, ac_enc=_AC_ENC):
    """AC refinement scan (Ah=Al+1): newly-significant coefficients as
    (run, 1) codes; one correction bit appended for every already-nonzero
    coefficient passed over, in exactly the order the decoder consumes
    them (G.1.2.3 — bits follow the next emitted code, EOBRUN included)."""
    eobrun = 0
    ebits: list[int] = []
    for blk in blocks:
        q = []  # ('z',0) zero-history zero | ('b',bit) refine | ('n',sign)
        for k in range(ss, se + 1):
            v = int(blk[k])
            a = abs(v)
            if (a >> (al + 1)) != 0:
                q.append(("b", (a >> al) & 1))
            elif (a >> al) == 0:
                q.append(("z", 0))
            else:
                q.append(("n", 1 if v > 0 else 0))
        news = [j for j, (tag, _) in enumerate(q) if tag == "n"]
        if not news:
            eobrun += 1
            ebits.extend(b for tag, b in q if tag == "b")
            if eobrun == 0x7FFF:
                eobrun, ebits = _flush_eobrun(w, eobrun, ebits, ac_enc)
            continue
        eobrun, ebits = _flush_eobrun(w, eobrun, ebits, ac_enc)
        j0 = 0
        for jn in news:
            seg = q[j0:jn]
            zcount = sum(1 for tag, _ in seg if tag == "z")
            si = 0
            while zcount > 15:
                zc, zl = ac_enc[0xF0]
                w.write(zc, zl)
                consumed = 0
                while consumed < 16:
                    tag, b = seg[si]
                    si += 1
                    if tag == "z":
                        consumed += 1
                    else:
                        w.write(b, 1)
                zcount -= 16
            code, length = ac_enc[(zcount << 4) | 1]
            w.write(code, length)
            w.write(q[jn][1], 1)
            for tag, b in seg[si:]:
                if tag == "b":
                    w.write(b, 1)
            j0 = jn + 1
        tail = q[j0:]
        if tail:
            eobrun = 1
            ebits = [b for tag, b in tail if tag == "b"]
    _flush_eobrun(w, eobrun, ebits, ac_enc)


class _SymbolRecorder(dict):
    """Stands in for a huffman encode table during the counting pass:
    records every symbol the scan writer asks for."""

    def __init__(self):
        super().__init__()
        self.used: set[int] = set()

    def __getitem__(self, k):
        self.used.add(k)
        return (0, 1)


def _fixed_len_table(symbols) -> tuple[list[int], list[int]]:
    """Canonical huffman BITS/VALS giving every symbol the same length —
    always valid (the all-ones code stays unused), trivially decodable,
    and — unlike Annex K.4 — able to carry the EOBn symbols (r<<4, r>0)
    progressive AC scans need, which the standard baseline table lacks."""
    syms = sorted(symbols)
    n = max(1, len(syms))
    length = 1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    return bits, syms


def encode_jpeg_gray_progressive(
    band: np.ndarray, quality: int = 92, successive: bool = True
) -> bytes:
    """uint16 (h, w) band -> PROGRESSIVE grayscale JFIF (SOF2).

    Scan script: DC then two spectral AC bands (1-5, 6-63); with
    ``successive`` each scan first sends bits >> 1 (Al=1) and a second
    round of refinement scans sends the final bit — exercising every
    decoder path (DC/AC first + refine, EOBRUN, ZRL-in-refine). Same
    quantized coefficients as ``encode_jpeg_gray`` at the same quality,
    so the decode is bit-identical to the baseline round trip."""
    h, w = band.shape
    px = (band.astype(np.uint16) >> 8).astype(np.float64)
    qtbl = _quant_table(quality)
    q2d = qtbl.reshape(8, 8)
    H, W = (h + 7) & ~7, (w + 7) & ~7
    pad = np.pad(px, ((0, H - h), (0, W - w)), mode="edge") - 128.0
    zz = _zz_blocks(pad, q2d)
    flat = zz.reshape(-1, 64)  # raster block order (Ns=1 scan order)
    dcs = flat[:, 0]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(int(x) for x in qtbl[_ZIGZAG]))
    out += _seg(
        0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))

    def sos(ss, se, ah, al, tdta, writer_fn):
        wtr = _BitWriter()
        writer_fn(wtr)
        return (
            _seg(0xFFDA, bytes([1, 1, tdta, ss, se, (ah << 4) | al]))
            + wtr.flush()
        )

    def ac_scan(write_fn, ss, se, ah, al):
        """Counting pass -> per-scan fixed-length AC table (the EOBn
        symbols progressive scans emit don't exist in Annex K.4) -> DHT
        (class AC, id 1 — redefined before every scan, which also
        exercises the decoder's between-scan table updates) -> SOS."""
        rec = _SymbolRecorder()
        write_fn(_BitWriter(), rec)
        bits, vals = _fixed_len_table(rec.used)
        enc = _build_codes(bits, vals)
        seg = _seg(0xFFC4, bytes([0x11]) + bytes(bits) + bytes(vals))
        return seg + sos(ss, se, ah, al, 0x01,
                         lambda w_: write_fn(w_, enc))

    first_al = 1 if successive else 0
    out += sos(0, 0, 0, first_al, 0x00,
               lambda w_: _write_prog_dc_first(w_, dcs, first_al))
    for (ss, se) in ((1, 5), (6, 63)):
        out += ac_scan(
            lambda w_, enc, ss=ss, se=se: _write_prog_ac_first(
                w_, flat, ss, se, first_al, ac_enc=enc),
            ss, se, 0, first_al)
    if successive:
        out += sos(0, 0, 1, 0, 0x00,
                   lambda w_: _write_prog_dc_refine(w_, dcs, 0))
        for (ss, se) in ((1, 5), (6, 63)):
            out += ac_scan(
                lambda w_, enc, ss=ss, se=se: _write_prog_ac_refine(
                    w_, flat, ss, se, 0, ac_enc=enc),
                ss, se, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray_12bit(band: np.ndarray, quality: int = 92) -> bytes:
    """uint16 (h, w) band -> 12-bit-precision sequential grayscale JFIF.

    The engine's test-vector source for the 12-bit decode path: samples
    are the top 12 bits (v >> 4) — half the 8-bit path's quantization
    loss — with a Pq=1 (16-bit) DQT as 12-bit writers emit. The standard
    Annex K huffman tables only reach category 11, while 12-bit DC
    diffs/AC magnitudes reach 15/14, so per-file tables are built from a
    counting pass (same mechanism as the progressive encoder's per-scan
    tables)."""
    h, w = band.shape
    px = (band.astype(np.uint16) >> 4).astype(np.float64)
    # scale the 8-bit-range table up so quantization error stays
    # proportional to the 12-bit sample range
    qtbl = _quant_table(quality).astype(np.int32) * 16
    q2d = qtbl.reshape(8, 8).astype(np.float64)
    H, W = (h + 7) & ~7, (w + 7) & ~7
    pad = np.pad(px, ((0, H - h), (0, W - w)), mode="edge") - 2048.0
    # coefficients once; the counting and emit passes entropy-code the
    # same cached array (r6 review: the DCT is the dominant encode cost)
    flat = _zz_blocks(pad, q2d).reshape(-1, 64)

    def scan(dc_enc, ac_enc, wtr):
        prev = 0
        for blk in flat:
            prev = _entropy_block(wtr, blk, dc_enc, ac_enc, prev)

    dc_rec, ac_rec = _SymbolRecorder(), _SymbolRecorder()
    scan(dc_rec, ac_rec, _BitWriter())
    dc_bits, dc_vals = _fixed_len_table(dc_rec.used)
    ac_bits, ac_vals = _fixed_len_table(ac_rec.used)
    wtr = _BitWriter()
    scan(_build_codes(dc_bits, dc_vals), _build_codes(ac_bits, ac_vals), wtr)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(
        0xFFDB,
        bytes([0x10])  # Pq=1 (16-bit), table id 0
        + b"".join(
            struct.pack(">H", int(x)) for x in qtbl[_ZIGZAG]
        ),
    )
    out += _seg(
        0xFFC0, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0])
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color_12bit(
    rgb: np.ndarray, quality: int = 92, subsampling: str = "444"
) -> bytes:
    """uint16 (h, w, 3) RGB with 12-bit samples (0..4095) -> 12-bit
    sequential YCbCr interleaved JFIF (r7) — the test-vector source for
    the 12-bit COLOR decode path (medical/remote-sensing writers emit
    this profile). Same mechanics as the 8-bit color encoder with the
    12-bit adaptations of encode_jpeg_gray_12bit: Pq=1 16-bit DQTs
    scaled ×16, level shift 2048, and per-file Huffman tables from a
    counting pass (Annex-K tables stop at category 11; 12-bit DC/AC
    reach 15/14) — one DC/AC pair for luma (ids 0) and one shared by
    both chroma components (ids 1)."""
    h, w, nc = rgb.shape
    if nc != 3:
        raise ValueError("encode_jpeg_color_12bit expects (h, w, 3)")
    if int(rgb.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be <= 4095")
    planes, q_lum, q_chr_nat, (hY, vY), mcux, mcuy = _color_planes(
        rgb, quality, subsampling, center=2048.0
    )
    q_lum16 = q_lum.astype(np.int32) * 16
    q_chr16 = q_chr_nat.astype(np.int32) * 16
    samps = [(hY, vY), (1, 1), (1, 1)]
    qs = [
        q_lum16.reshape(8, 8).astype(np.float64),
        q_chr16.reshape(8, 8).astype(np.float64),
        q_chr16.reshape(8, 8).astype(np.float64),
    ]

    def scan(tbls, wtr):
        prev = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hi, vi) in enumerate(samps):
                    de, ae = tbls[ci]
                    for byi in range(vi):
                        for bxi in range(hi):
                            py = (my * vi + byi) * 8
                            px = (mx * hi + bxi) * 8
                            prev[ci] = _encode_block(
                                wtr,
                                planes[ci][py : py + 8, px : px + 8],
                                qs[ci], de, ae, prev[ci],
                            )

    lum_dc, lum_ac = _SymbolRecorder(), _SymbolRecorder()
    chr_dc, chr_ac = _SymbolRecorder(), _SymbolRecorder()
    scan([(lum_dc, lum_ac), (chr_dc, chr_ac), (chr_dc, chr_ac)],
         _BitWriter())
    ldc_b, ldc_v = _fixed_len_table(lum_dc.used)
    lac_b, lac_v = _fixed_len_table(lum_ac.used)
    cdc_b, cdc_v = _fixed_len_table(chr_dc.used)
    cac_b, cac_v = _fixed_len_table(chr_ac.used)
    wtr = _BitWriter()
    scan(
        [
            (_build_codes(ldc_b, ldc_v), _build_codes(lac_b, lac_v)),
            (_build_codes(cdc_b, cdc_v), _build_codes(cac_b, cac_v)),
            (_build_codes(cdc_b, cdc_v), _build_codes(cac_b, cac_v)),
        ],
        wtr,
    )

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q16 in ((0, q_lum16), (1, q_chr16)):
        out += _seg(
            0xFFDB,
            bytes([0x10 | tid])
            + b"".join(struct.pack(">H", int(x)) for x in q16[_ZIGZAG]),
        )
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 12, h, w, 3)
        + bytes([1, (hY << 4) | vY, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(ldc_b) + bytes(ldc_v))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(lac_b) + bytes(lac_v))
    out += _seg(0xFFC4, bytes([0x01]) + bytes(cdc_b) + bytes(cdc_v))
    out += _seg(0xFFC4, bytes([0x11]) + bytes(cac_b) + bytes(cac_v))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color_progressive(
    rgb: np.ndarray,
    quality: int = 92,
    subsampling: str = "444",
    successive: bool = True,
) -> bytes:
    """uint8 (h, w, 3) RGB -> PROGRESSIVE YCbCr JFIF (SOF2).

    Scan script: interleaved DC scan over all three components (the MCU
    geometry the decoder must honor), then per-component spectral AC
    scans (Y split 1-5/6-63, chroma 1-63) — with ``successive`` all at
    Al=1 followed by a full refinement round. Same quantized
    coefficients as ``encode_jpeg_color`` at the same quality and
    subsampling, so the decode is bit-identical to the baseline round
    trip (AC scans cover the REAL per-component block grid; the
    MCU-padding blocks beyond it carry DC only, and are cropped away
    exactly as in the baseline)."""
    h, w, nc = rgb.shape
    if nc != 3:
        raise ValueError("encode_jpeg_color_progressive expects (h, w, 3)")
    planes, q_lum, q_chr_nat, (hY, vY), mcux, mcuy = _color_planes(
        rgb, quality, subsampling
    )
    samps = [(hY, vY), (1, 1), (1, 1)]
    qs = [q_lum.reshape(8, 8), q_chr_nat.reshape(8, 8),
          q_chr_nat.reshape(8, 8)]
    zzs = [_zz_blocks(planes[ci], qs[ci]) for ci in range(3)]
    comps = [(1, hY, vY, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    geo, _, _ = _comp_geometry(h, w, comps)

    def dc_interleaved(w_, ah, al):
        preds = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hi, vi) in enumerate(samps):
                    enc = _DC_ENC if ci == 0 else _CHR_DC_ENC
                    for byi in range(vi):
                        for bxi in range(hi):
                            v = int(zzs[ci][my * vi + byi, mx * hi + bxi, 0])
                            if ah:
                                w_.write((v >> al) & 1, 1)
                                continue
                            t = v >> al
                            diff = t - preds[ci]
                            preds[ci] = t
                            cat, low = _magnitude(diff)
                            code, length = enc[cat]
                            w_.write(code, length)
                            if cat:
                                w_.write(low, cat)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(int(x) for x in q_lum[_ZIGZAG]))
    out += _seg(
        0xFFDB, bytes([1]) + bytes(int(x) for x in q_chr_nat[_ZIGZAG])
    )
    out += _seg(
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hY << 4) | vY, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(
        0xFFC4, bytes([0x01]) + bytes(_DC_CHR_BITS) + bytes(_DC_CHR_VALS)
    )

    def dc_sos(ah, al):
        wtr = _BitWriter()
        dc_interleaved(wtr, ah, al)
        return (
            _seg(
                0xFFDA,
                bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, (ah << 4) | al]),
            )
            + wtr.flush()
        )

    def ac_sos(ci, ss, se, ah, al):
        bh, bw = geo[ci][1]
        flat = zzs[ci][:bh, :bw].reshape(-1, 64)
        write_fn = _write_prog_ac_refine if ah else _write_prog_ac_first
        rec = _SymbolRecorder()
        write_fn(_BitWriter(), flat, ss, se, al, ac_enc=rec)
        bits, vals = _fixed_len_table(rec.used)
        enc = _build_codes(bits, vals)
        wtr = _BitWriter()
        write_fn(wtr, flat, ss, se, al, ac_enc=enc)
        return (
            _seg(0xFFC4, bytes([0x11]) + bytes(bits) + bytes(vals))
            + _seg(
                0xFFDA,
                bytes([1, ci + 1, 0x01, ss, se, (ah << 4) | al]),
            )
            + wtr.flush()
        )

    first_al = 1 if successive else 0
    ac_bands = [(0, 1, 5), (0, 6, 63), (1, 1, 63), (2, 1, 63)]
    out += dc_sos(0, first_al)
    for ci, ss, se in ac_bands:
        out += ac_sos(ci, ss, se, 0, first_al)
    if successive:
        out += dc_sos(1, 0)
        for ci, ss, se in ac_bands:
            out += ac_sos(ci, ss, se, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def _read_code(r: _BitReader, tbl: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        v = tbl.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid huffman code in jpeg scan")


def _decode_block(
    r: _BitReader,
    dc_tbl: dict[tuple[int, int], int],
    ac_tbl: dict[tuple[int, int], int],
    q2d: np.ndarray,
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    """Entropy-decode + dequantize + inverse-DCT ONE 8×8 block; returns
    (centered block, new DC predictor)."""
    zz = np.zeros(64, dtype=np.float64)
    cat = _read_code(r, dc_tbl)
    diff = _extend(r.bits(cat), cat) if cat else 0
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _read_code(r, ac_tbl)
        run, cat = rs >> 4, rs & 0xF
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += run
        if k > 63:
            raise ValueError("jpeg AC index overflow")
        zz[k] = _extend(r.bits(cat), cat)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[_ZIGZAG] = zz
    coef = block.reshape(8, 8) * q2d
    return _D.T @ coef @ _D, dc


# --------------------------------------------------------------------------
# progressive (SOF2) — T.81 Annex G: spectral selection + successive
# approximation. Scans accumulate quantized coefficients (zigzag order)
# per component; dequant + IDCT happen once after the last scan.
# --------------------------------------------------------------------------


def _entropy_end(payload: bytes, pos: int) -> int:
    """Index of the first real marker after ``pos`` (skips stuffed FF00
    and RSTn, which belong to the entropy stream)."""
    i = pos
    n = len(payload)
    while True:
        j = payload.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            return n
        nxt = payload[j + 1]
        if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
            return j
        i = j + 2


def _comp_geometry(h: int, w: int, comps):
    """Per-component ((padded_bh, padded_bw), (real_bh, real_bw)) block
    dims + (mcux, mcuy). Padded dims shape the coefficient storage (and
    interleaved scans); REAL dims bound non-interleaved scans — for a
    subsampled frame they can be smaller than the padded grid (A.2.2)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geo = []
    for (_, hi, vi, _) in comps:
        comp_w = -(-(w * hi) // hmax)
        comp_h = -(-(h * vi) // vmax)
        geo.append(
            ((mcuy * vi, mcux * hi), (-(-comp_h // 8), -(-comp_w // 8)))
        )
    return geo, mcux, mcuy


def _prog_dc_scan(r, coefs, comps, scan_comps, dc_tbls, preds, ah, al,
                  mcux, mcuy, geo, dri):
    """One DC scan (Ss=0): interleaved (Ns=Nf) or single-component."""
    mcu_i = 0

    def _restart():
        nonlocal mcu_i
        if dri and mcu_i and mcu_i % dri == 0:
            r.consume_restart(mcu_i // dri - 1)
            for ci in scan_comps:
                preds[ci] = 0

    def _one(ci, by, bx):
        c = coefs[ci]
        if ah == 0:
            cat = _read_code(r, dc_tbls[ci])
            diff = _extend(r.bits(cat), cat) if cat else 0
            preds[ci] += diff
            c[by, bx, 0] = preds[ci] << al
        elif r.bit():
            c[by, bx, 0] |= 1 << al

    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                _restart()
                mcu_i += 1
                for ci in scan_comps:
                    _, hi, vi, _ = comps[ci]
                    for byi in range(vi):
                        for bxi in range(hi):
                            _one(ci, my * vi + byi, mx * hi + bxi)
    else:
        ci = scan_comps[0]
        bh, bw = geo[ci][1]
        for by in range(bh):
            for bx in range(bw):
                _restart()
                mcu_i += 1
                _one(ci, by, bx)


def _prog_ac_scan(r, coefs, ci, ac_tbl, ss, se, ah, al, geo, dri):
    """One AC scan (Ss>=1, always non-interleaved, B.2.3): first pass
    (Ah=0) with EOBRUN batching, or refinement (Ah=Al+1) appending one
    correction bit per already-nonzero coefficient (G.1.2.3)."""
    c = coefs[ci]
    bh, bw = geo[ci][1]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    mcu_i = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and mcu_i and mcu_i % dri == 0:
                r.consume_restart(mcu_i // dri - 1)
                eobrun = 0
            mcu_i += 1
            blk = c[by, bx]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_code(r, ac_tbl)
                    run, cat = rs >> 4, rs & 0xF
                    if cat == 0:
                        if run < 15:
                            eobrun = (1 << run) - 1
                            if run:
                                eobrun += r.bits(run)
                            break
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > se:
                        raise ValueError("jpeg progressive AC overflow")
                    blk[k] = _extend(r.bits(cat), cat) << al
                    k += 1
                continue
            # refinement scan
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _read_code(r, ac_tbl)
                    run, cat = rs >> 4, rs & 0xF
                    if cat == 0:
                        if run < 15:
                            eobrun = (1 << run)
                            if run:
                                eobrun += r.bits(run)
                            break
                        val = 0
                    else:
                        if cat != 1:
                            raise ValueError(
                                "jpeg progressive AC refine cat != 1"
                            )
                        val = p1 if r.bit() else m1
                    while k <= se:
                        if blk[k] != 0:
                            if r.bit() and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        else:
                            if run == 0:
                                if val:
                                    blk[k] = val
                                k += 1
                                break
                            run -= 1
                        k += 1
            if eobrun:
                while k <= se:
                    if blk[k] != 0:
                        if r.bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    k += 1
                eobrun -= 1


def _planes_from_coefs(coefs, comps, qtables):
    """Zigzag coefficient blocks -> padded spatial planes. The per-block
    dequant + IDCT replicates _decode_block's float op order EXACTLY
    (same left-associated matmuls) so a progressive encode of the same
    quantized coefficients decodes bit-identically to the baseline path
    — a batched einsum contracts in a different order and flips ±1 DNs
    at round-half boundaries (observed 22/4096 pixels)."""
    planes = []
    for ci, (_, hi, vi, tq) in enumerate(comps):
        q2d = qtables[tq].astype(np.float64)[_UNZIGZAG].reshape(8, 8)
        zz = coefs[ci]
        bh, bw = zz.shape[0], zz.shape[1]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        block = np.zeros(64, dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                block[_ZIGZAG] = zz[by, bx]
                coef = block.reshape(8, 8) * q2d
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _D.T @ coef @ _D
                )
        planes.append(plane)
    return planes


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Baseline JFIF -> uint16 (h, w) luma (8-bit value × 257).

    Handles single-component grayscale (non-interleaved Ns=1 scan —
    sampling factors are ignored per T.81 A.2) and 3-component
    interleaved YCbCr with per-axis sampling factors 1-4 (4:4:4, 4:2:2,
    4:2:0, 4:4:0), plus restart intervals (DRI/RSTn); color output is
    converted to ITU-R 601 luma because the engine's band contract is
    grayscale u16. Baseline (SOF0) and progressive (SOF2) frames both
    decode, at 8-bit or 12-bit precision (gray + YCbCr); raises
    NotImplementedError for the remaining profiles (arithmetic coding,
    streams whose
    APP14 declares transform 0) — the ``codec.decode`` dispatch routes
    those to the optional Pillow path.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    scan_data = None
    scan_tabs: list[tuple[int, int]] = []
    restart_interval = 0
    progressive = False
    coefs = None  # per-comp (padded_bh, padded_bw, 64) zigzag int32
    prog_geo = None
    sample_prec = 8
    rgb_direct = False
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq == 0:
                    qtables[tq] = np.frombuffer(
                        body[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.int32)
                    i += 65
                elif pq == 1:
                    # 16-bit table (B.2.4.1 Pq=1 — the 12-bit-sample case)
                    qtables[tq] = np.frombuffer(
                        body[i + 1 : i + 129], dtype=">u2"
                    ).astype(np.int32)
                    i += 129
                else:
                    raise ValueError(f"jpeg bad DQT precision {pq}")
        elif marker in (0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                f"jpeg SOF marker 0x{marker:04X}: only baseline sequential "
                "(SOF0) and progressive (SOF2) supported by the stdlib path"
            )
        elif marker in (0xFFC0, 0xFFC2):
            progressive = marker == 0xFFC2
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec not in (8, 12):
                raise NotImplementedError(f"jpeg precision {prec}")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"jpeg with {ncomp} components: only grayscale and "
                    "YCbCr supported by the stdlib path"
                )
            # r7: 12-bit decodes for BOTH grayscale and YCbCr — the
            # entropy/DCT path is precision-agnostic; only the level
            # shift and output scaling differ (_finish_jpeg_planes)
            sample_prec = prec
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0xF
                if ncomp == 1:
                    # an Ns=1 scan is NON-interleaved (T.81 A.2): the MCU
                    # is one block and sampling factors do not shape the
                    # scan, so normalize them — real encoders do emit
                    # e.g. 2x2 on single-component files
                    hi = vi = 1
                if not (1 <= hi <= 4) or not (1 <= vi <= 4):
                    raise NotImplementedError(
                        f"jpeg sampling factor {hi}x{vi}: T.81 allows "
                        "1-4 per axis"
                    )
                comps.append((cid, hi, vi, tq))
            # r7: non-integer sampling ratios (e.g. Y 3x1 with Cb 2x1,
            # legal per T.81 A.1.1) decode via the index-map upsampler
            # in _finish_jpeg_planes — no gate needed; block geometry
            # (_comp_geometry) was already general ceil arithmetic
            # component ids 'R','G','B' (or APP14 transform=0): a
            # direct-RGB stream with NO color transform — late r7,
            # handled in _finish_jpeg_planes (each plane is a centered
            # color channel; luma is computed straight from them)
            sof = (h, w, comps)
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nval = sum(bits)
                vals = list(body[i + 17 : i + 17 + nval])
                htables[(tc, th)] = _build_decoder(bits, vals)
                i += 17 + nval
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFEE and body[:5] == b"Adobe":
            # APP14 transform flag: 0 = components are straight RGB (no
            # color transform — late r7: decoded via the direct-RGB tail
            # in _finish_jpeg_planes); 1 = YCbCr; 2 = YCCK (4-comp,
            # gated at SOF)
            if len(body) >= 12 and body[11] == 0:
                rgb_direct = True
        elif marker == 0xFFDA and progressive:
            if sof is None:
                raise ValueError("jpeg SOS before SOF")
            hh, ww, pcomps = sof
            if coefs is None:
                prog_geo, p_mcux, p_mcuy = _comp_geometry(hh, ww, pcomps)
                coefs = [
                    np.zeros((pb[0], pb[1], 64), np.int32)
                    for pb, _ in prog_geo
                ]
            ns = body[0]
            sels = []
            cid_to_ci = {c[0]: i for i, c in enumerate(pcomps)}
            for i in range(ns):
                cs = body[1 + 2 * i]
                if cs not in cid_to_ci:
                    raise ValueError(
                        f"jpeg progressive SOS selector {cs} not in SOF"
                    )
                tdta = body[2 + 2 * i]
                sels.append((cid_to_ci[cs], tdta >> 4, tdta & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            end = _entropy_end(payload, pos)
            r = _BitReader(payload[pos:end])
            if ss == 0:
                if se != 0:
                    raise ValueError("jpeg progressive DC scan with Se>0")
                if ns not in (1, len(pcomps)):
                    raise NotImplementedError(
                        "jpeg progressive DC scan over a strict "
                        "multi-component subset"
                    )
                if ns > 1 and [s[0] for s in sels] != list(range(ns)):
                    raise ValueError(
                        "jpeg progressive interleaved DC scan out of "
                        "SOF order"
                    )
                dc_map = {}
                for ci, td, _ in sels:
                    if ah == 0:
                        t = htables.get((0, td))
                        if t is None:
                            raise ValueError(
                                "jpeg scan references missing huffman table"
                            )
                        dc_map[ci] = t
                _prog_dc_scan(
                    r, coefs, pcomps, [s[0] for s in sels], dc_map,
                    [0] * len(pcomps), ah, al, p_mcux, p_mcuy, prog_geo,
                    restart_interval,
                )
            else:
                if ns != 1:
                    raise ValueError(
                        "jpeg progressive AC scan must be non-interleaved"
                    )
                ci, _, ta = sels[0]
                act = htables.get((1, ta))
                if act is None:
                    raise ValueError(
                        "jpeg scan references missing huffman table"
                    )
                _prog_ac_scan(
                    r, coefs, ci, act, ss, se, ah, al, prog_geo,
                    restart_interval,
                )
            pos = end
        elif marker == 0xFFDA:
            ns = body[0]
            if sof is None or ns != len(sof[2]):
                raise NotImplementedError(
                    "jpeg non-interleaved multi-scan (Ns != Nf)"
                )
            # component order in the scan header, each with (dc, ac) ids.
            # T.81 B.2.3 mandates frame (SOF) order for interleaved scans;
            # the tables below are zipped positionally with the SOF
            # component list, so a reordered or unknown Cs id would
            # silently decode with the wrong quant/huffman tables —
            # validate each selector against the SOF id at that position
            # and error instead (ADVICE r5)
            for i in range(ns):
                cs = body[1 + 2 * i]
                if cs != sof[2][i][0]:
                    raise ValueError(
                        f"jpeg SOS component selector {cs} at scan "
                        f"position {i} does not match SOF component id "
                        f"{sof[2][i][0]} (T.81 B.2.3 frame order)"
                    )
            scan_tabs = [
                (body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            scan_data = payload[pos:]
            break
    if sof is None or (scan_data is None and coefs is None):
        raise ValueError("jpeg missing SOF/SOS")
    h, w, comps = sof
    ncomp = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if progressive:
        for (_, _, _, tq) in comps:
            if tq not in qtables:
                raise ValueError("jpeg scan references missing quant table")
        planes = _planes_from_coefs(coefs, comps, qtables)
        return _finish_jpeg_planes(
            planes, comps, hmax, vmax, h, w, sample_prec,
            rgb_direct=rgb_direct,
        )
    q2ds, dc_tbls, ac_tbls = [], [], []
    for (cid, hi, vi, tq), (dci, aci) in zip(comps, scan_tabs):
        if tq not in qtables:
            raise ValueError("jpeg scan references missing quant table")
        # DQT payload is zigzag-ordered (B.2.4.1) — map back to natural
        q2ds.append(qtables[tq].astype(np.float64)[_UNZIGZAG].reshape(8, 8))
        dc_t, ac_t = htables.get((0, dci)), htables.get((1, aci))
        if dc_t is None or ac_t is None:
            raise ValueError("jpeg scan references missing huffman table")
        dc_tbls.append(dc_t)
        ac_tbls.append(ac_t)

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for (_, hi, vi, _) in comps
    ]
    r = _BitReader(scan_data)
    prev = [0] * ncomp
    mcu_i = 0
    # interleaved scan (A.2.3): each MCU carries h_i×v_i blocks per
    # component in raster order within the MCU
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # byte-align, consume RSTn, reset every DC predictor (E.2.4)
                r.consume_restart(mcu_i // restart_interval - 1)
                prev = [0] * ncomp
            mcu_i += 1
            for ci, (_, hi, vi, _) in enumerate(comps):
                for byi in range(vi):
                    for bxi in range(hi):
                        blk, prev[ci] = _decode_block(
                            r, dc_tbls[ci], ac_tbls[ci], q2ds[ci], prev[ci]
                        )
                        py = (my * vi + byi) * 8
                        px = (mx * hi + bxi) * 8
                        planes[ci][py : py + 8, px : px + 8] = blk
    return _finish_jpeg_planes(
        planes, comps, hmax, vmax, h, w, sample_prec, rgb_direct=rgb_direct
    )


def _finish_jpeg_planes(
    planes, comps, hmax, vmax, h, w, prec=8, rgb_direct=False
) -> np.ndarray:
    """Shared decode tail (baseline + progressive): replication-upsample
    subsampled planes, crop to (h, w), and convert to u16 luma.
    ``prec``: sample precision — 8-bit expands ×257, 12-bit by the
    standard 12→16 bit replication (v<<4 | v>>8)."""
    ncomp = len(comps)
    full = []
    for ci, (_, hi, vi, _) in enumerate(comps):
        p = planes[ci]
        if hi < hmax:
            # index-map upsample: for integer ratios this reproduces
            # np.repeat bit-for-bit ((j*hi)//hmax == j//(hmax//hi));
            # for NON-integer ratios (r7 — e.g. Y 3x1 with Cb 2x1,
            # legal per T.81 A.1.1) it is the nearest-sample mapping
            p = p[:, (np.arange(p.shape[1] * hmax // hi) * hi) // hmax]
        if vi < vmax:
            p = p[(np.arange(p.shape[0] * vmax // vi) * vi) // vmax, :]
        full.append(p[:h, :w])
    if ncomp == 1:
        center, maxv = 1 << (prec - 1), (1 << prec) - 1
        px = np.clip(np.round(full[0] + center), 0, maxv).astype(np.uint16)
        if prec == 12:
            return (px << 4) | (px >> 8)
        return px * 257
    # YCbCr -> RGB (JFIF full-range 601) -> ITU-R 601 luma, APPROXIMATING
    # the Pillow fallback's convert('L'): chroma upsampling above is
    # nearest-neighbor replication while libjpeg uses fancy (interpolated)
    # upsampling, so subsampled payloads agree only to ~PSNR>=40dB (the
    # test gate), NOT bit-exactly; 4:4:4 and grayscale are exact.
    # r7: range-generalized — the 601 matrix is precision-agnostic, only
    # the midpoint/clip bound and output scaling depend on prec (8-bit
    # full range 255, 12-bit 4095).
    center, maxv = float(1 << (prec - 1)), (1 << prec) - 1
    ids = {c[0] for c in comps}
    if ids == {82, 71, 66} or rgb_direct:
        # direct-RGB stream (component ids 'R','G','B', or ANY ids under
        # APP14 transform=0 — late r7): planes ARE the centered color
        # channels — no YCbCr inverse, straight to the 601 luma. Map
        # planes BY COMPONENT ID when ids are R/G/B (SOF order is
        # writer-defined); otherwise SOF order is the channel order.
        if ids == {82, 71, 66}:
            by_id = {c[0]: full[i] for i, c in enumerate(comps)}
            pr, pg, pb = by_id[82], by_id[71], by_id[66]
        else:
            pr, pg, pb = full[0], full[1], full[2]
        rr = np.clip(np.round(pr + center), 0, maxv)
        gg = np.clip(np.round(pg + center), 0, maxv)
        bb = np.clip(np.round(pb + center), 0, maxv)
        luma = np.clip(
            np.round(0.299 * rr + 0.587 * gg + 0.114 * bb), 0, maxv
        ).astype(np.uint16)
        if prec == 12:
            return (luma << 4) | (luma >> 8)
        return luma * 257
    y = full[0] + center
    cb = full[1]
    cr = full[2]
    rr = np.clip(np.round(y + 1.402 * cr), 0, maxv)
    gg = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, maxv)
    bb = np.clip(np.round(y + 1.772 * cb), 0, maxv)
    luma = np.clip(
        np.round(0.299 * rr + 0.587 * gg + 0.114 * bb), 0, maxv
    ).astype(np.uint16)
    if prec == 12:
        return (luma << 4) | (luma >> 8)
    return luma * 257


def split_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Full interchange JPEG → (tables-only stream, abbreviated image
    stream) per TIFF TechNote 2 (Compression 7): the tables stream is
    ``SOI · DQT/DHT/DRI · EOI`` (goes into the JPEGTables tag 347), the
    abbreviated stream is ``SOI · everything else`` (one per strip/tile).
    A conformant reader rebuilds the interchange stream by splicing the
    tables segments ahead of the per-chunk stream."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    tables = bytearray(b"\xff\xd8")
    image = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("JPEG segment desync while splitting tables")
        marker = stream[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        seg = stream[pos : pos + 2 + ln]
        pos += 2 + ln
        if marker in (0xDB, 0xC4, 0xDD):  # DQT / DHT / DRI
            tables += seg
        else:
            image += seg
        if marker == 0xDA:  # SOS: entropy data + EOI follow verbatim
            image += stream[pos:]
            tables += b"\xff\xd9"
            return bytes(tables), bytes(image)
    raise ValueError("JPEG stream ended before SOS")


def merge_tables(tables: bytes, chunk: bytes) -> bytes:
    """Inverse of split_tables: tables stream (347) + abbreviated chunk →
    interchange stream the decoder accepts. Chunks that already carry
    their own tables (writers MAY mix) pass through unchanged when no
    tables stream exists."""
    if not tables:
        return chunk
    if tables[:2] != b"\xff\xd8" or chunk[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG-in-TIFF streams (missing SOI)")
    body = tables[2:]
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]
    return b"\xff\xd8" + body + chunk[2:]
