"""Band-payload codecs + PSNR invariant.

The input table (BASELINE.json input_hint) carries pixels as an opaque
``bytes:binary`` column with ``fmt:string``. Formats:

- ``raw-u16``   : little-endian uint16, row-major h×w. Lossless; the
  engine-native format (the reference's valid dtypes are uint16/uint8,
  src/pipeline/main.py:167-169).
- ``lossy-q12`` : deterministic fake-lossy stub — uint16 quantized to 12
  bits (values 0..65520, multiples of 16) stored like raw-u16. Real image
  codecs (PNG/JPEG/TIFF libs) are not in this container, so per the build
  brief the decode of true compressed formats is STUBBED; this format
  exists to exercise the PSNR≥40 dB lossy invariant end-to-end with real
  Spark plumbing. PSNR of q12 vs original ≈ 48 dB > 40 dB.
- ``png``/``tiff``/… : gated behind optional imports; raise
  NotImplementedError when the codec library is absent.

PSNR (peak 65535) is the per-row invariant from BASELINE.json input_hint:
decoded-pixel allclose for lossless, PSNR ≥ 40 dB for lossy.
"""

from __future__ import annotations

import numpy as np

PEAK_U16 = 65535.0


def encode_raw_u16(band: np.ndarray) -> bytes:
    a = np.ascontiguousarray(band.astype("<u2"))
    return a.tobytes()


def decode_raw_u16(payload: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(payload, dtype="<u2").reshape(h, w)


def encode_lossy_q12(band: np.ndarray) -> bytes:
    q = (band.astype(np.uint16) >> 4) << 4
    return encode_raw_u16(q)


def decode(payload: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode one band payload → uint16 (h, w). Vector-friendly: call per
    row *inside* an Arrow batch, never as a row-at-a-time Python UDF."""
    if fmt in ("raw-u16", "lossy-q12"):
        return decode_raw_u16(payload, w, h)
    if fmt == "png":
        try:
            import io

            from PIL import Image  # noqa: PLC0415
        except ImportError as e:  # codec libs absent in this container
            raise NotImplementedError(
                "png decode requires Pillow (not installed); "
                "use raw-u16/lossy-q12 or ship Pillow via --py-files env"
            ) from e
        return np.asarray(Image.open(io.BytesIO(payload)), dtype=np.uint16)
    raise ValueError(f"unknown fmt {fmt!r}")


def is_lossless(fmt: str) -> bool:
    return fmt == "raw-u16"


def psnr_db(a: np.ndarray, b: np.ndarray, peak: float = PEAK_U16) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical arrays)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
