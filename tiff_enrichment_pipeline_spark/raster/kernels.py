"""Vegetation-index + calibration numpy kernels (canonical semantics).

Pure float32 element-wise math with guarded division, matching the
reference's processor.py variants exactly — the canonical semantics per
SURVEY.md §2.5 (processor.py is what process_single_set calls,
src/pipeline/micasense/core/processor.py:401-477; the indices.py epsilon
variant is deliberately NOT replicated):

- ndvi   (nir-red)/(nir+red), 0 where denom==0   processor.py:479-486
- ndre   (nir-re)/(nir+re)                        processor.py:488-495
- gndvi  (nir-green)/(nir+green)                  processor.py:497-504
- savi   (nir-red)(1+L)/(nir+red+L), L=0.5        processor.py:506-514
- msavi  0.5(2nir+1-sqrt((2nir+1)^2-8(nir-red)))  processor.py:516-518
- evi    G(nir-red)/(nir+C1 red-C2 blue+L)        processor.py:520-531
- osavi  SAVI with L=0.16                         processor.py:533-541
- ndwi   (green-nir)/(green+nir)                  processor.py:543-550

Plus:
- calibrate: reflectance = dn*10000 clip [0,65535] uint16
  (processor.py:361-399, factor at :381; config calibration_factor 0.0001,
  tests/test_config.json:32)
- pack_index_u16: (idx+1)*32767.5 clip → uint16 (processor.py:419 et seq.)
- veg_coverage: % pixels in (0.2,1.0] and (0.5,1.0]
  (processing/indices.py:106-117)
- align_band: bilinear affine resample of a band onto a reference grid
  (processor.py:300-359 — rasterio.reproject, bilinear, same-CRS case)

These run ONLY inside Arrow-batched pandas UDFs (raster/udfs.py); the numpy
layer is kept UDF-free so unit tests hit it directly with golden values.
"""

from __future__ import annotations

import numpy as np

BAND_NAMES = {1: "blue", 2: "green", 3: "red", 4: "nir", 5: "red_edge"}
# MicaSense RedEdge wavelengths nm (reference: src/pipeline/main.py:184-215)
BAND_WAVELENGTH_NM = {1: 475, 2: 560, 3: 668, 4: 840, 5: 717}

CALIBRATION_SCALE = 10000.0  # 1/calibration_factor, processor.py:381


def _f32(a: np.ndarray) -> np.ndarray:
    return a.astype(np.float32)


def _guarded_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    out = np.zeros_like(num, dtype=np.float32)
    np.divide(num, den, out=out, where=den != 0)
    return out


def ndvi(nir: np.ndarray, red: np.ndarray) -> np.ndarray:
    nir, red = _f32(nir), _f32(red)
    return _guarded_div(nir - red, nir + red)


def ndre(nir: np.ndarray, red_edge: np.ndarray) -> np.ndarray:
    nir, re = _f32(nir), _f32(red_edge)
    return _guarded_div(nir - re, nir + re)


def gndvi(nir: np.ndarray, green: np.ndarray) -> np.ndarray:
    nir, green = _f32(nir), _f32(green)
    return _guarded_div(nir - green, nir + green)


def savi(nir: np.ndarray, red: np.ndarray, soil_factor: float = 0.5) -> np.ndarray:
    nir, red = _f32(nir), _f32(red)
    return _guarded_div(
        (nir - red) * np.float32(1.0 + soil_factor),
        nir + red + np.float32(soil_factor),
    )


def msavi(nir: np.ndarray, red: np.ndarray) -> np.ndarray:
    nir, red = _f32(nir), _f32(red)
    t = 2.0 * nir + 1.0
    return (0.5 * (t - np.sqrt(np.maximum(t * t - 8.0 * (nir - red), 0.0)))).astype(
        np.float32
    )


def evi(nir: np.ndarray, red: np.ndarray, blue: np.ndarray) -> np.ndarray:
    nir, red, blue = _f32(nir), _f32(red), _f32(blue)
    return _guarded_div(
        np.float32(2.5) * (nir - red),
        nir + np.float32(6.0) * red - np.float32(7.5) * blue + np.float32(1.0),
    )


def osavi(nir: np.ndarray, red: np.ndarray) -> np.ndarray:
    return savi(nir, red, soil_factor=0.16)


def ndwi(green: np.ndarray, nir: np.ndarray) -> np.ndarray:
    green, nir = _f32(green), _f32(nir)
    return _guarded_div(green - nir, green + nir)


ALL_INDICES = {
    "ndvi": lambda b: ndvi(b["nir"], b["red"]),
    "ndre": lambda b: ndre(b["nir"], b["red_edge"]),
    "gndvi": lambda b: gndvi(b["nir"], b["green"]),
    "savi": lambda b: savi(b["nir"], b["red"]),
    "msavi": lambda b: msavi(b["nir"], b["red"]),
    "evi": lambda b: evi(b["nir"], b["red"], b["blue"]),
    "osavi": lambda b: osavi(b["nir"], b["red"]),
    "ndwi": lambda b: ndwi(b["green"], b["nir"]),
}


def calibrate(dn: np.ndarray, scale: float = CALIBRATION_SCALE) -> np.ndarray:
    """Radiometric calibration: dn*scale clip [0,65535] → uint16
    (processor.py:361-399)."""
    return np.clip(dn.astype(np.float32) * np.float32(scale), 0, 65535).astype(
        np.uint16
    )


def pack_index_u16(idx: np.ndarray) -> np.ndarray:
    """Index in [-1,1] → uint16 via (idx+1)*32767.5 clip (processor.py:419)."""
    return np.clip((idx.astype(np.float32) + 1.0) * 32767.5, 0, 65535).astype(
        np.uint16
    )


def unpack_index_u16(packed: np.ndarray) -> np.ndarray:
    return packed.astype(np.float32) / np.float32(32767.5) - np.float32(1.0)


def veg_coverage(ndvi_arr: np.ndarray) -> tuple[float, float]:
    """(% pixels in (0.2,1.0], % in (0.5,1.0]) — processing/indices.py:106-117."""
    n = ndvi_arr.size
    if n == 0:
        return 0.0, 0.0
    veg = float(np.mean((ndvi_arr > 0.2) & (ndvi_arr <= 1.0))) * 100.0
    dense = float(np.mean((ndvi_arr > 0.5) & (ndvi_arr <= 1.0))) * 100.0
    return veg, dense


def band_stats(a: np.ndarray, nodata: int = 0) -> dict[str, float]:
    """Per-band pixel stats (reference: output/metadata.py:79-106)."""
    f = a.astype(np.float64)
    return {
        "px_min": float(f.min()),
        "px_max": float(f.max()),
        "px_mean": float(f.mean()),
        "px_std": float(f.std()),
        "nodata_count": float(np.sum(a == nodata)),
        "zero_ratio": float(np.mean(a == 0)),
        "p25": float(np.percentile(f, 25)),
        "p50": float(np.percentile(f, 50)),
        "p75": float(np.percentile(f, 75)),
    }


def align_band(
    band: np.ndarray,
    src_transform: tuple[float, float, float, float, float, float],
    dst_transform: tuple[float, float, float, float, float, float],
    dst_shape: tuple[int, int],
) -> np.ndarray:
    """Bilinear affine resample of ``band`` onto the destination grid.

    Same-CRS reprojection (the reference always works in EPSG:4326,
    processor.py:300-359): for each destination pixel center, invert the
    source affine to fractional source coords, sample bilinearly, clamp
    edges, zero-fill outside. Pure vectorized numpy.
    """
    h_dst, w_dst = dst_shape
    a, b_, c, d, e, f = dst_transform
    cols = np.arange(w_dst, dtype=np.float64) + 0.5
    rows = np.arange(h_dst, dtype=np.float64) + 0.5
    cc, rr = np.meshgrid(cols, rows)
    x = a * cc + b_ * rr + c
    y = d * cc + e * rr + f

    sa, sb, sc, sd, se, sf = src_transform
    det = sa * se - sb * sd
    inv_col = (se * (x - sc) - sb * (y - sf)) / det
    inv_row = (-sd * (x - sc) + sa * (y - sf)) / det

    fc = inv_col - 0.5
    fr = inv_row - 0.5
    h_src, w_src = band.shape
    valid = (fc > -1) & (fc < w_src) & (fr > -1) & (fr < h_src)

    i0 = np.clip(np.floor(fc), 0, w_src - 2).astype(np.int64)
    j0 = np.clip(np.floor(fr), 0, h_src - 2).astype(np.int64)
    wx = np.clip(fc - i0, 0.0, 1.0)
    wy = np.clip(fr - j0, 0.0, 1.0)
    src = band.astype(np.float64)
    v = (1 - wy) * ((1 - wx) * src[j0, i0] + wx * src[j0, i0 + 1]) + wy * (
        (1 - wx) * src[j0 + 1, i0] + wx * src[j0 + 1, i0 + 1]
    )
    out = np.where(valid, v, 0.0)
    # round-half-even before the cast (truncation would bias identity
    # resamples down 1 DN); clip per processor.py:344-345
    return np.clip(np.rint(out), 0, 65535).astype(np.uint16)
