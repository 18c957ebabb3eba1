"""Deterministic synthetic fixtures (seed-free: pure functions of ids).

FIXTURES.md realization. Everything is a closed-form function of integer
ids — no RNG state — so "known coordinates → known elevation/land-cover/
weather values" goldens are stable across runs and processes (the
reference's golden-value test style, tests/test_vegetation_indices.py:29-60).

Tables built here (payload-bearing; the payload-free geo tables derive from
driver parquet in geotables.py):

- images           input_hint schema + geotags + capture grouping
- dem_tiles        32×32 float32 analytic DEM per 0.1° tile over the NL box
- landcover_test   rect tiling + concave L-shape overlays (pytest-only; the
                   oracle-checked rect tiling lives in geotables.py)
- processing_runs / api_usage   catalog fixtures for the reporting queries
                   (reference: scripts/create-tables.sql:14-63,195-223)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiff_enrichment_pipeline_spark import geotables
from tiff_enrichment_pipeline_spark.raster import codec

IMG_W = IMG_H = 64


def pixel_band(capture: int, band: int, w: int = IMG_W, h: int = IMG_H) -> np.ndarray:
    """Deterministic uint16 band raster for (capture, band)."""
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)[:, None]
    v = (capture * 7919 + band * 104729 + x * 31 + y * 17) % 60000
    return v.astype(np.uint16)


def image_geotag(capture: int) -> tuple[float | None, float | None, float]:
    """(lat, lon, alt) — NL-clustered like geotables.images_geo; every 29th
    capture has no GPS (the reference's no-GPS routing, gps_utils.py:87-94)."""
    if capture % 29 == 7:
        return None, None, 0.0
    u1 = ((capture * geotables.MULT1) % geotables.MOD_U) / float(geotables.MOD_U)
    u2 = ((capture * geotables.MULT2) % geotables.MOD_U) / float(geotables.MOD_U)
    sel = capture % 10
    if sel < 2:
        lon = geotables.HOT_LON + (u1 - 0.5) * geotables.HOT_SPAN
        lat = geotables.HOT_LAT + (u2 - 0.5) * geotables.HOT_SPAN
    elif sel < 8:
        lon = geotables.NL_LON0 + u1 * geotables.NL_LON_SPAN
        lat = geotables.NL_LAT0 + u2 * geotables.NL_LAT_SPAN
    else:
        lon = -180.0 + u1 * 360.0
        lat = -90.0 + u2 * 180.0
    return lat, lon, 20.0 + u2 * 100.0


def images_pdf(n_captures: int = 20) -> pd.DataFrame:
    """Payload-bearing images table (input_hint schema + geo columns)."""
    rows = []
    base_ts = pd.Timestamp("2024-01-01T12:00:00")
    for cap in range(n_captures):
        lat, lon, alt = image_geotag(cap)
        for band in range(1, 6):
            px = pixel_band(cap, band)
            sel = (cap * 5 + band) % 11
            fmt = (
                "lossy-q12" if sel == 3
                else "png" if sel == 7
                else "tiff" if sel == 5
                else "raw-u16"
            )
            payload = (
                codec.encode_lossy_q12(px) if fmt == "lossy-q12"
                else codec.encode_png_u16(px) if fmt == "png"
                else codec.encode_tiff_u16(px) if fmt == "tiff"
                else codec.encode_raw_u16(px)
            )
            caption = (
                f"capture {cap} band {band} at "
                + (f"{lat:.4f},{lon:.4f}" if lat is not None else "unknown")
            )
            rows.append(
                {
                    "image_id": f"IMG_{cap:04d}_{band}.tif",
                    "bytes": payload,
                    "w": np.int32(IMG_W),
                    "h": np.int32(IMG_H),
                    "fmt": fmt,
                    "caption": caption,
                    "phash": np.int64(
                        int.from_bytes(
                            __import__("hashlib").sha256(payload).digest()[:8],
                            "big", signed=True,
                        )
                    ),
                    "capture_id": f"IMG_{cap:04d}",
                    "band": np.int32(band),
                    "lat": lat,
                    "lon": lon,
                    "alt": alt,
                    "captured_at": base_ts + pd.Timedelta(seconds=30 * cap),
                }
            )
    return pd.DataFrame(rows)


def images_df(spark: SparkSession, n_captures: int = 20) -> DataFrame:
    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, capture_id string, band int, "
        "lat double, lon double, alt double, captured_at timestamp"
    )
    return spark.createDataFrame(images_pdf(n_captures), schema=schema)


# ---------------------------------------------------------------------------
# DEM tiles
# ---------------------------------------------------------------------------

def dem_tile_grid(tx: int, ty: int) -> np.ndarray:
    """float32 32×32 grid; value = 100 + 50*sin(lon) + 30*cos(lat) at cell
    centers (FIXTURES.md §4 analytic DEM) — grid[j, i], i = lon axis."""
    n, t, s = geotables.DEM_N, geotables.DEM_TILE_DEG, geotables.DEM_STEP
    cx = tx * t + (np.arange(n, dtype=np.float64) + 0.5) * s
    cy = ty * t + (np.arange(n, dtype=np.float64) + 0.5) * s
    v = 100.0 + 50.0 * np.sin(cx)[None, :] + 30.0 * np.cos(cy)[:, None]
    return v.astype(np.float32)


def dem_tiles_pdf() -> pd.DataFrame:
    """All tiles covering the NL box (lon [3.0,7.3) × lat [50.7,53.6))."""
    t = geotables.DEM_TILE_DEG
    txs = range(int(np.floor(3.0 / t)), int(np.floor((7.3 - 1e-9) / t)) + 1)
    tys = range(int(np.floor(50.7 / t)), int(np.floor((53.6 - 1e-9) / t)) + 1)
    rows = [
        {
            "tile_x": np.int32(tx),
            "tile_y": np.int32(ty),
            "grid": dem_tile_grid(tx, ty).tobytes(),
            "accuracy_m": 1.0,
            "source": "usgs_3dep" if (tx + ty) % 2 == 0 else "nasa_srtm",
        }
        for tx in txs
        for ty in tys
    ]
    return pd.DataFrame(rows)


def dem_tiles_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        dem_tiles_pdf(),
        schema="tile_x int, tile_y int, grid binary, accuracy_m double, source string",
    )


# ---------------------------------------------------------------------------
# Concave-polygon land cover (pytest-only overlay)
# ---------------------------------------------------------------------------

def landcover_concave_pdf() -> pd.DataFrame:
    """Two L-shaped concave polygons (FIXTURES.md §2) with bboxes + vertex
    rings — exercises the even-odd refinement path the rect fast path skips."""
    def lshape(x0, y0, s, cls, conf, pid):
        # L: big square minus top-right quadrant
        verts = [
            {"x": x0, "y": y0},
            {"x": x0 + s, "y": y0},
            {"x": x0 + s, "y": y0 + s / 2},
            {"x": x0 + s / 2, "y": y0 + s / 2},
            {"x": x0 + s / 2, "y": y0 + s},
            {"x": x0, "y": y0 + s},
        ]
        return {
            "polygon_id": pid,
            "land_cover_class": cls,
            "confidence": conf,
            "xmin": x0, "ymin": y0, "xmax": x0 + s, "ymax": y0 + s,
            "vertices": verts,
            "is_rect": False,
        }

    return pd.DataFrame(
        [
            lshape(5.0, 52.0, 0.2, "water", 0.9, "LCC_0000"),
            lshape(6.0, 51.0, 0.3, "wetland", 0.8, "LCC_0001"),
        ]
    )


def landcover_concave_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        landcover_concave_pdf(),
        schema=(
            "polygon_id string, land_cover_class string, confidence double, "
            "xmin double, ymin double, xmax double, ymax double, "
            "vertices array<struct<x:double,y:double>>, is_rect boolean"
        ),
    )


# ---------------------------------------------------------------------------
# Catalog fixtures (processing_runs / api_usage) — reporting-query inputs
# ---------------------------------------------------------------------------

STATUSES = ["pending", "processing", "completed", "failed", "retrying", "cancelled"]
API_SOURCES = ["usgs_3dep", "open_meteo", "esa_worldcover", "nasa_srtm", "manual"]


def processing_runs_df(spark: SparkSession, n: int = 500) -> DataFrame:
    """Synthetic pipeline.processing_runs (create-tables.sql:14-63)."""
    ids = F.col("id")
    start = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(
        secs=(ids * 137) % 2592000
    )
    return spark.range(n).select(
        F.concat(F.lit("RUN_"), F.format_string("%06d", ids.cast("int"))).alias("run_id"),
        F.concat(F.lit("IMG_"), F.format_string("%04d", (ids % 100).cast("int"))).alias("image_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in STATUSES]), ((ids * 7) % 6).cast("int") + 1
        ).alias("status"),
        start.alias("start_ts"),
        (start + F.make_interval(secs=(ids * 31) % 600 + 5)).alias("end_ts"),
        ((ids * 13) % 4).cast("int").alias("retry_count"),
        ((ids * 104729) % 10000000).alias("in_bytes"),
        ((ids * 7919) % 8000000).alias("out_bytes"),
    )


def api_usage_df(spark: SparkSession, n: int = 2000) -> DataFrame:
    """Synthetic metadata.api_usage (create-tables.sql:195-223)."""
    ids = F.col("id")
    return spark.range(n).select(
        F.element_at(
            F.array(*[F.lit(s) for s in API_SOURCES]), ((ids * 11) % 5).cast("int") + 1
        ).alias("api_source"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(ids * 977) % 86400)
        ).alias("request_ts"),
        F.when((ids * 17) % 20 < 17, 200)
        .when((ids * 17) % 20 < 19, 404)
        .otherwise(500)
        .cast("int")
        .alias("response_code"),
        ((ids * 37) % 900 + 20).cast("int").alias("response_ms"),
        ((ids * 3) % 5 < 2).alias("cache_hit"),
    )


# ---------------------------------------------------------------------------
# Distributed payload synthesis (raster queries over driver tables)
# ---------------------------------------------------------------------------

def band_rows_from_orders(
    spark: SparkSession, sf_dir: str, capture_modulo: int = 97
) -> DataFrame:
    """Payload-bearing 5-band capture rows derived from orders keys.

    Pixels are generated *distributively* (Arrow-batched pandas UDF running
    ``pixel_band`` per row) — the synthesis itself exercises the engine's
    binary-column plumbing; geotags reuse the images_geo arithmetic.
    Captures are subsampled (``o_orderkey % capture_modulo == 0``) to keep
    payload volume proportional to the correctness run, not the table.
    """
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from tiff_enrichment_pipeline_spark import geotables
    from tiff_enrichment_pipeline_spark.raster import codec

    @F.pandas_udf(BinaryType())
    def _payload(capture: pd.Series, band: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for c, b, f in zip(capture, band, fmt):
            px = pixel_band(int(c), int(b))
            if f == "tiff":
                # rotate the container profile deterministically so the
                # driver-checked queries exercise every stdlib TIFF path
                # (r6: LZW, tiled, BigTIFF) — all lossless, so every
                # pixel-value oracle is untouched. r7 rebalance: the r6
                # rotation put LZW on HALF the tiffs, and pure-Python LZW
                # encode is 34× deflate (2.7 vs 0.08 ms/band) — it owned
                # the multimodal_features regression on the r6 record.
                # Every profile (lzw, tiled, tiled+lzw, BigTIFF) still
                # appears every few captures, but LZW now rides 3/16 of
                # tiffs instead of 1/2.
                r = c % 8
                if r == 1:
                    comp, tile, big = "lzw", None, False
                elif r == 3:
                    comp, tile, big = "deflate", None, True
                elif r == 5:
                    comp = "lzw" if c % 16 == 5 else "deflate"
                    tile, big = 16, False
                elif r == 7:
                    comp, tile, big = "deflate", 16, False
                elif r == 2 and c % 16 == 2:
                    # r7: PackBits (TIFF6 §9 baseline RLE) rides 1/16 of
                    # tiffs — cheap to encode (single numpy pass + a
                    # short control-byte loop), lossless, so every
                    # pixel-value oracle is untouched
                    comp, tile, big = "packbits", None, False
                else:
                    comp, tile, big = "deflate", None, False
                enc = codec.encode_tiff_u16(
                    px, compression=comp, tile=tile, bigtiff=big
                )
            elif f == "tiff-rgb":
                # r7: the reference's `regular_tiff` bucket (ordinary RGB
                # TIFF, main.py:50-108) as gray-in-RGB — R=G=B=v, so the
                # BT.601 integer luma the decode path emits is exactly v
                # and every pixel-value oracle is untouched. 1/4 of RGB
                # payloads ship PlanarConfiguration 2 (separate plane
                # groups) so the driver-checked queries exercise the
                # planar read path too. Late r7: residue-3 captures ship
                # RGBA (photometric 2 + ExtraSamples alpha, which the
                # luma reducer ignores — still exactly v), so the
                # 4-sample container path is driver-exercised too.
                if c % 8 == 3:
                    enc = codec.encode_tiff_rgba(
                        np.stack([px, px, px, px >> 1], axis=-1),
                    )
                else:
                    enc = codec.encode_tiff_rgb(
                        np.stack([px, px, px], axis=-1),
                        planar=2 if c % 4 == 1 else 1,
                    )
            elif f == "lossy-q12":
                enc = codec.encode_lossy_q12(px)
            elif f == "png":
                enc = codec.encode_png_u16(px)
            else:
                enc = codec.encode_raw_u16(px)
            out.append(enc)
        return pd.Series(out)

    img = geotables.images_geo(spark, sf_dir).filter(
        F.col("image_id") % capture_modulo == 0
    )
    bands = img.select(
        (F.col("image_id") / capture_modulo).cast("long").alias("capture_no"),
        "lat", "lon", "alt",
    ).withColumn("band", F.explode(F.array(*[F.lit(b) for b in range(1, 6)])))
    fmt = (
        F.when((F.col("capture_no") * 5 + F.col("band")) % 11 == 3, "lossy-q12")
        .when((F.col("capture_no") * 5 + F.col("band")) % 11 == 7, "png")
        .when(
            ((F.col("capture_no") * 5 + F.col("band")) % 11 == 5)
            & (F.col("capture_no") % 2 == 1),
            "tiff-rgb",  # r7: RGB container on odd captures (gray-in-RGB)
        )
        .when((F.col("capture_no") * 5 + F.col("band")) % 11 == 5, "tiff")
        .otherwise("raw-u16")
    )
    return (
        bands.withColumn("fmt", fmt)
        .withColumn(
            "capture_id",
            F.concat(F.lit("IMG_"), F.format_string("%04d", F.col("capture_no").cast("int"))),
        )
        .withColumn(
            "image_id",
            F.concat(F.col("capture_id"), F.lit("_"), F.col("band").cast("string"), F.lit(".tif")),
        )
        .withColumn("bytes", _payload(F.col("capture_no"), F.col("band"), F.col("fmt")))
        .withColumn("w", F.lit(IMG_W).cast("int"))
        .withColumn("h", F.lit(IMG_H).cast("int"))
        .withColumn("band", F.col("band").cast("int"))
    )
