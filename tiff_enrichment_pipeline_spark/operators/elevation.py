"""Raster↔vector elevation alignment: DEM tile join + bilinear sampling.

Re-creates the reference's declared elevation enrichment
(elevation_meters DECIMAL(8,2) + elevation_source usgs_3dep/nasa_srtm +
elevation_accuracy_meters; reference: scripts/create-tables.sql:122-126,
scripts/init-db.sql:59,62) as a grid equi-join (SURVEY.md J7):

1. Image point → integer tile key ``(floor(lon/T), floor(lat/T))`` — pure
   column math, pushes down to partition pruning when the DEM table is
   written partitioned by tile key.
2. Equi-join against the DEM tile table (broadcast when the region's DEM
   fits; sort-merge over tile keys for planetary DEMs — tile keys are
   uniformly sized, so no skew).
3. Bilinear sample inside an Arrow-batched pandas UDF over the float32 grid
   payload (the only place Python touches data — per-batch numpy, never
   per-row interpretation of pixels; edge samples clamp to the grid border).

The grid payload is a raw little-endian float32 N×N buffer in its own binary
column, so Catalyst prunes it away for any query not sampling elevation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from tiff_enrichment_pipeline_spark.geotables import DEM_N, DEM_STEP, DEM_TILE_DEG


def bilinear_sample_np(
    grid_f32: np.ndarray, lon: float, lat: float, tx: int, ty: int
) -> float:
    """Bilinear sample of one tile grid (grid[j, i], i=lon axis).

    Index/clamp/weight arithmetic matches geotables.elevation_bilinear_sql
    exactly (double precision, float32 corner values) so the DuckDB oracle
    reproduces results bit-for-bit up to libm trig rounding.
    """
    fx = (lon - tx * DEM_TILE_DEG) / DEM_STEP - 0.5
    fy = (lat - ty * DEM_TILE_DEG) / DEM_STEP - 0.5
    i0 = int(min(max(np.floor(fx), 0), DEM_N - 2))
    j0 = int(min(max(np.floor(fy), 0), DEM_N - 2))
    wx = min(max(fx - i0, 0.0), 1.0)
    wy = min(max(fy - j0, 0.0), 1.0)
    v00 = float(grid_f32[j0, i0])
    v10 = float(grid_f32[j0, i0 + 1])
    v01 = float(grid_f32[j0 + 1, i0])
    v11 = float(grid_f32[j0 + 1, i0 + 1])
    return (1.0 - wy) * ((1.0 - wx) * v00 + wx * v10) + wy * (
        (1.0 - wx) * v01 + wx * v11
    )


@F.pandas_udf(DoubleType())
def _bilinear_udf(
    it: Iterator[tuple[pd.Series, pd.Series, pd.Series, pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    for grid_bytes, lon, lat, tx, ty in it:
        out = np.full(len(lon), np.nan)
        cache: dict[int, np.ndarray] = {}
        for i in range(len(lon)):
            b = grid_bytes.iloc[i]
            if b is None or pd.isna(lon.iloc[i]):
                continue
            key = id(b)
            g = cache.get(key)
            if g is None:
                g = np.frombuffer(b, dtype="<f4").reshape(DEM_N, DEM_N)
                cache[key] = g
            out[i] = bilinear_sample_np(
                g, float(lon.iloc[i]), float(lat.iloc[i]),
                int(tx.iloc[i]), int(ty.iloc[i]),
            )
        yield pd.Series(out)


def tile_key(lon, lat):
    tx = F.floor(lon / F.lit(DEM_TILE_DEG)).cast("int")
    ty = F.floor(lat / F.lit(DEM_TILE_DEG)).cast("int")
    return tx, ty


def elevation_join(
    images: DataFrame,
    dem_tiles: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    broadcast_dem: bool = True,
) -> DataFrame:
    """images ⟕ DEM → + elevation (double, NULL off-DEM), elevation_source,
    elevation_accuracy_m.

    ``dem_tiles``: tile_x:int, tile_y:int, grid:binary (N*N float32 LE),
    accuracy_m:double, source:string.
    """
    tx, ty = tile_key(F.col(lon), F.col(lat))
    probe = images.withColumn("tile_x", tx).withColumn("tile_y", ty)
    dem = F.broadcast(dem_tiles) if broadcast_dem else dem_tiles
    joined = probe.join(dem, ["tile_x", "tile_y"], "left")
    return (
        joined.withColumn(
            "elevation",
            _bilinear_udf(
                F.col("grid"), F.col(lon), F.col(lat),
                F.col("tile_x"), F.col("tile_y"),
            ),
        )
        .withColumn("elevation_source", F.col("source"))
        .withColumn("elevation_accuracy_m", F.col("accuracy_m"))
        .drop("grid", "source", "accuracy_m")
    )
