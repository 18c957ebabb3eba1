"""Fused Arrow geo-lookup: 1-NN station + DEM bilinear in ONE UDF crossing.

The flagship plan (plans/enrich.py) needs two Python-side lookups per image:
nearest weather station (GEMM kNN) and DEM elevation (bilinear). Running
them as separate pandas UDFs puts two ArrowEvalPython nodes in the same
stage — every task then drives two Python workers (JVM→py→JVM→py→JVM), and
at high local parallelism the 3× thread count thrashes instead of scaling.
This module fuses both lookups into a single UDF returning a fixed-width
struct — one Arrow crossing, one worker per task, same math as the
individual operators (which remain the oracle-checked public API).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from tiff_enrichment_pipeline_spark.geotables import DEM_N, DEM_STEP, DEM_TILE_DEG
from tiff_enrichment_pipeline_spark.operators.knn_join import (
    _chord2_to_m,
    _indexed_payload_df,
    _safe_idx,
    build_cell_candidates,
    topk_bucketed_np,
)


def fused_station_dem_lookup(
    images: DataFrame,
    stations: DataFrame,
    dem_tiles: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    knn_res: int = 10,
    knn_ring: int = 2,
) -> DataFrame:
    """images + ``_geo`` struct<st_idx,d2,elevation> + station payload +
    dist_m + elevation columns. Exact 1-NN + bilinear DEM, one Arrow pass.

    ``knn_res``/``knn_ring``: candidate-bucket resolution and Chebyshev
    ring of the certified-exact 1-NN (EnrichConfig.knn_res/knn_ring) —
    results are exact for ANY setting; they only trade candidate-set size
    against fallback frequency."""
    st_rows = stations.collect()
    # id-ascending layout → kernel argmin fast path (see knn_join.py)
    st_rows.sort(key=lambda r: r["station_id"])
    s_lat = np.array([r["st_lat"] for r in st_rows], dtype=np.float64)
    s_lon = np.array([r["st_lon"] for r in st_rows], dtype=np.float64)
    s_ids = np.array([r["station_id"] for r in st_rows], dtype=np.int64)
    rp, rl = np.radians(s_lat), np.radians(s_lon)
    s_xyz = np.stack(
        [np.cos(rp) * np.cos(rl), np.cos(rp) * np.sin(rl), np.sin(rp)], axis=1
    )
    cand_by_cell = build_cell_candidates(s_lat, s_lon, res=knn_res, ring=knn_ring)

    tile_rows = dem_tiles.select("tile_x", "tile_y", "grid").collect()
    grids = {
        (r["tile_x"], r["tile_y"]): np.frombuffer(r["grid"], dtype="<f4")
        .reshape(DEM_N, DEM_N)
        .astype(np.float64)
        for r in tile_rows
    }
    sc = images.sparkSession.sparkContext
    bc_s = sc.broadcast((s_xyz, s_ids, cand_by_cell))
    bc_g = sc.broadcast(grids)

    out_t = StructType(
        [
            StructField("st_idx", DoubleType()),
            StructField("d2", DoubleType()),
            StructField("elevation", DoubleType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _lookup(plat: pd.Series, plon: pd.Series) -> pd.DataFrame:
        S, ids, cand = bc_s.value
        g_by_tile = bc_g.value
        lat_v = plat.to_numpy(np.float64, na_value=np.nan)
        lon_v = plon.to_numpy(np.float64, na_value=np.nan)
        n = len(lat_v)
        elev = np.full(n, np.nan)
        valid = ~np.isnan(lat_v) & ~np.isnan(lon_v)
        # --- 1-NN station: cell-bucketed chord GEMM (certified-exact) ---
        idx, d2v = topk_bucketed_np(
            lat_v, lon_v, S, ids, cand, 1, res=knn_res, ring=knn_ring
        )
        st_idx = idx[:, 0]
        d2_out = d2v[:, 0]
        if valid.any():
            # --- DEM bilinear, grouped by tile ---
            tx = np.floor(lon_v / DEM_TILE_DEG).astype(np.int64)
            ty = np.floor(lat_v / DEM_TILE_DEG).astype(np.int64)
            key = np.where(valid, tx * 100000 + ty, np.int64(-(2**62)))
            order = np.argsort(key, kind="stable")
            sk = key[order]
            starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
            bounds = np.r_[starts, len(sk)]
            for gi in range(len(starts)):
                if sk[starts[gi]] == -(2**62):
                    continue
                rows = order[bounds[gi]:bounds[gi + 1]]
                tile = (int(tx[rows[0]]), int(ty[rows[0]]))
                g = g_by_tile.get(tile)
                if g is None:
                    continue
                fx = (lon_v[rows] - tile[0] * DEM_TILE_DEG) / DEM_STEP - 0.5
                fy = (lat_v[rows] - tile[1] * DEM_TILE_DEG) / DEM_STEP - 0.5
                i0 = np.clip(np.floor(fx), 0, DEM_N - 2).astype(np.int64)
                j0 = np.clip(np.floor(fy), 0, DEM_N - 2).astype(np.int64)
                wx = np.clip(fx - i0, 0.0, 1.0)
                wy = np.clip(fy - j0, 0.0, 1.0)
                v00, v10 = g[j0, i0], g[j0, i0 + 1]
                v01, v11 = g[j0 + 1, i0], g[j0 + 1, i0 + 1]
                elev[rows] = (1.0 - wy) * ((1.0 - wx) * v00 + wx * v10) + wy * (
                    (1.0 - wx) * v01 + wx * v11
                )
        return pd.DataFrame({"st_idx": st_idx, "d2": d2_out, "elevation": elev})

    spark = images.sparkSession
    st_indexed = _indexed_payload_df(spark, stations, st_rows)
    dem_meta = dem_tiles.select(
        "tile_x", "tile_y",
        F.col("source").alias("elevation_source"),
        F.col("accuracy_m").alias("elevation_accuracy_m"),
    )
    # NaN-gated (ANSI cast of NaN→int throws; NULL floor is already NULL)
    tx = F.when(
        ~F.isnan(F.col(lon)), F.floor(F.col(lon) / F.lit(DEM_TILE_DEG))
    ).cast("int")
    ty = F.when(
        ~F.isnan(F.col(lat)), F.floor(F.col(lat) / F.lit(DEM_TILE_DEG))
    ).cast("int")
    out = (
        images.withColumn("_geo", _lookup(F.col(lat), F.col(lon)))
        .withColumn("_st_idx", _safe_idx(F.col("_geo")["st_idx"]))
        .withColumn("dist_m", _chord2_to_m(F.col("_geo")["d2"]))
        .withColumn("elevation", F.col("_geo")["elevation"])
        .withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
        .drop("_geo")
        .join(F.broadcast(st_indexed), "_st_idx", "left")
        .join(F.broadcast(dem_meta), ["tile_x", "tile_y"], "left")
        .drop("_st_idx")
    )
    return out
