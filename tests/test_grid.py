"""Grid cell-index kernel: encode/decode/parent/k-ring invariants."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tiff_enrichment_pipeline_spark import grid


def test_numpy_matches_column_expr(spark):
    pts = [(-179.9, -89.9), (0.0, 0.0), (5.0, 52.0), (179.9, 89.9), (4.89, 52.37)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for k in (grid.RES7, grid.RES8, grid.RES9):
        got = [
            r[0]
            for r in df.select(grid.cell_of(F.col("lon"), F.col("lat"), k)).collect()
        ]
        want = grid.cell_of_np(
            np.array([p[0] for p in pts]), np.array([p[1] for p in pts]), k
        ).tolist()
        assert got == want


def test_parent_contains_child(spark):
    df = spark.createDataFrame([(5.123, 52.456)], "lon double, lat double")
    c9 = grid.cell_of(F.col("lon"), F.col("lat"), grid.RES9)
    c7 = grid.cell_of(F.col("lon"), F.col("lat"), grid.RES7)
    par = grid.cell_parent(c9, grid.RES7, grid.RES9)
    row = df.select(c7.alias("a"), par.alias("b")).collect()[0]
    assert row["a"] == row["b"]


def test_kring_size_and_membership(spark):
    df = spark.createDataFrame([(5.0, 52.0)], "lon double, lat double")
    c = grid.cell_of(F.col("lon"), F.col("lat"), 10)
    ring = df.select(
        grid.kring_cells(c, 10, 2).alias("ring"), c.alias("me")
    ).collect()[0]
    assert len(ring["ring"]) == 25
    assert ring["me"] in ring["ring"]
    assert len(set(ring["ring"])) == 25


def test_kring_lat_clamp(spark):
    # near the pole: rows above the top row are dropped, not wrapped
    df = spark.createDataFrame([(0.0, 89.99)], "lon double, lat double")
    c = grid.cell_of(F.col("lon"), F.col("lat"), 10)
    ring = df.select(grid.kring_cells(c, 10, 2).alias("r")).collect()[0]["r"]
    assert len(ring) == 15  # 5 lon cols × 3 valid lat rows


def test_cell_center_roundtrip(spark):
    df = spark.createDataFrame([(5.0, 52.0)], "lon double, lat double")
    c = grid.cell_of(F.col("lon"), F.col("lat"), grid.RES8)
    lon_c, lat_c = grid.cell_center(c, grid.RES8)
    row = df.select(lon_c.alias("x"), lat_c.alias("y")).collect()[0]
    w = grid.cell_width_deg(grid.RES8)
    assert abs(row["x"] - 5.0) <= w / 2
    assert abs(row["y"] - 52.0) <= w / 2
