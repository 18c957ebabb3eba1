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


def test_kring_wraps_antimeridian(spark):
    """A point at lon≈180 must have ring neighbors on BOTH sides of the
    antimeridian (ix wraps mod nx), and its ring must contain the cell of
    a point just across the seam."""
    df = spark.createDataFrame(
        [(1, 179.99, 10.0), (2, -179.99, 10.0)],
        "id long, lon double, lat double",
    )
    cell = grid.cell_of(F.col("lon"), F.col("lat"), 10)
    out = df.select(
        "id", cell.alias("cell"), grid.kring_cells(cell, 10, 1).alias("ring")
    ).collect()
    cells = {r["id"]: r["cell"] for r in out}
    rings = {r["id"]: set(r["ring"]) for r in out}
    assert cells[2] in rings[1]  # across-the-seam neighbor is in the ring
    assert cells[1] in rings[2]
    assert len(rings[1]) == 9


def test_zorder_matches_numpy_and_interleaves(spark):
    """zorder_of: Column expr == numpy twin; z-adjacency implies spatial
    adjacency (consecutive z quadrants share a parent cell); null GPS →
    NULL z."""
    rng = np.random.default_rng(5)
    lons = np.concatenate([rng.uniform(-180, 180, 50), [5.0, -179.99, 179.99]])
    lats = np.concatenate([rng.uniform(-90, 90, 50), [52.0, -89.9, 89.9]])
    df = spark.createDataFrame(
        list(zip(lons.tolist(), lats.tolist())), "lon double, lat double"
    )
    got = [
        r[0]
        for r in df.select(
            grid.zorder_of(F.col("lon"), F.col("lat")).alias("z")
        ).collect()
    ]
    want = grid.zorder_np(lons, lats).tolist()
    assert got == want

    # bit-interleave property: the low 2 bits select the quadrant within
    # the parent (z >> 2 is the parent's z at res k-1)
    z = grid.zorder_np(np.array([5.0]), np.array([52.0]), k=16)[0]
    zp = grid.zorder_np(np.array([5.0]), np.array([52.0]), k=15)[0]
    assert z >> 2 == zp

    nulls = spark.createDataFrame(
        [(None, None), (float("nan"), 1.0)], "lon double, lat double"
    )
    out = [
        r[0]
        for r in nulls.select(
            grid.zorder_of(F.col("lon"), F.col("lat"))
        ).collect()
    ]
    assert out == [None, None]


def test_cell_of_null_and_nan_yield_null(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, float("nan"), 10.0), (3, 5.0, 52.0)],
        "id long, lon double, lat double",
    )
    out = {
        r["id"]: r["c"]
        for r in df.select(
            "id", grid.cell_of(F.col("lon"), F.col("lat"), 10).alias("c")
        ).collect()
    }
    assert out[1] is None and out[2] is None and out[3] is not None


def test_hilbert_curve_properties_and_engine_parity(spark):
    """The S2-analog Hilbert index: (1) Spark == numpy reference on random
    coords, (2) the DEFINING curve property — consecutive indices are
    always grid-adjacent (Manhattan distance exactly 1; the Morton
    z-curve violates this at every row boundary), (3) parent coarsening
    is index >> 2, (4) NULL/NaN GPS -> NULL."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(21)
    lons = rng.uniform(-180, 180, 400)
    lats = rng.uniform(-90, 90, 400)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lons, lats))],
        "i long, lon double, lat double",
    )
    got = [
        r["hilbert"]
        for r in grid.with_hilbert(df, k=13).orderBy("i").collect()
    ]
    want = grid.hilbert_np(lons, lats, 13)
    assert got == [int(v) for v in want]

    # adjacency: exhaustive over a full order-7 curve (16384 steps)
    k = 7
    d = np.arange(0, 4**k - 1)
    x1, y1 = grid.hilbert_d2xy_np(d, k)
    x2, y2 = grid.hilbert_d2xy_np(d + 1, k)
    assert (np.abs(x1 - x2) + np.abs(y1 - y2) == 1).all()
    # ...and the inverse walk round-trips through lon/lat
    n = 2**k
    lon_c = (x1 + 0.5) / n * 360.0 - 180.0
    lat_c = (y1 + 0.5) / n * 180.0 - 90.0
    assert np.array_equal(grid.hilbert_np(lon_c, lat_c, k), d)

    # parent: order-k index >> 2 IS the order-(k-1) index
    assert np.array_equal(
        grid.hilbert_np(lons, lats, 13) >> 2, grid.hilbert_np(lons, lats, 12)
    )

    # null gate
    df2 = spark.createDataFrame(
        [(None, 1.0), (float("nan"), 2.0), (3.0, 4.0)],
        "lon double, lat double",
    )
    vals = [r["hilbert"] for r in grid.with_hilbert(df2, k=13).collect()]
    assert vals[0] is None and vals[1] is None and vals[2] is not None

    # plan stays JVM-side: chained projections collapse, no Python node
    plan = (
        grid.with_hilbert(df, k=13)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
