"""Coarse wall-time guards — the reference's performance-assertion layer
(SURVEY §5, tests/test_performance.py:92-208: '1 MB file < 5 s' style).
Bounds are ~10× the measured values so they catch catastrophic regressions
(a plan falling back to row-at-a-time Python, a lost broadcast), never
machine noise."""

from __future__ import annotations

import time

from tiff_enrichment_pipeline_spark import geotables
from tiff_enrichment_pipeline_spark.fixtures import dem_tiles_df
from tiff_enrichment_pipeline_spark.plans.enrich import enrich

SF = "/root/testdata/sf0.001"


def test_flagship_wall_bound(spark):
    df = enrich(
        geotables.images_geo(spark, SF),
        landcover=geotables.landcover_polygons(spark),
        stations=geotables.stations(spark, SF),
        dem_tiles=dem_tiles_df(spark),
        observations=geotables.weather_observations(spark, SF),
    )
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    # measured ~0.5-2 s warm at sf0.001; 10× headroom
    assert wall < 20.0, f"flagship enrichment took {wall:.1f}s at sf0.001"


def test_knn_weather_wall_bound(spark):
    from tiff_enrichment_pipeline_spark.queries import QUERIES

    df = QUERIES["knn_weather"](spark, SF)
    df.write.format("noop").mode("overwrite").save()
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    assert wall < 15.0, f"knn_weather took {wall:.1f}s at sf0.001"
