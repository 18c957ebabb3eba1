"""The flagship enrichment DAG: geotag → cells → PIP → kNN → elevation.

One lazy DataFrame plan re-creating the reference's documented workflow step
"Geospatial enrichment fetches elevation, weather, land cover data"
(reference: README.md:403-404; target schema metadata.enrichment_data,
scripts/create-tables.sql:118-161) with zero external services:

  images ──cell encode (map)──► PIP land-cover (broadcast join, map-side)
         ──kNN weather (broadcast ring join + 1 window shuffle)
         ──elevation (broadcast tile join + Arrow bilinear UDF)
         ──► enriched rows

Exactly one shuffle on the big side (the kNN per-image window); everything
else is map stages + broadcast joins, which is what survives a 1000-executor
100 TB run. GPS-less rows route around enrichment and union back
(reference's no-GPS path, src/pipeline/utils/gps_utils.py:87-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiff_enrichment_pipeline_spark import grid
from tiff_enrichment_pipeline_spark.functions.geo import gps_valid
from tiff_enrichment_pipeline_spark.operators.elevation import elevation_join
from tiff_enrichment_pipeline_spark.operators.knn_join import knn_nearest
from tiff_enrichment_pipeline_spark.operators.pip_join import landcover_pip_join


def enrich(
    images: DataFrame,
    landcover: DataFrame,
    stations: DataFrame,
    dem_tiles: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Full enrichment of a geotagged image table.

    Output: input columns + cell_r7/8/9, polygon_id, land_cover_class,
    land_cover_confidence, weather struct (k-NN aggregated: idw temp etc.),
    elevation, elevation_source, elevation_accuracy_m, enrich_status.
    """
    valid = gps_valid(F.col("lat"), F.col("lon"))
    with_gps = images.filter(valid)
    no_gps = images.filter(~F.coalesce(valid, F.lit(False)))

    cells = (
        with_gps.withColumn("cell_r7", grid.cell_of(F.col("lon"), F.col("lat"), grid.RES7))
        .withColumn("cell_r9", grid.cell_of(F.col("lon"), F.col("lat"), grid.RES9))
    )

    lc = landcover_pip_join(cells, landcover, res=grid.RES8)

    # 1-NN weather — Arrow top-k map stage + broadcast payload join; keeps
    # the whole enrichment shuffle-free on the probe side (SURVEY.md J6)
    near = knn_nearest(lc, stations)
    with_weather = near.withColumn(
        "weather",
        F.map_from_arrays(
            F.array(
                F.lit("temp_c"), F.lit("wind_ms"),
                F.lit("precip_mm"), F.lit("nearest_dist_m"),
            ),
            F.array(
                F.col("temp_c"), F.col("wind_ms"),
                F.col("precip_mm"), F.col("dist_m"),
            ),
        ),
    ).withColumnRenamed("station_id", "weather_station_id").drop(
        "st_lon", "st_lat", "temp_c", "wind_ms", "precip_mm", "dist_m"
    )

    enriched = elevation_join(with_weather, dem_tiles).withColumn(
        "enrich_status", F.lit("enriched")
    )

    passthrough = no_gps
    for c in enriched.columns:
        if c not in passthrough.columns:
            passthrough = passthrough.withColumn(
                c,
                F.lit(None).cast(dict(enriched.dtypes)[c])
                if c != "enrich_status"
                else F.lit("no_gps"),
            )
    return enriched.unionByName(passthrough.select(*enriched.columns))
