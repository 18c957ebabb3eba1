"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship enrichment DAG on /root/testdata/sf0.001.
queries()      — named operator queries (SURVEY.md §2) over (spark, sf_dir).
oracle_sql()   — DuckDB twins; see tiff_enrichment_pipeline_spark/queries.py
                 for the determinism rules that keep value-hashes identical.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full geospatial enrichment (cells → PIP land-cover →
    kNN weather → elevation) of the sf0.001 image table."""
    from tiff_enrichment_pipeline_spark import geotables
    from tiff_enrichment_pipeline_spark.fixtures import dem_tiles_df
    from tiff_enrichment_pipeline_spark.plans.enrich import enrich

    sf_dir = "/root/testdata/sf0.001"
    images = geotables.images_geo(spark, sf_dir)
    return enrich(
        images,
        landcover=geotables.landcover_polygons(spark),
        stations=geotables.stations(spark, sf_dir),
        dem_tiles=dem_tiles_df(spark),
        observations=geotables.weather_observations(spark, sf_dir),
    ).drop("weather")  # struct column: keep driver smoke schema simple


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tiff_enrichment_pipeline_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tiff_enrichment_pipeline_spark.queries import ORACLES

    return dict(ORACLES)
