"""Frozen-fixture guard (SURVEY §7.3: 'our own fixtures define truth —
freeze them early and version them').

The DuckDB parity gate catches the Spark side drifting from the SQL side,
but NOT both drifting together (an edit to geotables.py usually changes the
Column expression AND its *_sql twin in the same commit). These constants
pin the actual VALUES: any change to the derivation arithmetic fails here
and must be a conscious version bump of the hashes below."""

from __future__ import annotations

import hashlib

from tiff_enrichment_pipeline_spark import geotables
from tiff_enrichment_pipeline_spark.fixtures import dem_tiles_df

SF = "/root/testdata/sf0.001"

FROZEN = {
    "images": "3fbcd6c219d856b3",
    "stations": "40fb2ff1c44af710",
    "observations": "38b4f76469073c17",
    "landcover": "6fbba93be0050cba",
    "dem": "d5d92b6e8ba17398",
}


def _h(df) -> str:
    rows = sorted(tuple(str(x) for x in r) for r in df.collect())
    return hashlib.sha256(repr(rows[:200]).encode()).hexdigest()[:16]


def test_geo_fixtures_frozen(spark):
    got = {
        "images": _h(
            geotables.images_geo(spark, SF).orderBy("image_id").limit(50)
        ),
        "stations": _h(
            geotables.stations(spark, SF).orderBy("station_id").limit(50)
        ),
        "observations": _h(
            geotables.weather_observations(spark, SF)
            .orderBy("station_id", "obs_date")
            .limit(50)
        ),
        "landcover": _h(
            geotables.landcover_polygons(spark).orderBy("polygon_id").limit(50)
        ),
        "dem": _h(dem_tiles_df(spark).orderBy("tile_x", "tile_y").limit(20)),
    }
    assert got == FROZEN
