"""End-to-end determinism + checkpoint-resume idempotence (SURVEY §5 item 5,
reference overwrite_existing=False semantics, micasense/core/config.py:41)."""

from __future__ import annotations

import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from tiff_enrichment_pipeline_spark import geotables
from tiff_enrichment_pipeline_spark.fixtures import dem_tiles_df
from tiff_enrichment_pipeline_spark.operators.lineage import (
    partition_lineage,
    resume_filter,
)
from tiff_enrichment_pipeline_spark.plans.enrich import enrich
from tiff_enrichment_pipeline_spark.sources.images import upsert_by_key

SF = "/root/testdata/sf0.001"


def _run(spark):
    return enrich(
        geotables.images_geo(spark, SF),
        landcover=geotables.landcover_polygons(spark),
        stations=geotables.stations(spark, SF),
        dem_tiles=dem_tiles_df(spark),
    )


def _fingerprint(df):
    """Order-insensitive content hash over the enrichment outputs."""
    return (
        df.select(
            F.sha2(
                F.concat_ws(
                    "|",
                    F.col("image_id").cast("string"),
                    F.coalesce(F.col("land_cover_class"), F.lit("-")),
                    F.coalesce(F.col("weather_station_id").cast("string"), F.lit("-")),
                    F.coalesce(F.round("elevation", 6).cast("string"), F.lit("-")),
                    F.col("enrich_status"),
                ),
                256,
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("fp"))
        .collect()[0]["fp"]
    )


def test_enrich_is_deterministic(spark):
    assert _fingerprint(_run(spark)) == _fingerprint(_run(spark))


def test_resume_noops_after_full_run(spark):
    out = _run(spark).select("image_id")
    remaining = resume_filter(
        geotables.images_geo(spark, SF), out, key_col="image_id"
    )
    assert remaining.count() == 0  # second run has nothing to do


def test_rerun_upsert_preserves_rowcount_and_content(spark):
    with tempfile.TemporaryDirectory() as d:
        target = str(Path(d) / "enriched")
        first = _run(spark)
        first.write.parquet(target)
        n1 = spark.read.parquet(target).count()
        fp1 = _fingerprint(spark.read.parquet(target))
        # full re-run upserted by key → identical table, no duplicates
        upsert_by_key(spark, target, _run(spark), key="image_id")
        final = spark.read.parquet(target)
        assert final.count() == n1
        assert _fingerprint(final) == fp1
        # lineage checksums agree run-over-run (partition-count independent)
        l1 = partition_lineage(first, "r1").agg(
            F.sum("rows_out"), F.sum("key_checksum")
        ).collect()[0]
        l2 = partition_lineage(final.repartition(3), "r2").agg(
            F.sum("rows_out"), F.sum("key_checksum")
        ).collect()[0]
        assert tuple(l1) == tuple(l2)
