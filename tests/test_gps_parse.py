"""DMS/altitude/EXIF parse goldens (reference: utils/gps_utils.py:7-96)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiff_enrichment_pipeline_spark.functions.gps import (
    parse_altitude,
    parse_dms,
    parse_exif_timestamp,
)


def test_parse_dms_reference_cases(spark):
    cases = [
        ("52 deg 6' 28.48\" N", 52.0 + 6 / 60 + 28.48 / 3600),
        ("4 deg 53' 44.4\" W", -(4.0 + 53 / 60 + 44.4 / 3600)),
        ("52.1234N", 52.1234),
        ("12.5S", -12.5),
        ("-4.5", -4.5),
        ("garbage text", 0.0),  # reference fallback, gps_utils.py:40-42
        ("", 0.0),
        (None, 0.0),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "c string")
    got = [r["v"] for r in df.select(parse_dms(F.col("c")).alias("v")).collect()]
    for (raw, want), v in zip(cases, got):
        assert v == pytest.approx(want, abs=1e-9), raw


def test_parse_altitude_and_exif(spark):
    df = spark.createDataFrame(
        [("26.9 m Above Sea Level", "2024:01:02 03:04:05"), ("junk", "bad")],
        "a string, ts string",
    )
    rows = df.select(
        parse_altitude(F.col("a")).alias("alt"),
        parse_exif_timestamp(F.col("ts")).alias("t"),
    ).collect()
    assert rows[0]["alt"] == pytest.approx(26.9)
    assert rows[0]["t"].isoformat() == "2024-01-02T03:04:05"
    assert rows[1]["alt"] == 0.0
    assert rows[1]["t"] is None
