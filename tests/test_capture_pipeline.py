"""Per-capture grouped-map processor + entry() smoke
(reference lifecycle: core/processor.py:177-298; tests/test_integration.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiff_enrichment_pipeline_spark.fixtures import images_df, pixel_band
from tiff_enrichment_pipeline_spark.raster import kernels
from tiff_enrichment_pipeline_spark.raster.udfs import process_captures, psnr_vs_q12


@pytest.fixture(scope="module")
def capture_results(spark):
    return {
        r["capture_id"]: r for r in process_captures(images_df(spark, 12)).collect()
    }


def test_all_captures_complete(capture_results):
    assert len(capture_results) == 12
    for r in capture_results.values():
        assert r["status"] == "completed"
        assert r["n_bands"] == 5


def test_index_means_match_numpy(capture_results):
    """Grouped-map output must equal the pure-numpy pipeline (identity
    alignment case: all bands share the capture GPS)."""
    cap = 3
    bands = {
        kernels.BAND_NAMES[b]: kernels.calibrate(pixel_band(cap, b), 1.0)
        for b in range(1, 6)
    }
    r = capture_results[f"IMG_{cap:04d}"]
    for name, fn in kernels.ALL_INDICES.items():
        want = float(fn(bands).mean())
        assert r[f"{name}_mean"] == pytest.approx(want, abs=1e-6), name


def test_ndvi_packed_roundtrip(capture_results):
    cap = 5
    r = capture_results[f"IMG_{cap:04d}"]
    packed = np.frombuffer(r["ndvi_packed"], dtype=np.uint16).reshape(64, 64)
    bands = {
        kernels.BAND_NAMES[b]: kernels.calibrate(pixel_band(cap, b), 1.0)
        for b in range(1, 6)
    }
    want = kernels.pack_index_u16(kernels.ALL_INDICES["ndvi"](bands))
    np.testing.assert_array_equal(packed, want)


def test_no_gps_capture_uses_unit_transform(capture_results):
    r = capture_results["IMG_0007"]  # capture 7: no GPS (fixtures.image_geotag)
    assert r["crs"] is None
    assert r["status"] == "completed"
    assert r["transform_a"] == 1.0


def test_incomplete_set_routed(spark):
    df = images_df(spark, 3).filter(
        ~((F.col("capture_id") == "IMG_0001") & (F.col("band") > 3))
    )
    out = {r["capture_id"]: r for r in process_captures(df).collect()}
    assert out["IMG_0001"]["status"] == "incomplete_set"
    assert out["IMG_0000"]["status"] == "completed"


def test_caption_byte_equality_and_psnr(spark):
    """input_hint invariants: captions byte-equal through the engine; lossy
    rows PSNR ≥ 40 dB."""
    df = images_df(spark, 10)
    out = df.select(
        "image_id", "caption", "fmt",
        psnr_vs_q12(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt")).alias("psnr"),
    ).collect()
    from tiff_enrichment_pipeline_spark.fixtures import images_pdf

    want = dict(zip(images_pdf(10)["image_id"], images_pdf(10)["caption"]))
    for r in out:
        assert r["caption"] == want[r["image_id"]]
        if r["fmt"] == "lossy-q12":
            assert r["psnr"] == float("inf")  # already quantized → identical
    # PSNR of ORIGINAL vs q12 (the lossy bound itself) ≥ 40 dB
    raws = df.filter(F.col("fmt") == "raw-u16")
    psnrs = raws.select(
        psnr_vs_q12(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt")).alias("p")
    ).collect()
    assert all(r["p"] >= 40.0 for r in psnrs)


def test_entry_smoke(spark):
    import importlib

    entry_mod = importlib.import_module("__spark_entry__")
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert "land_cover_class" in df.columns
    assert "elevation" in df.columns
    enriched = df.filter(F.col("enrich_status") == "enriched").count()
    assert enriched > 0


def test_capture_rel_slice_matches_full(spark):
    """capture_pipeline_rel is a SLICE of the full capture pipeline, not a
    parallel implementation: its Catalyst-derived veg_pct/dense_veg_pct
    must equal process_capture_group's to the bit, and its packed-u16
    aggregates must equal the same stats computed from the full
    pipeline's ndvi_packed BYTES — proving the skipped alignment step is
    the identity it's documented to be."""
    import numpy as np

    from tiff_enrichment_pipeline_spark import queries as Q
    from tiff_enrichment_pipeline_spark.fixtures import band_rows_from_orders
    from tiff_enrichment_pipeline_spark.raster.udfs import process_captures

    sf = "/root/testdata/sf0.001"
    rel = {
        r["capture_id"]: r
        for r in Q.QUERIES["capture_pipeline_rel"](spark, sf).collect()
    }
    full = {
        r["capture_id"]: r
        for r in process_captures(band_rows_from_orders(spark, sf)).collect()
    }
    assert rel.keys() == full.keys() and len(rel) > 0
    for cap, r in rel.items():
        f = full[cap]
        assert f["status"] == "completed" and r["status"] == "completed"
        assert r["veg_pct"] == f["veg_pct"], cap
        assert r["dense_veg_pct"] == f["dense_veg_pct"], cap
        packed = np.frombuffer(f["ndvi_packed"], dtype=np.uint16)
        assert r["n_px"] == packed.size
        assert r["ndvi_packed_sum"] == int(packed.sum(dtype=np.int64)), cap
        assert r["ndvi_packed_min"] == int(packed.min()), cap
        assert r["ndvi_packed_max"] == int(packed.max()), cap
