"""Submit-time config validation (SURVEY §1.1; reference
core/config.py:16-152, core/validation.py:294-368). Pure-Python — no
SparkSession."""

from __future__ import annotations

import pytest

from tiff_enrichment_pipeline_spark.config import ConfigError, EnrichConfig


def test_defaults_are_valid():
    cfg = EnrichConfig().validate()
    assert cfg.knn_k == 3 and cfg.cell_res_mid == 8


def test_invalid_values_all_reported_at_once():
    with pytest.raises(ConfigError) as e:
        EnrichConfig(cell_res_low=99, knn_k=0, sf_dir="").validate()
    msg = str(e.value)
    # every violation listed, not just the first
    assert "cell_res_low=99" in msg
    assert "knn_k=0" in msg
    assert "sf_dir=''" in msg


def test_resolution_ordering_enforced():
    with pytest.raises(ConfigError, match="ordered"):
        EnrichConfig(cell_res_low=9, cell_res_mid=8, cell_res_high=7).validate()


def test_from_dict_rejects_unknown_keys():
    with pytest.raises(ConfigError, match="unknown config keys: knn_kk"):
        EnrichConfig.from_dict({"knn_kk": 3})


def test_from_dict_roundtrip():
    cfg = EnrichConfig.from_dict({"knn_k": 5, "broadcast_dem": False})
    assert cfg.knn_k == 5 and cfg.broadcast_dem is False


def test_wrong_types_rejected():
    with pytest.raises(ConfigError, match="broadcast_dem"):
        EnrichConfig(broadcast_dem="yes").validate()
    with pytest.raises(ConfigError, match="dem_salt"):
        EnrichConfig(dem_salt=0).validate()
