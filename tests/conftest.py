from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
# override to re-prove parity at another scale (sf-dependent divergence —
# AQE replans, LSH collision profiles, tie distributions — never shows at
# one sf): SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.001 pytest tests/test_oracle_parity.py
import os as _os

SF_ORACLE = _os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from tiff_enrichment_pipeline_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
