"""Equivalence pins for the r7 Arrow-GEMM ANN ranking paths: the scaled
forms (query-matrix broadcast + per-batch GEMM + partial-top-k merge)
must return exactly what the dim-scale forms return on the driver
embeddings table — same neighbors, same ranks, cosine to 1e-9 (the HOF
pair path and the GEMM path sum in different orders)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tiff_enrichment_pipeline_spark.operators.ann import (
    brute_force_topk,
    brute_force_topk_arrow,
    ivf_probe_pruned,
    ivf_probe_pruned_arrow,
    write_ivf_index,
)

SF = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _keyed(df):
    return {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in df.collect()
    }


def test_brute_force_arrow_equals_broadcast_form(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") % 97 == 0)
    a = _keyed(brute_force_topk(q, emb, k=5))
    b = _keyed(brute_force_topk_arrow(q, emb, k=5))
    assert a.keys() == b.keys() and len(a) > 0
    for key, (nid, cos) in a.items():
        assert b[key][0] == nid, key
        assert abs(b[key][1] - cos) < 1e-9, key


def test_ivf_probe_arrow_equals_hof_form(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 12)
    path = tempfile.mkdtemp(prefix="ivf_arrow_eq_")
    try:
        write_ivf_index(emb, path, n_lists=8)
        a = _keyed(ivf_probe_pruned(q, path, k=5, nprobe=3))
        b = _keyed(ivf_probe_pruned_arrow(q, path, k=5, nprobe=3))
        assert a.keys() == b.keys() and len(a) > 0
        for key, (nid, cos) in a.items():
            assert b[key][0] == nid, key
            assert abs(b[key][1] - cos) < 1e-9, key
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_ivf_probe_arrow_prunes_partitions(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 4)
    path = tempfile.mkdtemp(prefix="ivf_arrow_pf_")
    try:
        write_ivf_index(emb, path, n_lists=8)
        out = ivf_probe_pruned_arrow(q, path, k=3, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        scans = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert scans and any("ivf_list" in l for l in scans), plan[:2000]
    finally:
        shutil.rmtree(path, ignore_errors=True)
