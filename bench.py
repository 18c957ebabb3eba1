#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "throughput_img_per_sec": ...}

--scaling: runs the identical flagship enrichment job at local[8] and
local[32] on the same input and reports both throughputs + scaling
efficiency (the BASELINE.json two-cluster-size criterion, evidenced via two
parallelism levels per the sandbox rule), appending results to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _noop_write(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def build_session(cores: str):
    from tiff_enrichment_pipeline_spark.session import get_spark

    return get_spark(f"bench-local-{cores}", master=f"local[{cores}]")


def flagship(spark, sf_dir: str):
    from tiff_enrichment_pipeline_spark import geotables
    from tiff_enrichment_pipeline_spark.fixtures import dem_tiles_df
    from tiff_enrichment_pipeline_spark.plans.enrich import enrich

    images = geotables.images_geo(spark, sf_dir)
    return enrich(
        images,
        landcover=geotables.landcover_polygons(spark),
        stations=geotables.stations(spark, sf_dir),
        dem_tiles=dem_tiles_df(spark),
    )


def run_default() -> None:
    from tiff_enrichment_pipeline_spark.queries import QUERIES

    spark = build_session(CPUS)
    n_images = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()

    headline = [
        "cell_encode", "pip_landcover", "knn_weather", "elevation",
        "status_summary", "hourly_api_stats", "capture_assembly",
        "dedup_checksum", "percentiles",
    ]
    times: dict[str, float] = {}

    t0 = time.time()
    _noop_write(flagship(spark, SF_DIR))
    t_flag = time.time() - t0
    times["enrich_flagship"] = round(t_flag, 3)

    for name in headline:
        t0 = time.time()
        _noop_write(QUERIES[name](spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR,
                "n_images": n_images,
                "throughput_img_per_sec": round(n_images / t_flag, 1),
            }
        )
    )
    spark.stop()


def run_scaling() -> None:
    results = {}
    n_images = None
    for cores in ("8", "32"):
        spark = build_session(cores)
        if n_images is None:
            n_images = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
        # warm-up (JIT, file listing) then timed run
        _noop_write(flagship(spark, SF_DIR))
        t0 = time.time()
        _noop_write(flagship(spark, SF_DIR))
        dt = time.time() - t0
        results[cores] = {
            "sec": round(dt, 3),
            "img_per_sec": round(n_images / dt, 1),
        }
        spark.stop()
    eff = results["32"]["img_per_sec"] / (4.0 * results["8"]["img_per_sec"])
    out = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": SF_DIR,
        "n_images": n_images,
        "local8": results["8"],
        "local32": results["32"],
    }
    print(json.dumps(out))
    with open(REPO / "BENCH.md", "a") as f:
        f.write(
            f"\n## Scaling run ({time.strftime('%Y-%m-%d %H:%M:%S')}, {SF_DIR}, "
            f"{n_images} images)\n\n"
            f"| cores | wall sec | img/s |\n|---|---|---|\n"
            f"| local[8] | {results['8']['sec']} | {results['8']['img_per_sec']} |\n"
            f"| local[32] | {results['32']['sec']} | {results['32']['img_per_sec']} |\n\n"
            f"Scaling efficiency (8→32 cores, throughput/4×): **{eff:.3f}**\n"
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        run_default()
