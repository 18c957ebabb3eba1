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

# one BLAS thread per Python worker: N workers × M BLAS threads thrashes
# (workers inherit the driver env in local mode)
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


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


def _median(xs: list[float]) -> float:
    import statistics

    return statistics.median(xs)


def run_default() -> None:
    """Headline bench. Per VERDICT r3 #4 the recorded per-query number is
    the MEDIAN of 3 cold runs (each run re-builds the DataFrame, so the
    plan/broadcast work re-executes; session-level warmth — JVM JIT,
    Python workers — persists, as it did for prior rounds' single cold
    runs, keeping the series comparable). min/max accompany it so a
    co-tenant noise spike is visible in the driver file itself instead of
    needing BENCH.md footnotes."""
    from tiff_enrichment_pipeline_spark.queries import QUERIES

    spark = build_session(CPUS)
    n_images = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()

    headline = [
        "cell_encode", "pip_landcover", "knn_weather", "knn_weather_dated",
        "elevation", "status_summary", "hourly_api_stats", "capture_assembly",
        "dedup_checksum", "percentiles",
        # round-3 breadth: the dedup/multimodal stack gets the same
        # regression guard the geo stack has (VERDICT r2 #8)
        "lsh_dedup_clusters", "phash_neardup", "multimodal_features",
        # round-3 batch 9: terrain derivatives (UDF-heavy raster path)
        "terrain",
        # round-4 breadth: radius join, zonal stats, stratified sampling
        "within_radius", "zonal_elevation", "stratified_sample",
    ]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    times: dict[str, float] = {}
    tmin: dict[str, float] = {}
    tmax: dict[str, float] = {}
    steady: dict[str, float] = {}

    # steady-state flagship throughput: build plan once, warm up (JIT,
    # Python workers, broadcasts), then median-of-reps timed runs
    flag_df = flagship(spark, SF_DIR)
    _noop_write(flag_df)
    flag_runs = []
    for _ in range(reps):
        t0 = time.time()
        _noop_write(flag_df)
        flag_runs.append(time.time() - t0)
    t_flag = _median(flag_runs)
    times["enrich_flagship"] = steady["enrich_flagship"] = round(t_flag, 3)
    tmin["enrich_flagship"] = round(min(flag_runs), 3)
    tmax["enrich_flagship"] = round(max(flag_runs), 3)

    for name in headline:
        cold_runs = []
        df = None
        for _ in range(reps):
            df = QUERIES[name](spark, SF_DIR)  # fresh plan → cold run
            t0 = time.time()
            _noop_write(df)
            cold_runs.append(time.time() - t0)
        times[name] = round(_median(cold_runs), 3)
        tmin[name] = round(min(cold_runs), 3)
        tmax[name] = round(max(cold_runs), 3)
        # steady state: re-execute the last (already-run) plan
        t0 = time.time()
        _noop_write(df)
        steady[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "reps": reps,
                "queries": times,
                "queries_min": tmin,
                "queries_max": tmax,
                "steady_total": round(sum(steady.values()), 3),
                "queries_steady": steady,
                "sf": SF_DIR,
                "n_images": n_images,
                "throughput_img_per_sec": round(n_images / t_flag, 1),
            }
        )
    )
    spark.stop()


def _scaled_flagship(spark, sf_dir: str, mult: int):
    """Flagship DAG over the probe replicated ×mult (distinct image ids) —
    the scaling run needs enough work per core that fixed overhead (Python
    workers, planning) doesn't dominate a 3-second job."""
    from pyspark.sql import functions as F

    from tiff_enrichment_pipeline_spark import geotables
    from tiff_enrichment_pipeline_spark.fixtures import dem_tiles_df
    from tiff_enrichment_pipeline_spark.plans.enrich import enrich

    images = geotables.images_geo(spark, sf_dir)
    if mult > 1:
        images = (
            images.withColumn(
                "_r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            )
            .withColumn("image_id", F.col("image_id") * mult + F.col("_r"))
            .drop("_r")
        )
    return enrich(
        images,
        landcover=geotables.landcover_polygons(spark),
        stations=geotables.stations(spark, sf_dir),
        dem_tiles=dem_tiles_df(spark),
    )


def _scaled_pip_only(spark, sf_dir: str, mult: int):
    """JVM-only enrichment slice (cells + PIP, no Python boundary) — the
    second scaling datapoint separating the engine's relational core from
    the fixed Arrow-crossing cost."""
    from pyspark.sql import functions as F

    from tiff_enrichment_pipeline_spark import geotables, grid
    from tiff_enrichment_pipeline_spark.operators.pip_join import landcover_pip_join

    images = geotables.images_geo(spark, sf_dir)
    if mult > 1:
        images = (
            images.withColumn(
                "_r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            )
            .withColumn("image_id", F.col("image_id") * mult + F.col("_r"))
            .drop("_r")
        )
    cells = images.withColumn(
        "cell_r7", grid.cell_of(F.col("lon"), F.col("lat"), grid.RES7)
    ).withColumn("cell_r9", grid.cell_of(F.col("lon"), F.col("lat"), grid.RES9))
    return landcover_pip_join(cells, geotables.landcover_polygons(spark), res=grid.RES8)


def run_scaling_worker(cores: str, mult: int, reps: int = 3) -> None:
    """One pinned measurement (invoked under ``taskset -c 0-{cores-1}``):
    plan once, warm up, time ``reps`` runs, print best wall sec."""
    spark = build_session(cores)
    n_images = spark.read.parquet(f"{SF_DIR}/orders.parquet").count() * mult
    job = os.environ.get("SPARK_GRAFT_SCALE_JOB", "flagship")
    build = _scaled_pip_only if job == "pip" else _scaled_flagship
    df = build(spark, SF_DIR, mult)
    _noop_write(df)  # warm-up: JIT, Python workers, broadcasts
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _noop_write(df)
        best = min(best, time.time() - t0)
    print(json.dumps({"cores": cores, "sec": round(best, 3), "n_images": n_images}))
    spark.stop()


def run_scaling() -> None:
    """Two-cluster-size evidence (BASELINE.json north rule): the identical
    job at 8 vs 32 cores. ``local[N]`` bounds only JVM task slots — pandas-
    UDF workers are extra OS processes — so each measurement is pinned with
    ``taskset`` to a true N-core machine, like real cluster containers."""
    import subprocess

    mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "320"))
    lo = os.environ.get("SPARK_GRAFT_SCALE_LO", "8")
    hi = os.environ.get("SPARK_GRAFT_SCALE_HI", "32")
    results = {}
    n_images = None
    for cores in (lo, hi):
        cmd = [
            "taskset", "-c", f"0-{int(cores) - 1}",
            sys.executable, __file__, "--scaling-worker", cores, str(mult),
        ]
        # the low-core arm at mult=320 runs ~400 s of measured work alone;
        # under co-tenant load 560 s was killing it silently
        proc = subprocess.run(
            cmd, capture_output=True, text=True,
            timeout=int(os.environ.get("SPARK_GRAFT_SCALE_TIMEOUT", "900")),
        )
        lines = proc.stdout.strip().splitlines()
        if proc.returncode != 0 or not lines:
            raise RuntimeError(
                f"scaling worker ({cores} cores) failed rc={proc.returncode}: "
                f"{proc.stderr.strip()[-500:]}"
            )
        r = json.loads(lines[-1])
        n_images = r["n_images"]
        results[cores] = {
            "sec": r["sec"],
            "img_per_sec": round(n_images / r["sec"], 1),
        }
    ratio = int(hi) / int(lo)
    eff = results[hi]["img_per_sec"] / (ratio * results[lo]["img_per_sec"])
    out = {
        "metric": f"scaling_efficiency_{lo}_to_{hi}_cores",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": SF_DIR,
        "n_images": n_images,
        f"local{lo}": results[lo],
        f"local{hi}": results[hi],
    }
    job = os.environ.get("SPARK_GRAFT_SCALE_JOB", "flagship")
    out["job"] = job
    print(json.dumps(out))
    with open(REPO / "BENCH.md", "a") as f:
        f.write(
            f"\n## Scaling run — {job} ({time.strftime('%Y-%m-%d %H:%M:%S')}, {SF_DIR}, "
            f"{n_images} images)\n\n"
            f"| cores | wall sec | img/s |\n|---|---|---|\n"
            f"| local[{lo}] (taskset {lo} cores) | {results[lo]['sec']} | {results[lo]['img_per_sec']} |\n"
            f"| local[{hi}] (taskset {hi} cores) | {results[hi]['sec']} | {results[hi]['img_per_sec']} |\n\n"
            f"Scaling efficiency ({lo}->{hi} cores, throughput/{ratio:.0f}x): **{eff:.3f}**\n"
        )


def _skew_images(spark, sf_dir: str, mult: int, shape: str):
    """Image table for the skew stress: ``uniform`` = the normal fixture;
    ``hot`` = HALF of all images forced onto ONE exact point (one res-8/9
    cell) — the worst-case urban pileup SURVEY §7.3 names, far beyond the
    fixture's ~20%-in-a-few-cells cluster."""
    from pyspark.sql import functions as F

    from tiff_enrichment_pipeline_spark import geotables

    images = geotables.images_geo(spark, sf_dir)
    if mult > 1:
        images = (
            images.withColumn(
                "_r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            )
            .withColumn("image_id", F.col("image_id") * mult + F.col("_r"))
            .drop("_r")
        )
    if shape == "hot":
        hot = F.col("image_id") % 2 == 0
        images = images.withColumn(
            "lon", F.when(hot, F.lit(geotables.HOT_LON)).otherwise(F.col("lon"))
        ).withColumn(
            "lat", F.when(hot, F.lit(geotables.HOT_LAT)).otherwise(F.col("lat"))
        )
    return images


def run_skew_worker(cores: str, mult: int, shape: str, reps: int = 3) -> None:
    """One pinned skew measurement: flagship + per-cell aggregation over
    the (possibly hot-cell-skewed) image table; best-of-reps each."""
    from pyspark.sql import functions as F

    from tiff_enrichment_pipeline_spark import geotables, grid
    from tiff_enrichment_pipeline_spark.fixtures import dem_tiles_df
    from tiff_enrichment_pipeline_spark.plans.enrich import enrich

    spark = build_session(cores)
    images = _skew_images(spark, SF_DIR, mult, shape)
    n_images = spark.read.parquet(f"{SF_DIR}/orders.parquet").count() * mult
    jobs = {
        "flagship": enrich(
            images,
            landcover=geotables.landcover_polygons(spark),
            stations=geotables.stations(spark, SF_DIR),
            dem_tiles=dem_tiles_df(spark),
        ),
        # the shuffle-bearing aggregation shape: groupBy CELL — the one
        # key geography reaches; partial (map-side) aggregation is the
        # defense under test
        "cell_agg": images.groupBy(
            grid.cell_of(F.col("lon"), F.col("lat"), grid.RES8).alias("cell")
        ).agg(
            F.count("*").alias("n"),
            F.avg("alt").alias("avg_alt"),
            F.min("lat").alias("mn"),
            F.max("lat").alias("mx"),
        ),
    }
    out = {"shape": shape, "cores": cores, "n_images": n_images}
    for name, df in jobs.items():
        _noop_write(df)  # warm-up
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            _noop_write(df)
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    print(json.dumps(out))
    spark.stop()


def run_skew() -> None:
    """Hot-cell skew stress evidence (VERDICT r3 #6): the same jobs at the
    same pinned core count on a uniform vs a 50%-in-one-cell input; the
    claim under test is that geography never reaches a shuffle key
    (flagship: broadcast joins only) or is absorbed map-side (cell_agg:
    partial aggregation), so hot-input throughput stays within ~1.3× of
    uniform. (capture_assembly is structurally immune — its shuffle key is
    capture_id, a uniform surrogate; its input carries no geography — so
    it is not an arm here.)"""
    import subprocess

    mult = int(os.environ.get("SPARK_GRAFT_SKEW_MULT", "64"))
    cores = os.environ.get("SPARK_GRAFT_SKEW_CORES", "8")
    results = {}
    for shape in ("uniform", "hot"):
        cmd = [
            "taskset", "-c", f"0-{int(cores) - 1}",
            sys.executable, __file__, "--skew-worker", cores, str(mult), shape,
        ]
        proc = subprocess.run(
            cmd, capture_output=True, text=True,
            timeout=int(os.environ.get("SPARK_GRAFT_SCALE_TIMEOUT", "900")),
        )
        lines = proc.stdout.strip().splitlines()
        if proc.returncode != 0 or not lines:
            raise RuntimeError(
                f"skew worker ({shape}) failed rc={proc.returncode}: "
                f"{proc.stderr.strip()[-500:]}"
            )
        results[shape] = json.loads(lines[-1])
    rec = {
        "metric": f"hot_cell_skew_slowdown_{cores}_cores",
        "unit": "ratio (hot/uniform wall time; 1.0 = skew-immune)",
        "sf": SF_DIR,
        "n_images": results["uniform"]["n_images"],
        "uniform": results["uniform"],
        "hot": results["hot"],
    }
    for job in ("flagship", "cell_agg"):
        rec[f"{job}_slowdown"] = round(
            results["hot"][job] / results["uniform"][job], 3
        )
    print(json.dumps(rec))
    with open(REPO / "BENCH.md", "a") as f:
        f.write(
            f"\n## Hot-cell skew stress ({time.strftime('%Y-%m-%d %H:%M:%S')}, "
            f"{SF_DIR}, {rec['n_images']} images, taskset {cores} cores, "
            f"50% of images on ONE point)\n\n"
            f"| job | uniform sec | hot sec | slowdown (hot/uniform) |\n|---|---|---|---|\n"
            + "".join(
                f"| {job} | {results['uniform'][job]} | {results['hot'][job]} "
                f"| {rec[f'{job}_slowdown']} |\n"
                for job in ("flagship", "cell_agg")
            )
            + "\ncapture_assembly is structurally immune (shuffle key = "
            "capture_id, a uniform surrogate; no geography in its input) "
            "and is therefore not an arm.\n"
        )


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        i = sys.argv.index("--scaling-worker")
        run_scaling_worker(sys.argv[i + 1], int(sys.argv[i + 2]))
    elif "--scaling" in sys.argv:
        run_scaling()
    elif "--skew-worker" in sys.argv:
        i = sys.argv.index("--skew-worker")
        run_skew_worker(sys.argv[i + 1], int(sys.argv[i + 2]), sys.argv[i + 3])
    elif "--skew" in sys.argv:
        run_skew()
    else:
        run_default()
