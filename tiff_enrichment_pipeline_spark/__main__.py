"""Module CLI — `python -m tiff_enrichment_pipeline_spark <sf_dir> [out]`.

The reference's second entry point (`python -m pipeline.micasense
<input_dir>`, src/pipeline/micasense/__main__.py:48-62: argparse →
load/validate config → process_all → summary JSON). Spark shape: validate
config BEFORE building any plan, run the flagship enrichment DAG once
(batch) or as the streaming watcher (--watch), write enriched + lineage +
metrics tables, print a one-line JSON summary.

Grouping semantics follow main.py's regex classification (P1-P3), not this
entry point's positional-band variant — the documented divergence
(SURVEY §3.2: the reference's two groupings are mutually inconsistent).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tiff_enrichment_pipeline_spark")
    # None defaults so an ABSENT positional never clobbers a --config value
    ap.add_argument("sf_dir", nargs="?", default=None)
    ap.add_argument("output_dir", nargs="?", default=None)
    ap.add_argument(
        "--config", help="JSON file of EnrichConfig overrides", default=None
    )
    ap.add_argument(
        "--watch", action="store_true",
        help="streaming watcher mode (readStream over sf_dir-shaped input)",
    )
    ap.add_argument(
        "--compact", metavar="TABLE", default=None,
        help="compact an image table in place (layout-preserving "
        "small-file rewrite) and exit",
    )
    args = ap.parse_args(argv)

    from tiff_enrichment_pipeline_spark.config import EnrichConfig

    overrides = {}
    if args.config:
        with open(args.config) as f:
            overrides = json.load(f)
    # precedence: explicit positional > config file > dataclass default
    if args.sf_dir is not None:
        overrides["sf_dir"] = args.sf_dir
    if args.output_dir is not None:
        overrides["output_dir"] = args.output_dir
    cfg = EnrichConfig.from_dict(overrides)

    from tiff_enrichment_pipeline_spark import geotables
    from tiff_enrichment_pipeline_spark.fixtures import dem_tiles_df
    from tiff_enrichment_pipeline_spark.operators.lineage import RunRecorder
    from tiff_enrichment_pipeline_spark.plans.enrich import enrich
    from tiff_enrichment_pipeline_spark.session import get_spark

    # the tuned session factory (AQE, Arrow batch, UTC, broadcast
    # threshold); master='inherit' keeps a spark-submit cluster master
    spark = get_spark("tiff-enrichment-cli", master="inherit")
    t0 = time.time()

    if args.compact:
        # maintenance mode: no enrichment inputs needed, skip preflight
        from tiff_enrichment_pipeline_spark.sources.images import (
            compact_images,
        )

        stats = compact_images(spark, args.compact)
        print(
            json.dumps(
                {
                    "mode": "compact",
                    "table": args.compact,
                    **stats,
                    "wall_s": round(time.time() - t0, 2),
                }
            )
        )
        return 0

    from tiff_enrichment_pipeline_spark.health import preflight

    # fail-fast health gate (reference main.py:411-413 / health.py:92-107)
    preflight(spark, cfg.sf_dir, cfg.output_dir)

    landcover = geotables.landcover_polygons(spark)
    stations = geotables.stations(spark, cfg.sf_dir)
    dem = dem_tiles_df(spark)
    obs = (
        geotables.weather_observations(spark, cfg.sf_dir)
        if cfg.use_observations
        else None
    )

    if args.watch:
        from tiff_enrichment_pipeline_spark.streaming.watcher import watch_images

        def enrich_batch(df, batch_id):
            return enrich(
                df, landcover=landcover, stations=stations, dem_tiles=dem,
                observations=obs, res_low=cfg.cell_res_low,
                res_mid=cfg.cell_res_mid, res_high=cfg.cell_res_high,
                knn_res=cfg.knn_res, knn_ring=cfg.knn_ring,
                broadcast_dem=cfg.broadcast_dem, dem_salt=cfg.dem_salt,
                broadcast_obs=cfg.broadcast_obs,
            )

        schema = (
            "image_id long, lon double, lat double, alt double, "
            "captured_at timestamp"
        )
        q = watch_images(
            spark, f"{cfg.sf_dir}/stream_in", f"{cfg.output_dir}/enriched",
            f"{cfg.output_dir}/_checkpoint", enrich_batch, schema=schema,
        )
        q.awaitTermination()
        try:
            n = spark.read.parquet(f"{cfg.output_dir}/enriched").count()
        except Exception:
            n = 0  # drained stream produced zero micro-batches
    else:
        rec = RunRecorder("RUN_CLI")
        images = geotables.images_geo(spark, cfg.sf_dir)
        result = enrich(
            images, landcover=landcover, stations=stations, dem_tiles=dem,
            observations=obs, res_low=cfg.cell_res_low,
            res_mid=cfg.cell_res_mid, res_high=cfg.cell_res_high,
            knn_res=cfg.knn_res, knn_ring=cfg.knn_ring,
            broadcast_dem=cfg.broadcast_dem, dem_salt=cfg.dem_salt,
            broadcast_obs=cfg.broadcast_obs,
        )
        from tiff_enrichment_pipeline_spark.sources.images import (
            read_images,
            write_images,
        )

        # partitioned layout (id-hash bucket + coarse cell) so later reads
        # of the enriched table prune — partition_buckets from config;
        # the weather struct is kept (parquet nests structs fine)
        write_images(
            result, f"{cfg.output_dir}/enriched",
            mode="overwrite", buckets=cfg.partition_buckets,
            cluster=cfg.cluster,
        )
        out = read_images(spark, f"{cfg.output_dir}/enriched")
        lineage, metrics = rec.finish(out)
        lineage.write.mode("overwrite").parquet(f"{cfg.output_dir}/lineage")
        metrics.write.mode("overwrite").parquet(f"{cfg.output_dir}/metrics")
        n = out.count()

    print(
        json.dumps(
            {
                "enriched_rows": n,
                "output_dir": cfg.output_dir,
                "wall_s": round(time.time() - t0, 2),
                "mode": "watch" if args.watch else "batch",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
