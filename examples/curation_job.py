"""spark-submit entry point for the TRAINING-DATA CURATION pipeline:

    zip -qr engine.zip tiff_enrichment_pipeline_spark
    spark-submit --py-files engine.zip examples/curation_job.py \
        <sf_dir> <output_dir>

One DAG over the documents + images tables, composing the engine's
curation operators exactly the way a 100 TB corpus run would:

  documents ── language gate ── quality gate ── exact-dup survivor
            ── MinHash-LSH near-dup survivor (pairs → components → keep)
            ── deterministic train/val/test split ──► curated corpus
  images    ── pHash near-dup keep/drop ── z-order-clustered parquet

Everything is a pure DataFrame transform; the split assignment and the
dedup survivors are deterministic hash arithmetic, so a resumed/retried
run reproduces the identical output (the checkpoint-resume property).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_out"

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = time.time()

    from tiff_enrichment_pipeline_spark.operators.sampling import (
        stratified_split,
    )
    from tiff_enrichment_pipeline_spark.queries import (
        q_corpus_curation,
        q_phash_dedup_clusters,
    )
    from tiff_enrichment_pipeline_spark.sources.images import write_images

    # text corpus: gates + exact-dup + LSH survivors (audit columns kept),
    # then the deterministic split over the kept documents
    curated = q_corpus_curation(spark, sf_dir)
    split = stratified_split(
        curated.filter(F.col("kept")), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    split.write.mode("overwrite").partitionBy("split").parquet(
        f"{out_dir}/corpus"
    )

    # image near-dup keep/drop, joined back to the geo metadata and written
    # z-order-clustered so later bbox reads prune row groups
    from tiff_enrichment_pipeline_spark import geotables

    survivors = q_phash_dedup_clusters(spark, sf_dir).filter(
        F.col("survivor")
    ).select(F.col("node").alias("image_id"))
    images = geotables.images_geo(spark, sf_dir).join(
        F.broadcast(survivors), "image_id", "left_semi"
    )
    write_images(
        images, f"{out_dir}/images", mode="overwrite",
        partition=False, cluster="zorder",
    )

    n_corpus = spark.read.parquet(f"{out_dir}/corpus").count()
    n_images = spark.read.parquet(f"{out_dir}/images").count()
    per_split = {
        r["split"]: r["n"]
        for r in spark.read.parquet(f"{out_dir}/corpus")
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "curated_docs": n_corpus,
                "per_split": per_split,
                "kept_images": n_images,
                "output_dir": out_dir,
                "wall_s": round(time.time() - t0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
