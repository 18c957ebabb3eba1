"""Per-partition lineage + metrics + checkpoint-resume.

Re-creates the reference's catalog bookkeeping as engine tables:

- lineage   ← pipeline.processing_runs (status, timings, checksums,
              retry_count; reference: scripts/create-tables.sql:14-63)
- metrics   ← monitoring.system_metrics + the Prometheus counters
              pipeline_processing_duration_seconds /
              pipeline_processed_files_total / pipeline_errors_total
              (create-tables.sql:182-192; monitoring/grafana/dashboards/
              pipeline.json:69,164,354)
- resume    ← overwrite_existing=False + the checksum unique index
              (micasense/core/config.py:41; create-tables.sql:19,253)
              realized as a left-anti join against already-processed keys.

Keys are deterministic sha2 surrogates (NOT uuid_generate_v4,
create-tables.sql:15/init-db.sql:77) so re-runs produce identical row
identity — the property that makes MERGE/anti-join resume safe (M13).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METRIC_DURATION = "pipeline_processing_duration_seconds"
METRIC_PROCESSED = "pipeline_processed_files_total"
METRIC_ERRORS = "pipeline_errors_total"


def surrogate_key(*cols) -> F.Column:
    """Deterministic sha2 surrogate key (resume-idempotent uuid replacement)."""
    return F.sha2(F.concat_ws(":", *cols), 256)


def partition_lineage(df: DataFrame, run_id: str, key_col: str = "image_id") -> DataFrame:
    """Per-partition lineage rows: (run_id, partition_id, rows, key_checksum).

    key_checksum is an order-insensitive sum of 32-bit key hashes — two runs
    that produced the same partition contents agree, a reordered/partial one
    doesn't (the engine twin of input_file_checksum,
    create-tables.sql:19)."""
    return (
        df.select(
            F.spark_partition_id().alias("partition_id"),
            F.col(key_col).cast("string").alias("_k"),
        )
        .withColumn(
            "_h", F.conv(F.substring(F.md5(F.col("_k")), 1, 8), 16, 10).cast("long")
        )
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("rows_out"),
            F.sum("_h").alias("key_checksum"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            "rows_out",
            "key_checksum",
            F.current_timestamp().alias("recorded_at"),
        )
    )


def run_metrics(
    run_id: str,
    n_processed: int,
    n_errors: int,
    wall_seconds: float,
    spark=None,
) -> DataFrame:
    """Metrics table rows with the reference's metric names."""
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    rows = [
        (run_id, METRIC_DURATION, float(wall_seconds), "seconds"),
        (run_id, METRIC_PROCESSED, float(n_processed), "files"),
        (run_id, METRIC_ERRORS, float(n_errors), "errors"),
    ]
    return spark.createDataFrame(
        rows, "run_id string, metric_name string, metric_value double, unit string"
    ).withColumn("recorded_at", F.current_timestamp())


def resume_filter(
    images: DataFrame, processed: DataFrame | None, key_col: str = "image_id"
) -> DataFrame:
    """Checkpoint-resume: drop rows whose key already appears in the
    processed table (left-anti join — SURVEY.md §4 'incremental/skip-done').
    AQE broadcasts the processed-key side when small; at scale both sides
    hash-shuffle on the uniformly distributed key (no skew)."""
    if processed is None:
        return images
    keys = processed.select(F.col(key_col)).distinct()
    return images.join(keys, key_col, "left_anti")


class RunRecorder:
    """Tiny helper: time a run, emit lineage + metrics DataFrames."""

    def __init__(self, run_id: str):
        self.run_id = run_id
        self._t0 = time.time()

    def finish(self, output: DataFrame, n_errors: int = 0, key_col: str = "image_id"):
        lineage = partition_lineage(output, self.run_id, key_col)
        n = output.count()
        metrics = run_metrics(
            self.run_id, n, n_errors, time.time() - self._t0,
            spark=output.sparkSession,
        )
        return lineage, metrics
