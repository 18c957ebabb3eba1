"""Streaming watcher — Structured Streaming replacement for the reference's
poll-loop daemon.

The reference re-runs the whole batch pipeline every 30 s and relies on
"skip if output exists" for idempotence (src/pipeline/watcher.py:8-19;
overwrite_existing=False, micasense/core/config.py:41). Here:

- source: ``readStream`` over the images directory (file source tracks seen
  files in the checkpoint — the dedup the reference gets from checksums,
  scripts/create-tables.sql:19,253);
- the batch enrichment DAG is REUSED verbatim via ``foreachBatch`` (one code
  path for batch + streaming, SURVEY.md §3.3);
- trigger: ``availableNow`` (drain-and-stop; tests, backfills) or
  ``processingTime='30 seconds'`` (the reference's cadence);
- sink: parquet append + the lineage/metrics tables per micro-batch;
- exactly-once: checkpointed source offsets + idempotent keyed output
  (deterministic surrogate keys — M13).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def watch_images(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    enrich_batch: Callable[[DataFrame, int], DataFrame],
    schema: str,
    trigger_interval: str | None = None,
    sink: str = "append",
    upsert_key: str = "image_id",
) -> StreamingQuery:
    """Start the watcher: stream new image files → enrich → append output.

    ``enrich_batch(df, batch_id)`` is the same function the batch entry
    point uses — passed in so plans/enrich.py stays streaming-agnostic.
    ``trigger_interval=None`` → Trigger.AvailableNow (drain then stop);
    else e.g. '30 seconds' (the reference's poll cadence, watcher.py:11,18).

    ``sink``: ``'append'`` (default — at-least-once, dedup relies on the
    checkpoint never replaying a batch) or ``'upsert'`` — each micro-batch
    MERGEs by ``upsert_key`` (sources/images.upsert_by_key), making the
    sink idempotent under batch REPLAY: a lost checkpoint, a re-run over
    the same input, or foreachBatch's own at-least-once contract all
    converge to the same table instead of duplicating rows — the
    reference's ``overwrite_existing: False`` resume semantics carried to
    streaming (core/config.py:41)."""
    if sink not in ("append", "upsert"):
        raise ValueError(f"sink must be append|upsert, got {sink!r}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def _process(df: DataFrame, batch_id: int) -> None:
        out = enrich_batch(df, batch_id)
        if sink == "upsert":
            from tiff_enrichment_pipeline_spark.sources.images import (
                hadoop_exists,
                upsert_by_key,
            )

            if hadoop_exists(spark, output_dir):
                upsert_by_key(spark, output_dir, out, key=upsert_key)
            else:  # first batch creates the table
                out.write.mode("overwrite").parquet(output_dir)
        else:
            out.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
