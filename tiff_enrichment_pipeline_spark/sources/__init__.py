"""Table IO: Iceberg-first with transparent parquet fallback."""
