"""End-to-end job DAG builders (batch + streaming share these)."""
