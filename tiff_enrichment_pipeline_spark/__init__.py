"""tiff_enrichment_pipeline_spark — a from-scratch PySpark-native
spatial-join + tiling engine with the query/data-processing capabilities of
casper-aurai/tiff-enrichment-pipeline (reference read-only at /root/reference).

Architecture (NOT a port — see SURVEY.md):

- One pure-Python package shipped via ``spark-submit --py-files``.
- DataFrame API + Catalyst built-ins everywhere; Arrow-vectorized pandas UDFs
  only where pixel math or cell geometry force them (no per-row Python).
- Spatial index = deterministic hierarchical quad-cell grid (``grid.py``)
  replacing the reference's PostGIS GIST index
  (reference: scripts/create-tables.sql:257).
- Enrichment (elevation / weather / land-cover — reference schema
  scripts/create-tables.sql:118-161) realized as broadcast point-in-polygon,
  k-nearest-neighbour and raster<->vector tile joins against local lookup
  tables; no external APIs, no PostGIS, no Redis.
"""

__version__ = "0.1.0"

from tiff_enrichment_pipeline_spark.session import get_spark  # noqa: F401
