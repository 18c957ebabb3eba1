"""Driver-contract self-checks (VERDICT r2 #10).

The driver records only the first ``DRIVER_CAP`` registry entries into
CORRECTNESS_r{N}.json. These tests pin the prefix so future query additions
cannot silently push a load-bearing oracle row off the scoreboard again
(round 2 lost `enrich_full` — the flagship end-to-end oracle — that way).
"""

from __future__ import annotations

import importlib

entry_mod = importlib.import_module("__spark_entry__")

from tiff_enrichment_pipeline_spark.queries import DRIVER_CAP, ORACLES, QUERIES

# every §2 operator family must have a recorded row; these names are the
# family representatives that MUST sit inside the driver cap
REQUIRED_IN_CAP = {
    # flagship + geo/spatial
    "enrich_full", "cell_encode", "pip_landcover", "pip_concave",
    "knn_weather", "knn_weather_dated", "asof_weather", "elevation",
    "elevation_partitioned", "cell_kring", "cell_crowding", "bbox_filter",
    "haversine_pairs", "georef_transform",
    # parsing / generated
    "filename_classify", "dms_parse", "exif_altitude_parse",
    "generated_columns",
    # joins / aggs / windows / sets
    "capture_assembly", "status_summary", "hourly_api_stats", "group_stats",
    "first_line_per_order", "value_histogram", "rollup_status",
    "topk_recent", "user_session_rank", "running_total", "event_gaps",
    "exists_semijoin", "resume_antijoin", "union_glob", "to_json_row",
    "percentiles_udaf",
    # dedup / text / ANN
    "dedup_checksum", "simhash", "dedup_components", "lsh_dedup_clusters",
    "corpus_curation", "langid", "quality_score", "phash_neardup",
    "ann_topk", "ivf_ann_pruned",
    # streaming
    "streaming_hourly", "streaming_session", "streaming_join",
    # raster lifecycle (rows-only by design)
    "capture_pipeline", "image_integrity", "multimodal_features",
}

# in-cap entries allowed to have no oracle (golden-pinned in pytest instead)
ROWS_ONLY_IN_CAP = {
    "ivf_ann_pruned", "capture_pipeline", "image_integrity",
    "multimodal_features",
}


def test_required_queries_inside_driver_cap():
    prefix = list(entry_mod.queries())[:DRIVER_CAP]
    missing = REQUIRED_IN_CAP - set(prefix)
    assert not missing, f"load-bearing queries pushed past the driver cap: {missing}"


def test_in_cap_prefix_is_oracle_paired():
    prefix = list(entry_mod.queries())[:DRIVER_CAP]
    oracles = entry_mod.oracle_sql()
    unpaired = [n for n in prefix if n not in oracles and n not in ROWS_ONLY_IN_CAP]
    assert not unpaired, f"in-cap queries without an oracle: {unpaired}"


def test_entry_registry_matches_module_registry():
    assert list(entry_mod.queries()) == list(QUERIES)
    assert entry_mod.oracle_sql() == ORACLES


def test_demoted_entries_stay_registered_and_paired():
    """Past-cap entries are redundant VARIANTS, not dropped coverage: they
    stay registered (pytest parity re-proves the oracle-paired ones every
    run via tests/test_oracle_parity.py)."""
    names = list(QUERIES)
    past_cap = names[DRIVER_CAP:]
    # the no-oracle-by-design trio is the only allowed unpaired tail
    assert {n for n in past_cap if n not in ORACLES} <= {
        "percentiles_approx", "distinct_sketch", "lsh_ann", "ivf_ann",
    }
