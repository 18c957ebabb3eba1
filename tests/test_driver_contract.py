"""Driver-contract self-checks (VERDICT r2 #10, reshaped per VERDICT r3 #1).

The driver records only the first ``DRIVER_CAP`` registry entries into
CORRECTNESS_r{N}.json. Round 2 pinned the prefix by NAME, which prevented
losing rows but also guaranteed new operators never gained one (the round-3
scoreboard gap). These tests now pin *family coverage*: every SURVEY §2
operator family must keep at least one in-cap representative, while the
prefix itself rotates each round (COVERAGE.md rotation policy) so every
oracle-paired query accumulates a driver-green row within ~2 rounds.
"""

from __future__ import annotations

import importlib

entry_mod = importlib.import_module("__spark_entry__")

from tiff_enrichment_pipeline_spark.queries import DRIVER_CAP, ORACLES, QUERIES

# §2 family -> the queries that can represent it on the scoreboard. At
# least one name per family must sit inside the driver cap; WHICH one may
# rotate round to round.
FAMILIES: dict[str, set[str]] = {
    "flagship_dag": {"enrich_full"},
    "cell_encode": {"cell_encode", "zorder_encode"},
    "cell_neighborhood": {"cell_kring", "cell_crowding", "cell_pyramid"},
    "pip_join": {"pip_landcover", "pip_concave"},
    "knn_join": {"knn_weather"},
    "spatio_temporal_join": {"knn_weather_dated", "asof_weather"},
    "elevation_raster": {"elevation", "elevation_partitioned"},
    "terrain_derivatives": {"terrain"},
    "zonal_stats": {"zonal_elevation"},
    "distance_join": {"haversine_pairs", "within_radius"},
    "range_join": {"range_band"},
    "bbox_filter": {"bbox_filter"},
    "georef_transform": {"georef_transform"},
    "filename_classify": {"filename_classify"},
    "gps_exif_parse": {"dms_parse", "exif_altitude_parse"},
    "generated_columns": {"generated_columns"},
    "capture_assembly": {"capture_assembly"},
    "status_summary_joins": {"status_summary"},
    "time_bucket_agg": {"hourly_api_stats", "daily_stats"},
    "group_stats": {"group_stats"},
    "sorted_group_first": {"first_line_per_order"},
    "histogram": {"value_histogram"},
    "grouping_forms": {"rollup_status", "cube_status", "grouping_sets_status"},
    # grouping-sets is the superset grouping form (pivot = grouping sets +
    # conditional agg), so it may represent the pivot family on the
    # scoreboard after pivot_status earned its own driver row in r4
    "pivot": {"pivot_status", "grouping_sets_status"},
    "top_k": {"topk_recent", "top_shingles"},
    "ranking_window": {"user_session_rank", "rank_trio"},
    "moving_window": {"running_total", "event_gaps", "sliding_1h"},
    "semi_anti_join": {"exists_semijoin", "resume_antijoin"},
    "json_sink": {"to_json_row", "json_extract"},
    "percentiles": {"percentiles_udaf", "percentiles"},
    "exact_dedup": {"dedup_checksum"},
    "text_dedup_chain": {"lsh_dedup_clusters", "dedup_components"},
    "image_dedup_chain": {"phash_dedup_clusters", "phash_neardup"},
    "embedding_dedup_chain": {"embedding_dedup_clusters", "embedding_neardup"},
    "corpus_curation": {"corpus_curation"},
    "text_analysis": {"langid", "quality_score", "simhash"},
    "ann_exact": {"ann_topk"},
    "ann_index_lifecycle": {"ivf_exhaustive", "ivf_ann_pruned"},
    "streaming_window": {"streaming_hourly", "streaming_session"},
    "streaming_join": {"streaming_join"},
    "streaming_upsert": {"streaming_upsert_eq"},
    "write_clustering": {"zorder_encode", "hilbert_encode"},
    "sampling_splits": {"train_split", "stratified_sample"},
    "incremental_dedup": {"incremental_dedup"},
    "raster_pipeline": {"capture_pipeline", "capture_pipeline_rel"},
    "integrity_scan": {"image_integrity", "image_integrity_rel"},
    "decode_quarantine": {"decode_quarantine"},
    "multimodal": {"multimodal_features", "multimodal_features_rel"},
}

# in-cap entries allowed to have no oracle (pixel ops are not
# SQL-expressible; values golden-pinned in pytest instead)
ROWS_ONLY_IN_CAP = set()  # r6: capture_pipeline_rel closed the last one


def test_every_family_has_an_in_cap_representative():
    prefix = set(list(entry_mod.queries())[:DRIVER_CAP])
    uncovered = {
        fam: names for fam, names in FAMILIES.items() if not names & prefix
    }
    assert not uncovered, f"§2 families with no driver row: {uncovered}"


def test_family_table_is_consistent_with_registry():
    """Every family representative must actually be a registered query (a
    rename would silently hollow out the coverage assertion)."""
    all_names = set(QUERIES)
    ghosts = {
        fam: names - all_names
        for fam, names in FAMILIES.items()
        if names - all_names
    }
    assert not ghosts, f"family table names not in the registry: {ghosts}"


def test_in_cap_prefix_is_oracle_paired():
    prefix = list(entry_mod.queries())[:DRIVER_CAP]
    oracles = entry_mod.oracle_sql()
    unpaired = [n for n in prefix if n not in oracles and n not in ROWS_ONLY_IN_CAP]
    assert not unpaired, f"in-cap queries without an oracle: {unpaired}"


def test_entry_registry_matches_module_registry():
    assert list(entry_mod.queries()) == list(QUERIES)
    assert entry_mod.oracle_sql() == ORACLES


def test_demoted_entries_stay_registered_and_paired():
    """Past-cap entries are rotation candidates or redundant VARIANTS, not
    dropped coverage: they stay registered (pytest parity re-proves the
    oracle-paired ones every run via tests/test_oracle_parity.py)."""
    names = list(QUERIES)
    past_cap = names[DRIVER_CAP:]
    # the no-oracle-by-design set is the only allowed unpaired tail
    assert {n for n in past_cap if n not in ORACLES} <= {
        "percentiles_approx", "distinct_sketch", "lsh_ann", "ivf_ann",
        "ivf_ann_pruned", "image_integrity", "multimodal_features",
        "capture_pipeline",
    }
