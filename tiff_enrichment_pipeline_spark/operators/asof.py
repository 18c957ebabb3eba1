"""Distributed as-of join: latest build row at-or-before each probe time.

The temporal companion to the kNN spatial join: enrich each image with the
most recent weather observation ≤ its capture date when observations are
SPARSE (the dense-daily case is a plain equi-join —
knn_join.nearest_station_dated). Naive formulations explode:
``probe ⋈ obs ON station AND obs_date <= d`` then rank materializes
|probe| × |obs-per-station| intermediate rows before pruning to 1.

This implementation is the sort-based shape that scales:

1. UNION the two sides with a marker (build rows carry values, probe rows
   carry NULLs);
2. ONE shuffle by the equi-key (station_id — uniform, skew-free), sort by
   (time, marker) within partitions;
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding running
   window forward-fills each probe row with the nearest earlier build row;
4. filter the probe rows back out.

Cost: one shuffle + one sort of |probe|+|build| rows — never a row-count
blow-up, regardless of how many build rows precede a probe. Ties (build
and probe at the same instant) resolve build-first, i.e. at-or-BEFORE
semantics, matching SQL ``ASOF JOIN ... ON probe.t >= build.t``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_time: str,
    build_time: str,
    value_cols: list[str],
) -> DataFrame:
    """probe + (asof_<build_time>, value_cols…) from the latest build row
    with ``build_time <= probe_time`` per ``on`` key. Left-join semantics:
    probes with no earlier build row keep NULLs."""
    b = build.select(
        F.col(on),
        F.col(build_time).alias("_t"),
        F.lit(0).alias("_is_probe"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(t).alias(f"_p_{c}")
          for c, t in probe.dtypes if c != on],
    )
    p = probe.select(
        F.col(on),
        F.col(probe_time).cast(dict(build.dtypes)[build_time]).alias("_t"),
        F.lit(1).alias("_is_probe"),
        *[F.lit(None).cast(dict(build.dtypes)[c]).alias(c) for c in value_cols],
        *[F.col(c).alias(f"_p_{c}") for c in probe.columns if c != on],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc("_t"), F.asc("_is_probe"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = p.unionByName(b).select(
        on,
        "_t",
        "_is_probe",
        *[F.col(f"_p_{c}") for c in probe.columns if c != on],
        F.last(F.when(F.col("_is_probe") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias(f"asof_{build_time}"),
        *[
            F.last(
                F.when(F.col("_is_probe") == 0, F.col(c)), ignorenulls=True
            )
            .over(w)
            .alias(c)
            for c in value_cols
        ],
    )
    return (
        filled.filter(F.col("_is_probe") == 1)
        .select(
            on,
            *[
                F.col(f"_p_{c}").alias(c)
                for c in probe.columns
                if c != on
            ],
            f"asof_{build_time}",
            *value_cols,
        )
    )
