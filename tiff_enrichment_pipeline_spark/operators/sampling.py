"""Deterministic sampling / dataset splitting for training-data pipelines.

A 100 TB curation run needs samples and train/val/test splits that are:

- **deterministic across retries and resumes** — a failed stage re-executes
  and MUST land every row in the same split (Spark's ``sample()`` /
  ``randomSplit()`` are seed-stable only for identical partitioning, which
  a resume does not guarantee);
- **engine-portable** — the assignment must be recomputable outside Spark
  (the md5-prefix hash has a DuckDB twin, so every split is
  oracle-checkable; Spark's murmur ``hash()`` is not portable);
- **shuffle-free** — assignment is a pure projection over the key column.

Pattern: ``bucket = md5_prefix_long(key) % 10_000`` (uniform by md5's
avalanche), then threshold for sampling or cumulative ranges for weighted
splits — the standard hash-mod split used by large-scale data pipelines,
expressed as a Catalyst column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiff_enrichment_pipeline_spark.functions.text import (
    md5_prefix_long,
    md5_prefix_long_sql,
)

_BUCKETS = 10_000


def sample_bucket(key: Column) -> Column:
    """Uniform bucket in [0, 10000) from the row key (string-cast first so
    numeric and string keys hash identically to the SQL twin)."""
    return md5_prefix_long(key.cast("string")) % _BUCKETS


def sample_bucket_sql(key_expr: str) -> str:
    return f"({md5_prefix_long_sql(f'CAST({key_expr} AS VARCHAR)')} % {_BUCKETS})"


def deterministic_sample(
    df: DataFrame, key: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — stable across
    retries, resumes, and engines. A pure filter: no shuffle, no RNG."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction={fraction} must be in [0, 1]")
    return df.filter(sample_bucket(F.col(key)) < int(round(fraction * _BUCKETS)))


def split_column(key: Column, weights: dict[str, float]) -> Column:
    """Label each row with its split name by cumulative hash-bucket ranges.

    ``weights`` maps split name → fraction; fractions must sum to 1 (±1e-9).
    Iteration order defines the ranges, so pass an ordered dict — e.g.
    ``{"train": 0.8, "val": 0.1, "test": 0.1}`` → buckets [0,8000),
    [8000,9000), [9000,10000).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = sample_bucket(key)
    expr = None
    names = list(weights)
    hi = 0
    # the LAST split is an unconditional otherwise/ELSE: cumulative
    # int(round(w*10000)) ranges can top out below 10000 for weights that
    # legitimately pass the sum==1 check (e.g. three 1/3 shares → 9999),
    # and a conditional last range would leave the top buckets NULL —
    # silently dropped by a partitionBy(split) write
    for name in names[:-1]:
        hi += int(round(weights[name] * _BUCKETS))
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def split_column_sql(key_expr: str, weights: dict[str, float]) -> str:
    b = sample_bucket_sql(key_expr)
    names = list(weights)
    cases, hi = [], 0
    for name in names[:-1]:
        hi += int(round(weights[name] * _BUCKETS))
        cases.append(f"WHEN {b} < {hi} THEN '{name}'")
    if not cases:
        return f"'{names[-1]}'"
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


def stratified_split(
    df: DataFrame, key: str, weights: dict[str, float], label: str = "split"
) -> DataFrame:
    """df + a ``split`` column (train/val/test style). Deterministic,
    shuffle-free; per-stratum proportions hold by hash uniformity when the
    key is unique per row."""
    return df.withColumn(label, split_column(F.col(key), weights))


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the class-REBALANCING operation
    (keep 100% of rare languages, 10% of English; keep all positives,
    downsample negatives). Row keep/drop is ``hash(key) bucket <
    fraction[stratum] threshold``: a pure projection+filter, no shuffle, no
    RNG — so a retried/resumed stage keeps exactly the same rows, and the
    choice is recomputable in any engine with md5 (oracle-checkable).
    Strata missing from ``fractions`` get ``default_fraction`` (0.0 =
    drop — the allowlist curation default)."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} = {f} not in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction={default_fraction} not in [0, 1]")
    b = sample_bucket(F.col(key))
    thr = None
    for s, f in fractions.items():
        cond = F.col(strata) == s
        t = F.lit(int(round(f * _BUCKETS)))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default_thr = F.lit(int(round(default_fraction * _BUCKETS)))
    thr = default_thr if thr is None else thr.otherwise(default_thr)
    return df.filter(b < thr)


def stratified_sample_sql(
    key_expr: str,
    strata_expr: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> str:
    """WHERE-clause twin of ``stratified_sample`` for the DuckDB oracle.
    Stratum values are single-quote-escaped; empty ``fractions`` (legal in
    the Python API — everything gets ``default_fraction``) emits a plain
    threshold instead of a zero-arm CASE (which would be a syntax
    error)."""
    b = sample_bucket_sql(key_expr)
    default_thr = int(round(default_fraction * _BUCKETS))
    if not fractions:
        return f"({b} < {default_thr})"
    cases = " ".join(
        f"WHEN {strata_expr} = '{s.replace(chr(39), chr(39) * 2)}' "
        f"THEN {int(round(f * _BUCKETS))}"
        for s, f in fractions.items()
    )
    return f"({b} < CASE {cases} ELSE {default_thr} END)"
