"""1-D interval range join (value ∈ [lo, hi)) — the brief's "range join".

The reference's PostGIS stack gets interval containment from btree/gist
predicates (e.g. elevation bands, date validity windows); a naive Spark
translation is a cross join with a theta filter — |probe|×|intervals| at
planetary scale. Two real strategies instead:

- ``broadcast`` (default): intervals are a dimension table (bands,
  configs, calendars — thousands of rows at most). Broadcast + theta
  filter: the join stays a *BroadcastNestedLoopJoin* but the build side is
  tiny and the probe side streams map-side — no shuffle of the fact
  table, which is the only thing that matters at 100 TB.
- ``bucketed``: both sides big. Pick a bucket width, explode each
  interval into the buckets it overlaps (cost ∝ interval length /
  width), bucket the probe value (1 row each), hash equi-join on the
  bucket id, then refine with the exact containment predicate. This is
  the same cover→equi-join→refine shape as the spatial ST_DWithin
  operator (operators/distance_join.py) dropped to one dimension; skew
  only arises from pathological value distributions, the bucket key is
  otherwise uniform.

Semantics are half-open ``lo <= v < hi`` (matching the reference's band
tables); overlapping intervals yield one output row per match, ``how=
'left'`` keeps probe rows with no interval (NULL interval columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_lookup_join(
    probe: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    *,
    strategy: str = "broadcast",
    bucket_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each probe row to every interval containing its value.

    ``bucket_width`` (bucketed strategy only): defaults to the P50
    interval width computed from a bounded agg over the intervals table —
    wide enough that most intervals explode into O(1) buckets, narrow
    enough that a bucket's interval list stays small.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    v = F.col(value_col)
    contains = (F.col(lo_col) <= v) & (v < F.col(hi_col))

    if strategy == "broadcast":
        return probe.join(F.broadcast(intervals), contains, how)

    if strategy != "bucketed":
        raise ValueError(f"unknown strategy {strategy!r}")

    if bucket_width is None:
        # bounded driver action: one scalar (median width) off the
        # intervals table — same data motion as planning a broadcast
        med = intervals.select(
            F.expr(f"percentile_approx({hi_col} - {lo_col}, 0.5)")
        ).first()[0]
        if med is None:  # empty intervals table
            raise ValueError(
                "bucketed interval_lookup_join needs a non-empty intervals "
                "table to derive bucket_width (or pass bucket_width)"
            )
        bucket_width = float(med)
    if not bucket_width or bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    w = float(bucket_width)

    def bucket_of(c: Column) -> Column:
        return F.floor(c / F.lit(w)).cast("long")

    # explode each interval into its covering buckets: [floor(lo/w) ..
    # floor(hi/w)]; sequence() is codegen, cost ∝ width/w. When hi lands
    # exactly on a bucket edge the top bucket is over-covered by one row —
    # deliberate: over-coverage is harmless (the exact containment refine
    # drops it), while any under-coverage from float edge arithmetic would
    # silently lose matches.
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(bucket_of(F.col(lo_col)), bucket_of(F.col(hi_col)))
        ),
    )
    pb = probe.withColumn("_bucket", bucket_of(v)).alias("p")
    iv = iv.alias("i")
    # a probe value lies in exactly ONE bucket, so joining on bucket
    # equality + containment matches each (probe, interval) pair at most
    # once — 'left' therefore works natively, no anti-join pass needed
    cond = (
        (F.col("p._bucket") == F.col("i._bucket"))
        & (F.col(f"i.{lo_col}") <= F.col(f"p.{value_col}"))
        & (F.col(f"p.{value_col}") < F.col(f"i.{hi_col}"))
    )
    return pb.join(iv, cond, how).drop("_bucket")
