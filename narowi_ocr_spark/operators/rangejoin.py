"""Bucketed interval (range) join: points × [lo, hi) ranges without a
nested-loop plan.

Spark compiles a bare ``points JOIN ranges ON lo <= p AND p < hi`` to
BroadcastNestedLoopJoin — O(N·M) comparisons, the canonical scale
cliff for interval joins (Spark has no native interval-join strategy;
this decomposition is the standard workaround, same family as
Databricks' range-join bin optimization). The fix is bucket
decomposition: chop the number line into fixed-width buckets, explode
each range onto every bucket it touches (⌈span/width⌉ + 1 rows — a
small constant for ranges narrow relative to the width), tag each
point with its single bucket, then equi-join on the bucket id and
re-check the exact predicate. The join becomes a shuffled (or
broadcast) HASH join on an integer key — linear scan per side, and
AQE's skew handling applies to hot buckets.

Width tradeoff: too wide → many false candidate pairs re-checked per
bucket; too narrow → each range replicates into many buckets. Set it
near the median range span so both costs stay O(1) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 50.0,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Join each point row to every range row with lo ≤ point < hi.

    Returns points.* × ranges.* for matching pairs. ``broadcast_ranges``
    fits the dim-table case (a few thousand bands); for two large sides
    set it False and the equi-join shuffles both on the bucket id —
    still a hash join, never a nested loop.
    """
    w = float(bucket_width)
    r = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                # hi is exclusive, so bucket(hi) is only needed when hi
                # is not on a bucket boundary; including it always is
                # conservative — the exact re-check below drops the
                # false candidates
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    if broadcast_ranges:
        r = F.broadcast(r)
    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / w).cast("long")
    )
    joined = p.join(r, "_bucket").where(
        (F.col(lo_col) <= F.col(point_col))
        & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bucket")
