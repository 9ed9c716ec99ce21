"""Skew-safe aggregation shapes.

``groupBy(k).agg(countDistinct(v))`` is the canonical skew victim at
100 TB: Spark expands it to a single aggregation keyed on ``k`` whose
partial state is the full distinct-value set, so one hot key's ENTIRE
value universe converges on one reducer. The two-stage shape here keys
the heavy first exchange on ``(k, v)`` — a hot key's values spread
across ALL reducers — and the second exchange moves only (k, count)
partials. Same trick family as the salted host keys in
``sink.salted_host_key`` (bench-evidenced in BENCH.md §Skew), but as a
reusable operator: here the value column itself is the salt, which is
both free and perfectly uniform within each key.

(Algebraic aggregates — count/sum/min/max — do NOT need this: their
map-side partial aggregation already collapses hot keys before the
shuffle. Reach for two-stage shapes only when the partial state is
holistic: exact NDV, collect_list/set, exact percentiles.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_then_count(
    df: DataFrame, key_cols: list[str], val_col: str
) -> DataFrame:
    """Exact per-key NDV as distinct-then-count: stage 1 dedups on
    (keys, val) — the exchange is keyed on BOTH, so a key with 10⁹
    events spreads over the whole cluster; stage 2 is an algebraic
    count with map-side combine (a few rows per key per partition reach
    the wire). Returns (*key_cols, ndv)."""
    stage1 = df.select(*key_cols, val_col).distinct()
    return stage1.groupBy(*key_cols).agg(
        F.count(val_col).alias("ndv")
    )
