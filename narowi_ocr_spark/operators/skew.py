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


def heavy_hitters(
    df: DataFrame, key_col: str, num: int = 3, den: int = 100
) -> DataFrame:
    """Exact frequent-item query (share ≥ num/den) via sketch-then-verify.

    Phase 1 (sketch) runs Misra-Gries with ``ceil(den/num)`` counters per
    partition inside ``mapInPandas``: each partition emits at most
    ``capacity`` candidate keys — a few KB — regardless of partition row
    count. An item with GLOBAL share ≥ θ has local share ≥ θ in at least
    one partition (averaging argument), and MG with capacity c keeps every
    item whose local share exceeds 1/(c+1); c = ceil(1/θ) makes
    1/(c+1) < θ, so the candidate union is a guaranteed superset of the
    true heavy hitters. Phase 2 (verify) broadcast-semi-joins the
    tiny candidate set back onto the stream and counts EXACTLY, so the
    final answer has no approximation at all — the sketch only bounds
    what phase 2 has to count.

    At 100 TB this is the shape that works: the full groupBy(key) would
    shuffle every row; here phase 1 shuffles ``capacity × partitions``
    candidate keys and phase 2's count has map-side combine over a
    broadcast-filtered stream (only candidate rows reach the agg).

    Returns (key_col, n_events, share) for keys with n·den ≥ num·N —
    pure integer comparison, no float thresholding.
    """
    import math

    import pandas as pd

    capacity = max(1, math.ceil(den / num))
    total = df.count()
    key_type = df.schema[key_col].dataType.simpleString()

    def mg(batches):
        # Mergeable-summaries form of Misra-Gries (Agarwal et al., PODS
        # 2012): fold each Arrow batch in via vectorized value_counts,
        # then subtract the (c+1)-st largest count from everything and
        # evict ≤0. Error stays ≤ n_p/(c+1), same keep-guarantee as the
        # per-row update, but the per-batch cost is one hash aggregation.
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[key_col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: c - cut for k, c in counters.items() if c > cut
                }
        yield pd.DataFrame({key_col: list(counters.keys())})

    candidates = (
        df.select(key_col)
        .mapInPandas(mg, schema=f"{key_col} {key_type}")
        .distinct()
    )
    exact = (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("n_events"))
    )
    return exact.where(
        F.col("n_events") * F.lit(den) >= F.lit(num) * F.lit(total)
    ).select(
        key_col,
        "n_events",
        (F.col("n_events") / F.lit(float(total))).alias("share"),
    )
