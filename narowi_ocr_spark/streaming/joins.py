"""Stream-stream event-time interval join: view→purchase attribution.

The missing piece between per-stream aggregation (stream.py) and custom
state (stateful.py): joining two live streams. Spark's stream-stream
join keeps both sides' unmatched rows in state; UNBOUNDED unless the
join condition carries an event-time range, so the contract here is
explicit: both inputs are watermarked and the join predicate bounds
``purchase_ts`` to (view_ts, view_ts + horizon]. With that, Spark
derives a state-eviction watermark for each side — a view older than
(watermark + horizon) can never match a future purchase and is dropped
from state. That is what makes the operator runnable forever at crawl
scale: state is O(events within the horizon window), not O(stream).

Plan shape: both streams shuffle once on ``user_id`` into the same
partitioning (co-partitioned stateful join); the interval predicate is
evaluated post-match, never as a nested loop. Inner-join results emit
as soon as both sides arrive — no watermark delay on output (the
watermark only gates state cleanup).

Batch twin: :func:`attribute_batch` states the same join over a static
table — the DuckDB oracle and the streaming run must agree row-for-row
on an availableNow drain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HORIZON = "1 hour"
DEFAULT_WATERMARK = "2 hours"


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    views = events.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    return views, purchases


def attribute_stream(
    events: DataFrame,
    horizon: str = DEFAULT_HORIZON,
    watermark: str = DEFAULT_WATERMARK,
    how: str = "inner",
) -> DataFrame:
    """All (view, purchase) pairs of one user with the purchase inside
    (view_ts, view_ts + horizon]. ``events`` is a STREAMING frame with
    (user_id, ts timestamp, event_type, value); both derived sides get
    the same watermark, and the time-range predicate is what bounds the
    join state (see module docstring).

    ``how='leftOuter'`` additionally emits every UNATTRIBUTED view once,
    with NULL purchase columns — the conversion-funnel "view that never
    converted" row. Outer emission is watermark-DEPENDENT (unlike inner
    matches, which emit as both sides arrive): a view's NULL row can
    only be produced once the eviction watermark proves no future
    purchase can match, i.e. in the first micro-batch whose starting
    watermark has passed view_ts + horizon (availableNow runs a final
    no-data batch precisely so this terminal flush happens; a live job
    relies on later batches advancing the watermark). State stays
    O(horizon window) either way. Operational caveat: with two
    watermarked columns the GLOBAL watermark is their MINIMUM
    (``spark.sql.streaming.multipleWatermarkPolicy`` defaults to
    ``min``), so a drain/flush sentinel must advance BOTH sides — a
    view-only sentinel leaves the global watermark pinned at the
    purchase side and no NULL row ever emits."""
    views, purchases = _sides(events)
    v = views.withWatermark("view_ts", watermark)
    p = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (v["user_id"] == p["user_id"])
        & (p["purchase_ts"] > v["view_ts"])
        & (
            p["purchase_ts"]
            <= v["view_ts"] + F.expr(f"INTERVAL {horizon}")
        )
    )
    return v.join(p, cond, how).select(
        v["user_id"], "view_ts", "purchase_ts", "value"
    )


def attribute_batch(
    events: DataFrame, horizon: str = DEFAULT_HORIZON, how: str = "inner"
) -> DataFrame:
    """Static twin of :func:`attribute_stream` — same predicate, same
    output schema, ordinary hash join (``how='left'`` for the outer
    twin)."""
    views, purchases = _sides(events)
    cond = (
        (views["user_id"] == purchases["user_id"])
        & (purchases["purchase_ts"] > views["view_ts"])
        & (
            purchases["purchase_ts"]
            <= views["view_ts"] + F.expr(f"INTERVAL {horizon}")
        )
    )
    return views.join(purchases, cond, how).select(
        views["user_id"], "view_ts", "purchase_ts", "value"
    )
