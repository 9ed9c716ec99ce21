"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2g extension).

The reference has no stateful streaming (its camera loop is stateless per
frame, examples/capture_reading.py:20-81), but a web-scale ingestion
pipeline needs at least one genuinely stateful operator shape: per-key
state that survives micro-batches, emits on a condition, and expires by
timeout. This module provides that shape over the ``events`` table
(user sessions split on a ``gap`` of inactivity), as the pattern to copy
for crawl-session assembly / per-host rate accounting at 100 TB.

Scale notes:
  - state is partitioned by the group key (user_id): the state store
    shards with the shuffle, so capacity scales with executors;
  - the event-time timeout bounds state size — every idle key is evicted
    after ``gap`` + watermark delay, so state is O(active keys), not
    O(all keys ever seen);
  - output is append-mode (sessions emit exactly once, on close), which
    keeps the sink idempotent and the checkpoint resumable.

A batch (non-streaming) twin ``sessionize_batch`` computes the identical
sessions with window functions — used by tests to cross-check the
stateful operator's output, and exposed as the DuckDB-oracled query
``events_sessions`` in ``__spark_entry__.py``.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30  # inactivity gap that closes a session

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# state: (session_start_epoch_us, session_end_epoch_us, n_events, total_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


def _sessionize_group(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into the open-session
    state; emit every session closed by a gap, keep the last one open.
    Timeout fires when the watermark passes end + gap → emit + evict."""
    (user_id,) = key
    out: list[tuple] = []

    if state.hasTimedOut:
        if state.exists:
            s, e, n, v = state.get
            out.append((user_id, s, e, n, v))
        state.remove()
    else:
        ts_us: list[int] = []
        vals: list[float] = []
        for pdf in batches:
            ts_us.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
            )
            vals.extend(float(x) for x in pdf["value"])
        order = sorted(range(len(ts_us)), key=lambda i: ts_us[i])

        if state.exists:
            s, e, n, v = state.get
        else:
            s, e, n, v = None, None, 0, 0.0

        for i in order:
            t, x = ts_us[i], vals[i]
            if s is None:
                s, e, n, v = t, t, 1, x
            elif t - e > _GAP_US:
                out.append((user_id, s, e, n, v))
                s, e, n, v = t, t, 1, x
            else:
                e, n, v = max(e, t), n + 1, v + x

        if s is not None:
            state.update((s, e, n, v))
            state.setTimeoutTimestamp(e // 1000 + SESSION_GAP_MIN * 60 * 1000)

    if out:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                "session_end": [pd.Timestamp(r[2], unit="us") for r in out],
                "n_events": [r[3] for r in out],
                "total_value": [r[4] for r in out],
            }
        )


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events stream → closed-session rows. Event-time watermark bounds
    lateness; per-user state times out ``SESSION_GAP_MIN`` after the last
    event, so sessions emit exactly once."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame) -> DataFrame:
    """Batch twin of ``sessionize_stream``: identical sessions via window
    functions (lag → gap flag → running session id → groupBy). Native
    Catalyst end-to-end; used to cross-check the stateful operator."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond epoch, NOT cast('long') (second truncation): the
    # stateful twin applies the strict >gap test at µs precision, and
    # sub-second timestamps near the exact gap boundary must sessionize
    # identically in both implementations.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = events.select(
        "user_id",
        "ts",
        "value",
        F.when(us - F.lag(us).over(w) > _GAP_US, 1)
        .otherwise(0)
        .alias("new_session"),
    ).withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    ).drop("session_id")


def windowed_counts_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data dropped after
    the watermark): the standard streaming rollup shape."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
