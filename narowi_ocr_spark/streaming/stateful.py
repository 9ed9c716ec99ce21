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


# ---------------------------------------------------------------- alerts

ALERT_THRESHOLD_CENTS = 250_000  # $2,500 cumulative spend

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("alert_ts", T.TimestampType()),
        T.StructField("cum_cents", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: (cum_cents, n_events, fired)
ALERT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cum_cents", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("fired", T.BooleanType()),
    ]
)


def _cents(x: float) -> int:
    """Exact integer cents from a 2-decimal double (values in the events
    table are exact cents; floor(x·100 + 0.5) is the same IEEE
    round-half-up used everywhere else in this repo)."""
    import math

    return int(math.floor(x * 100.0 + 0.5))


def _alert_group(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this user's events in (ts, event_id) order into a running
    integer-cents total; emit ONE alert row the first time the total
    crosses the threshold. State is three scalars per user — bounded
    regardless of event volume.

    Ordering contract: the crossing point is defined over event-time
    order. Late data (an event older than ones already folded) would
    move the true crossing earlier; this operator assumes per-key
    event-time-ordered arrival across micro-batches (log-structured
    ingestion). Production hardening = buffer to the watermark before
    folding (same trade the sessionize operator documents).
    """
    (user_id,) = key
    rows = []
    for pdf in batches:
        for t, e, v in zip(
            pd.to_datetime(pdf["ts"]), pdf["event_id"], pdf["value"]
        ):
            rows.append((int(t.value // 1000), int(e), float(v)))
    rows.sort()

    if state.exists:
        cum, n, fired = state.get
    else:
        cum, n, fired = 0, 0, False

    out = None
    for t_us, _eid, v in rows:
        cum += _cents(v)
        n += 1
        if not fired and cum > ALERT_THRESHOLD_CENTS:
            fired = True
            out = (user_id, pd.Timestamp(t_us, unit="us"), cum, n)
    state.update((cum, n, fired))

    if out is not None:
        yield pd.DataFrame(
            {
                "user_id": [out[0]],
                "alert_ts": [out[1]],
                "cum_cents": [out[2]],
                "n_events": [out[3]],
            }
        )


def spend_alerts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events stream → at most one threshold-crossing alert per user
    (quota/fraud/billing alerting — the emit-once FSM shape that
    complements sessionize_stream's emit-on-close shape). State shards
    with the user_id shuffle; no timeout is registered because the
    state is three scalars per key (production would add an event-time
    timeout at the account-inactivity horizon to reap dead keys)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _alert_group,
            outputStructType=ALERT_SCHEMA,
            stateStructType=ALERT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def spend_alerts_batch(events: DataFrame) -> DataFrame:
    """Batch twin of ``spend_alerts_stream``: running decimal-exact
    cents over a (ts, event_id) window; the alert row is the first one
    where the running total exceeds the threshold (prev total ≤ T <
    total). One window sort per user partition, nothing else."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = (
        F.col("value").cast("decimal(18,2)") * 100
    ).cast("long")
    staged = events.select(
        "user_id", "ts", "event_id", cents.alias("_c")
    ).select(
        "user_id",
        "ts",
        "_c",
        F.sum("_c").over(w).alias("cum_cents"),
        F.row_number().over(w).alias("n_events"),
    )
    thr = F.lit(ALERT_THRESHOLD_CENTS).cast("long")
    return staged.where(
        (F.col("cum_cents") > thr)
        & (F.col("cum_cents") - F.col("_c") <= thr)
    ).select(
        "user_id",
        F.col("ts").alias("alert_ts"),
        "cum_cents",
        F.col("n_events").cast("long").alias("n_events"),
    )
