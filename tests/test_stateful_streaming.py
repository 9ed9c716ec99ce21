"""Stateful streaming sessionization (applyInPandasWithState) vs its
native batch twin, plus the watermarked windowed rollup."""

from __future__ import annotations

import datetime
import uuid

import pytest
from pyspark.sql import functions as F

from narowi_ocr_spark.streaming.stateful import (
    SESSION_GAP_MIN,
    sessionize_batch,
    sessionize_stream,
    windowed_counts_stream,
)

T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _mk_events(spark):
    """Two users; user 1 has two sessions split by a 45-min gap, user 2
    one session; plus a far-future flush event per user so every real
    session closes inside one availableNow run."""
    rows = [
        # user 1, session A: 3 events within 10 min
        (1, T0, 1.0),
        (1, T0 + datetime.timedelta(minutes=5), 2.0),
        (1, T0 + datetime.timedelta(minutes=10), 3.0),
        # gap 45 min > 30 → session B
        (1, T0 + datetime.timedelta(minutes=55), 4.0),
        (1, T0 + datetime.timedelta(minutes=60), 5.0),
        # user 2: single session, exactly-30-min gap does NOT split
        (2, T0, 10.0),
        (2, T0 + datetime.timedelta(minutes=30), 20.0),
    ]
    flush = T0 + datetime.timedelta(days=2)
    rows += [(1, flush, 0.0), (2, flush, 0.0)]
    df = spark.createDataFrame(
        rows, schema="user_id long, ts timestamp, value double"
    )
    return df, flush


def _run_stream(spark, src_dir, tmp_path):
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src_dir)
    name = "t_sess_" + uuid.uuid4().hex[:8]
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


def test_stateful_sessions_match_batch_twin(spark, tmp_path):
    events, flush = _mk_events(spark)
    src = str(tmp_path / "src")
    events.coalesce(1).write.parquet(src)

    out = _run_stream(spark, src, tmp_path)
    real = out.where(F.col("session_start") < F.lit(flush))
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in real.collect()
    )
    assert got == [
        (1, T0, T0 + datetime.timedelta(minutes=10), 3, 6.0),
        (1, T0 + datetime.timedelta(minutes=55),
         T0 + datetime.timedelta(minutes=60), 2, 9.0),
        (2, T0, T0 + datetime.timedelta(minutes=30), 2, 30.0),
    ]

    # batch twin on the real events agrees exactly
    twin = sessionize_batch(
        events.where(F.col("ts") < F.lit(flush))
    )
    twin_rows = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in twin.collect()
    )
    assert twin_rows == got


def test_gap_constant_is_strict(spark, tmp_path):
    """A gap of exactly SESSION_GAP_MIN does not split (strict >)."""
    t1 = T0 + datetime.timedelta(minutes=SESSION_GAP_MIN)
    flush = T0 + datetime.timedelta(days=2)
    df = spark.createDataFrame(
        [(7, T0, 1.0), (7, t1, 1.0), (7, flush, 0.0)],
        schema="user_id long, ts timestamp, value double",
    )
    src = str(tmp_path / "src2")
    df.coalesce(1).write.parquet(src)
    out = _run_stream(spark, src, tmp_path)
    real = out.where(F.col("session_start") < F.lit(flush)).collect()
    assert len(real) == 1 and real[0].n_events == 2


def test_batch_twin_microsecond_boundary(spark):
    """sessionize_batch applies the strict >gap test at MICROSECOND
    precision like the stateful twin: a gap of 30 min + 500 ms splits
    (second truncation would see exactly 1800 s and keep one session)."""
    t_half = T0 + datetime.timedelta(minutes=SESSION_GAP_MIN, milliseconds=500)
    df = spark.createDataFrame(
        [(9, T0, 1.0), (9, t_half, 1.0)],
        schema="user_id long, ts timestamp, value double",
    )
    out = sessionize_batch(df).collect()
    assert len(out) == 2

    # exact-gap boundary still does NOT split
    t_exact = T0 + datetime.timedelta(minutes=SESSION_GAP_MIN)
    df2 = spark.createDataFrame(
        [(9, T0, 1.0), (9, t_exact, 1.0)],
        schema="user_id long, ts timestamp, value double",
    )
    assert len(sessionize_batch(df2).collect()) == 1


def test_windowed_counts_stream(spark, tmp_path):
    events, flush = _mk_events(spark)
    src = str(tmp_path / "srcw")
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src)
    withtype = stream.withColumn("event_type", F.lit("click"))
    name = "t_win_" + uuid.uuid4().hex[:8]
    q = (
        windowed_counts_stream(withtype)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckptw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.window_start, r.n): r.total_value
        for r in spark.table(name).collect()
    }
    # hour 12:00 → 6 events (user1 at :00/:05/:10/:55, user2 at :00/:30);
    # hour 13:00 → 1 (user1 at :60). The flush-hour window is withheld:
    # the watermark never passes it, which is the late-data semantics
    # append mode promises.
    assert rows == {
        (T0.replace(minute=0), 6): 40.0,
        (T0.replace(minute=0) + datetime.timedelta(hours=1), 1): 5.0,
    }


def test_spend_alert_stream_matches_batch_twin(spark, tmp_path):
    """Stateful threshold FSM vs the window batch twin: same single
    alert per crossing user, same crossing event, exactly one emission
    even when later batches keep adding spend."""
    from narowi_ocr_spark.streaming.stateful import (
        spend_alerts_batch,
        spend_alerts_stream,
    )

    rows = [
        # user 1 crosses $2500 on its 3rd event
        (1, 101, T0, 1000.0),
        (1, 102, T0 + datetime.timedelta(minutes=1), 1000.0),
        (1, 103, T0 + datetime.timedelta(minutes=2), 600.0),
        (1, 104, T0 + datetime.timedelta(minutes=3), 5000.0),  # after fire
        # user 2 never crosses
        (2, 201, T0, 2500.0),
        # user 3 crosses exactly at the boundary: 2500.00 is NOT >
        (3, 301, T0, 2500.0),
        (3, 302, T0 + datetime.timedelta(minutes=1), 0.01),
    ]
    df = spark.createDataFrame(
        rows, schema="user_id long, event_id long, ts timestamp, value double"
    )
    batch = {
        r["user_id"]: r for r in spend_alerts_batch(df).collect()
    }
    assert set(batch) == {1, 3}
    assert (batch[1]["cum_cents"], batch[1]["n_events"]) == (260000, 3)
    assert (batch[3]["cum_cents"], batch[3]["n_events"]) == (250001, 2)

    src = str(tmp_path / "alert_src")
    # two micro-batch files in event-time order (the documented
    # ordering contract)
    df.where(F.col("ts") <= T0).coalesce(1).write.parquet(src)
    df.where(F.col("ts") > T0).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "user_id long, event_id long, ts timestamp, value double"
    ).parquet(src)
    name = "t_alert_" + uuid.uuid4().hex[:8]
    q = (
        spend_alerts_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "alert_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["user_id"]: r for r in spark.table(name).collect()}
    assert set(got) == set(batch)
    for u in batch:
        assert got[u]["alert_ts"] == batch[u]["alert_ts"]
        assert got[u]["cum_cents"] == batch[u]["cum_cents"]
        assert got[u]["n_events"] == batch[u]["n_events"]
