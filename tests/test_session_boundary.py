"""Adversarial session-gap boundary fixtures (VERDICT r3 item 6): an
event pair whose gap falls inside (1800, 1801) s distinguishes the
exact int64-microsecond gap rule from the truncate-seconds-then-diff
bug class (ADVICE r2) — a second-truncated implementation computes
gap = 1800 and merges the pair; the exact rule splits it. Pairs at
exactly 1800 s pin the twins' shared boundary rule: BOTH the lag/sum
batch twin and the native session_window twin merge an exact-gap pair
(split iff gap strictly exceeds the window) — this fixture is what
established that session_window is gap-inclusive; an earlier oracle
modelled >= and was wrong, invisibly, until boundary data existed."""

import datetime as dt

import __spark_entry__ as entrymod


def _write_events(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(seconds, micros=0):
        return base + dt.timedelta(seconds=seconds, microseconds=micros)

    rows = [
        # user 1: gap 1800.5 s — in (1800, 1801): exact rule splits,
        # truncate-then-diff would merge (gap==1800 not > 1800)
        (1, at(0), 1, "view", 1.0, "{}"),
        (2, at(1800, 500000), 1, "view", 1.0, "{}"),
        # user 2: gap exactly 1800 s — batch twin merges, native splits
        (3, at(0), 2, "view", 1.0, "{}"),
        (4, at(1800), 2, "view", 1.0, "{}"),
        # user 3: gap 1800 s + 1 µs — both twins split
        (5, at(0), 3, "view", 1.0, "{}"),
        (6, at(1800, 1), 3, "view", 1.0, "{}"),
        # user 4: gap 1799.999999 s — both twins merge
        (7, at(0), 4, "view", 1.0, "{}"),
        (8, at(1799, 999999), 4, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_batch_twin_exact_microsecond_gap_rule(spark, tmp_path):
    sf_dir = _write_events(spark, tmp_path)
    fn = entrymod.queries()["events_sessions"]
    per_user = {}
    for r in fn(spark, sf_dir).collect():
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
    assert per_user == {
        1: 2,  # 1800.5 s gap splits — the truncate-diff bug merges it
        2: 1,  # exactly 1800 s: strict > keeps one session
        3: 2,  # one microsecond over: splits
        4: 1,  # just under: merges
    }


def test_stateful_twin_strict_gt_boundary(spark, tmp_path):
    """The applyInPandasWithState twin shares the strict-> rule of the
    other two — all three sessionizations agree at every boundary."""
    sf_dir = _write_events(spark, tmp_path)
    fn = entrymod.queries()["sessions_stateful"]
    per_user = {}
    for r in fn(spark, sf_dir).collect():
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
    assert per_user == {1: 2, 2: 1, 3: 2, 4: 1}


def test_native_twin_gap_inclusive_boundary(spark, tmp_path):
    sf_dir = _write_events(spark, tmp_path)
    fn = entrymod.queries()["events_sessions_native"]
    per_user = {}
    for r in fn(spark, sf_dir).collect():
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
    assert per_user == {
        1: 2,
        2: 1,  # session_window merges an EXACT-gap pair (inclusive)
        3: 2,
        4: 1,
    }
