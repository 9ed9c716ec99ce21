"""Changelog-merge (CDC) operator tests: last-writer-wins, delete
semantics, delete-then-reinsert, and base-snapshot application."""

from pyspark.sql import Row

from narowi_ocr_spark.operators.cdc import merge_changelog, snapshot_with_base


def _changes(spark):
    # key 1: insert then update            -> v=11 survives
    # key 2: insert then delete            -> absent
    # key 3: insert, delete, re-insert     -> v=32 survives
    # key 4: single insert                 -> v=40 survives
    # seq tie-break: key 5 has two changes at the same ts; change_id
    # orders them, the delete (higher change_id) wins -> absent
    rows = [
        Row(key=1, ts=1, change_id=0, op="upsert", v=10),
        Row(key=1, ts=2, change_id=1, op="upsert", v=11),
        Row(key=2, ts=1, change_id=2, op="upsert", v=20),
        Row(key=2, ts=3, change_id=3, op="delete", v=0),
        Row(key=3, ts=1, change_id=4, op="upsert", v=30),
        Row(key=3, ts=2, change_id=5, op="delete", v=0),
        Row(key=3, ts=4, change_id=6, op="upsert", v=32),
        Row(key=4, ts=9, change_id=7, op="upsert", v=40),
        Row(key=5, ts=5, change_id=8, op="upsert", v=50),
        Row(key=5, ts=5, change_id=9, op="delete", v=0),
    ]
    return spark.createDataFrame(rows)


def test_merge_changelog_last_writer_wins(spark):
    snap = {
        r["key"]: (r["ts"], r["v"])
        for r in merge_changelog(
            _changes(spark), ["key"], ["ts", "change_id"]
        ).collect()
    }
    assert snap == {1: (2, 11), 3: (4, 32), 4: (9, 40)}


def test_merge_changelog_is_partition_invariant(spark):
    df = _changes(spark)
    a = sorted(
        map(tuple, merge_changelog(df, ["key"], ["ts", "change_id"]).collect())
    )
    b = sorted(
        map(
            tuple,
            merge_changelog(
                df.repartition(7), ["key"], ["ts", "change_id"]
            ).collect(),
        )
    )
    assert a == b


def test_snapshot_with_base(spark):
    base = spark.createDataFrame(
        [
            Row(key=1, ts=0, change_id=-1, v=100),  # updated by changelog
            Row(key=2, ts=0, change_id=-1, v=200),  # deleted by changelog
            Row(key=9, ts=0, change_id=-1, v=900),  # untouched
        ]
    )
    snap = {
        r["key"]: r["v"]
        for r in snapshot_with_base(
            base, _changes(spark), ["key"], ["ts", "change_id"]
        ).collect()
    }
    assert snap == {1: 11, 3: 32, 4: 40, 9: 900}
