"""Distributed exact rank (operators/ranking.py): bit-identity with a
global-window row_number, bucket-function monotonicity, and the plan
invariant that no full-table data crosses a single-partition exchange
(VERDICT r2 item 1: the global-window quantile family was the last
single-task-sort scale-killer)."""

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from narowi_ocr_spark.operators.ranking import bucketed_rank, loglin_bucket


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_loglin_bucket_monotone_and_bounded(spark):
    """bucket(v) is non-decreasing in v over the full long range and
    stays within the documented ~4k-cell budget."""
    rnd = random.Random(7)
    vals = sorted(
        {0, 1, 2, 127, 128, 129, (1 << 62) + 12345}
        | {rnd.randrange(0, 1 << 62) for _ in range(400)}
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = (
        df.select("v", loglin_bucket(F.col("v")).alias("b"))
        .orderBy("v")
        .collect()
    )
    buckets = [r["b"] for r in got]
    assert buckets == sorted(buckets), "bucket must be monotone in v"
    assert all(0 <= b < 64 * 128 + 128 for b in buckets)


def test_bucketed_rank_matches_global_window(spark):
    """Exact equality with row_number() over an unpartitioned window,
    for both directions, under heavy ties (the case the per-bucket
    local sort must settle via the unique tiebreaker)."""
    rnd = random.Random(11)
    rows = [(i, rnd.randrange(0, 40)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(8)

    for asc in (True, False):
        order = [F.asc("v") if asc else F.desc("v"), F.asc("id")]
        want = {
            (r["id"],): r["rn"]
            for r in df.select(
                "id", F.row_number().over(Window.orderBy(*order)).alias("rn")
            ).collect()
        }
        got_df = bucketed_rank(
            df,
            loglin_bucket(F.col("v")),
            order,
            ascending_buckets=asc,
            rank_name="rn",
            total_name="n",
        )
        got = got_df.collect()
        assert {(r["id"],): r["rn"] for r in got} == want
        assert all(r["n"] == 500 for r in got)


def test_bucketed_rank_double_key_deciles(spark):
    """floor(q·K) bucketing on a double key reproduces the exact
    global decile assignment (the quality_deciles shape)."""
    rnd = random.Random(3)
    rows = [(i, round(rnd.random(), 4)) for i in range(400)]
    # force tie groups
    rows += [(1000 + i, 0.5) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, q double").repartition(8)
    order = [F.desc("q"), F.asc("doc_id")]
    n = len(rows)
    want = {
        r["doc_id"]: r["d"]
        for r in df.select(
            "doc_id",
            F.floor(
                (F.row_number().over(Window.orderBy(*order)) - 1) * 10 / n
            ).alias("d"),
        ).collect()
    }
    ranked = bucketed_rank(
        df,
        F.floor(F.col("q") * 10000),
        order,
        ascending_buckets=False,
        rank_name="rn",
        total_name="n",
    )
    got = {
        r["doc_id"]: r["d"]
        for r in ranked.select(
            "doc_id",
            F.floor((F.col("rn") - 1) * 10 / F.col("n")).alias("d"),
        ).collect()
    }
    assert got == want


def test_bucketed_rank_limit_prunes_tie_mass_exactly(spark):
    """Top-k whole-bucket pruning (the Zipf tie-mass fix): with
    ``limit=k`` the surviving rows' ranks are bit-identical to the
    unlimited call, AND the hapax tie bucket (freq=1 — most of the
    rows) is dropped before the rank sort, never just filtered after.
    """
    # 20 head words with distinct high freqs + 400 hapax (freq=1)
    rows = [(f"head{i:02d}", 1000 - i) for i in range(20)]
    rows += [(f"tail{i:04d}", 1) for i in range(400)]
    df = spark.createDataFrame(rows, "word string, freq long").repartition(8)
    order = [F.desc("freq"), F.asc("word")]
    k = 10

    want = {
        r["word"]: r["rn"]
        for r in df.select(
            "word", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
        if r["rn"] <= k
    }
    got_df = bucketed_rank(
        df,
        loglin_bucket(F.col("freq")),
        order,
        ascending_buckets=False,
        rank_name="rn",
        limit=k,
    )
    returned = got_df.collect()
    got = {r["word"]: r["rn"] for r in returned if r["rn"] <= k}
    assert got == want
    # pruning, not post-filtering: the 400-row freq=1 bucket starts at
    # offset 20 >= k, so none of its rows may come back at all
    assert len(returned) < 100, len(returned)
    assert not any(r["word"].startswith("tail") for r in returned)


def test_bucketed_rank_plan_no_fulltable_single_partition(spark):
    """Plan shape: the ONLY single-partition exchange carries the tiny
    per-bucket count table (child subtree contains the aggregate); the
    full-table rank window is partitioned by the bucket key."""
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") * 37 % 999).alias("v")
    )
    ranked = bucketed_rank(
        df,
        loglin_bucket(F.col("v")),
        [F.asc("v"), F.asc("id")],
        ascending_buckets=True,
        rank_name="rn",
    )
    plan = _physical_plan(ranked)
    # the big-table window is partitioned by the bucket key
    assert "windowspecdefinition(_rb" in plan, plan
    # exactly one single-partition exchange: the bucket-count table
    lines = plan.splitlines()
    sp = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert len(sp) == 1, plan
    # its input subtree (the remainder of the printed tree below it)
    # must aggregate before crossing — i.e. contain a HashAggregate
    below = "\n".join(lines[sp[0] :])
    assert "HashAggregate" in below, plan
