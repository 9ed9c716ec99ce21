"""Z-order layout (operators/layout.py): Morton-code correctness and the
data-skipping envelope property the layout exists for."""

from pyspark.sql import functions as F

from narowi_ocr_spark.operators.layout import (
    layout_stats,
    morton2,
    morton2_sql,
    zorder_layout,
)


def _py_morton(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def _grid(spark, n=64):
    return spark.range(n * n).select(
        F.col("id"),
        (F.col("id") % n).alias("a"),
        (F.col("id") / n).cast("long").alias("b"),
    )


def test_morton_matches_bitloop(spark):
    rows = (
        _grid(spark)
        .withColumn("z", morton2("a", "b"))
        .collect()
    )
    for r in rows:
        assert r["z"] == _py_morton(r["a"], r["b"]), (r["a"], r["b"])


def test_morton_sql_twin_identical(spark):
    """The SQL string twin (used by the DuckDB oracle) computes the same
    z when executed by Spark's own SQL parser."""
    df = _grid(spark, 32)
    got = (
        df.withColumn("z1", morton2("a", "b"))
        .withColumn("z2", F.expr(morton2_sql("a", "b")))
        .where(F.col("z1") != F.col("z2"))
        .count()
    )
    assert got == 0


def test_morton_is_monotone_per_dim(spark):
    """Fixing one coordinate, z is strictly increasing in the other —
    the property that makes z-range files rectangle-compact."""
    for a, b1, b2 in [(5, 3, 9), (0, 0, 1), (65535, 100, 101)]:
        assert _py_morton(a, b1) < _py_morton(a, b2)
        assert _py_morton(b1, a) < _py_morton(b2, a)


def test_zorder_shrinks_both_envelopes(spark):
    """After zorder_layout, the mean per-partition min/max envelope of
    BOTH dims is a small fraction of the global range; a single-dim sort
    leaves the other dim's envelope at ~full range. These envelopes are
    exactly what parquet footer stats give a file-skipping planner."""
    n = 64  # 4096 points on a 64x64 grid
    df = _grid(spark, n)
    z = zorder_layout(df, "a", "b", n_files=16)
    stats = layout_stats(z, "a", "b").collect()
    width_a = sum(r["max_a"] - r["min_a"] for r in stats) / len(stats)
    width_b = sum(r["max_b"] - r["min_b"] for r in stats) / len(stats)
    # 16 z-range files over a 64x64 grid → each covers ~a 16x16 tile.
    assert width_a <= n / 2, width_a
    assert width_b <= n / 2, width_b

    # Contrast: range-partition by a alone → b spans the full range.
    lin = df.repartitionByRange(16, F.col("a")).sortWithinPartitions("a")
    lstats = layout_stats(lin.withColumn("z", F.lit(0)), "a", "b").collect()
    lw_b = sum(r["max_b"] - r["min_b"] for r in lstats) / len(lstats)
    assert lw_b >= n - 1, lw_b  # no pruning power on b


def test_zorder_file_prune_simulation(spark):
    """Simulated planner: for a box predicate on (a, b), count partitions
    whose envelope intersects the box. Z-order must touch strictly fewer
    than the single-dim layout does for a predicate on the unsorted dim."""
    n = 64
    df = _grid(spark, n)

    def touched(stats, lo_b, hi_b):
        return sum(
            1 for r in stats if not (r["max_b"] < lo_b or r["min_b"] > hi_b)
        )

    zstats = layout_stats(zorder_layout(df, "a", "b", 16), "a", "b").collect()
    lin = df.repartitionByRange(16, F.col("a")).sortWithinPartitions("a")
    lstats = layout_stats(lin.withColumn("z", F.lit(0)), "a", "b").collect()

    z_touch = touched(zstats, 0, 7)  # narrow slice in b
    l_touch = touched(lstats, 0, 7)
    assert z_touch < l_touch, (z_touch, l_touch)
    assert l_touch == 16  # single-dim layout prunes nothing on b


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """64 per-batch append files compact to the size-targeted count,
    rows preserved, and each output file covers a DISJOINT key range
    (footer min/max become usable for file skipping)."""
    import glob

    from narowi_ocr_spark.operators.layout import compact_parquet

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    # 64 tiny appended files, keys interleaved across files (worst case
    # for footer pruning: every file spans the whole key range)
    for b in range(8):
        spark.range(b, 4096, 8).selectExpr(
            "id AS k", "CAST(id AS STRING) AS payload"
        ).coalesce(8).write.mode("append").parquet(src)
    n_src = len(glob.glob(src + "/part-*.parquet"))
    assert n_src >= 32

    total = sum(
        __import__("os").path.getsize(f)
        for f in glob.glob(src + "/part-*.parquet")
    )
    target = total // 4  # expect exactly 4 output files (ceil may give 5)
    n_out = compact_parquet(spark, src, out, "k", target_file_bytes=target)
    files_out = glob.glob(out + "/part-*.parquet")
    assert len(files_out) == n_out <= 5
    assert len(files_out) < n_src / 4

    assert spark.read.parquet(out).count() == 4096
    # disjoint sorted ranges per file
    ranges = sorted(
        tuple(
            spark.read.parquet(f)
            .agg(F.min("k"), F.max("k"))
            .collect()[0]
        )
        for f in files_out
    )
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 < lo2
