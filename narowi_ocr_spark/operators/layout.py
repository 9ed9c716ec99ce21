"""Z-order (Morton) data layout for multi-dimensional data skipping.

At 100 TB the scan cost of a query that filters on TWO dimensions
(e.g. ``user_id`` and event hour) is set by how many parquet files its
predicate rectangle touches. Sorting by one column makes that column's
min/max file stats tight and the other's useless; interleaving the bits
of both (the Morton / Z-order curve, as used by Delta OPTIMIZE ZORDER
and Iceberg's sort orders) makes BOTH columns' per-file ranges shrink
like sqrt(files), so either predicate prunes.

Everything is integer bit-twiddling on 64-bit longs — pure Catalyst
expressions (shiftleft/and/or), whole-stage codegen, and bit-identical
in any engine, so the z-value computation is DuckDB-oracle-checkable.

The write path is ``repartitionByRange(z) + sortWithinPartitions(z)``:
one range-exchange (sampled boundaries, skew-proof) and the files come
out as near-disjoint z-ranges = near-disjoint rectangles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic masks that spread the low 16 bits of a long across the even bit
# positions of the low 32 (classic Morton encoding steps).
_SPREAD_STEPS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(x: Column) -> Column:
    """Spread a 16-bit value's bits to even positions of a 32-bit lane."""
    v = x.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def morton2(a: Column | str, b: Column | str) -> Column:
    """Interleave the low 16 bits of ``a`` (even positions) and ``b``
    (odd positions) into one 32-bit z-value (as a long)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread16(ca.cast("long")).bitwiseOR(
        F.shiftleft(_spread16(cb.cast("long")), 1)
    )


def morton2_sql(a: str, b: str) -> str:
    """The identical computation as ANSI SQL (for the DuckDB oracle)."""

    def spread(e: str) -> str:
        v = f"(CAST({e} AS BIGINT) & 65535)"
        for shift, mask in _SPREAD_STEPS:
            v = f"(({v} | ({v} << {shift})) & {mask})"
        return v

    return f"({spread(a)} | ({spread(b)} << 1))"


def zorder_layout(
    df: DataFrame,
    a: str,
    b: str,
    n_files: int = 32,
    z_col: str = "z",
) -> DataFrame:
    """Return ``df`` with the z-value column added, range-partitioned and
    sorted so each output partition (= parquet file on write) covers a
    compact z-range, i.e. a compact rectangle in (a, b) space.

    ``n_files`` is the write fan-out knob: at scale, target-file-size /
    partition-bytes decides it; here it is explicit so tests can assert
    the per-file min/max envelopes.
    """
    out = df.withColumn(z_col, morton2(a, b))
    return out.repartitionByRange(n_files, F.col(z_col)).sortWithinPartitions(z_col)


def compact_parquet(
    spark,
    src_dir: str,
    out_dir: str,
    sort_col: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Small-files compaction — the maintenance op every incrementally
    written table (streaming sinks, per-batch ingest deltas) needs:
    rewrite ``src_dir`` into ``ceil(total_bytes / target)`` files,
    range-partitioned and sorted on ``sort_col`` so every output file
    covers a disjoint key range (parquet footer min/max become usable
    for file skipping, which per-batch append files destroy).

    File sizing comes from the SOURCE's on-disk bytes (the only honest
    estimate before rewriting — compressed size in ≈ compressed size
    out for the same codec). Local-fs walk here; on a cluster the same
    number comes from Hadoop `listStatus` or table-format statistics.

    Returns the number of parquet files actually written (range
    partitions left empty by few distinct sort keys produce no file, so
    the planned count is not the truthful one for manifests/stats).
    """
    import math
    import os

    if os.path.abspath(out_dir) == os.path.abspath(src_dir):
        raise ValueError(
            "out_dir == src_dir: mode=overwrite would clobber the "
            "source while it is being read"
        )
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(total / target_file_bytes))
    (
        spark.read.parquet(src_dir)
        .repartitionByRange(n_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return sum(
        1
        for _root, _dirs, files in os.walk(out_dir)
        for f in files
        if f.endswith(".parquet")
    )


def layout_stats(df: DataFrame, a: str, b: str, z_col: str = "z") -> DataFrame:
    """Per-partition min/max envelopes for both dimensions — the exact
    numbers a file-skipping planner would read from parquet footers.
    Diagnostic (one row per partition, collected by tests/benchmarks)."""
    return (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.count("*").alias("n"),
            F.min(a).alias(f"min_{a}"),
            F.max(a).alias(f"max_{a}"),
            F.min(b).alias(f"min_{b}"),
            F.max(b).alias(f"max_{b}"),
            F.min(z_col).alias("min_z"),
            F.max(z_col).alias("max_z"),
        )
    )
