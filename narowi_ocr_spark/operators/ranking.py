"""Distributed exact global rank — the scale-safe replacement for an
unpartitioned ``Window.orderBy`` (which funnels the ENTIRE table through
one task's sort; at 10⁹+ rows that single task is the job's
scale-killer, VERDICT r2).

The classic two-pass scheme, expressed declaratively so Catalyst keeps
every stage parallel:

1. **Coarsen**: assign every row an order-monotone integer bucket
   derived from its sort key (not from Spark's physical partitioning,
   so the assignment is deterministic and needs no mid-job collect or
   persist-pinning).
2. **Offsets**: count rows per bucket (map-side combined aggregate,
   output = one row per bucket — thousands, not billions), prefix-sum
   the counts in bucket order. This tiny table is the only data that
   ever crosses a single-partition exchange.
3. **Rank**: broadcast the offsets back and compute
   ``rank = bucket_offset + row_number() over (partition by bucket)``
   — a window PARTITIONED by bucket, so each bucket sorts
   independently and the sort parallelism equals the bucket count.

The result is bit-identical to
``row_number().over(Window.orderBy(*order))`` for any TOTAL order
(include a unique tiebreaker column), because the bucket function is
monotone along the order: every row in an earlier bucket precedes every
row in a later one, and within a bucket the local sort settles the
rest.

Bucket-function contract: deterministic, non-null, and monotone
(non-strictly) in the leading sort key. Balance determines parallelism
— ``loglin_bucket`` below spreads non-negative longs over ~8k
log-linear cells covering any magnitude; for bounded doubles,
``floor(col * K)`` works (IEEE multiply-by-positive-constant and floor
are both monotone, so representation error never reorders buckets).

Reference analogue: none — this is pure distribution machinery the
single-process reference (src/processing/*) never needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def loglin_bucket(v: Column) -> Column:
    """Order-monotone log-linear coarsening of a non-negative long:
    ``bit_length(v) * 128 + top_7_bits(v)``.

    Both pieces come from the base-2 string (integer-exact, no float
    log2 edge cases — same trick as ``length_histogram``): the
    substring of the binary representation IS ``v >> (bit_length - 7)``.
    Monotone: within one bit-length the 7-bit prefix orders values;
    across bit-lengths the ``* 128`` term dominates (a 7-bit prefix is
    < 128). ≤ 64 × 64 ≈ 4k buckets spanning the full int64 range, each
    covering one log-linear cell — balanced for any broadly-spread
    distribution without knowing its range."""
    bin_ = F.conv(v.cast("long"), 10, 2)
    m = F.length(bin_).cast("long")
    prefix = F.conv(F.substring(bin_, 1, 7), 2, 10).cast("long")
    return m * 128 + prefix


def bucketed_rank(
    df: DataFrame,
    bucket: Column,
    order: list[Column],
    ascending_buckets: bool,
    rank_name: str = "_rank",
    total_name: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Exact global ``row_number`` over ``order`` without a global sort.

    ``bucket`` must be monotone along ``order`` (ascending when
    ``ascending_buckets``) and ``order`` must be total (end with a
    unique column). Adds ``rank_name`` (1-based long) and, when
    ``total_name`` is given, the total row count — replacing the
    ``count(*) over ()`` second unpartitioned window the quantile
    queries used to pay for (VERDICT r2 item 4).

    ``limit``: when the caller only keeps ranks ≤ limit (top-k), pass
    it here — every bucket whose starting offset is already ≥ limit is
    dropped BEFORE the rank window (its rows all satisfy
    rank = offset + row_number > limit), so they are never shuffled or
    sorted. This is what defuses the Zipf TIE-MASS hazard: ranking a
    web vocabulary by (freq desc, token asc) puts every hapax
    (freq = 1 — typically about half of all types) into ONE bucket,
    and without the pruning one task would sort that entire tie set
    just to assign ranks the caller immediately filters away. The
    returned ranks of surviving rows are bit-identical to the
    unlimited call (row_number is computed per bucket, and only whole
    buckets past the cutoff are removed); rows with rank in
    (limit, bucket end] still come back — callers filter exactly as
    before. For full-table rankings (deciles, RFM) no limit applies;
    there the bucket function must be fine enough that no single value
    atom concentrates the table (see module docstring).

    Shuffle budget: one partial-agg exchange on the bucket key (tiny
    output), one single-partition exchange over the PER-BUCKET COUNT
    table only, one hash exchange on the bucket key for the partitioned
    rank window, and a broadcast of the offsets. The full table is
    never sorted in one task."""
    b = df.withColumn("_rb", bucket.cast("long"))
    cnts = b.groupBy("_rb").agg(F.count("*").alias("_rc"))
    border = F.col("_rb").asc() if ascending_buckets else F.col("_rb").desc()
    wo = Window.orderBy(border).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy(border).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = cnts.select(
        "_rb",
        (F.sum("_rc").over(wo) - F.col("_rc")).alias("_off"),
        F.sum("_rc").over(wall).alias("_tot"),
    )
    if limit is not None:
        # whole-bucket top-k pruning: rank > _off for every row, so a
        # bucket starting at or past the cutoff contributes nothing.
        # Filtering the broadcast side prunes the big side's rows at
        # the join — the tie-mass bucket never reaches the rank sort.
        offs = offs.where(F.col("_off") < F.lit(int(limit)))
    j = b.join(F.broadcast(offs), "_rb")
    wl = Window.partitionBy("_rb").orderBy(*order)
    out = j.withColumn(
        rank_name, (F.col("_off") + F.row_number().over(wl)).cast("long")
    )
    if total_name is not None:
        out = out.withColumnRenamed("_tot", total_name)
    else:
        out = out.drop("_tot")
    return out.drop("_rb", "_off")
