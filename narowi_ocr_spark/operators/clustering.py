"""Distributed k-means (Lloyd iterations) over embedding columns — the
clustering step training-data pipelines use for semantic bucketing,
IVF-index training (similarity.ivf_cells consumes the centroids), and
cluster-balanced sampling.

The loop is the canonical Spark iterative-algorithm shape: centroids are
a k-row dimension BROADCAST to the assignment join (the corpus never
shuffles for assignment), and the update step shuffles only
(cell, dim, Σ, n) partial aggregates — map-side combined, so the
exchange is O(k·dim) per partition regardless of corpus size.

Cross-engine exactness (the property the DuckDB oracle gate needs) is
engineered, not hoped for:
  * vectors are quantized once to FIXED-POINT bigints
    (floor(x·10⁶ + 0.5) — float→double cast is exact, one IEEE multiply
    + floor, identical everywhere);
  * dot products and squared norms are then pure 64-bit INTEGER sums
    (|val| ≤ 2²⁰ ⇒ 64-dim dot ≤ 2⁴⁶ — no overflow, no float-sum
    ordering), so cosine is one deterministic double expression over
    three exact integers;
  * centroid updates are integer means with a +2²⁰ SHIFT so the
    floor division is over non-negative sums — Spark's `div` truncates
    toward zero while DuckDB's `//` floors, and they only agree on
    non-negative operands.

Iteration count is a fixed parameter (default 2): an oracle-replayable
query must pin its round count. A production fit-to-convergence run
wraps the same round body in the driver loop + localCheckpoint pattern
of ``components.connected_components`` (centroid movement as the cheap
fixpoint aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from narowi_ocr_spark.functions.native import round4

# Fixed-point scale for embedding quantization. 10⁶ keeps 64-dim integer
# dot products below 2⁴⁶ for |x| ≤ 1-ish embeddings and loses nothing
# that matters to cluster geometry (quantization error 5e-7 per dim).
FP_SCALE = 1_000_000

# Shift making per-dim values non-negative before the integer-mean floor
# division (see module docstring). Covers |x| ≤ FP_SHIFT/FP_SCALE ≈ 1.05.
FP_SHIFT = 1 << 20


def quantize(vec: Column | str) -> Column:
    """array<float/double> → array<long> fixed-point (floor(x·10⁶+0.5))."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        v,
        lambda x: F.floor(x.cast("double") * FP_SCALE + F.lit(0.5)).cast(
            "long"
        ),
    )


def dot_fp(a: Column, b: Column) -> Column:
    """Exact integer dot product of two fixed-point vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_fp(a: Column, b: Column) -> Column:
    """round4 cosine from exact integer dot/norms — bit-identical across
    engines (three exact integers into one IEEE expression). Degenerate
    vectors (all |x| < 0.5/FP_SCALE quantize to the zero vector, whose
    cosine is undefined) score a deterministic -1.0 — they rank below
    every real similarity and tie-break to the lowest cell instead of
    producing NULLs with engine-dependent ordering."""
    na, nb = dot_fp(a, a), dot_fp(b, b)
    return F.when(
        (na > 0) & (nb > 0),
        round4(
            dot_fp(a, b).cast("double")
            / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))
        ),
    ).otherwise(F.lit(-1.0))


def _assign(fx: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as a PURE PROJECTION: the k centroids
    are folded into one array row, broadcast, and each vector picks its
    argmax by an in-row fold — the corpus is never expanded k× and never
    shuffles (the previous formulation ranked the k-way cross join with
    a per-id window, i.e. a full corpus×k exchange per Lloyd round).
    Tie-break matches the old (cos desc, cell asc) rank: the fold array
    is sorted by cell and replacement is strictly-greater, and
    ``cosine_fp`` is total (degenerate vectors score -1.0, above the
    -2.0 fold seed), so the first maximal — lowest — cell wins.
    Returns (id, fv, cell, cos_sim)."""
    cell_t = cents.schema["cell"].dataType
    carr = cents.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cell"), F.col("cv")))
        ).alias("_cents")
    )
    seed = F.struct(
        F.lit(-2.0).alias("cos_sim"), F.lit(None).cast(cell_t).alias("cell")
    )
    best = F.aggregate(
        F.transform(
            "_cents",
            lambda c: F.struct(
                cosine_fp(F.col("fv"), c["cv"]).alias("cos_sim"),
                c["cell"].alias("cell"),
            ),
        ),
        seed,
        lambda acc, c: F.when(c["cos_sim"] > acc["cos_sim"], c).otherwise(acc),
    )
    return (
        fx.crossJoin(F.broadcast(carr))
        .select("id", "fv", best.alias("_best"))
        .select("id", "fv", F.col("_best.cell").alias("cell"),
                F.col("_best.cos_sim").alias("cos_sim"))
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids = per-dim integer mean of the members' fixed-point
    values (shifted so the floor division is over non-negative sums).
    Cells that lost every member disappear (standard cluster death)."""
    ex = assigned.select(
        "cell", F.posexplode("fv").alias("dim", "val")
    )
    m = (
        ex.groupBy("cell", "dim")
        .agg(
            F.sum(F.col("val") + F.lit(FP_SHIFT)).alias("s"),
            F.count("*").alias("c"),
        )
        .select(
            "cell",
            "dim",
            (F.expr("s div c") - F.lit(FP_SHIFT)).cast("long").alias("m"),
        )
    )
    return m.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))),
            lambda st: st["m"],
        ).alias("cv")
    )


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd rounds (assign → update) from the
    deterministic seed centroids (the k lowest-id vectors — the same
    convention similarity.ivf_cells uses), then return the final
    assignment: (id, cell, cos_sim) against the refined centroids.

    Plan shape per round: one broadcast-join projection (assignment — no
    shuffle of the corpus) + one partial-aggregated (cell, dim) rollup
    (update — O(k·dim) rows per partition reach the exchange). With
    fixed ``iters`` the whole fit is a single static DAG — no driver
    round-trips — which also makes it expressible as one oracle query.
    """
    fx = vectors.select(
        F.col(id_col).alias("id"), quantize(vec_col).alias("fv")
    )
    # the k LOWEST ids, whatever the id space looks like — a WHERE id<k
    # filter would silently under-seed (or empty out) non-dense or
    # non-zero-based id spaces
    cents = (
        fx.orderBy("id")
        .limit(k)
        .select(F.col("id").alias("cell"), F.col("fv").alias("cv"))
    )
    for _ in range(iters):
        cents = _update(_assign(fx, cents))
    return _assign(fx, cents).select(
        F.col("id").alias(id_col), "cell", "cos_sim"
    )
