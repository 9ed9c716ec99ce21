"""Unit tests for the fixed-point Lloyd k-means operator."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from narowi_ocr_spark.operators.clustering import (
    FP_SCALE,
    FP_SHIFT,
    dot_fp,
    kmeans_lloyd,
    quantize,
)


@pytest.fixture(scope="module")
def blobs(spark):
    """Two tight angular blobs: ids 0-2 near +x, ids 3-5 near +y.
    Seed centroids (id<2) are BOTH inside blob A — only the update step
    can move centroid 1 over to blob B, so the test fails unless Lloyd
    iteration actually refines."""
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.05, 0.0]),
        Row(vec_id=1, embedding=[1.0, 0.10, 0.0]),
        Row(vec_id=2, embedding=[1.0, 0.00, 0.05]),
        Row(vec_id=3, embedding=[0.05, 1.0, 0.0]),
        Row(vec_id=4, embedding=[0.10, 1.0, 0.0]),
        Row(vec_id=5, embedding=[0.0, 1.0, 0.05]),
    ]
    return spark.createDataFrame(rows)


def test_quantize_and_dot_exact(spark):
    df = spark.createDataFrame(
        [Row(a=[0.5, -0.25, 1.0], b=[1.0, 1.0, -1.0])]
    )
    got = df.select(
        quantize(F.col("a")).alias("qa"),
        dot_fp(quantize(F.col("a")), quantize(F.col("b"))).alias("d"),
    ).first()
    assert got["qa"] == [500000, -250000, 1000000]
    # Σ q(aᵢ)·q(bᵢ) — carries the SCALE² factor (cancels in cosine)
    assert got["d"] == (
        500000 * 1000000 + (-250000) * 1000000 + 1000000 * (-1000000)
    )


def test_kmeans_separates_blobs(blobs):
    got = {r.vec_id: r for r in kmeans_lloyd(blobs, k=2, iters=2).collect()}
    cells_a = {got[i].cell for i in (0, 1, 2)}
    cells_b = {got[i].cell for i in (3, 4, 5)}
    # each blob lands in exactly one cell, and the cells differ
    assert len(cells_a) == 1 and len(cells_b) == 1
    assert cells_a != cells_b
    # members sit close to their refined centroid
    assert all(got[i].cos_sim > 0.99 for i in range(6))


def test_kmeans_iteration_improves_fit(blobs):
    """Mean final-assignment cosine must not decrease with more Lloyd
    rounds (monotone WCSS is the Lloyd invariant)."""
    def mean_cos(iters):
        rows = kmeans_lloyd(blobs, k=2, iters=iters).collect()
        return sum(r.cos_sim for r in rows) / len(rows)

    m0, m2 = mean_cos(0), mean_cos(2)
    assert m2 >= m0 - 1e-9
    # with both seeds in blob A, round 0 cannot fit blob B well
    assert m2 > m0


def test_kmeans_shift_covers_range():
    # the non-negative-sum precondition for div/floor-div agreement
    assert FP_SHIFT > 0.6 * FP_SCALE  # embeddings bounded well inside ±1
    assert math.log2(FP_SHIFT) == 20
