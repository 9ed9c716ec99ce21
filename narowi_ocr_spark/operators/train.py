"""On-cluster classifier TRAINING — the missing half of the
hashing-trick quality filter.

``functions/textstats.linear_quality_classifier`` ships the INFERENCE
dataflow (fastText-style bag-of-hashed-words scoring, the
FineWeb-Edu/DCLM filter shape) but loads a stub weight vector with the
note "a real deployment loads the trained vector instead". This module
trains that vector on the cluster: a batch perceptron over the same
md5-bucket features, run entirely in integer arithmetic so the learned
weights are bit-identical across engines, partitionings, and reruns —
the property that makes training itself oracle-gateable against DuckDB
(no float Σ whose value depends on aggregation order, no transcendental
sigmoid whose last ulp differs across libm builds).

Reference analogue: the reference hard-codes its recognition thresholds
(image_processor.py:30-45 config constants); this is the learned
replacement a web-scale pipeline actually deploys, trained where the
data lives.

Scale shape (the part that must survive 100 TB):
- Featurization is ONE explode + groupBy(doc, bucket) shuffle of
  (doc_id, bkt, cnt) triples; the raw text is read once and never
  shuffled. The (doc, bkt) matrix is the per-epoch working set — for
  a 256-bucket model it is ≤256 ints per doc, orders of magnitude
  smaller than the corpus.
- The per-epoch working set is the matrix grouped ONCE into one row
  per doc (doc_id, y, fv: array<(bkt, cnt)>) and cached in that shape,
  so each epoch is a single scan: the doc's score is a row-local
  ``F.aggregate`` over fv with the weight vector folded into the plan
  as a literal array (no window, no join, no shuffle to score), and
  the only exchange per epoch is the gradient groupBy(bkt) whose
  map-side-combined output is ≤n_buckets rows per partition.
- Model state (the weight vector) is O(n_buckets) and lives on the
  driver between epochs — the same driver-aggregation shape Spark
  MLlib uses; the collect is bounded by the model size, never by the
  data size.

Determinism / overflow: weights, gradients, and the geometric step
schedule are exact int64 (see ``perceptron_train`` for the bound);
per-(doc,bkt) counts are clipped (``clip_cnt``) exactly like the
clipped tf in BM25 — the default clip (15) matches the subword-count
clipping used by hashed fastText implementations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from narowi_ocr_spark.functions.textstats import words

_HEX = "0123456789abcdef"


def md5_bucket(col: Column, n_buckets: int) -> Column:
    """Engine-portable feature hash: first one/two hex digits of
    md5(token) → [0, 16) or [0, 256). Identical expression to the
    inference classifier and the shard assigner, so training and
    inference share one feature space. (Deployment scoring of a
    TRAINED vector goes through ``perceptron_score`` — weights here
    are signed and carry a bias slot, whereas
    ``linear_quality_classifier``'s literal-array fast path is
    restricted to non-negative weights for integer-division
    portability of its mean score.)"""
    if n_buckets not in (16, 256):
        raise ValueError("n_buckets must be 16 or 256")
    hex_arr = F.array(*[F.lit(c) for c in _HEX])
    h = F.md5(col)
    b = F.array_position(hex_arr, F.substring(h, 1, 1)) - 1
    if n_buckets == 256:
        b = b * 16 + F.array_position(hex_arr, F.substring(h, 2, 1)) - 1
    return b.cast("int")


def hashed_token_counts(
    df: DataFrame,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    clip_cnt: int = 15,
    bias: bool = False,
) -> DataFrame:
    """(doc_id, bkt, cnt) sparse feature matrix: case-folded whitespace
    tokens hashed into ``n_buckets`` md5 buckets, counts clipped at
    ``clip_cnt`` (overflow bound + the standard tf dampening). One
    shuffle; zero-token docs contribute no rows (callers must treat a
    missing doc as the zero vector).

    ``bias=True`` appends a constant feature (bkt = ``n_buckets``,
    cnt = 1) for EVERY input doc — including zero-token docs, so every
    doc then appears in the matrix. Without it a linear model over
    non-negative counts cannot express a count threshold (score 0 is
    unreachable from below); weight vectors must then have
    ``n_buckets + 1`` entries."""
    toks = words(F.lower(F.col(text_col)))
    ex = df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("_w"))
    counts = (
        ex.select("doc_id", md5_bucket(F.col("_w"), n_buckets).alias("bkt"))
        .groupBy("doc_id", "bkt")
        .agg(F.least(F.count("*"), F.lit(clip_cnt)).cast("long").alias("cnt"))
    )
    if not bias:
        return counts
    bias_rows = df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(n_buckets).cast("int").alias("bkt"),
        F.lit(1).cast("long").alias("cnt"),
    )
    return counts.unionByName(bias_rows)


def hashed_doc_matrix(
    df: DataFrame,
    label: Column,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    clip_cnt: int = 15,
    bias: bool = True,
) -> DataFrame:
    """(doc_id, y, fv) grouped feature matrix with the label computed
    in the SAME corpus pass — the fused fast path for callers whose
    label is an expression over the doc row (the usual case: a topic
    rule, a teacher score threshold). Removes the feats⋈labels shuffle
    join of the two-input ``perceptron_train`` path: the matrix build
    is one scan + two key-local aggregations instead of one scan per
    side plus a join. Bit-identical weights to the join path (verified
    in tests/test_train.py): the (doc_id, y, fv) multiset is the same,
    and every downstream fold is order-independent integer arithmetic.

    ``bias=True`` (the default here — training without it can't express
    a count threshold) gives zero-token docs their bias-only row, so
    the fused path covers exactly the docs the join path covers.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        label.cast("long").alias("y"),
        F.col(text_col).alias("_t"),
    )
    toks = words(F.lower(F.col("_t")))
    counts = (
        base.select("doc_id", "y", F.explode(toks).alias("_w"))
        .select("doc_id", "y", md5_bucket(F.col("_w"), n_buckets).alias("bkt"))
        .groupBy("doc_id", "y", "bkt")
        .agg(F.least(F.count("*"), F.lit(clip_cnt)).cast("long").alias("cnt"))
    )
    if bias:
        counts = counts.unionByName(
            base.select(
                "doc_id",
                "y",
                F.lit(n_buckets).cast("int").alias("bkt"),
                F.lit(1).cast("long").alias("cnt"),
            )
        )
    return counts.groupBy("doc_id", "y").agg(
        F.collect_list(F.struct("bkt", "cnt")).alias("fv")
    )


def perceptron_train(
    feats: DataFrame | None = None,
    labels: DataFrame | None = None,
    n_weights: int = 256,
    epochs: int = 8,
    matrix: DataFrame | None = None,
) -> list[int]:
    """Batch perceptron over the hashed feature matrix with geometric
    step decay. ``labels`` is (doc_id, y) with y ∈ {+1, −1};
    ``n_weights`` is the weight-vector length (``n_buckets``, or
    ``n_buckets + 1`` when the matrix carries a bias feature). Returns
    the dense integer weight vector after ``epochs`` full-batch
    updates.

    Epoch e (0-indexed): score every doc under the current weights
    (w folds into the plan as a literal array and the score is a
    row-local ``F.aggregate`` over the doc's cached feature array —
    no weight-table join, no window, no shuffle), mark docs with
    y·score ≤ 0 misclassified (ties update, so epoch 1 under w=0
    updates on every doc — that pass is skipped analytically), and add
    2^(epochs−1−e) · Σ_misclassified y·cnt to each bucket.

    The decayed step is what makes FULL-BATCH perceptron converge in
    practice: with a constant step the aggregated gradient magnitude
    (~corpus token count) dwarfs the separating margin and the model
    flip-flops between all-positive and all-negative states; halving
    the step each epoch anneals onto the boundary (and since sign
    predictions are scale-invariant, the power-of-2 scaling costs
    nothing). All arithmetic stays exact int64 — no float learning
    rate — so the learned vector is bit-identical across engines and
    partitionings; the per-epoch driver collect is ≤ n_weights rows
    (model state, not data).

    Overflow bound: |w| ≤ 2^epochs · Σ_docs Σ_bkt cnt, and scores add
    a ×(clip·n_weights) factor — safe in int64 through ~10⁹-doc
    training sets at the default geometry; a 10¹²-doc run trains on a
    deterministic md5-threshold subsample (the standard practice — the
    classifier needs ~10⁶ docs, not the corpus) rather than widening
    the accumulators.

    ``matrix`` (mutually exclusive with feats/labels) accepts a
    pre-grouped (doc_id, y, fv) table — ``hashed_doc_matrix``'s fused
    single-pass build — skipping the join below entirely.
    """
    w = [0] * n_weights
    if matrix is not None:
        if feats is not None or labels is not None:
            raise ValueError("pass either (feats, labels) or matrix, not both")
        docs = matrix.persist()
    else:
        # group the matrix ONCE into one cached row per doc — the
        # per-epoch loop then never shuffles the matrix again (the
        # join+groupBy here is paid once for all epochs; the cached
        # shape is the same payload as the triples, just pre-co-located
        # by doc)
        docs = (
            feats.join(labels, "doc_id")
            .groupBy("doc_id", "y")
            .agg(F.collect_list(F.struct("bkt", "cnt")).alias("fv"))
            .persist()
        )
    try:
        for epoch in range(epochs):
            step = 1 << (epochs - 1 - epoch)
            if any(w):
                # row-local score: Σ cnt·w[bkt] over the doc's feature
                # array (collect_list order is nondeterministic, but an
                # integer sum is order-independent) — "misclassified"
                # is a per-row filter with ZERO exchanges.
                # ONE array Literal, not CreateArray of n_weights
                # literals: the single Literal lands in the codegen
                # references array, so the generated source is
                # identical across epochs (Janino cache hit) instead of
                # recompiling n_weights inlined constants every epoch —
                # measured ~25% off the epoch loop at sf0.1.
                w_arr = F.lit([int(v) for v in w]).cast("array<long>")
                score = F.aggregate(
                    F.col("fv"),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc
                    + x["cnt"] * F.element_at(w_arr, x["bkt"] + 1),
                )
                grad_src = docs.where(F.col("y") * score <= 0)
            else:
                # all-zero weights score every doc 0 → y·0 ≤ 0 → every
                # doc is misclassified; the scoring pass is the identity
                grad_src = docs
            # the ONLY exchange per epoch: gradient groupBy(bkt),
            # map-side combined to ≤n_weights rows per partition
            grad = (
                grad_src.select("y", F.explode("fv").alias("_f"))
                .groupBy(F.col("_f.bkt").alias("bkt"))
                .agg(F.sum(F.col("y") * F.col("_f.cnt")).alias("g"))
                .collect()
            )
            for row in grad:
                w[row["bkt"]] += step * row["g"]
    finally:
        docs.unpersist()
    return w


def weights_table(spark: SparkSession, w: list[int]) -> DataFrame:
    """Dense (bkt, weight) table for the learned vector — the artifact
    a deployment persists and ``linear_quality_classifier`` loads."""
    return spark.createDataFrame(
        [(b, int(v)) for b, v in enumerate(w)], "bkt int, weight long"
    )


def perceptron_score(
    feats: DataFrame,
    w: list[int],
) -> DataFrame:
    """Score (doc_id → Σ cnt·w[bkt]) under a trained vector; the same
    literal-array fold as training. Docs absent from ``feats`` (zero
    tokens) are absent here — callers coalesce to 0."""
    w_arr = F.array(*[F.lit(int(v)).cast("long") for v in w])
    return feats.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.element_at(w_arr, F.col("bkt") + 1)).alias(
            "score"
        )
    )
