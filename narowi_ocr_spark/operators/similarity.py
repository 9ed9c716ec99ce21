"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k as the exact baseline, a sign-LSH
(random-hyperplane) bucketed variant (Charikar, STOC 2002), and IVF
coarse quantization with multi-probe (the inverted-file half of
Jégou/Douze/Schmid, "Product quantization for nearest neighbor
search", TPAMI 2011) as the scale paths.

Everything is native Catalyst (zip_with / aggregate higher-order
functions) so the arithmetic is reproducible in the DuckDB oracles and
stays JVM-side. The hyperplanes are deterministic ±1 Rademacher vectors
derived from md5 parity at module import, embedded as literal arrays —
identical constants appear in the oracle SQL.

Scale notes:
  - brute-force is O(|Q|·N): correct usage broadcasts the small query set
    against the big corpus (narrow after broadcast — no shuffle of the
    corpus side);
  - sign-LSH reduces the candidate set to one bucket (or a multi-probe
    neighborhood); the bucket id is 8 native dot products per row, narrow;
  - at 100 TB the bucketed table is written partitioned by ``bucket`` so
    probes prune partitions at scan time.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from narowi_ocr_spark.functions.native import round4

NUM_PLANES = 8
DIM = 64


def _rademacher(plane: int, dim: int) -> list[int]:
    """Deterministic ±1 weight vector for one hyperplane: the parity of
    the first hex digit of md5('<plane>:<dim>')."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        out.append(1 if h[0] in "89abcdef" else -1)
    return out


HYPERPLANES: list[list[int]] = [_rademacher(p, DIM) for p in range(NUM_PLANES)]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — sequential fold, so the float
    result is bit-identical to the oracle's list_dot_product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    ``queries`` (small — broadcast) × ``vectors`` (the 100 TB side) →
    per-query ranking. The corpus side never shuffles: broadcast join +
    window over query_id groups (each group is |corpus| rows, ranked with
    partial top-k pushdown via the window's rank filter under AQE).
    Cosine is rounded to 4 decimals before ranking, with id tie-break,
    for cross-engine determinism.
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            round4(cosine(F.col("qvec"), F.col("nvec"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_bucket(vec: Column | str) -> Column:
    """Sign-LSH bucket id: bit *p* is 1 iff ⟨vec, hyperplane_p⟩ > 0."""
    v = _col(vec)
    out = F.lit(0)
    for p, plane in enumerate(HYPERPLANES):
        w = F.array(*[F.lit(float(x)) for x in plane])
        out = out + F.when(dot(v, w) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out


def _nearest_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    n: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared centroid assignment (the single source of truth for the
    tie-break and rounding — corpus cells and query probes MUST agree on
    it or the cells-partition-the-corpus invariant breaks): each vector
    with its ``n`` max-cosine centroids (ties → lower cell id), computed
    entirely IN-ROW — the K centroids fold into one broadcast array row
    and each vector sorts its K scores with a comparator that replays
    the old window order (csim desc nulls-last, cell asc) and slices the
    top ``n``. The corpus side is a pure projection: no k-way row
    expansion, no per-id window exchange (the previous formulation
    shuffled corpus×K rows per call)."""
    carr = centroids.agg(
        F.collect_list(
            F.struct(
                F.col(id_col).alias("cell"), F.col(vec_col).alias("cvec")
            )
        ).alias("_cents")
    )

    def by_window_order(l, r):  # csim desc nulls-last, cell asc
        return (
            F.when(
                l["csim"].isNull() & r["csim"].isNull(),
                F.when(l["cell"] < r["cell"], F.lit(-1)).otherwise(F.lit(1)),
            )
            .when(l["csim"].isNull(), F.lit(1))
            .when(r["csim"].isNull(), F.lit(-1))
            .when(l["csim"] > r["csim"], F.lit(-1))
            .when(l["csim"] < r["csim"], F.lit(1))
            .when(l["cell"] < r["cell"], F.lit(-1))
            .otherwise(F.lit(1))
        )

    top = F.slice(
        F.array_sort(
            F.transform(
                "_cents",
                lambda c: F.struct(
                    round4(cosine(F.col(vec_col), c["cvec"])).alias("csim"),
                    c["cell"].alias("cell"),
                ),
            ),
            by_window_order,
        ),
        1,
        n,
    )
    return (
        vectors.crossJoin(F.broadcast(carr))
        .select(id_col, vec_col, F.explode(top).alias("_t"))
        .select(id_col, vec_col, F.col("_t.cell").alias("cell"))
    )


def ivf_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its max-cosine
    centroid cell. ``centroids`` is small (K rows) and broadcast. At
    100 TB the assigned table is written partitioned by ``cell`` so
    probes scan only their cells. Centroid choice is pluggable (k-means
    on a sample offline); any deterministic K vectors work for the
    dataflow."""
    return _nearest_cells(vectors, centroids, 1, id_col, vec_col)


def ivf_query_cells(
    queries: DataFrame,
    centroids: DataFrame,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, qvec, cell) with one row per probed cell: the query's
    ``n_probe`` nearest centroids. n_probe is THE recall/latency knob of
    IVF — each probed cell adds one partition-pruned scan of the
    cell-partitioned corpus; since cells partition the corpus, probes
    never duplicate candidates."""
    return _nearest_cells(queries, centroids, n_probe, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        "cell",
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: rank only candidates in the query's
    ``n_probe`` nearest cells. Complements ``bucketed_topk`` — IVF cells
    follow the data distribution where sign-LSH buckets are
    data-independent."""
    from pyspark.sql.window import Window

    cells = ivf_cells(vectors, centroids, id_col, vec_col)
    q = ivf_query_cells(queries, centroids, n_probe, id_col, vec_col)
    scored = (
        cells.join(F.broadcast(q), on="cell")
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            round4(cosine(F.col("qvec"), F.col(vec_col))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup counterpart of
    ANN search): candidate pairs come from a sign-LSH bucket self-join —
    never the O(N²) cross product — and survive iff cosine ≥ threshold.
    Canonical id_a < id_b ordering.

    At 100 TB the table is written partitioned by ``bucket`` so the
    self-join is partition-local (co-located scan, no full shuffle of the
    corpus); buckets are balanced by construction (random hyperplanes),
    so no skew handling is needed beyond AQE."""
    b = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(vec_col).alias("bucket"),
    )
    return (
        b.alias("a")
        .join(b.alias("b"), on="bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            round4(cosine(F.col("a.v"), F.col("b.v"))).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: rank only candidates in the query's LSH bucket.
    The corpus is bucketed once (narrow, 8 dot products/row); the join is
    an equi-join on ``bucket`` — at scale a partition-pruned scan of the
    pre-bucketed table instead of a full pass."""
    from pyspark.sql.window import Window

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        lsh_bucket(vec_col).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket(vec_col).alias("bucket"),
    )
    scored = (
        v.join(F.broadcast(q), on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            round4(cosine(F.col("qvec"), F.col("nvec"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): documents whose EMBEDDINGS are near-identical are
    redundant even when their text differs (templated pages, rewrites,
    translations-of-boilerplate), so cluster by embedding cosine and
    keep one representative per cluster. The default threshold (0.95)
    targets near-IDENTICAL embeddings per the paper; lowering it merges
    merely topically-related documents and, through the transitive
    closure, can chain large fractions of a real corpus into one
    cluster — tune against a held-out sample before dropping it.

    Composition of two already-scale-shaped pieces:
      1. ``embedding_near_dup_pairs`` — sign-LSH bucket self-join, so
         candidate generation is partition-local on the bucketed table,
         never O(N²);
      2. ``connected_components`` — near-dup similarity is transitive in
         practice, so pairs are closed into clusters with the iterative
         min-label propagation (one (id, long) shuffle per round,
         diameter-bounded rounds).

    Returns (id, component, is_kept): component is the min reachable id
    (the cluster's canonical representative, consistent with
    exact_dedup's keep-min rule) and is_kept marks the one row per
    cluster that survives. Downstream, the kept set is a semi-join
    filter on the corpus — ids only, embeddings and text never move.
    """
    from narowi_ocr_spark.operators.components import connected_components

    pairs = embedding_near_dup_pairs(
        vectors, threshold=threshold, id_col=id_col, vec_col=vec_col
    )
    nodes = vectors.select(F.col(id_col).alias("id"))
    labels = connected_components(pairs, nodes=nodes)
    return labels.select(
        F.col("id").alias(id_col),
        F.col("comp").alias("component"),
        (F.col("id") == F.col("comp")).alias("is_kept"),
    )


def semantic_contamination(
    vectors: DataFrame,
    eval_vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    complement of ``corpus.contamination``'s n-gram overlap (paraphrased
    or translated eval leakage shares no n-grams but sits next to the
    eval item in embedding space; cf. the contamination analyses in
    GPT-3 App. C and SemDeDup §5).

    Flags every corpus vector whose cosine to ANY eval vector is
    ≥ threshold. Returns (id, max_eval_cos, contaminated) for every
    corpus row.

    Scale shape: eval sets are tiny (10³-10⁴ prompts) next to the corpus
    (10⁹⁺ docs), so the whole eval set is collected into ONE array row
    and broadcast — the corpus side is a single narrow projection (a
    per-row array_max over the eval vectors) with NO shuffle anywhere:
    not even an (id, max) rollup, because the max-over-evals happens
    inside the row. An eval set too big for one row (>>10⁵ vectors) is
    the signal to switch to the bucketed-join variant
    (``bucketed_topk``'s shape) instead."""
    # cosine in DOUBLE end-to-end: float32-element products round at
    # single precision and can flip a round4 boundary between engines —
    # the widened fold is bit-identical everywhere
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    evs = eval_vectors.agg(
        F.collect_list(F.col(vec_col).cast("array<double>")).alias("evs")
    )
    scored = v.join(F.broadcast(evs)).select(
        "id",
        F.coalesce(
            F.array_max(
                F.transform(
                    F.col("evs"),
                    lambda e: round4(cosine(F.col("v"), e)),
                )
            ),
            F.lit(-1.0),
        ).alias("max_eval_cos"),
    )
    return scored.select(
        "id",
        "max_eval_cos",
        (F.col("max_eval_cos") >= threshold).alias("contaminated"),
    )


Q_SCALE = 1_000_000


def gemm_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via an Arrow-batched integer GEMM kernel.

    Same answer shape as ``brute_force_topk`` but the per-pair math runs
    as ONE ``Q @ Vᵀ`` matrix multiply per Arrow batch instead of |Q|
    interpreted higher-order folds per row — the BLAS path is the right
    hot loop once |Q| grows past a handful (the HOF fold is interpreted,
    outside whole-stage codegen).

    Cross-engine exactness without float-summation-order traps: each
    component is quantized to an int64 grid (``floor(x·1e6 + 0.5)``, the
    house half-up rounding — identical in numpy / Catalyst / DuckDB) and
    the GEMM runs in float64, where every product (≤ ~2⁴⁰) and every
    partial dot (64-dim ⇒ ≤ ~2⁴⁴) is an integer below 2⁵³ — i.e. the
    float64 arithmetic is EXACT and associative, so BLAS reordering
    cannot change a single bit. cos = D/√(‖q‖²·‖v‖²) is then a fixed
    chain of correctly-rounded IEEE ops on identical integers in every
    engine. Zero-norm vectors score 0.0 (guarded, never NaN).

    Scale shape: the query block (|Q|·dim ints) rides into each task via
    the closure; the corpus never shuffles; each batch emits only its
    local top-k per query, so the final exchange carries
    |Q|·k·n_batches candidate rows into one global window.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()  # small side only
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.floor(
        np.array([r[1] for r in q_rows], dtype=np.float64) * Q_SCALE + 0.5
    )
    qn = (Q * Q).sum(axis=1)  # exact integers in float64

    out_schema = (
        "query_id long, neighbor_id long, dot_q long, cos_sim double"
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            V = np.floor(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                * Q_SCALE
                + 0.5
            )
            vn = (V * V).sum(axis=1)
            D = Q @ V.T  # |Q| × batch, exact integer-valued float64
            denom = np.sqrt(qn[:, None] * vn[None, :])
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0.0, D / denom, 0.0)
            for qi in range(len(qids)):
                mask = ids != qids[qi]
                cand_ids = ids[mask]
                cand_cos = cos[qi][mask]
                cand_dot = D[qi][mask]
                order = np.lexsort((cand_ids, -cand_cos))[:k]
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "neighbor_id": cand_ids[order],
                        "dot_q": cand_dot[order].astype(np.int64),
                        "cos_sim": cand_cos[order],
                    }
                )

    from pyspark.sql.window import Window

    local = vectors.select(id_col, vec_col).mapInPandas(
        kernel, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_q", "cos_sim", "rank")
    )


RECALL_SCALE = 1_000_000


def quantize_embeddings(
    vectors: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric scalar quantization to ``bits``-bit signed
    integers (the storage/transport format every production vector store
    uses — int8 cuts a 100 TB float32 embedding corpus to 25 TB and
    quadruples the vectors per scan batch), plus EXACT reconstruction
    diagnostics so the quality cost is measured, not assumed.

    q_i = floor(x_i·L/scale + 0.5) with L = 2^(bits-1)-1 and
    scale = max|x_i| (per-vector max-abs) — round-half-up in pure IEEE
    ops, bit-identical across engines (same trick as ``round4``).
    Zero vectors quantize to all-zero with scale 0.

    Returns (id, n_dims, scale_r4, q_sum, q_min, q_max, q_md5, mse_r4):
    q_sum/q_min/q_max are integer-exact over the quantized vector,
    q_md5 is the digest of the comma-joined int codes (locks every code
    exactly), mse_r4 the round4 mean squared reconstruction error via
    the same sequential fold as ``dot``.

    Scale shape: one narrow projection — no shuffle, no UDF; every
    expression is codegen HOFs over the array column. The quantized
    codes stay array<long> here for oracle comparability; a production
    writer would pack them to binary with ``F.to_binary``-style encoders
    at the sink.
    """
    from narowi_ocr_spark.functions.native import round4

    level = float((1 << (bits - 1)) - 1)
    v = _col(vec_col)
    x = F.transform(v, lambda e: e.cast("double"))
    staged = vectors.select(
        F.col(id_col),
        x.alias("_x"),
        F.array_max(F.transform(x, F.abs)).alias("_scale"),
    )
    code = lambda e: F.when(F.col("_scale") == 0.0, F.lit(0).cast("long")).otherwise(
        F.floor(e * F.lit(level) / F.col("_scale") + F.lit(0.5))
    )
    # Stage the code array once, then derive the reconstruction error
    # from it via zip_with: HOF lambdas are interpreted with no CSE, so
    # inlining code(e) into the error expression would evaluate the
    # quantization ~3× per dimension.
    staged = staged.select(
        F.col(id_col), "_x", "_scale", F.transform("_x", code).alias("_q")
    )
    err2 = F.zip_with(
        "_x",
        "_q",
        lambda e, qv: (
            e - qv.cast("double") * F.col("_scale") / F.lit(level)
        )
        * (e - qv.cast("double") * F.col("_scale") / F.lit(level)),
    )
    staged = staged.select(
        F.col(id_col),
        F.size("_x").alias("n_dims"),
        round4(F.col("_scale")).alias("scale_r4"),
        F.col("_q"),
        F.aggregate(err2, F.lit(0.0), lambda a, b: a + b).alias("_sse"),
    )
    return staged.select(
        id_col,
        "n_dims",
        "scale_r4",
        F.aggregate("_q", F.lit(0).cast("long"), lambda a, b: a + b).alias(
            "q_sum"
        ),
        F.array_min("_q").cast("int").alias("q_min"),
        F.array_max("_q").cast("int").alias("q_max"),
        F.md5(
            F.array_join(
                F.transform(F.col("_q"), lambda e: e.cast("string")), ","
            )
        ).alias("q_md5"),
        round4(F.col("_sse") / F.col("n_dims").cast("double")).alias(
            "mse_r4"
        ),
    )


def ann_recall(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    approx=None,
) -> DataFrame:
    """Recall@k of an approximate ANN strategy against the exact
    ranking, per query — the evaluation harness that turns "the bucketed
    path is probably fine" into a number before a 100 TB index build
    commits to a geometry (planes per LSH bucket, IVF probe count).

    Returns (query_id, n_exact, n_found, recall_scaled, recall):
    ``n_exact`` is the exact top-k size (k, unless the corpus is
    smaller), ``n_found`` how many of those ids the approximate result
    also returned, recall their ratio (fixed-point div, then the exact
    double twin). Both rankings use the same deterministic total order
    (round4 cosine desc, id asc), so the comparison is reproducible
    across engines and partitionings.

    Scale shape: this is an EVAL operator — run it on a few hundred
    SAMPLED queries (e.g. ``fixed_count_sample``), where the exact side
    is a broadcast-join scan of the corpus (the corpus never shuffles)
    and the approximate side is whatever the production path costs. The
    id-pair join between the two k-row-per-query results is trivial.
    """
    if approx is None:
        approx = bucketed_topk
    exact = brute_force_topk(vectors, queries, k, id_col, vec_col)
    ann = approx(vectors, queries, k, id_col, vec_col)
    hits = exact.select("query_id", "neighbor_id").join(
        ann.select(
            F.col("query_id").alias("aq"),
            F.col("neighbor_id").alias("an"),
            F.lit(1).alias("_hit"),
        ),
        (F.col("query_id") == F.col("aq"))
        & (F.col("neighbor_id") == F.col("an")),
        "left",
    )
    agg = hits.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_found"),
    )
    return agg.select(
        "query_id",
        F.col("n_exact").cast("int").alias("n_exact"),
        F.col("n_found").cast("int").alias("n_found"),
        F.expr(f"({RECALL_SCALE} * n_found) div n_exact").alias(
            "recall_scaled"
        ),
        (
            F.expr(f"({RECALL_SCALE} * n_found) div n_exact").cast("double")
            / F.lit(float(RECALL_SCALE))
        ).alias("recall"),
    )
