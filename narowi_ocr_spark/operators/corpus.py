"""Corpus-level curation operators for large-scale training-data
pipelines: benchmark decontamination (n-gram overlap against an eval
set), deterministic stratified sampling, and a character-bigram LM
quality score (learn/apply gibberish filter).

All three follow the two-sided corpus-operator pattern established by
``textstats.doc_keywords``: a LEARN side that reduces the corpus (or a
small eval set) to a compact statistics table, and an APPLY side that
joins those statistics back per document. Raw text never shuffles in
any of them — only (id, gram/count) pairs after map-side partial
aggregation, and every small side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from narowi_ocr_spark.functions.native import round4
from narowi_ocr_spark.functions.textstats import ngrams


def contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM pattern):
    flag every corpus document that shares at least one word ``n``-gram
    with the evaluation set.

    Returns one row per corpus document:
      (id, n_grams, n_overlap, contaminated)
    where ``n_grams`` is the document's distinct-n-gram count,
    ``n_overlap`` how many of those appear anywhere in the eval set,
    and ``contaminated`` = n_overlap > 0.

    Scale shape: the eval-set gram table is tiny relative to the corpus
    (benchmarks are thousands of prompts, the corpus is billions of
    docs), so it is broadcast — the corpus side joins without any
    shuffle; the only exchange is the (id, count) partial-aggregated
    rollup, and the final flag join is id-to-id. Raw text never leaves
    the scan stage. Gram strings are short (n words) and only live
    inside the broadcast-hash probe, so hashing them to fixed-width
    digests is unnecessary.
    """
    eval_grams = (
        eval_df.select(
            F.explode(F.array_distinct(ngrams(eval_text_col, n))).alias("g")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE pass over the corpus: the doc's gram count rides along the
    # explode (explode_outer keeps zero-gram docs), the broadcast left
    # join marks eval hits, and one partial-aggregated rollup rebuilds
    # the per-doc row — the corpus is scanned once and shuffles once.
    staged = corpus.withColumn("_grams", F.array_distinct(ngrams(text_col, n)))
    exploded = staged.select(
        F.col(id_col).alias("id"),
        F.size("_grams").alias("_n_grams"),
        F.explode_outer(F.col("_grams")).alias("g"),
    )
    marked = exploded.join(F.broadcast(eval_grams), "g", "left")
    return (
        marked.groupBy("id")
        .agg(
            F.max("_n_grams").alias("n_grams"),
            F.count("_hit").cast("int").alias("n_overlap"),
        )
        .select(
            "id",
            "n_grams",
            "n_overlap",
            (F.col("n_overlap") > 0).alias("contaminated"),
        )
    )


def _rate_to_hex_threshold(rate: float) -> str:
    """Sampling rate -> 8-hex-char threshold for lexicographic compare
    against the first 8 chars of a lowercase md5 hex digest. Hex-string
    order is value order, so ``digest8 < threshold`` keeps a ``rate``
    fraction of the uniform digest space. rate>=1 uses 'g', which every
    hex string sorts below (full keep); rate<=0 uses '0' (keep none)."""
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "0"
    return format(int(rate * 16**8), "08x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Deterministic per-stratum sampling — the training-mix operator
    (C4/Pile-style source weighting). Each stratum keeps a fixed,
    engine-independent fraction of its rows: a row survives iff the
    first 8 hex chars of md5(salt || id) sort below the stratum's
    rate threshold. Strata absent from ``rates`` are dropped.

    Unlike ``df.sampleBy`` (seeded RNG, partition-layout dependent) the
    decision is a pure function of (salt, id), so the sample is
    reproducible across runs, engines, cluster sizes, and partitionings
    — the property a 100 TB pipeline needs for resumable/incremental
    runs. The rates table is a broadcast dim (few hundred sources at
    most), so the fact side neither shuffles nor re-partitions; the
    filter composes with scan-level pushdown of any stratum pruning.
    """
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        [(k, _rate_to_hex_threshold(v)) for k, v in rates.items()],
        f"{strata_col} string, _thr string",
    )
    keyed = df.withColumn(
        "_u",
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
    )
    return (
        keyed.join(F.broadcast(rdf), strata_col)
        .where(F.col("_u") < F.col("_thr"))
        .drop("_thr")
        .withColumnRenamed("_u", "sample_key")
    )


# Fixed-point scale for the char-bigram conditional probabilities. Chosen
# so p_scaled = floor(SCALE * cnt / ctx_total) is exact 64-bit integer
# arithmetic in every engine (cnt, ctx_total < 2^40 even at 100 TB-per-
# partition-of-vocab scale; SCALE * cnt < 2^62).
LM_SCALE = 1_000_000


def char_bigram_lm(
    corpus: DataFrame,
    apply_to: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-bigram language-model score — the CCNet/KenLM-style
    "does this look like language we trained on?" filter, in two
    phases: LEARN P(c2|c1) from the corpus, APPLY the model per
    document (to ``apply_to`` if given, else self-score the corpus).

    Returns (id, n_bigrams, lm_sum, lm_score): ``lm_sum`` is the exact
    integer sum of fixed-point conditional probabilities
    floor(1e6·count(c1c2)/count(c1·)) over the document's bigram
    occurrences, ``lm_score`` = round4(lm_sum / n_bigrams / 1e6) — the
    average conditional probability of each character given its
    predecessor. Gibberish (uniform random chars) scores near 1/|V|;
    in-distribution text scores an order of magnitude higher.

    Fixed-point instead of log-prob is deliberate: integer division and
    integer sums are bit-exact in every engine, so the DuckDB oracle
    hash-matches without floating-sum-order traps; the single double
    division at the end is IEEE-exact. (A log-perplexity variant would
    rank identically for filtering thresholds in practice but cannot be
    made cross-engine exact.) Monotone transform caveat documented: the
    average-probability score compresses differently than perplexity,
    which is acceptable for a keep/drop gate.

    Scale shape: the learn side explodes (bigram) tokens but partial-
    aggregates them map-side, so at most |V|² rows per partition reach
    the shuffle; the model table is |V|²-bounded (tiny — ASCII text is
    ≤16k rows) and broadcast to the apply join; the apply side shuffles
    only (id, bigram, count) partial aggregates, never text.
    """
    target = corpus if apply_to is None else apply_to

    def bigram_col(t):
        from narowi_ocr_spark.functions.native import bind_once

        chars0 = F.filter(F.split(F.lower(t), ""), lambda c: F.length(c) > 0)

        def _bg(cs):
            k = F.size(cs)
            return F.when(
                k >= 2,
                F.transform(
                    F.sequence(F.lit(1), k - 1),
                    lambda i: F.concat(
                        F.element_at(cs, i), F.element_at(cs, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))

        # bind the char array once: indexing the raw split inside the
        # lambda would re-split (and re-lower) the doc per bigram
        return bind_once(chars0, _bg)

    # LEARN: bigram counts and context (first-char) totals. p_scaled is
    # pure 64-bit integer division (`div`), bit-exact in every engine —
    # no float-floor boundary cases to reason about.
    grams = corpus.select(
        F.explode(bigram_col(F.col(text_col))).alias("bg")
    )
    bg_cnt = grams.groupBy("bg").agg(F.count("*").alias("cnt"))
    model = bg_cnt.withColumn(
        "ctx_total", F.sum("cnt").over(Window.partitionBy(F.substring("bg", 1, 1)))
    ).select(
        "bg",
        F.expr(f"(CAST({LM_SCALE} AS BIGINT) * cnt) div ctx_total")
        .cast("long")
        .alias("p_scaled"),
    )

    # APPLY: per-doc bigram multiplicities x model, integer-exact
    doc_bg = target.select(
        F.col(id_col).alias("id"),
        F.explode(bigram_col(F.col(text_col))).alias("bg"),
    ).groupBy("id", "bg").agg(F.count("*").alias("mult"))
    scored = (
        doc_bg.join(F.broadcast(model), "bg", "left")
        .groupBy("id")
        .agg(
            F.sum("mult").cast("long").alias("n_bigrams"),
            F.sum(F.col("mult") * F.coalesce(F.col("p_scaled"), F.lit(0)))
            .cast("long")
            .alias("lm_sum"),
        )
    )
    base = target.select(F.col(id_col).alias("id"))
    nb = F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
    ls = F.coalesce(F.col("lm_sum"), F.lit(0)).cast("long")
    return base.join(scored, "id", "left").select(
        "id",
        nb.alias("n_bigrams"),
        ls.alias("lm_sum"),
        F.when(
            nb > 0,
            round4(
                ls.cast("double") / nb.cast("double") / F.lit(float(LM_SCALE))
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lm_score"),
    )
