"""Retrieval-side corpus operators: sliding-window chunking (RAG /
training-context prep) and BM25 ranked search over an inverted-postings
dataflow.

Beyond-reference surface (SURVEY.md §2 extension): a training-data
pipeline that feeds retrieval-augmented models needs (a) documents cut
into overlapping fixed-token windows and (b) a way to rank the corpus
against a query set — both expressed here as pure DataFrame transforms
whose shuffle carries only (id, term, count) triples, never document
text.

Cross-engine exactness: BM25 is computed entirely in 64-bit integer
fixed-point (the same recipe as ``corpus.char_bigram_lm``): the
Robertson idf is replaced by its log-free rational core
(2N−2df+1)/(2df+1) scaled by ``BM25_SCALE`` via integer ``div``, and the
tf-saturation term tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) with k1=6/5,
b=3/4 is cleared of denominators (multiply through by 10·L where L is
the corpus token total) so each per-term contribution is one integer
division. Integer sums are order-free, so the doc score is bit-identical
to the DuckDB oracle no matter how Spark partitions the aggregation.
The log-idf variant ranks identically at the extremes and is a one-line
swap where cross-engine bit-equality is not required; at true 100 TB
scale (L ≳ 10¹²) the integer products here would overflow int64, so the
production profile swaps to double idf·tf math — the DATAFLOW (postings
build, broadcast query join, partial-agg score sum) is the part that
survives the scale-up unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from narowi_ocr_spark.functions.textstats import words

# Fixed-point scale for BM25 integer scoring. With SCALE=1e4,
# idf_scaled ≤ SCALE·2N and the per-term numerator idf_scaled·22·tf·L
# stays < 2⁶³ for corpora up to ~10⁹ tokens — far above every test SF.
BM25_SCALE = 10_000


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping word windows.

    Chunks start at token offsets 0, stride, 2·stride, … for every
    offset < n_tokens, so tails shorter than ``chunk_size`` are kept
    (they carry the document suffix) and empty documents emit nothing.

    Returns (doc_id, chunk_id, start_tok, n_tokens, chunk_text).

    Scale shape: one narrow projection + explode per document — no
    shuffle at all; the word array is bound once per row (the offsets
    sequence and every slice index into the same bound array), so cost
    is O(tokens) per document, not O(tokens·chunks).
    """
    from narowi_ocr_spark.functions.native import bind_once

    def chunks(ws):
        n = F.size(ws)
        return F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(0), n - 1, F.lit(stride)),
                lambda start: F.struct(
                    (start / stride).cast("int").alias("chunk_id"),
                    start.cast("int").alias("start_tok"),
                    F.least(F.lit(chunk_size), n - start)
                    .cast("int")
                    .alias("n_tokens"),
                    F.array_join(
                        F.slice(ws, start + 1, chunk_size), " "
                    ).alias("chunk_text"),
                ),
            ),
        ).otherwise(F.array().cast(
            "array<struct<chunk_id:int,start_tok:int,n_tokens:int,"
            "chunk_text:string>>"
        ))

    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(bind_once(words(F.col(text_col)), chunks)).alias("c"),
        )
        .select("doc_id", "c.chunk_id", "c.start_tok", "c.n_tokens", "c.chunk_text")
    )


def postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: (term, doc_id, tf) with one row per
    distinct term per document. The explode happens before the groupBy,
    so partial (map-side) aggregation bounds the shuffle by the number
    of DISTINCT (doc, term) pairs per partition — document text never
    leaves the scan stage."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(words(F.col(text_col))).alias("term"),
        )
        .where(F.length("term") > 0)
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k document retrieval for a small query set.

    Returns (query_id, doc_id, score_sum, bm25, rank): ``score_sum`` is
    the exact integer fixed-point score (see module docstring), ``bm25``
    = round4(score_sum / BM25_SCALE), rank by (score_sum desc, doc_id) —
    a pure int64 ordering, deterministic in every engine.

    Dataflow (the part that holds at 100 TB): the queried-term literal
    filter is applied to the postings FRAME, where Catalyst pushes it
    through the (term, doc) groupBy down to the token explode — so the
    tf aggregate, the df(term) doc-frequency aggregate, and every
    downstream join only ever see postings of the queried terms, never
    the full vocabulary (df restricted-then-aggregated equals
    aggregated-then-restricted for the queried terms, so scores are
    unchanged). Per-doc lengths stay a narrow tokenize scan; the query
    term table (|queries|·|terms| rows), the restricted df table, and
    the global scalars (N, L) are broadcast; the final groupBy shuffles
    one integer per (query, candidate-doc) pair.
    """
    spark = df.sparkSession
    q_terms = sorted({term for _, terms in queries for term in terms})
    post = postings(df, id_col, text_col).where(F.col("term").isin(q_terms))
    dl = (
        df.select(
            F.col(id_col).alias("doc_id"), F.size(words(F.col(text_col))).alias("dl")
        )
    )
    stats = df.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(words(F.col(text_col)))).cast("long").alias("total_len"),
    )

    qrows = [
        (qid, term) for qid, terms in queries for term in sorted(set(terms))
    ]
    qdf = spark.createDataFrame(qrows, "query_id string, term string")

    # df(term) over the queried-term postings only — identical values
    # to a full-vocabulary aggregate restricted afterwards. (term, doc)
    # rows are already distinct post-tf-agg, so count(*) == distinct.
    term_df = post.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )

    scored = (
        post.join(F.broadcast(qdf), "term")
        .join(F.broadcast(term_df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf_scaled = F.expr(
        f"(CAST({BM25_SCALE} AS BIGINT) * (2*n_docs - 2*df + 1)) div (2*df + 1)"
    )
    # tf·(k1+1)/(tf + k1(1−b) + k1·b·dl/avgdl) with k1=6/5, b=3/4 and
    # avgdl=L/N, denominators cleared by 10·L:
    #   = 22·tf·L / (10·L·tf + 3·L + 9·dl·N)
    term_score = F.expr(
        "(idf_scaled * 22 * tf * total_len) div "
        "(10 * total_len * tf + 3 * total_len + 9 * dl * n_docs)"
    )
    per_term = scored.withColumn("idf_scaled", idf_scaled).withColumn(
        "term_score", term_score
    )
    agg = per_term.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").cast("long").alias("score_sum")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_sum"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "score_sum",
            (F.col("score_sum").cast("double") / F.lit(float(BM25_SCALE))).alias(
                "bm25"
            ),
            "rank",
        )
    )


# ----------------------------------------------------------- sentences

# maximal terminal-punctuated runs; the final alternation keeps an
# unterminated tail. RE2-safe (no lookaround), covers every character,
# always consumes >= 1 char per match.
SENTENCE_RE = r"([^.!?]*[.!?]+|[^.!?]+$)"


def sentence_spans(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Split text into sentences WITH exact character offsets:
    (doc_id, sent_idx, start_char, n_chars, sentence) — ``sent_idx``
    is the raw segment ordinal (stable under drops), ``start_char``
    the 0-based offset of the sentence's first non-whitespace
    character in the original text, ``sentence`` whitespace-trimmed;
    segments that trim to '' drop. Terminal runs ('?!', '...') stay
    attached to their sentence. Offsets make every downstream span
    (PII hits, quality flags, citations) alignable back to the source
    bytes — the property plain split() loses.

    Scale shape: regexp_extract_all + posexplode + HOF prefix-sum over
    the (small) per-doc segment list — no shuffle, no Python, O(s²)
    only in segment COUNT per doc, never in characters.
    """
    raws = F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), 1)
    seg = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        F.posexplode(raws).alias("sent_idx", "_raw"),
    )
    # offset of this segment = total length of the segments before it
    prior = F.aggregate(
        F.slice(
            F.regexp_extract_all(F.col("_t"), F.lit(SENTENCE_RE), 1),
            F.lit(1),
            F.col("sent_idx"),
        ),
        F.lit(0),
        lambda acc, s: acc + F.length(s),
    )
    lead = F.length(F.col("_raw")) - F.length(
        F.regexp_replace(F.col("_raw"), r"^\s+", "")
    )
    sent = F.regexp_replace(F.col("_raw"), r"^\s+|\s+$", "")
    return (
        seg.select(
            "doc_id",
            "sent_idx",
            (prior + lead).cast("int").alias("start_char"),
            F.length(sent).cast("int").alias("n_chars"),
            sent.alias("sentence"),
        )
        .where(F.col("sentence") != "")
    )
