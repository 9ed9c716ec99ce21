"""The flagship end-to-end extraction pipeline (SURVEY.md §3 E1/E2 recast,
§7 minimum slice):

  pages(url, warc_ts, html, …)
    → P1  null/empty filter + P2 size cap       (native; pushes to scan)
    → P4-P8/R1-R4/T3-T5/K5-K7 fused extraction  (ONE mapInArrow stage:
      tokenize → score/classify → assemble → reading-span kernels)
    → A1   per-url status                       (native)

Plan-shape invariants (verified by tests/test_plan_shape.py):
  - every stage is a narrow transform — the whole pipeline is ONE Spark
    stage with no shuffle; scaling to 1000 executors is embarrassing
    parallelism over input splits;
  - the raw ``html`` binary column is consumed inside the single Arrow
    boundary, so nothing downstream (or any later shuffle) carries page
    payloads;
  - only that one MapInArrow stage leaves the JVM; status and the
    aggregation/export operators stay in whole-stage codegen. Result
    columns are built directly as Arrow arrays (no pandas round-trip —
    measured 15-25% faster than the pandas-UDF equivalent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from narowi_ocr_spark.functions.readings import extract_readings, extract_readings_py
from narowi_ocr_spark.operators.assemble import main_text, mean_content_score
from narowi_ocr_spark.operators.blocks import (
    round4_py,
    tokenize_and_score_py,
    tokenize_scored,
)
from narowi_ocr_spark.operators.results import with_status
from narowi_ocr_spark.schema import READINGS_SCHEMA


def extract_page_py(payload: bytes | str | None) -> tuple[str, float, list[dict]]:
    """The whole per-document chain (tokenize → score → classify →
    assemble → reading-span extraction) as one pure-Python call, executed
    only inside Arrow batches. Byte-identical to composing the individual
    operators (asserted by tests/test_pipeline_fused.py)."""
    blocks = tokenize_and_score_py(payload)
    text = "\n".join(b["text"] for b in blocks if b["is_content"]).strip()
    nonempty = [b for b in blocks if b["text"]]
    if nonempty:
        # fold order + rounding mirror the JVM mean_content_score exactly
        acc = 0.0
        for b in nonempty:
            acc += b["score"]
        confidence = round4_py(acc / float(len(nonempty)))
    else:
        confidence = 0.0
    return text, confidence, extract_readings_py(text)


# mapInArrow output: (url, warc_ts pass through) + the extraction result.
# Building the result columns directly as Arrow arrays skips the
# pandas-DataFrame round-trip of the pandas-UDF path — measured 15-25%
# faster end-to-end at local[8] on 20k pages, byte-identical output.
EXTRACT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("readings", READINGS_SCHEMA, True),
    ]
)


def _extract_arrow(batches):
    import pyarrow as pa

    reading_t = pa.struct(
        [
            ("type", pa.string()),
            ("value", pa.float64()),
            ("unit", pa.string()),
            ("is_valid", pa.bool_()),
        ]
    )
    for b in batches:
        texts: list[str] = []
        confs: list[float] = []
        reads: list[list[dict]] = []
        for payload in b.column("html"):
            t, c, r = extract_page_py(payload.as_py())
            texts.append(t)
            confs.append(c)
            reads.append(r)
        yield pa.RecordBatch.from_arrays(
            [
                b.column("url"),
                b.column("warc_ts"),
                pa.array(texts, pa.string()),
                pa.array(confs, pa.float64()),
                pa.array(reads, pa.list_(reading_t)),
            ],
            names=["url", "warc_ts", "extracted_text", "confidence", "readings"],
        )


# P2: cap pathological page sizes before tokenization (the analogue of
# resize_image, reference image_processor.py:44-62 — bound work per doc,
# keep the prefix). 2 MB keeps any sane page intact.
MAX_HTML_BYTES = 2 * 1024 * 1024


def cap_html(html: Column, limit: int = MAX_HTML_BYTES) -> Column:
    return F.when(
        F.length(html) > limit, F.substring(html, 1, limit)
    ).otherwise(html)


def extract_pages(
    pages: DataFrame,
    keep_blocks: bool = False,
    max_html_bytes: int | None = MAX_HTML_BYTES,
) -> DataFrame:
    """pages → per-url result rows
    (url, warc_ts, status, readings, confidence, error_message,
    extracted_text).

    Default path: ONE fused Arrow stage per document. The earlier
    two-stage shape (tokenize UDF → JVM assembly → readings UDF) moved
    every block text across the JVM↔Python boundary three times (blocks
    out, assembled text back in, spans out) and ran two Python worker
    pools; fusing cut the boundary traffic to html-in/result-out and
    roughly halved wall-clock at 40k pages. ``keep_blocks=True`` switches
    to the two-stage variant, which materializes the scored block array
    for debugging/inspection queries."""
    nonempty = pages.where(
        F.col("html").isNotNull() & (F.length("html") > 0)  # P1
    )
    if max_html_bytes:
        nonempty = nonempty.withColumn("html", cap_html(F.col("html"), max_html_bytes))
    if keep_blocks:
        blocks = nonempty.select(
            "url", "warc_ts", tokenize_scored("html").alias("blocks")
        )
        assembled = blocks.select(
            "url",
            "warc_ts",
            "blocks",
            main_text("blocks").alias("extracted_text"),
            mean_content_score("blocks").alias("confidence"),
        )
        readings = assembled.withColumn(
            "readings", extract_readings("extracted_text")
        )
        out = with_status(readings)
        return out.select(
            "url", "warc_ts", "status", "readings", "confidence",
            "error_message", "extracted_text", "blocks",
        )

    # html is consumed inside this (single) Arrow boundary and never
    # appears downstream — column pruning is structural, not left to
    # chance (SURVEY.md §4).
    res = nonempty.select(
        "url", F.col("warc_ts").cast("timestamp").alias("warc_ts"), "html"
    ).mapInArrow(_extract_arrow, EXTRACT_OUT_SCHEMA)
    out = with_status(res)
    return out.select(
        "url", "warc_ts", "status", "readings", "confidence",
        "error_message", "extracted_text",
    )
