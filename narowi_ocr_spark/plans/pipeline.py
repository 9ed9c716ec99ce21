"""The flagship end-to-end extraction pipeline (SURVEY.md §3 E1/E2 recast,
§7 minimum slice):

  pages(url, warc_ts, html, …)
    → P1  null/empty filter                     (native; pushes to scan)
    → P4-P8/R1 tokenize html → blocks           (one fused Arrow UDF stage)
    → R2-R4 score + classify blocks             (native higher-order exprs)
    → T3-T5 main text + confidence              (native)
    → K5-K7 reading-span kernel                 (Arrow UDF)
    → A1   per-url status                       (native)

Plan-shape invariants (verified by tests/test_plan_shape.py):
  - every stage is a narrow transform — the whole pipeline is ONE Spark
    stage with no shuffle; scaling to 1000 executors is embarrassing
    parallelism over input splits;
  - the raw ``html`` binary column is dropped at the tokenize boundary, so
    nothing downstream (or any later shuffle) carries page payloads;
  - only the two Arrow UDF stages leave the JVM; scoring, assembly,
    validation and status stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from narowi_ocr_spark.functions.readings import extract_readings
from narowi_ocr_spark.operators.assemble import main_text, mean_content_score
from narowi_ocr_spark.operators.blocks import tokenize_scored
from narowi_ocr_spark.operators.results import with_status


def extract_pages(pages: DataFrame, keep_blocks: bool = False) -> DataFrame:
    """pages → per-url result rows
    (url, warc_ts, status, readings, confidence, error_message,
    extracted_text).

    Tokenize + score run FUSED in one Arrow stage (tokenize_scored): the
    scored block array is then a plain attribute for Catalyst, so the
    ~5 downstream consumers (text, confidence, readings input, status)
    don't re-inline the scoring expression tree (CollapseProject would —
    measured ~3× slower with the native-scoring variant)."""
    nonempty = pages.where(
        F.col("html").isNotNull() & (F.length("html") > 0)  # P1
    )
    blocks = nonempty.select(
        "url",
        "warc_ts",
        tokenize_scored("html").alias("blocks"),
        # html intentionally dropped here — column pruning is structural,
        # not left to chance (SURVEY.md §4 column-pruning row).
    )
    assembled = blocks.select(
        "url",
        "warc_ts",
        *( ["blocks"] if keep_blocks else [] ),
        main_text("blocks").alias("extracted_text"),
        mean_content_score("blocks").alias("confidence"),
    )
    readings = assembled.withColumn(
        "readings", extract_readings("extracted_text")
    )
    out = with_status(readings)
    return out.select(
        "url",
        "warc_ts",
        "status",
        "readings",
        "confidence",
        "error_message",
        "extracted_text",
        *( ["blocks"] if keep_blocks else [] ),
    )
