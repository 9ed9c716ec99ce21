"""Structured Streaming surface (SURVEY.md §2 S2/S5/S7, §2g)."""

from narowi_ocr_spark.streaming.stream import (  # noqa: F401
    dedup_stream,
    ingest_batch,
    run_extraction_stream,
    run_ingest_stream,
    stream_pages,
)
