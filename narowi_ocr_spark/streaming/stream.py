"""Streaming extraction: the batch pipeline re-run as a Structured
Streaming job (SURVEY.md §2g).

The reference's streaming surface is an interactive camera loop
(examples/capture_reading.py:20-81 — unbounded frame source, per-session
artifact dirs). The recast: ``readStream`` on the pages table → the
IDENTICAL stateless transform chain (plans/pipeline.py — every stage is a
narrow transform, so there is no state store at all) → ``writeStream``
with ``trigger(availableNow=True)``.

Resumability (north_rule): the checkpoint location is the restart token —
a killed job relaunched with the same checkpoint resumes from the last
committed micro-batch and never re-emits completed batches. Per-batch
lineage + metrics go to a JSON manifest via foreachBatch (on a cluster:
an Iceberg metrics table next to the data; snapshot ids give per-partition
lineage).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from narowi_ocr_spark.plans.pipeline import extract_pages
from narowi_ocr_spark.schema import PAGES_SCHEMA


def stream_pages(spark: SparkSession, src_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a directory of pages parquet (dev stand-in
    for ``readStream.format('iceberg')`` on a cluster)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def run_extraction_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    manifest_path: str | None = None,
    timeout_s: int = 300,
) -> list[int]:
    """Run the extraction pipeline over all currently-available input
    (``availableNow``), exactly-once into ``out_dir``; returns the list of
    batch ids processed THIS run (empty on a pure resume with no new data
    — proof the checkpoint prevented re-processing)."""
    pages = stream_pages(spark, src_dir)
    results = extract_pages(pages)

    batches_seen: list[int] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batches_seen.append(batch_id)
        batch_df.write.mode("append").parquet(out_dir)
        if manifest_path:
            os.makedirs(os.path.dirname(manifest_path), exist_ok=True)
            entry = {
                "batch_id": batch_id,
                "rows": batch_df.count(),
                "ts": time.time(),
                "checkpoint": checkpoint_dir,
            }
            with open(manifest_path, "a") as f:
                f.write(json.dumps(entry) + "\n")

    q = (
        results.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return batches_seen
