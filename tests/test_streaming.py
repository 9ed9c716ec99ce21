"""Streaming extraction: availableNow run, exactly-once resume from
checkpoint (north_rule resumability), manifest lineage."""

import json
import os

from narowi_ocr_spark.sources.pages import synth_pages
from narowi_ocr_spark.streaming import run_extraction_stream


def test_available_now_and_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    manifest = str(tmp_path / "m" / "manifest.jsonl")

    synth_pages(spark, 60, partitions=2).write.parquet(src)

    batches = run_extraction_stream(spark, src, out, ckpt, manifest, timeout_s=120)
    assert batches, "first run must process at least one batch"
    n1 = spark.read.parquet(out).count()
    assert n1 == 60

    # resume with no new data: checkpoint prevents re-processing
    batches2 = run_extraction_stream(spark, src, out, ckpt, manifest, timeout_s=120)
    assert spark.read.parquet(out).count() == n1
    assert all(b not in batches for b in batches2) or not batches2

    # new files arrive → only the delta is processed
    synth_pages(spark, 20, partitions=1).selectExpr(
        "concat(url, '/v2') AS url", "warc_ts", "html", "text", "lang"
    ).write.mode("append").parquet(src)
    run_extraction_stream(spark, src, out, ckpt, manifest, timeout_s=120)
    assert spark.read.parquet(out).count() == n1 + 20

    assert os.path.exists(manifest)
    entries = [json.loads(line) for line in open(manifest)]
    assert sum(e["rows"] for e in entries) == 80
