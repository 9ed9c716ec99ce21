"""Driver script for spark-submit (see tools/submit_cluster.sh).

Reads a pages table (Iceberg on a cluster; parquet path in dev), runs the
full extraction pipeline, writes per-url results plus the partition-size
skew histogram + run metrics manifest (north_rule: per-partition lineage
and metrics, resumable layout).

Usage: spark-submit ... run_extraction_job.py <pages_path> <out_path>
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

# Make `python tools/run_extraction_job.py` work standalone: repo root
# on sys.path for the driver, PYTHONPATH for local-mode Python workers
# (clusters ship the package via --py-files instead).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO, os.environ.get("PYTHONPATH", "")) if p
    )


def main() -> None:
    pages_path, out_path = sys.argv[1], sys.argv[2]
    # Pin UTC like the other drivers: timestamps rendered anywhere
    # downstream must not vary with the cluster's wall-clock zone.
    spark = (
        SparkSession.builder.appName("narowi-extract")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from narowi_ocr_spark.plans.pipeline import extract_pages
    from narowi_ocr_spark.sources.sink import (
        partition_histogram,
        write_results,
    )

    reader = spark.read
    pages = (
        reader.format("iceberg").load(pages_path)
        if "." in pages_path and "/" not in pages_path
        else reader.parquet(pages_path)
    )

    t0 = time.time()
    results = extract_pages(pages)
    write_results(results, f"{out_path}/results")

    hist = partition_histogram(spark.read.parquet(f"{out_path}/results"))
    rows = hist.collect()
    sizes = [r["rows"] for r in rows]
    manifest = {
        "ts": time.time(),
        "wall_s": round(time.time() - t0, 2),
        "partitions": len(sizes),
        "rows": sum(sizes),
        "max_partition_rows": max(sizes) if sizes else 0,
        "skew_ratio": round(max(sizes) / (sum(sizes) / len(sizes)), 4)
        if sizes
        else 0.0,
    }
    sc = spark.sparkContext
    sc.parallelize([json.dumps(manifest)], 1).saveAsTextFile(
        f"{out_path}/manifest"
    )
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
