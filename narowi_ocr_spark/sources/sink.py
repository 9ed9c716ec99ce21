"""Writers, salted partitioning, and the per-run metrics manifest
(SURVEY.md §2 S3-S5, §4 partitioning row; north_rule resumability +
per-partition lineage).

The Iceberg runtime jar is not present in the sandbox, so the table format
is a single switch here: ``format('iceberg')`` on a cluster, parquet
locally. Layout (bucketed url-hash partitioning, append snapshots, a
metrics manifest next to the data) is identical either way.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Flip to "iceberg" on clusters with the runtime jar on the classpath.
TABLE_FORMAT = os.environ.get("NAROWI_TABLE_FORMAT", "parquet")


def url_bucket(url: Column | str, n_buckets: int, n_salts: int = 8) -> Column:
    """Salted url-hash bucket: xxhash64(url) spreads urls of one host
    across buckets, and the extra salt term splits even a single
    pathological key across ``n_salts`` buckets — host-level skew cannot
    concentrate a partition (north_rule skew requirement)."""
    u = F.col(url) if isinstance(url, str) else url
    h = F.xxhash64(u)
    salt = F.pmod(F.xxhash64(u, F.lit("salt")), F.lit(n_salts))
    return F.pmod(h + salt, F.lit(n_buckets))


def salted_repartition(df: DataFrame, key: str, n_partitions: int) -> DataFrame:
    """Repartition by salted key-hash bucket."""
    return df.repartition(n_partitions, url_bucket(key, n_partitions))


def write_results(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S3/S4: persist result rows (parquet locally, Iceberg on cluster)."""
    df.write.format(TABLE_FORMAT).mode(mode).save(path)


def partition_histogram(df: DataFrame) -> DataFrame:
    """Rows per physical partition — the skew evidence the metrics
    manifest records (BASELINE.md protocol step 3)."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows"))
        .orderBy("partition_id")
    )


def write_manifest(df: DataFrame, manifest_dir: str, run_info: dict) -> dict:
    """S5: per-partition lineage + run metrics manifest. On Iceberg this
    is the snapshot's companion metrics table; locally a JSON file. The
    histogram collect is O(partitions), never O(rows)."""
    os.makedirs(manifest_dir, exist_ok=True)
    hist = [r.asDict() for r in partition_histogram(df).collect()]
    rows = sum(h["rows"] for h in hist)
    manifest = {
        **run_info,
        "rows": rows,
        "partitions": len(hist),
        "partition_histogram": hist,
        "max_partition_rows": max((h["rows"] for h in hist), default=0),
        "skew_ratio": (
            round(max(h["rows"] for h in hist) / (rows / len(hist)), 4)
            if hist and rows
            else None
        ),
    }
    with open(os.path.join(manifest_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
