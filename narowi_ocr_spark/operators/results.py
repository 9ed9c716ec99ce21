"""Result assembly and corpus aggregation (SURVEY.md §2 A1-A4) —
DataProcessor semantics (reference src/processing/data_processor.py)
re-expressed as native expressions and aggregations.

A1 status rules  (:76-99):   no readings → failed "No readings found";
                             all valid → success; none valid → failed
                             "No valid readings found"; else partial
                             "Only {k} of {n} readings are valid".
A2 batch totals  (:146-159): images, successful, failed, total/valid
                             readings, mean confidence (:165).
A3 type counts   (:156-159): VALID readings only, all nine types
                             zero-filled (:134).
A4 CSV flatten   (:210-221): one row per (url, reading); failed rows with
                             empty readings emit nothing (inner explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from narowi_ocr_spark.functions.native import round4

from narowi_ocr_spark.schema import READING_TYPE_NAMES

STATUS_SUCCESS = "success"
STATUS_PARTIAL = "partial"
STATUS_FAILED = "failed"


def with_status(df: DataFrame, readings_col: str = "readings") -> DataFrame:
    """A1: add `n_readings`, `n_valid`, `status`, `error_message`."""
    r = F.col(readings_col)
    n = F.size(r)
    n_valid = F.size(F.filter(r, lambda x: x["is_valid"]))
    status = (
        F.when(n == 0, F.lit(STATUS_FAILED))
        .when(n_valid == n, F.lit(STATUS_SUCCESS))
        .when(n_valid == 0, F.lit(STATUS_FAILED))
        .otherwise(F.lit(STATUS_PARTIAL))
    )
    error_message = (
        F.when(n == 0, F.lit("No readings found"))
        .when(n_valid == n, F.lit(None).cast("string"))
        .when(n_valid == 0, F.lit("No valid readings found"))
        .otherwise(
            F.format_string("Only %d of %d readings are valid", n_valid, n)
        )
    )
    return (
        df.withColumn("n_readings", n)
        .withColumn("n_valid", n_valid)
        .withColumn("status", status)
        .withColumn("error_message", error_message)
    )


def batch_summary(df: DataFrame, confidence_col: str = "confidence") -> DataFrame:
    """A2: one-row corpus summary. A single partial-aggregated (map-side
    combine) job — the counters the reference accumulates in its Python
    loop (:146-159) fold into one shuffle of O(partitions) rows."""
    return df.agg(
        F.count("*").alias("total_images"),
        F.sum(F.when(F.col("status") == STATUS_SUCCESS, 1).otherwise(0)).alias(
            "successful_images"
        ),
        F.sum(F.when(F.col("status") == STATUS_FAILED, 1).otherwise(0)).alias(
            "failed_images"
        ),
        F.sum("n_readings").alias("total_readings"),
        F.sum("n_valid").alias("valid_readings"),
        round4(F.avg(confidence_col)).alias("average_confidence"),
    )


def reading_type_counts(df: DataFrame, readings_col: str = "readings") -> DataFrame:
    """A3: per-type counts of VALID readings, zero-filled for all nine
    types. Implemented as explode → filter → groupBy, then a broadcast
    right-join against the static nine-row type dimension (no skew risk:
    nine groups, partial aggregation upstream)."""
    spark = df.sparkSession
    types_dim = spark.createDataFrame(
        [(t,) for t in READING_TYPE_NAMES], ["type"]
    )
    counted = (
        df.select(F.explode(readings_col).alias("r"))
        .where(F.col("r.is_valid"))
        .groupBy(F.col("r.type").alias("type"))
        .agg(F.count("*").alias("n"))
    )
    return (
        F.broadcast(types_dim)
        .join(counted, "type", "left")
        .select("type", F.coalesce("n", F.lit(0)).alias("n"))
    )


def flatten_readings(
    df: DataFrame,
    readings_col: str = "readings",
    keep: tuple[str, ...] = ("url", "status", "confidence"),
) -> DataFrame:
    """A4: the CSV-export un-nest — inner explode, so failed rows with no
    readings produce no output rows (reference :210-221)."""
    return df.select(*keep, F.explode(readings_col).alias("r")).select(
        *keep,
        F.col("r.type").alias("reading_type"),
        F.col("r.value").alias("value"),
        F.col("r.unit").alias("unit"),
        F.col("r.is_valid").alias("is_valid"),
    )
