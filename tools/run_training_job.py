"""Classifier-training driver for spark-submit (tools/submit_cluster.sh
with this script) — train the hashed linear quality/topic classifier
where the data lives and persist the deployable artifact:

    docs ──▶ md5-threshold train/eval split (deterministic, never moves
             a doc between splits across reruns)
         ──▶ hashed feature matrix (one explode+groupBy shuffle; text
             never shuffles again)
         ──▶ integer batch perceptron, geometric step decay (two
             exchanges per epoch + O(n_buckets) driver collect)
         ──▶ held-out eval (accuracy / per-class counts)
         ──▶ weights table parquet + metrics manifest

The teacher labels come from a column expression passed by name:
``--label-col`` must be a BOOLEAN column already on the table (the
weak-supervision output a deployment distills — an LLM-judge verdict,
a rule bundle, a lang flag). Docs: operators/train.py.

Usage:
  spark-submit --py-files narowi_ocr_spark.zip \
      tools/run_training_job.py <docs_path> <out_path> <label_col> \
      [epochs] [eval_frac_hex8]

Dev smoke (tests/test_release_job.py::test_training_job):
  python tools/run_training_job.py <docs_parquet> <out_dir> <label_col>
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Make `python tools/run_training_job.py` work standalone: repo root on
# sys.path for the driver, PYTHONPATH for local-mode Python workers
# (clusters ship the package via --py-files instead).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO, os.environ.get("PYTHONPATH", "")) if p
    )


def run_training(
    spark: SparkSession,
    docs_path: str,
    out_path: str,
    label_col: str,
    epochs: int = 8,
    eval_threshold_hex: str = "40000000",  # 25% held out
    salt: str = "clf0",
) -> dict:
    from narowi_ocr_spark.operators.train import (
        hashed_doc_matrix,
        hashed_token_counts,
        perceptron_score,
        perceptron_train,
        weights_table,
    )

    t0 = time.time()
    reader = spark.read
    docs = (
        reader.format("iceberg").load(docs_path)
        if "." in docs_path and "/" not in docs_path
        else reader.parquet(docs_path)
    )
    key = F.substring(
        F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8
    )
    labeled = docs.withColumn("_k", key).withColumn(
        "y", F.when(F.col(label_col), 1).otherwise(-1).cast("long")
    )
    train = labeled.where(F.col("_k") >= eval_threshold_hex)
    ev = labeled.where(F.col("_k") < eval_threshold_hex)

    # fused single-pass matrix: label is a column of the doc row, so
    # featurization + labeling share one corpus scan and skip the
    # feats⋈labels shuffle join (bit-identical weights — test_train.py)
    w = perceptron_train(
        matrix=hashed_doc_matrix(train, F.col("y"), n_buckets=256, bias=True),
        n_weights=257,
        epochs=epochs,
    )
    weights_table(spark, w).write.mode("overwrite").parquet(
        f"{out_path}/weights"
    )

    def _acc(split):
        feats = hashed_token_counts(split, n_buckets=256, bias=True)
        scored = split.select("doc_id", "y").join(
            perceptron_score(feats, w), "doc_id", "left"
        )
        sc = F.coalesce(F.col("score"), F.lit(0))
        pred = F.when(sc > 0, 1).otherwise(-1)
        row = scored.agg(
            F.count("*").alias("n"),
            F.sum((pred == F.col("y")).cast("long")).alias("ok"),
            F.sum((F.col("y") == 1).cast("long")).alias("pos"),
        ).first()
        return {
            "n": row["n"],
            "correct": row["ok"],
            "positives": row["pos"],
            "acc_ppm": int(row["ok"] * 1_000_000 / row["n"]) if row["n"] else 0,
        }

    manifest = {
        "ts": time.time(),
        "wall_s": round(time.time() - t0, 2),
        "epochs": epochs,
        "n_weights": len(w),
        "nonzero_weights": sum(1 for v in w if v),
        "train": _acc(train),
        "eval": _acc(ev),
    }
    spark.sparkContext.parallelize([json.dumps(manifest)], 1).saveAsTextFile(
        f"{out_path}/training_manifest"
    )
    return manifest


def main() -> None:
    docs_path, out_path, label_col = sys.argv[1], sys.argv[2], sys.argv[3]
    epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    thr = sys.argv[5] if len(sys.argv) > 5 else "40000000"
    # Pin UTC so timestamp-derived features/manifests are reproducible
    # across clusters (library sessions get this from config.get_spark).
    spark = (
        SparkSession.builder.appName("narowi-train")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    print(
        json.dumps(
            run_training(spark, docs_path, out_path, label_col, epochs, thr)
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
