"""Corpus-release driver for spark-submit (tools/submit_cluster.sh with
this script in place of run_extraction_job.py) — the full
crawl-to-training-corpus path as ONE submitted job:

    pages ──▶ extraction pipeline (single shuffle-free Arrow stage)
          ──▶ C4 line/page rules + blocklist gate      (codegen filters)
          ──▶ exact dedup (md5 groupBy, keep-min)
          ──▶ MinHash-LSH near-dedup: band candidates → exact-Jaccard
              verify → connected components → one rep per cluster
          ──▶ deterministic train/valid/test split
          ──▶ md5-range shard assignment + delivery manifest
          ──▶ WET conversion-record segments for the train split
          ──▶ release manifest (per-stage survivor counts — the audit
              trail a data card is written from)

Every stage is a library call (`narowi_ocr_spark.*`) — this script only
composes and records; the shapes (what shuffles, what broadcasts, what
stays in codegen) are documented on the operators themselves.

Usage:
  spark-submit --py-files narowi_ocr_spark.zip \
      tools/run_release_job.py <pages_path> <out_path> [term1,term2,...]

Dev smoke (tests/test_release_job.py runs exactly this):
  python tools/run_release_job.py <pages_parquet> <out_dir>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_BLOCKLIST = ["slow", "dup"]  # demo terms; deployments load the
# published list (see corpus.blocklist_gate)


def run_release(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    blocklist: list[str] | None = None,
    apply_c4: bool = True,
) -> dict:
    """``apply_c4`` gates on the C4 line/page prose rules — the right
    default for organic web text, but a corpus without sentence
    punctuation (chat logs, code, the synthetic dev tables) fails the
    terminal-punctuation line rule wholesale; such runs disable it and
    rely on the blocklist + dedup stages."""
    from narowi_ocr_spark.functions.textstats import with_c4_rules
    from narowi_ocr_spark.operators.components import (
        component_representatives,
        connected_components,
    )
    from narowi_ocr_spark.operators.corpus import (
        blocklist_gate,
        dataset_splits,
    )
    from narowi_ocr_spark.operators.dedup import (
        PROD_NUM_PERM,
        PROD_ROWS_PER_BAND,
        exact_dedup,
        jaccard_pairs,
        lsh_candidate_pairs,
    )
    from narowi_ocr_spark.operators.shards import shard_assign, shard_manifest
    from narowi_ocr_spark.operators.urls import url_host
    from narowi_ocr_spark.plans.pipeline import extract_pages
    from narowi_ocr_spark.sources.wet import wet_export, write_wet

    t0 = time.time()
    reader = spark.read
    pages = (
        reader.format("iceberg").load(pages_path)
        if "." in pages_path and "/" not in pages_path
        else reader.parquet(pages_path)
    )

    counts: dict[str, int] = {"pages": pages.count()}

    # 1. extraction (one Arrow stage). Admission gate = non-empty
    # extracted TEXT: `status` is the READINGS-validity verdict (the
    # reference's per-image A1 status — typed spans found and valid),
    # not an extraction-quality signal; extracted_text is byte-exact
    # for partial/failed pages too, and a corpus release that kept
    # only reading-bearing pages would silently drop ~90% of good
    # prose (measured on the fixture corpus).
    results = extract_pages(pages)
    extracted = results.where(F.length("extracted_text") > 0).select(
        # Full 64-bit id over (url, warc_ts) — no abs() (folding to 63
        # bits doubles collision odds), and the timestamp disambiguates
        # re-crawls of the same URL across segments.
        F.xxhash64("url", "warc_ts").alias("doc_id"),
        "url",
        "warc_ts",
        F.col("extracted_text").alias("text"),
        url_host(F.col("url")).alias("source"),
    )
    # Distinct-on-id guard: real crawl inputs repeat (url, warc_ts)
    # across re-ingested segments, and every downstream id-keyed
    # semi-join (c4_keep, bl_keep, exact_keep, reps) would fan rows out
    # multiplicatively on a duplicated id. Deterministic keep (min
    # struct), one hash aggregate on doc_id — linear, no window.
    docs = (
        extracted.groupBy("doc_id")
        .agg(F.min(F.struct("url", "warc_ts", "text", "source")).alias("_r"))
        .select("doc_id", "_r.url", "_r.warc_ts", "_r.text", "_r.source")
        # the downstream chain re-reads the survivor set many times
        # (gates, dedup, splits); persist once here
        .persist()
    )
    counts["extracted"] = docs.count()

    # 2. cleaning gates — both are zero-shuffle codegen filters
    clean = docs
    if apply_c4:
        c4_keep = (
            with_c4_rules(docs)
            .where(F.col("c4_keep"))
            .select(F.col("id").alias("doc_id"))
        )
        clean = clean.join(c4_keep, "doc_id")
    bl_keep = (
        blocklist_gate(docs, blocklist or DEFAULT_BLOCKLIST)
        .where(F.col("keep"))
        .select("doc_id")
    )
    clean = clean.join(bl_keep, "doc_id").persist()
    counts["clean"] = clean.count()

    # 3. exact dedup (keep-min over content md5)
    exact_keep = exact_dedup(clean).select(
        F.col("keep_id").alias("doc_id")
    )
    uniq = clean.join(exact_keep, "doc_id").persist()
    counts["exact_unique"] = uniq.count()

    # 4. near-dedup: LSH candidates → exact-Jaccard verify → CC reps.
    # PRODUCTION band geometry (128 perms, 16 bands x 8 rows, ~0.71
    # capture threshold): the dev 16/2 geometry's ~0.35 threshold turns
    # any moderately self-similar corpus into a quadratic candidate
    # join — at release scale the steep S-curve is what keeps this
    # stage linear in the number of TRUE near-dup pairs. The xxhash64
    # kernel keeps the 128-perm signature pass up to ~10× cheaper than
    # md5 on shingle-heavy corpora (the hash kernel IS the dedup cost
    # at scale); candidates are verified by exact Jaccard either way.
    cand = lsh_candidate_pairs(
        uniq,
        num_perm=PROD_NUM_PERM,
        rows_per_band=PROD_ROWS_PER_BAND,
        kernel="xxhash64",
    )
    # the verify → CC → count chain walks the candidate graph several
    # times; materialize the (cheap, sparse) pair list once
    cand = cand.localCheckpoint(eager=True)
    verified = jaccard_pairs(uniq, cand, threshold=0.8)
    labels = connected_components(
        verified, nodes=uniq.select(F.col("doc_id").alias("id"))
    )
    reps = component_representatives(labels).select(
        F.col("keep_id").alias("doc_id")
    )
    released = uniq.join(reps, "doc_id").persist()
    counts["near_unique"] = released.count()

    # 5. splits + shards + manifests
    split = dataset_splits(released)
    train = split.where(F.col("split") == "train").drop(
        "split", "split_key"
    )
    counts["train"] = train.count()
    assigned = shard_assign(train)
    assigned.write.mode("overwrite").partitionBy("shard").parquet(
        f"{out_path}/shards"
    )
    shard_manifest(assigned, train).write.mode("overwrite").parquet(
        f"{out_path}/shard_manifest"
    )

    # 6. WET segments for the released train split
    write_wet(
        wet_export(train, url_col="url", ts_col="warc_ts", text_col="text"),
        f"{out_path}/wet",
        mode="overwrite",
    )

    manifest = {
        "ts": time.time(),
        "wall_s": round(time.time() - t0, 2),
        "stages": counts,
        "survival_ppm": {
            k: int(v * 1_000_000 / counts["pages"]) if counts["pages"] else 0
            for k, v in counts.items()
        },
    }
    spark.sparkContext.parallelize([json.dumps(manifest)], 1).saveAsTextFile(
        f"{out_path}/release_manifest"
    )
    for d in (docs, clean, uniq, released):
        d.unpersist()
    return manifest


def main() -> None:
    pages_path, out_path = sys.argv[1], sys.argv[2]
    blocklist = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    # Pin UTC: WET WARC-Date and md5-of-date record ids must not vary
    # with the cluster's wall clock zone (library sessions get this
    # from config.get_spark; spark-submit sessions must set it here).
    spark = (
        SparkSession.builder.appName("narowi-release")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    print(json.dumps(run_release(spark, pages_path, out_path, blocklist)))
    spark.stop()


if __name__ == "__main__":
    main()
