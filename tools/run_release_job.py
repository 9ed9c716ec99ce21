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
          ──▶ release manifest (per-stage survivor counts + per-partition
              lineage histogram — the audit trail a data card is written
              from)

Every stage is a library call (`narowi_ocr_spark.*`) — this script only
composes and records; the shapes (what shuffles, what broadcasts, what
stays in codegen) are documented on the operators themselves.

RESUMABILITY (north_rule): each stage checkpoints its result under
``<out>/checkpoints/`` — the extracted doc table once in full (it is
also the release's extraction cache), every later stage as a doc-id
survivor list (a few bytes per doc; at 10^12 docs the id lists are
~8 TB total vs the corpus' ~100 TB text, and they are exactly the
semi-join keys the stages already shuffle). A rerun with
``resume=True`` (the default) loads every stage whose checkpoint
committed (`_SUCCESS` present) and recomputes only from the first
missing one — a job killed during near-dedup restarts at near-dedup
with extraction, gates and exact dedup served from parquet. All stages
are deterministic functions of their input (content hashes, not RNG),
so a resumed run is bit-identical to an uninterrupted one (asserted in
tests/test_release_job.py).

Usage:
  spark-submit --py-files narowi_ocr_spark.zip \
      tools/run_release_job.py <pages_path> <out_path> [term1,term2,...]

Dev smoke (tests/test_release_job.py runs exactly this):
  python tools/run_release_job.py <pages_parquet> <out_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# `python tools/run_release_job.py` puts tools/ (not the repo root) on
# sys.path; on a cluster --py-files ships the package instead. Make the
# dev invocation in the docstring actually work — driver imports via
# sys.path, local-mode executor Python workers via PYTHONPATH (set
# BEFORE the session starts):
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO, os.environ.get("PYTHONPATH", "")) if p
    )

DEFAULT_BLOCKLIST = ["slow", "dup"]  # demo terms; deployments load the
# published list (see corpus.blocklist_gate)


# --------------------------------------------------------------------------
# Stage builders — pure DataFrame → DataFrame functions. run_release()
# wraps each in its checkpoint/resume protocol; release_stage_plans()
# chains them lazily so tools/plan_audit.py can sweep the release
# job's physical plans with the same allowlist discipline as the 218
# queries (VERDICT r4 item 4: a new SortAggregate/CartesianProduct in
# the release path must fail the audit, not ship silently).
# --------------------------------------------------------------------------


def build_docs(pages: DataFrame) -> DataFrame:
    """Extraction + admission + distinct-on-id (stage 00_docs).

    Admission gate = non-empty extracted TEXT: `status` is the
    READINGS-validity verdict (the reference's per-image A1 status —
    typed spans found and valid), not an extraction-quality signal;
    extracted_text is byte-exact for partial/failed pages too, and a
    corpus release that kept only reading-bearing pages would silently
    drop ~90% of good prose (measured on the fixture corpus)."""
    from narowi_ocr_spark.operators.urls import url_host
    from narowi_ocr_spark.plans.pipeline import extract_pages

    extracted = extract_pages(pages).where(
        F.length("extracted_text") > 0
    ).select(
        # Full 64-bit id over (url, warc_ts) — no abs() (folding to
        # 63 bits doubles collision odds), and the timestamp
        # disambiguates re-crawls of the same URL across segments.
        F.xxhash64("url", "warc_ts").alias("doc_id"),
        "url",
        "warc_ts",
        F.col("extracted_text").alias("text"),
        url_host(F.col("url")).alias("source"),
    )
    # Distinct-on-id guard: real crawl inputs repeat (url, warc_ts)
    # across re-ingested segments, and every downstream id-keyed
    # semi-join (c4_keep, bl_keep, exact_keep, reps) would fan rows
    # out multiplicatively on a duplicated id. Deterministic keep
    # (min struct), ONE aggregate on doc_id — linear, no window.
    # The struct-min buffer makes it sort-based (per-partition sort
    # by the 8-byte doc_id, map-side combined to <=1 row per group
    # per partition before the shuffle); kept deliberately — the
    # lexicographic pick must compare text, so no fixed-width
    # packing applies, and a hash-then-join-back alternative
    # re-emits byte-identical duplicates (the common case) and
    # would need a second text shuffle to drop them.
    return (
        extracted.groupBy("doc_id")
        .agg(F.min(F.struct("url", "warc_ts", "text", "source")).alias("_r"))
        .select("doc_id", "_r.url", "_r.warc_ts", "_r.text", "_r.source")
    )


def build_clean_ids(
    docs: DataFrame,
    blocklist: list[str] | None = None,
    apply_c4: bool = True,
    full_gates: bool = False,
) -> DataFrame:
    """Cleaning gates (stage 01_clean_ids) as ONE fused scan: every
    gate chains in preserve mode (each appends its keep flag to the
    same DataFrame), the verdicts AND into a single filter, and the
    survivor set is ids-only (the text column never rewrites after
    00_docs). Zero joins, zero shuffles, one read of the text column —
    at release scale the alternative (one scan per gate + survivor-id
    semi-joins) multiplies corpus IO by the gate count.

    ``full_gates`` adds the complete modern curation stack on top of
    the C4 + blocklist default: language ID (en only), quality score,
    Gopher document rules, and the within-document repetition filter —
    the gate set the production recipe (``curation_full``) runs."""
    from narowi_ocr_spark.functions.textstats import with_c4_rules
    from narowi_ocr_spark.operators.corpus import blocklist_gate

    chain = docs
    pred = F.lit(True)
    if apply_c4:
        chain = with_c4_rules(chain, preserve=True)
        pred = pred & F.col("c4_keep")
    chain = blocklist_gate(
        chain, blocklist or DEFAULT_BLOCKLIST, preserve=True
    )
    pred = pred & F.col("bl_keep")
    if full_gates:
        from narowi_ocr_spark.functions.textstats import (
            with_gopher_rules,
            with_repetition_stats,
            with_text_stats,
        )

        chain = with_gopher_rules(
            with_repetition_stats(with_text_stats(chain)), preserve=True
        )
        pred = (
            pred
            & (F.col("lang_pred") == "en")
            & (F.col("q") >= 0.5)
            & (~F.col("is_repetitive"))
            & F.col("gopher_keep")
        )
    return chain.where(pred).select("doc_id")


def build_exact_ids(clean: DataFrame) -> DataFrame:
    """Exact dedup survivor ids (stage 02_exact_ids): keep-min over
    content md5."""
    from narowi_ocr_spark.operators.dedup import exact_dedup

    return exact_dedup(clean).select(F.col("keep_id").alias("doc_id"))


def build_near_ids(uniq: DataFrame, materialize: bool = True) -> DataFrame:
    """Near-dedup survivor ids (stage 03_near_ids): LSH candidates →
    exact-Jaccard verify → connected components → one rep per cluster.

    PRODUCTION band geometry (128 perms, 16 bands x 8 rows, ~0.71
    capture threshold): the dev 16/2 geometry's ~0.35 threshold turns
    any moderately self-similar corpus into a quadratic candidate
    join — at release scale the steep S-curve is what keeps this
    stage linear in the number of TRUE near-dup pairs. The xxhash64
    kernel keeps the 128-perm signature pass up to ~10× cheaper than
    md5 on shingle-heavy corpora (the hash kernel IS the dedup cost
    at scale); candidates are verified by exact Jaccard either way.

    ``materialize=False`` (plan audit only) skips the eager
    localCheckpoint of the candidate pair list so the full chain stays
    lazy; the real job materializes it because the verify → CC → count
    chain walks the (cheap, sparse) pair list several times."""
    from narowi_ocr_spark.operators.components import (
        component_representatives,
        connected_components,
    )
    from narowi_ocr_spark.operators.dedup import (
        PROD_NUM_PERM,
        PROD_ROWS_PER_BAND,
        jaccard_pairs,
        lsh_candidate_pairs,
    )

    cand = lsh_candidate_pairs(
        uniq,
        num_perm=PROD_NUM_PERM,
        rows_per_band=PROD_ROWS_PER_BAND,
        kernel="xxhash64",
    )
    if materialize:
        cand = cand.localCheckpoint(eager=True)
    verified = jaccard_pairs(uniq, cand, threshold=0.8)
    labels = connected_components(
        verified, nodes=uniq.select(F.col("doc_id").alias("id"))
    )
    return component_representatives(labels).select(
        F.col("keep_id").alias("doc_id")
    )


def build_released_text(released: DataFrame, pii_scrub: bool = False) -> DataFrame:
    """Delivery-side text pass: PII redaction applied ONCE to the
    released survivors (after dedup, so the regex chain never runs on
    rows dedup is about to drop; before splits/shards/WET, so every
    delivery surface ships the scrubbed text). Narrow per-row
    regexp_replace chain — no shuffle, no UDF."""
    if not pii_scrub:
        return released
    from narowi_ocr_spark.functions.textstats import PII_PATTERNS, with_pii_scrub

    return (
        with_pii_scrub(released)
        .drop("text", *[f"n_{kind}" for kind, _, _ in PII_PATTERNS])
        .withColumnRenamed("redacted", "text")
        # keep the caller's column order (drop+rename appends text)
        .select(*released.columns)
    )


def build_train_shards(released: DataFrame) -> DataFrame:
    """Deterministic split → train shard assignment (stage shards)."""
    from narowi_ocr_spark.operators.corpus import dataset_splits
    from narowi_ocr_spark.operators.shards import shard_assign

    split = dataset_splits(released)
    train = split.where(F.col("split") == "train").drop("split", "split_key")
    return shard_assign(train)


def build_wet(assigned: DataFrame) -> DataFrame:
    """WET conversion records for the released train split."""
    from narowi_ocr_spark.sources.wet import wet_export

    return wet_export(
        assigned.select("doc_id", "url", "warc_ts", "text"),
        url_col="url",
        ts_col="warc_ts",
        text_col="text",
    )


def release_stage_plans(
    pages: DataFrame,
    blocklist: list[str] | None = None,
    apply_c4: bool = True,
    full_gates: bool = False,
) -> dict[str, DataFrame]:
    """Lazily chain every release stage off ``pages`` — NOTHING
    executes (no checkpoints, no counts, no candidate materialization),
    so tools/plan_audit.py can inspect each stage's physical plan
    exactly as run_release() would compose it. Downstream stages read
    their upstream through the lazy chain instead of run_release()'s
    checkpoint parquet; the logical dataflow is identical, only the
    exchange-with-disk boundary differs."""
    docs = build_docs(pages)
    clean_ids = build_clean_ids(docs, blocklist, apply_c4, full_gates)
    clean = docs.join(clean_ids, "doc_id")
    exact_ids = build_exact_ids(clean)
    uniq = clean.join(exact_ids, "doc_id")
    near_ids = build_near_ids(uniq, materialize=False)
    released = build_released_text(
        docs.join(near_ids, "doc_id"), pii_scrub=full_gates
    )
    assigned = build_train_shards(released)
    return {
        "release:00_docs": docs,
        "release:01_clean_ids": clean_ids,
        "release:02_exact_ids": exact_ids,
        "release:03_near_ids": near_ids,
        "release:shards": assigned,
        "release:wet": build_wet(assigned),
    }


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem for ``path`` — works for file://, hdfs://, s3a://
    alike, unlike os.path (the driver must run unchanged on a cluster)."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jpath


def _committed(spark: SparkSession, path: str) -> bool:
    """True iff a Spark write to ``path`` COMMITTED (its `_SUCCESS`
    marker exists) — a half-written dir from a killed job is recomputed,
    never trusted."""
    fs, _ = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    return fs.exists(jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS"))


def _rmdir(spark: SparkSession, path: str) -> None:
    fs, jpath = _fs(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def run_release(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    blocklist: list[str] | None = None,
    apply_c4: bool = True,
    resume: bool = True,
    full_gates: bool = False,
) -> dict:
    """``full_gates`` runs the complete curation recipe: the default
    C4+blocklist gate stage additionally applies language ID, quality
    score, Gopher rules and the repetition filter (see
    ``build_clean_ids``), and the released text is PII-scrubbed once at
    delivery (``build_released_text``) before splits/shards/WET.

    ``apply_c4`` gates on the C4 line/page prose rules — the right
    default for organic web text, but a corpus without sentence
    punctuation (chat logs, code, the synthetic dev tables) fails the
    terminal-punctuation line rule wholesale; such runs disable it and
    rely on the blocklist + dedup stages.

    ``resume=True`` reuses any committed stage checkpoints under
    ``out_path/checkpoints`` (see module docstring); ``resume=False``
    forces a from-scratch run (checkpoints are still written, so the
    NEXT run can resume). Checkpoints are keyed by ``out_path`` alone —
    a release over a DIFFERENT pages table must use a fresh out dir
    (reusing one would resume from the other corpus' stages)."""
    from narowi_ocr_spark.operators.shards import shard_manifest
    from narowi_ocr_spark.sources.sink import partition_histogram
    from narowi_ocr_spark.sources.wet import write_wet

    t0 = time.time()
    reader = spark.read
    pages = (
        reader.format("iceberg").load(pages_path)
        if "." in pages_path and "/" not in pages_path
        else reader.parquet(pages_path)
    )

    resumed: list[str] = []
    stage_s: dict[str, float] = {}

    def stage(name: str, compute: "callable") -> DataFrame:
        """Load the stage from its committed checkpoint (resume) or
        compute it, write the checkpoint, and read it back — downstream
        stages always consume the durable parquet, so lineage never
        chains through a lost executor's cache and a restarted driver
        sees identical bytes. Per-stage wall-clock lands in the manifest
        (`stage_seconds`) — the number capacity planning reads first."""
        path = f"{out_path}/checkpoints/{name}"
        if resume and _committed(spark, path):
            resumed.append(name)
        else:
            ts = time.time()
            compute().write.mode("overwrite").parquet(path)
            stage_s[name] = round(time.time() - ts, 2)
        return spark.read.parquet(path)

    counts: dict[str, int] = {"pages": pages.count()}

    # 1. extraction (one Arrow stage) + admission + distinct-on-id
    # (see build_docs). The downstream chain re-reads the survivor set
    # many times (gates, dedup, splits); it is served from the
    # checkpoint parquet — the disk-backed equivalent of the old
    # .persist(), and it survives a driver restart.
    docs = stage("00_docs", lambda: build_docs(pages))
    counts["extracted"] = docs.count()

    # 2. cleaning gates (see build_clean_ids) — the checkpoint is the
    # surviving id list (ids-only: text never rewrites after 00_docs)
    clean_ids = stage(
        "01_clean_ids",
        lambda: build_clean_ids(docs, blocklist, apply_c4, full_gates),
    )
    clean = docs.join(clean_ids, "doc_id")
    counts["clean"] = clean_ids.count()

    # 3. exact dedup (keep-min over content md5)
    exact_ids = stage("02_exact_ids", lambda: build_exact_ids(clean))
    uniq = clean.join(exact_ids, "doc_id")
    counts["exact_unique"] = exact_ids.count()

    # 4. near-dedup: LSH candidates → exact-Jaccard verify → CC reps
    # (see build_near_ids; materialize=True pins the candidate pair
    # list once for the verify → CC → count chain)
    near_ids = stage("03_near_ids", lambda: build_near_ids(uniq))
    released = build_released_text(
        docs.join(near_ids, "doc_id"), pii_scrub=full_gates
    ).persist()
    counts["near_unique"] = near_ids.count()

    # 5. splits + shards + manifests — terminal writes are their own
    # checkpoints: a committed shards dir is loaded, not rewritten
    shards_done = resume and _committed(spark, f"{out_path}/shards")
    if shards_done:
        resumed.append("shards")
        assigned = spark.read.parquet(f"{out_path}/shards")
        counts["train"] = assigned.count()
    else:
        ts = time.time()
        assigned = build_train_shards(released)
        counts["train"] = assigned.count()
        assigned.write.mode("overwrite").partitionBy("shard").parquet(
            f"{out_path}/shards"
        )
        shard_manifest(assigned, assigned).write.mode("overwrite").parquet(
            f"{out_path}/shard_manifest"
        )
        stage_s["shards"] = round(time.time() - ts, 2)

    # 6. WET segments for the released train split
    if resume and _committed(spark, f"{out_path}/wet"):
        resumed.append("wet")
    else:
        ts = time.time()
        write_wet(build_wet(assigned), f"{out_path}/wet", mode="overwrite")
        stage_s["wet"] = round(time.time() - ts, 2)

    # 7. per-partition lineage over the delivered shards: rows per
    # physical partition + skew ratio (O(partitions) collect — the
    # audit row a 1000-executor run is debugged from). A fully-gated
    # release (train == 0) leaves a schema-less empty dir; record an
    # empty histogram rather than failing the manifest write.
    try:
        hist = [
            r.asDict()
            for r in partition_histogram(
                spark.read.parquet(f"{out_path}/shards")
            ).collect()
        ]
    except Exception:
        hist = []
    sizes = [h["rows"] for h in hist]
    manifest = {
        "ts": time.time(),
        "wall_s": round(time.time() - t0, 2),
        "stages": counts,
        "stage_seconds": stage_s,
        "resumed_stages": resumed,
        "survival_ppm": {
            k: int(v * 1_000_000 / counts["pages"]) if counts["pages"] else 0
            for k, v in counts.items()
        },
        "lineage": {
            "partitions": len(sizes),
            "rows": sum(sizes),
            "max_partition_rows": max(sizes) if sizes else 0,
            "skew_ratio": round(max(sizes) / (sum(sizes) / len(sizes)), 4)
            if sizes
            else None,
            "partition_histogram": hist,
        },
    }
    _rmdir(spark, f"{out_path}/release_manifest")  # saveAsTextFile cannot
    # overwrite; reruns into the same release dir must not fail here
    spark.sparkContext.parallelize([json.dumps(manifest)], 1).saveAsTextFile(
        f"{out_path}/release_manifest"
    )
    released.unpersist()
    return manifest


def main() -> None:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    pages_path, out_path = argv[0], argv[1]
    blocklist = argv[2].split(",") if len(argv) > 2 else None
    # Pin UTC: WET WARC-Date and md5-of-date record ids must not vary
    # with the cluster's wall clock zone (library sessions get this
    # from config.get_spark; spark-submit sessions must set it here).
    spark = (
        SparkSession.builder.appName("narowi-release")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    print(
        json.dumps(
            run_release(
                spark,
                pages_path,
                out_path,
                blocklist,
                # --no-c4: corpora without sentence punctuation (see
                # run_release docstring) skip the C4 prose rules
                apply_c4="--no-c4" not in flags,
                resume="--no-resume" not in flags,
            )
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
