"""End-to-end smoke of the release driver (tools/run_release_job.py):
crawl pages → extract → clean → dedup (exact + near) → split → shards →
WET segments → manifest, all from library calls."""

import glob
import json
import sys

import pyspark.sql.functions as F

from narowi_ocr_spark.sources.pages import synth_pages

sys.path.insert(0, "/root/repo/tools")


def test_release_job_end_to_end(spark, tmp_path):
    from run_release_job import run_release

    src = str(tmp_path / "pages")
    out = str(tmp_path / "release")
    base = synth_pages(spark, 300, partitions=4)
    # plant exact duplicates: 20 extra urls re-serving the text of the
    # first 20 pages (same html ⇒ same extracted text ⇒ exact-dup drop)
    dup = (
        base.limit(20)
        .select(
            F.concat(F.lit("https://mirror.example/"), F.col("url")).alias(
                "url"
            ),
            "warc_ts",
            "html",
            "text",
            "lang",
        )
    )
    base.unionByName(dup).write.parquet(src)

    # synth text has no sentence punctuation, so the C4 prose rules are
    # disabled (documented on run_release); the gate chain still runs
    # the blocklist
    manifest = run_release(spark, src, out, apply_c4=False)
    st = manifest["stages"]
    assert st["pages"] == 320
    assert 0 < st["extracted"] <= 320
    # gates only shrink; dedup only shrinks; train ⊆ released
    assert st["extracted"] >= st["clean"] >= st["exact_unique"]
    assert st["exact_unique"] >= st["near_unique"] >= st["train"]
    # exact dedup keeps exactly one doc per distinct surviving text —
    # the planted mirrors die here whenever their original also
    # survived the gates
    shards = spark.read.parquet(out + "/shards")
    assert st["exact_unique"] < st["clean"]  # at least one mirror pair

    # artifacts exist and reconcile
    assert shards.count() == st["train"]
    sm = spark.read.parquet(out + "/shard_manifest")
    assert sm.agg(F.sum("n_docs")).first()[0] == st["train"]
    wet_blob = b"".join(
        open(p, "rb").read()
        for p in sorted(glob.glob(out + "/wet/part-*"))
    )
    assert wet_blob.count(b"WARC/1.0\r\n") == st["train"]
    rel = json.loads(
        open(glob.glob(out + "/release_manifest/part-*")[0]).read()
    )
    assert rel["stages"] == st


def test_release_job_repeated_url_rows_collapse_not_fan_out(spark, tmp_path):
    """Re-ingested segments repeat (url, warc_ts) verbatim. The id
    guard must collapse them to one doc each — without it, every
    id-keyed semi-join downstream fans rows out multiplicatively and
    exact dedup keeps every copy (ADVICE r4)."""
    from run_release_job import run_release

    src = str(tmp_path / "pages")
    out = str(tmp_path / "release")
    base = synth_pages(spark, 100, partitions=4)
    # each page ingested 3× (same url AND warc_ts — identical rows)
    base.unionByName(base).unionByName(base).write.parquet(src)

    manifest = run_release(spark, src, out, apply_c4=False)
    st = manifest["stages"]
    assert st["pages"] == 300
    # the distinct-on-id guard collapses triplicates before the gates
    assert st["extracted"] <= 100
    # stage counts stay monotone (fan-out would break this)
    assert st["extracted"] >= st["clean"] >= st["exact_unique"]
    assert st["exact_unique"] >= st["near_unique"] >= st["train"]
    # released shards carry no duplicate urls
    shards = spark.read.parquet(out + "/shards")
    assert shards.count() == shards.select("url").distinct().count()
    assert shards.count() == st["train"]


def test_release_job_resume_is_noop_and_identical(spark, tmp_path):
    """north_rule resumability: a rerun into the same release dir loads
    every committed stage checkpoint (recomputing nothing upstream) and
    reproduces the manifest counts bit-for-bit."""
    from run_release_job import run_release

    src = str(tmp_path / "pages")
    out = str(tmp_path / "release")
    synth_pages(spark, 200, partitions=4).write.parquet(src)

    first = run_release(spark, src, out, apply_c4=False)
    assert first["resumed_stages"] == []
    second = run_release(spark, src, out, apply_c4=False)
    assert second["resumed_stages"] == [
        "00_docs", "01_clean_ids", "02_exact_ids", "03_near_ids",
        "shards", "wet",
    ]
    assert second["stages"] == first["stages"]
    assert second["lineage"]["rows"] == first["lineage"]["rows"]
    # and resume=False forces the full recompute to the same answer
    third = run_release(spark, src, out, apply_c4=False, resume=False)
    assert third["resumed_stages"] == []
    assert third["stages"] == first["stages"]


def test_release_job_resumes_from_first_missing_stage(spark, tmp_path):
    """A job killed mid-near-dedup restarts AT near-dedup: earlier
    checkpoints load, later stages recompute, outputs identical. A
    half-written (uncommitted) checkpoint is recomputed, not trusted."""
    import shutil

    from run_release_job import run_release

    src = str(tmp_path / "pages")
    out = str(tmp_path / "release")
    synth_pages(spark, 200, partitions=4).write.parquet(src)
    first = run_release(spark, src, out, apply_c4=False)

    # simulate the kill: near-dedup incomplete (no _SUCCESS), terminal
    # artifacts never written
    ck = tmp_path / "release" / "checkpoints"
    (ck / "03_near_ids" / "_SUCCESS").unlink()
    for d in ("shards", "shard_manifest", "wet"):
        shutil.rmtree(tmp_path / "release" / d)

    second = run_release(spark, src, out, apply_c4=False)
    assert second["resumed_stages"] == [
        "00_docs", "01_clean_ids", "02_exact_ids",
    ]
    assert second["stages"] == first["stages"]
    shards = spark.read.parquet(out + "/shards")
    assert shards.count() == first["stages"]["train"]


def test_training_job_end_to_end(spark, tmp_path):
    """Smoke of the training driver: train on a boolean teacher column,
    persist weights + manifest, eval beats the majority class."""
    from run_training_job import run_training

    src = str(tmp_path / "docs")
    out = str(tmp_path / "model")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    topic = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"),
            lambda t: t == F.lit("spark"),
        )
    )
    docs.withColumn("is_topic", topic >= 2).write.parquet(src)

    m = run_training(spark, src, out, "is_topic", epochs=8)
    assert m["n_weights"] == 257 and m["nonzero_weights"] > 0
    # weights artifact is dense and loadable
    wdf = spark.read.parquet(out + "/weights")
    assert wdf.count() == 257
    # learned: held-out accuracy beats predicting the majority class
    ev = m["eval"]
    majority = max(ev["positives"], ev["n"] - ev["positives"])
    assert ev["correct"] > majority
    import glob
    import json

    rel = json.loads(
        open(glob.glob(out + "/training_manifest/part-*")[0]).read()
    )
    assert rel["eval"] == ev


def test_release_job_full_gates_filters_and_scrubs(spark, tmp_path):
    """full_gates=True: the clean stage kills repetitive boilerplate the
    default gates admit, and the delivered text is PII-redacted — on a
    prose-mode corpus the organic pages survive every gate."""
    from run_release_job import (
        build_clean_ids,
        build_docs,
        build_released_text,
    )

    base = synth_pages(spark, 300, partitions=4, vocab_scale=64, prose=True)
    rep_body = (
        "<html><body>"
        + "".join(
            "<p>" + ("buy cheap deals now " * 12).strip() + ".</p>"
            for _ in range(6)
        )
        + "</body></html>"
    ).encode()
    rep = spark.createDataFrame(
        [("https://rep.example/a", rep_body)], "url string, html binary"
    ).select(
        "url",
        F.timestamp_seconds(F.lit(1)).alias("warc_ts"),
        "html",
        F.lit("x").alias("text"),
        F.lit("en").alias("lang"),
    )
    docs = build_docs(base.unionByName(rep)).cache()

    default_ids = build_clean_ids(docs, apply_c4=True)
    full_ids = build_clean_ids(docs, apply_c4=True, full_gates=True)
    rep_id = docs.where(F.col("url") == "https://rep.example/a").select(
        "doc_id"
    )
    # default gates admit the boilerplate page; the full stack kills it
    assert default_ids.join(rep_id, "doc_id").count() == 1
    assert full_ids.join(rep_id, "doc_id").count() == 0
    # organic prose pages pass the full stack (nothing else was culled)
    assert full_ids.count() == default_ids.count() - 1

    # PII scrub at delivery: emails redact, schema is unchanged
    released = docs.limit(5).withColumn(
        "text", F.concat("text", F.lit("\nmail bob.jones@mail.example now"))
    )
    scrubbed = build_released_text(released, pii_scrub=True)
    assert scrubbed.columns == released.columns
    assert scrubbed.where(F.col("text").contains("@mail.example")).count() == 0
    assert scrubbed.where(F.col("text").contains("<EMAIL>")).count() == 5
    # pii_scrub=False is the identity
    assert build_released_text(released) is released
