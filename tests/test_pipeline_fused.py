"""The fused single-Arrow-stage pipeline must be indistinguishable from
the modular two-stage composition (tokenize_scored → native assembly →
readings UDF) — same text, confidence, readings, status, per url."""

from pyspark.sql import functions as F

from narowi_ocr_spark.plans.pipeline import extract_pages
from narowi_ocr_spark.sources.pages import synth_pages


def test_fused_equals_modular(spark):
    pages = synth_pages(spark, 300, partitions=4)
    fused = extract_pages(pages)
    modular = extract_pages(pages, keep_blocks=True).drop("blocks")

    cols = ["status", "readings", "confidence", "error_message", "extracted_text"]
    f = {r["url"]: tuple(r[c] for c in cols) for r in fused.collect()}
    m = {r["url"]: tuple(r[c] for c in cols) for r in modular.collect()}
    assert f.keys() == m.keys()
    diff = [u for u in f if f[u] != m[u]]
    assert not diff, f"{len(diff)} urls differ, e.g. {diff[:3]}: {f[diff[0]]} vs {m[diff[0]]}"


def test_fused_single_python_stage(spark):
    pages = synth_pages(spark, 50, partitions=2)
    plan = extract_pages(pages)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1, plan
    assert plan.count("ArrowEvalPython") == 0, plan
    assert "Exchange" not in plan


def test_byte_identity_against_oracle_column(spark):
    pages = synth_pages(spark, 300, partitions=4)
    out = extract_pages(pages)
    j = out.join(pages.select("url", F.col("text").alias("expected")), "url")
    assert j.where(F.col("extracted_text") != F.col("expected")).count() == 0
