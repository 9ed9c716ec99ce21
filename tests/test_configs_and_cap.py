"""T7 best-of-configs and P2 html size cap."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from narowi_ocr_spark.operators.assemble import best_of_configs
from narowi_ocr_spark.plans.pipeline import cap_html, extract_pages
from narowi_ocr_spark.schema import PAGES_SCHEMA


def test_best_of_configs_picks_max_confidence(spark):
    df = spark.createDataFrame([Row(x=1)])
    a = F.struct(F.lit("text-a").alias("extracted_text"), F.lit(40.0).alias("confidence"))
    b = F.struct(F.lit("text-b").alias("extracted_text"), F.lit(90.0).alias("confidence"))
    c = F.struct(F.lit("text-c").alias("extracted_text"), F.lit(90.0).alias("confidence"))
    best = df.select(best_of_configs(a, b, c).alias("best")).first()["best"]
    assert best["extracted_text"] == "text-b"  # ties break to earlier config
    assert best["confidence"] == 90.0
    assert best["config_idx"] == 1


def test_cap_html_truncates_only_oversized(spark):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    big = b"<p>" + b"a" * 5000 + b"</p>"
    rows = [("u1", ts, b"<p>ok</p>", None, "en"), ("u2", ts, big, None, "en")]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = extract_pages(pages, max_html_bytes=1000)
    lens = {r["url"]: len(r["extracted_text"]) for r in out.collect()}
    assert lens["u1"] == 2
    # truncated page still tokenizes; its text is capped near the limit
    assert 0 < lens["u2"] <= 1000
