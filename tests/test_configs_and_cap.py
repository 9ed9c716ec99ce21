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


def test_extraction_mode_dispatch_caps_per_type(spark):
    """T2: extract_pages(doc_type_col=...) applies each row's mode cap
    via the native when(doc_type) dispatch — one plan, no branching."""
    import datetime

    from narowi_ocr_spark.plans.pipeline import EXTRACTION_MODES, mode_config

    ts = datetime.datetime(2024, 1, 1)
    big = b"<p>" + b"a" * 100_000 + b"</p>"
    rows = [
        ("article", ts, big, None, "en"),
        ("feed", ts, big, None, "en"),
        ("unknown-type", ts, big, None, "en"),  # falls back to article
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA).withColumn(
        "doc_type", F.col("url")
    )
    out = extract_pages(pages, doc_type_col="doc_type")
    lens = {r["url"]: len(r["extracted_text"]) for r in out.collect()}
    feed_cap = EXTRACTION_MODES["feed"]["max_html_bytes"]
    assert lens["article"] == 100_000          # under the 2 MB cap
    assert lens["unknown-type"] == 100_000     # default mode
    assert 0 < lens["feed"] <= feed_cap        # capped at 64 KiB

    cfg = (
        pages.select(mode_config(F.col("doc_type")).alias("m"))
        .where(F.col("url") == "feed")
        .first()["m"]
    )
    assert cfg["max_html_bytes"] == feed_cap
    assert cfg["min_text_len"] == EXTRACTION_MODES["feed"]["min_text_len"]


def test_extraction_mode_thresholds_reach_fused_kernel(spark):
    """T2: the mode's classifier thresholds ride the Arrow batch — a
    block shorter than feed's min_text_len (5) classifies as content
    under article mode but NOT under feed mode, in the FUSED path."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    html = b"<p>abc</p>"  # 3-char block
    rows = [("article", ts, html, None, "en"), ("feed", ts, html, None, "en")]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA).withColumn(
        "doc_type", F.col("url")
    )
    out = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(pages, doc_type_col="doc_type").collect()
    }
    assert out["article"] == "abc"
    assert out["feed"] == ""  # 3 < min_text_len=5 → not content

    # keep_blocks debug path applies the same per-row thresholds
    blk = {
        r["url"]: r["blocks"][0]["is_content"]
        for r in extract_pages(
            pages, keep_blocks=True, doc_type_col="doc_type"
        ).collect()
    }
    assert blk == {"article": True, "feed": False}


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
