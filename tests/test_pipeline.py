"""End-to-end pipeline: synthetic pages → blocks → main text → readings.
The ``text`` oracle column of the generated corpus must be reproduced
byte-identically by the extraction path (north_rule per-row invariant)."""

from pyspark.sql import functions as F

from narowi_ocr_spark.operators.blocks import rank_blocks, tokenize_html_py, top_block
from narowi_ocr_spark.plans.pipeline import extract_pages
from narowi_ocr_spark.sources.pages import build_page, synth_pages

N_PAGES = 400


def test_tokenizer_pure():
    url, ts, html, oracle, lang = build_page(0)
    blocks = tokenize_html_py(html)
    assert blocks, "tokenizer produced no blocks"
    tags = {b["tag"] for b in blocks}
    assert "title" in tags and "nav" in tags and "footer" in tags
    # script/style/comment content never leaks into block text
    joined = " ".join(b["text"] for b in blocks)
    assert "var x" not in joined and "margin:0" not in joined


def test_extracted_text_byte_identical(spark):
    pages = synth_pages(spark, N_PAGES, partitions=4)
    out = extract_pages(pages)
    joined = out.join(
        pages.select("url", F.col("text").alias("expected")), "url"
    )
    mismatches = joined.where(
        F.col("extracted_text") != F.col("expected")
    ).count()
    assert mismatches == 0
    assert out.count() == N_PAGES


def test_readings_on_golden_pages(spark):
    pages = synth_pages(spark, N_PAGES, partitions=4)
    out = extract_pages(pages)
    # Pages at id % 7 == 0 carry a golden snippet → most must yield spans.
    with_readings = out.where(F.size("readings") > 0).count()
    assert with_readings > N_PAGES / 10
    # Multi-reading golden docs (id % 53 == 0) must yield >= 9 readings.
    url0 = build_page(0)[0]  # id 0: snippet AND multi-doc page
    row = out.where(F.col("url") == url0).collect()[0]
    assert len(row.readings) >= 9


def test_status_rules(spark):
    pages = synth_pages(spark, N_PAGES, partitions=4)
    out = extract_pages(pages)
    bad = out.where(
        ((F.size("readings") == 0) & (F.col("status") != "failed"))
        | (
            (F.size("readings") > 0)
            & (F.size(F.filter("readings", lambda r: r["is_valid"])) == 0)
            & (F.col("status") != "failed")
        )
    ).count()
    assert bad == 0


def test_rank_and_top_block(spark):
    pages = synth_pages(spark, 50, partitions=2)
    from narowi_ocr_spark.operators.blocks import score_blocks, tokenize_html

    blocks = pages.select(
        "url", score_blocks(tokenize_html("html")).alias("blocks")
    )
    ranked = rank_blocks(blocks)
    # exactly one rank-1 block per url
    per_url = ranked.where("rank = 1").groupBy("url").count()
    assert per_url.where("count != 1").count() == 0
    # shuffle-free top_block agrees with the window rank-1 result
    tb = blocks.select("url", top_block("blocks").alias("b"))
    joined = tb.join(
        ranked.where("rank = 1").select("url", F.col("block").alias("w")), "url"
    )
    assert joined.where(F.col("b.block_idx") != F.col("w.block_idx")).count() == 0
