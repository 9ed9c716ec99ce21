"""T6 detailed tokens, K10 digit-confidence validation, S6 CSV export."""

import csv
import glob

from pyspark.sql import Row
from pyspark.sql import functions as F

from narowi_ocr_spark.operators.blocks import score_blocks, tokenize_html
from narowi_ocr_spark.operators.tokens import (
    detailed_tokens,
    digit_confidence_issues,
    temperature_range_issue,
)
from narowi_ocr_spark.plans.pipeline import extract_pages
from narowi_ocr_spark.sources.pages import synth_pages
from narowi_ocr_spark.sources.sink import CSV_HEADER, export_csv


def test_detailed_tokens_hierarchy(spark):
    html = "<p>alpha beta</p><p>one\ntwo three</p>"
    df = spark.createDataFrame([Row(url="u", html=html)])
    blocks = df.select("url", score_blocks(tokenize_html("html")).alias("blocks"))
    rows = detailed_tokens(blocks).collect()
    got = {(r["block_idx"], r["line_idx"], r["word_idx"]): r["token"] for r in rows}
    assert got[(0, 0, 0)] == "alpha"
    assert got[(0, 0, 1)] == "beta"
    assert got[(1, 0, 0)] == "one"
    assert got[(1, 1, 0)] == "two"
    assert got[(1, 1, 1)] == "three"
    assert all(r["confidence"] > 0 for r in rows)


def test_digit_confidence_issues(spark):
    tokens = spark.createDataFrame(
        [
            Row(doc_id=1, word_idx=0, token="35.9", confidence=80.0),
            Row(doc_id=1, word_idx=1, token="35.9", confidence=90.0),  # conf ok
            Row(doc_id=1, word_idx=2, token="467", confidence=10.0),   # no 3/5
        ]
    )
    issues = digit_confidence_issues(tokens).collect()
    flagged = {(r["word_idx"], r["char_index_in_word"], r["original_char"]) for r in issues}
    assert flagged == {(0, 0, "3"), (0, 1, "5")}
    # message + context_type match the reference Validator verbatim
    # (validator.py:34-35)
    msg = [r["message"] for r in issues if r["char_index_in_word"] == 0][0]
    assert msg == "Low confidence for digit '3' in word '35.9'"
    assert {r["context_type"] for r in issues} == {"confidence_check"}


def test_word_confidence_issues_intended_semantics(spark):
    """K11 intended semantics (the reference method crashes on a missing
    attribute): flag words under the 85.0 threshold with the exact
    message format the reference's f-string produces."""
    from narowi_ocr_spark.operators.tokens import word_confidence_issues

    tokens = spark.createDataFrame(
        [
            Row(doc_id=1, word_idx=0, token="35.9", confidence=80.0),
            Row(doc_id=1, word_idx=1, token="120", confidence=90.0),
            Row(doc_id=1, word_idx=2, token="ok", confidence=84.99),
        ]
    )
    out = {r["word_idx"]: r["message"] for r in word_confidence_issues(tokens).collect()}
    assert out == {
        0: "Low confidence (80.00%) for digits: 35.9",
        2: "Low confidence (84.99%) for digits: ok",
    }


def test_temperature_range_issue(spark):
    df = spark.createDataFrame(
        [Row(w="120.5"), Row(w="98.6"), Row(w="85"), Row(w="not-a-number")]
    )
    out = df.select(temperature_range_issue(F.col("w")).alias("m")).collect()
    # reference semantics: ANY parseable word range-checks (ungated)
    assert out[0]["m"] == "Potential out-of-range temperature: 120.5F"
    assert out[1]["m"] is None
    assert out[2]["m"] == "Potential out-of-range temperature: 85F"
    assert out[3]["m"] is None  # ValueError → pass in the reference


def test_export_csv_header_and_shape(spark, tmp_path):
    results = extract_pages(synth_pages(spark, 120, partitions=2))
    out = str(tmp_path / "csv")
    export_csv(results.coalesce(1), out)
    f = glob.glob(out + "/*.csv")[0]
    with open(f, newline="") as fh:
        rows = list(csv.reader(fh))
    assert tuple(rows[0]) == CSV_HEADER
    n_readings = results.select(F.sum(F.size("readings"))).first()[0]
    assert len(rows) - 1 == n_readings  # inner explode: no row for empty docs
