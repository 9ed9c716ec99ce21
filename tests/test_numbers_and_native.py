"""K1-K4 numeric-span kernel + K8 native temperature-format validation
(golden cases from reference tests/test_thermometer.py:10-40 and
test_pattern_matcher.py:196-213) + differential check vs the reference
NumberExtractor."""

import os

import pytest
from pyspark.sql import functions as F

from narowi_ocr_spark.functions.native import validate_temperature_format
from narowi_ocr_spark.functions.numbers import (
    extract_numbers,
    extract_numbers_py,
    validate_number_span,
)


def test_numbers_basic():
    spans = extract_numbers_py("BP: 120/80", 0.9)
    # No dedup in the reference: overlapping BP patterns emit 2 spans each
    # (3 patterns match → 6 spans).
    assert len(spans) == 6
    assert spans[0]["value"] == 120.0 and spans[0]["unit"] == "mmHg"
    assert spans[1]["value"] == 80.0


def test_numbers_bogus_oxygen_artifact():
    # Reference parity: '98% 72 BPM' emits a bogus (72, '%') span from the
    # '%\\s*(\\d+)' pattern — replicated, not fixed (SURVEY.md §2 K2).
    spans = extract_numbers_py("98% 72 BPM", 1.0)
    assert {(s["value"], s["unit"]) for s in spans} >= {(98.0, "%"), (72.0, "%"), (72.0, "BPM")}


def test_numbers_spark_and_validation(spark):
    df = spark.createDataFrame(
        [("98.6F", 90.0), ("150.5 lbs", 80.0), (None, 50.0)], ["text", "conf"]
    )
    out = (
        df.select(
            extract_numbers("text", F.col("conf")).alias("spans")
        )
        .select(F.explode("spans").alias("s"))
        .select("s.*", validate_number_span(F.col("s.value"), F.col("s.unit")).alias("ok"))
        .collect()
    )
    assert all(r.ok for r in out)
    temps = [r for r in out if r.unit == "°F"]
    assert temps and temps[0].value == 98.6


@pytest.mark.skipif(
    not os.path.exists("/root/reference/src/processing/number_extractor.py"),
    reason="reference not available",
)
def test_numbers_differential_vs_reference():
    import importlib.util
    import random

    spec = importlib.util.spec_from_file_location(
        "ref_ne", "/root/reference/src/processing/number_extractor.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    ne = ref.NumberExtractor()

    def ref_spans(text, conf):
        return [
            {"value": n.value, "unit": n.unit, "confidence": n.confidence, "raw_text": n.raw_text}
            for n in ne.extract_numbers(text, conf)
        ]

    rng = random.Random(11)
    frags = ["98.6F", "120/80", "mmHg", "BP:", "150.5 lbs", "kg", "98%", "SpO2:",
             "72 BPM", "HR: 72", "O2: 97%", "WT: 88.5 kg", "x", "12", "99.9"]
    for _ in range(400):
        text = rng.choice([" ", "\n"]).join(
            rng.choice(frags) for _ in range(rng.randint(1, 6))
        )
        assert extract_numbers_py(text, 0.8) == ref_spans(text, 0.8), repr(text)


TEMP_FORMAT_CASES = [
    # (text, is_valid, adjustment, reason, correction)
    ("98.6F", True, 0.0, None, None),
    ("98.6/", False, -20.0, "Invalid character '/' or '\\' in temperature", "98.6."),
    ("98.6", False, -25.0, "Missing temperature unit (F or C)", "98.6°F"),
    ("98.6.", False, -15.0, "Temperature ends with decimal point", "98.6"),
    ("98.6F ", True, 0.0, None, None),
    (" F98.6", True, 0.0, None, None),
    ("abc", False, -30.0, "Invalid temperature format", None),
]


def test_validate_temperature_format_native(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(TEMP_FORMAT_CASES)], ["id", "text"]
    )
    rows = (
        df.select("id", validate_temperature_format("text").alias("v"))
        .orderBy("id")
        .collect()
    )
    for row, (text, valid, adj, reason, corr) in zip(rows, TEMP_FORMAT_CASES):
        assert row.v.is_valid == valid, text
        assert row.v.confidence_adjustment == adj, text
        if reason:
            assert row.v.error_reason == reason, text
        if corr:
            assert row.v.suggested_correction == corr, text


def test_rolling_fingerprint(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.functions.textstats import (
        ROLL_BASE,
        ROLL_MOD,
        ROLL_SEED,
        rolling_fingerprint,
    )

    def py_roll(s):
        acc = ROLL_SEED
        for ch in s:
            acc = (acc * ROLL_BASE + ord(ch)) % ROLL_MOD
        return acc

    rows = [Row(i=0, t="abc"), Row(i=1, t=""), Row(i=2, t="the quick brown fox")]
    out = {
        r.i: r.rfp
        for r in spark.createDataFrame(rows)
        .select("i", rolling_fingerprint("t").alias("rfp"))
        .collect()
    }
    assert out == {0: py_roll("abc"), 1: ROLL_SEED, 2: py_roll("the quick brown fox")}
