"""Differential tests: the native (all-JVM) fast-path kernels vs the
byte-identical Python kernels. The fast paths promise identical output on
every input the reference can process; the fuzz here drives both over
randomized compositions of reading-bearing and noise lines and asserts
span-for-span equality."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from narowi_ocr_spark.functions.fastpath import (
    extract_numbers_fast,
    extract_readings_fast,
    extract_weight_spans,
)
from narowi_ocr_spark.functions.numbers import extract_numbers_py
from narowi_ocr_spark.functions.readings import extract_readings_py

FRAGMENTS = [
    "98.6F", "Temp: 37.0°C", "105F", "T: 99.1 F", "F 98.6",
    "150.5 lbs", "WT: 15 kg", "kg 68.2", "200 pounds", "12 lb.",
    "BP: 120/80", "SYS: 150 DIA: 95", "135/85 mmHg", "mmHg 110/70",
    "SpO2: 98%", "65%", "O2: 91 %", "% 88",
    "HR: 72", "205 BPM", "PULSE: 66", "72 BPM", "HR 55",
    "120 mg/dL", "2.5 mmol/L", "GLU: 140 mg/dL", "mmol/L 6.1",
    "RESP: 16", "R: 45", "RR: 22", "18 RR",
    "PAIN: 7/10", "P: 7/10", "P: 88", "3 out of 10", "-2/10",
    "HT: 170 cm", "5'10\"", "6 1 in", "H: 182 cm",
    "Temperature: 98.6F\nBP: 120/80\nO2: 98%",
    "HR: 72 RR",            # negative lookahead territory
    "the quick brown fox",  # digit-free
    "loop 42 things 7",     # digits, no reading
    "",
]


def _random_docs(n: int, seed: int = 20260817) -> list[str]:
    rng = random.Random(seed)
    docs = []
    for _ in range(n):
        k = rng.randint(0, 7)
        lines = [rng.choice(FRAGMENTS) for _ in range(k)]
        # occasionally duplicate a line to exercise the substring-dedup set
        if lines and rng.random() < 0.4:
            lines.append(rng.choice(lines))
        docs.append("\n".join(lines))
    return docs


@pytest.fixture(scope="module")
def doc_df(spark):
    docs = _random_docs(300)
    return (
        spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
        ),
        docs,
    )


def test_readings_fast_matches_kernel(doc_df):
    df, docs = doc_df
    got = {
        r["doc_id"]: [x.asDict() for x in r["r"]]
        for r in df.select(
            "doc_id", extract_readings_fast("text").alias("r")
        ).collect()
    }
    for i, text in enumerate(docs):
        assert got[i] == extract_readings_py(text), f"doc {i}: {text!r}"


def test_numbers_fast_matches_kernel(doc_df):
    df, docs = doc_df
    got = {
        r["doc_id"]: [x.asDict() for x in r["n"]]
        for r in df.select(
            "doc_id", extract_numbers_fast("text", 88.0).alias("n")
        ).collect()
    }
    for i, text in enumerate(docs):
        assert got[i] == extract_numbers_py(text, 88.0), f"doc {i}: {text!r}"


def test_fastpath_flag_dispatch(spark):
    """extract_readings/extract_numbers(byte_identical=False) route to
    the native fast path and agree with the Arrow kernels."""
    from narowi_ocr_spark.functions.numbers import extract_numbers
    from narowi_ocr_spark.functions.readings import extract_readings

    df = spark.createDataFrame(
        [Row(doc_id=0, text="Temp: 98.6F\nBP: 120/80\nHR: 72")]
    )
    slow = df.select(extract_readings("text").alias("r")).first()["r"]
    fast = df.select(
        extract_readings("text", byte_identical=False).alias("r")
    ).first()["r"]
    assert [x.asDict() for x in fast] == [x.asDict() for x in slow]

    slow_n = df.select(extract_numbers("text", 88.0).alias("n")).first()["n"]
    fast_n = df.select(
        extract_numbers("text", 88.0, byte_identical=False).alias("n")
    ).first()["n"]
    assert [x.asDict() for x in fast_n] == [x.asDict() for x in slow_n]


def test_numbers_fast_null_confidence_matches_kernel(spark):
    """NULL confidence coerces to 0.0 in BOTH paths (the kernel's
    `float(c) if c is not None else 0.0`)."""
    df = spark.createDataFrame(
        [Row(doc_id=0, text="HR: 72", conf=None)],
        "doc_id long, text string, conf double",
    )
    fast = df.select(
        extract_numbers_fast("text", F.col("conf")).alias("n")
    ).first()["n"]
    assert fast and all(x["confidence"] == 0.0 for x in fast)
    assert [x.asDict() for x in fast] == extract_numbers_py("HR: 72", 0.0)


def test_fastpath_null_and_empty(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text=None), Row(doc_id=1, text="")]
    )
    out = df.select(
        "doc_id",
        extract_readings_fast("text").alias("r"),
        extract_numbers_fast("text", 1.0).alias("n"),
        extract_weight_spans("text", 1.0).alias("w"),
    ).collect()
    for row in out:
        assert row["r"] == [] and row["n"] == [] and row["w"] == []


def test_documented_divergence_on_reference_crash_input(spark):
    """'170 centimeters' crashes the reference (and the byte-identical
    kernel): 'cm' ∉ matched.lower() routes to the feet-inches branch
    whose group(2) does not exist. The fast path instead yields the
    cm-branch reading — the one documented divergence class."""
    with pytest.raises(Exception):
        extract_readings_py("170 centimeters")
    df = spark.createDataFrame([Row(doc_id=0, text="170 centimeters")])
    out = df.select(extract_readings_fast("text").alias("r")).first()["r"]
    # HEIGHT emits from the cm branch; TEMPERATURE also matches "170 c"
    # ('c' before 'e' passes the (?!m) lookahead) — the crashed kernel
    # never reaches it
    assert [x.asDict() for x in out] == [
        {"type": "HEIGHT", "value": 170.0, "unit": "cm", "is_valid": True},
        {"type": "TEMPERATURE", "value": 170.0, "unit": "C", "is_valid": False},
    ]


def test_extract_weight_spans_intended_semantics(spark):
    """K9 intended semantics: whole-text scan, first occurrence of each
    raw_text wins across patterns, unit = lowercased unit token."""
    df = spark.createDataFrame(
        [Row(doc_id=0, text="WT: 150.5 lbs then 150.5 lbs again and 68.2 kg")]
    )
    out = [
        x.asDict()
        for x in df.select(extract_weight_spans("text", 90.0).alias("w")).first()["w"]
    ]
    # pattern 1 finds "150.5 lbs" twice (dedup keeps one) and pattern 3
    # finds "68.2 kg"; "WT: 150.5 lbs" (pattern 5) is a DIFFERENT raw
    # text and therefore also emits
    raws = [o["raw_text"] for o in out]
    assert raws.count("150.5 lbs") == 1
    assert "68.2 kg" in raws
    by_raw = {o["raw_text"]: o for o in out}
    assert by_raw["150.5 lbs"] == {
        "value": 150.5, "unit": "lbs", "raw_text": "150.5 lbs", "conf": 90.0
    }
    assert by_raw["68.2 kg"]["unit"] == "kg"
