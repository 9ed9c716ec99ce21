"""Numeric-span extraction (SURVEY.md §2 K1-K4) — the NumberExtractor
analogue (reference src/processing/number_extractor.py:73-125) as an
Arrow-batched pandas UDF.

Reference semantics kept exactly:
  - newline normalization only (whole-text matching, not per-line, :87);
  - NO dedup: overlapping patterns emit duplicate spans (:90-123);
  - blood-pressure matches emit TWO spans (systolic then diastolic), both
    with unit 'mmHg' and the same raw_text (:94-111);
  - unit inference from the raw matched text (:127-144);
  - emission order: category order → pattern order → match position.

``validate_number_span`` (K4, :146-170) is provided natively so it stays
inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

import re as _re

from narowi_ocr_spark.schema import NUMBERS_SCHEMA
from narowi_ocr_spark.functions.patterns import (
    NUMBER_UNIT_RANGES,
    compiled_number_patterns,
)

_HAS_DIGIT = _re.compile(r"\d").search

# Category iteration order == dict insertion order in the pattern table,
# matching the reference's dict iteration (number_extractor.py:90).


def extract_numbers_py(text: str, confidence: float) -> list[dict]:
    """Pure-Python single-document kernel; runs inside Arrow batches only."""
    if text is None:
        return []
    normalized = text.replace("\r\n", "\n").replace("\r", "\n")
    # Every numeric pattern requires digits; digit-free documents (most
    # web text) short-circuit — semantics-preserving fast path.
    if not _HAS_DIGIT(normalized):
        return []
    spans: list[dict] = []
    for category, patterns in compiled_number_patterns().items():
        for pattern in patterns:
            for m in pattern.finditer(normalized):
                raw = m.group(0)
                if category == "blood_pressure":
                    for g in (1, 2):
                        spans.append(
                            {
                                "value": float(m.group(g)),
                                "unit": "mmHg",
                                "confidence": confidence,
                                "raw_text": raw,
                            }
                        )
                else:
                    spans.append(
                        {
                            "value": float(m.group(1)),
                            "unit": _unit_for(category, raw),
                            "confidence": confidence,
                            "raw_text": raw,
                        }
                    )
    return spans


def _unit_for(category: str, raw: str) -> str | None:
    # Reference number_extractor.py:138-144.
    if category == "temperature":
        return "°F" if "F" in raw.upper() else "°C"
    if category == "weight":
        return "lbs" if "lbs" in raw.lower() else "kg"
    if category == "oxygen":
        return "%"
    if category == "heart_rate":
        return "BPM"
    return None


@pandas_udf(NUMBERS_SCHEMA)
def _extract_numbers_udf(
    batches: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    for text_s, conf_s in batches:
        yield pd.Series(
            [
                extract_numbers_py(t, float(c) if c is not None else 0.0)
                for t, c in zip(text_s, conf_s)
            ]
        )


def extract_numbers(
    text: Column | str, confidence: Column | float, byte_identical: bool = True
) -> Column:
    """array<struct<value,unit,confidence,raw_text>> of numeric spans.

    ``byte_identical=False`` switches to the all-JVM fast path
    (functions/fastpath.py): Java regex, no Arrow boundary — same
    no-dedup/two-span-BP semantics without the Python ``re`` contract."""
    if not byte_identical:
        from narowi_ocr_spark.functions.fastpath import extract_numbers_fast

        return extract_numbers_fast(text, confidence)
    tcol = F.col(text) if isinstance(text, str) else text
    ccol = F.lit(confidence) if isinstance(confidence, (int, float)) else confidence
    return _extract_numbers_udf(tcol, ccol.cast("double"))


def validate_number_span(value: Column, unit: Column) -> Column:
    """Native range check per unit (K4) — unknown units validate true
    (reference number_extractor.py:167-170). Stays in codegen."""
    expr = F.lit(True)
    for u, (lo, hi) in NUMBER_UNIT_RANGES.items():
        expr = F.when(unit == F.lit(u), value.between(F.lit(lo), F.lit(hi))).otherwise(
            expr
        )
    return expr
