"""Main-text assembly from classified blocks (SURVEY.md §2 T3-T5).

The reference joins OCR tokens into a stripped text string and averages
token confidences (src/processing/ocr_engine.py:51-95). Here: join the
kept content blocks with newlines and average block scores — both as pure
higher-order array expressions (no explode, no shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from narowi_ocr_spark.functions.native import round4


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def content_blocks(scored_blocks: Column | str) -> Column:
    return F.filter(_col(scored_blocks), lambda b: b["is_content"])


def main_text(scored_blocks: Column | str) -> Column:
    """T3: newline-joined text of content blocks, stripped like the
    reference's ``text.strip()`` (ocr_engine.py:67)."""
    joined = F.array_join(
        F.transform(content_blocks(scored_blocks), lambda b: b["text"]), "\n"
    )
    return F.regexp_replace(joined, r"^\s+|\s+$", "")


def mean_content_score(scored_blocks: Column | str) -> Column:
    """T4: mean score over non-empty blocks; no blocks → 0.0
    (reference get_confidence filters empty/-1 tokens, errors → 0.0,
    ocr_engine.py:84-95)."""
    nonempty = F.filter(
        _col(scored_blocks), lambda b: F.length(b["text"]) > 0
    )
    total = F.aggregate(
        nonempty, F.lit(0.0), lambda acc, b: acc + b["score"]
    )
    n = F.size(nonempty)
    return F.when(n > 0, round4(total / n.cast("double"))).otherwise(F.lit(0.0))


def text_with_confidence(scored_blocks: Column | str) -> Column:
    """T5: (extracted_text, confidence) struct — computed in one pass,
    unlike the reference's double OCR invocation (ocr_engine.py:107-111)."""
    b = _col(scored_blocks)
    return F.struct(
        main_text(b).alias("extracted_text"),
        mean_content_score(b).alias("confidence"),
    )


def best_of_configs(*candidates: Column) -> Column:
    """T7: multi-config best-of (the reference tries several PSM modes
    and keeps the max-confidence result,
    tests/test_ocr_real_world.py:104-115). Each candidate is a
    (extracted_text, confidence) struct from ``text_with_confidence``;
    returns struct<confidence, config_idx, extracted_text> of the winner
    — F.greatest compares structs lexicographically, so confidence
    decides, with config order as the deterministic tie-break."""
    keyed = [
        F.struct(
            c["confidence"].alias("confidence"),
            F.lit(-i).alias("neg_config_idx"),  # earlier config wins ties
            c["extracted_text"].alias("extracted_text"),
        )
        for i, c in enumerate(candidates)
    ]
    best = F.greatest(*keyed) if len(keyed) > 1 else keyed[0]
    return F.struct(
        best["confidence"].alias("confidence"),
        (-best["neg_config_idx"]).alias("config_idx"),
        best["extracted_text"].alias("extracted_text"),
    )
