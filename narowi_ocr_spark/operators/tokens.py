"""Token-level recovery and validation (SURVEY.md §2 T6, K10).

T6 — the analogue of ``OCREngine.extract_detailed_data`` (reference
src/processing/ocr_engine.py:113-144): per-token records carrying the
position hierarchy. Tesseract's level/page/block/par/line/word indices map
to our (block_idx, line_idx, word_idx); the reference drops blank tokens
and conf ≤ -1 rows (:123) — we drop blank tokens (confidence is a per-
block score here, never -1).

K10 — the analogue of ``Validator.validate_digits_with_confidence``
(reference src/processing/validator.py:15-61): per character of each
token, flag '3'/'5' with confidence below LOW_CONFIDENCE_THRESHOLD_3_5
(85.0, validator.py:13) as a confusion-risk issue; in the
``temperature_fahrenheit`` context additionally flag out-of-range values
(>110 or <90, validator.py:40-53). (The reference file has an unresolved
merge conflict; semantics follow its main branch, '<' comparison.)

Everything is native Catalyst — explode/posexplode + sequence/substring —
so token-level processing stays inside whole-stage codegen and each op
has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOW_CONFIDENCE_THRESHOLD_3_5 = 85.0  # reference validator.py:13
TEMP_F_HIGH = 110.0                  # reference validator.py:44
TEMP_F_LOW = 90.0                    # reference validator.py:49

CONFUSABLE_CHARS = ("3", "5")


def detailed_tokens(
    df: DataFrame,
    blocks_col: str = "blocks",
    key: str = "url",
) -> DataFrame:
    """T6: one row per token with (block_idx, line_idx, word_idx, token,
    block score as confidence). 1→N expansions via posexplode — no UDTF,
    no Python."""
    b = (
        df.select(key, F.posexplode(blocks_col).alias("block_idx", "block"))
        .select(
            key,
            "block_idx",
            F.col("block.score").alias("confidence"),
            F.posexplode(F.split(F.col("block.text"), "\n")).alias(
                "line_idx", "line"
            ),
        )
    )
    w = b.select(
        key,
        "block_idx",
        "line_idx",
        "confidence",
        F.posexplode(F.split(F.col("line"), r"\s+")).alias("word_idx", "token"),
    )
    return w.where(F.length("token") > 0)


def digit_confidence_issues(
    tokens: DataFrame,
    token_col: str = "token",
    conf_col: str = "confidence",
    context_type: str | Column = "digit_confusion",
) -> DataFrame:
    """K10: explode each token into characters (sequence + substring, so
    the same expression runs in the DuckDB oracle) and keep '3'/'5' chars
    whose token confidence is below the threshold."""
    ctx = F.lit(context_type) if isinstance(context_type, str) else context_type
    chars = tokens.select(
        "*",
        F.explode(F.sequence(F.lit(1), F.length(token_col))).alias("char_pos"),
    ).select(
        "*",
        F.substring(F.col(token_col), F.col("char_pos"), 1).alias("ch"),
    )
    issues = chars.where(
        F.col("ch").isin(*CONFUSABLE_CHARS)
        & (F.col(conf_col) < F.lit(LOW_CONFIDENCE_THRESHOLD_3_5))
    )
    return issues.select(
        *[c for c in tokens.columns],
        (F.col("char_pos") - 1).alias("char_index_in_word"),
        F.col("ch").alias("original_char"),
        F.format_string(
            "Low confidence digit '%s' (%.1f < %.1f)",
            F.col("ch"),
            F.col(conf_col).cast("double"),
            F.lit(LOW_CONFIDENCE_THRESHOLD_3_5),
        ).alias("message"),
        ctx.alias("context_type"),
    )


def temperature_range_issue(value: Column, unit: Column) -> Column:
    """K10 context branch: Fahrenheit reading out of plausible range
    (reference validator.py:40-53). Returns the issue message or NULL."""
    return F.when(
        (unit == F.lit("F")) & ((value > TEMP_F_HIGH) | (value < TEMP_F_LOW)),
        F.format_string(
            "Temperature %.1f°F outside plausible range [%.1f, %.1f]",
            value,
            F.lit(TEMP_F_LOW),
            F.lit(TEMP_F_HIGH),
        ),
    ).otherwise(F.lit(None).cast("string"))
