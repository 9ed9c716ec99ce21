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
(85.0, validator.py:13) as a confusion-risk issue — message and
context_type strings match the reference verbatim ("Low confidence for
digit 'X' in word 'Y'" / 'confidence_check', validator.py:34-35); in
the ``temperature_fahrenheit`` context additionally flag any
float-parseable word out of range (>110 or <90, validator.py:40-53 —
ungated by unit) with "Potential out-of-range temperature: <word>F" /
'range_check'. (The reference file has an unresolved merge conflict;
semantics follow its main branch, '<' comparison.)

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
    context_type: str | Column = "confidence_check",
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
            "Low confidence for digit '%s' in word '%s'",
            F.col("ch"),
            F.col(token_col),
        ).alias("message"),
        ctx.alias("context_type"),
    )


def word_confidence_issues(
    tokens: DataFrame,
    token_col: str = "token",
    conf_col: str = "confidence",
) -> DataFrame:
    """K11 INTENDED semantics — the reference's
    ``PatternMatcher.validate_digits_with_confidence``
    (pattern_matcher.py:317-326) crashes on every call (it references
    ``self.LOW_CONFIDENCE_THRESHOLD_3_5``, which PatternMatcher lacks),
    so there is no byte behavior to preserve; this implements what the
    code plainly intends: one issue per word whose confidence is below
    the 85.0 threshold, with the reference's exact message format
    ("Low confidence (NN.NN%) for digits: <word>"). Deliberately NOT
    replicating the AttributeError (SURVEY.md §7)."""
    return tokens.where(
        F.col(conf_col) < F.lit(LOW_CONFIDENCE_THRESHOLD_3_5)
    ).select(
        "*",
        F.format_string(
            "Low confidence (%.2f%%) for digits: %s",
            F.col(conf_col).cast("double"),
            F.col(token_col),
        ).alias("message"),
    )


def temperature_range_issue(token: Column) -> Column:
    """K10 'temperature_fahrenheit' context branch (reference
    validator.py:40-53): float-parse the word — ANY parseable word, not
    just unit-tagged ones — and flag values >110 or <90 with the
    reference's message / 'range_check' context. Returns the message or
    NULL. (Parse-failure → NULL try_cast ≙ the reference's ValueError
    pass; exotic spellings Python accepts but SQL casts reject, e.g.
    'inf', differ — documented, not reachable from digit tokens.)"""
    v = token.try_cast("double")
    return F.when(
        v.isNotNull() & ((v > TEMP_F_HIGH) | (v < TEMP_F_LOW)),
        F.format_string("Potential out-of-range temperature: %sF", token),
    ).otherwise(F.lit(None).cast("string"))
