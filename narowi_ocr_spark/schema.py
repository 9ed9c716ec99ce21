"""Fixed schemas for every stage of the pipeline.

Derived from the reference data model (SURVEY.md §1):
  - pages table shape comes from BASELINE.json input_hint;
  - the reading span struct mirrors MedicalReading
    (reference src/processing/pattern_matcher.py:16-21; BP rows carry the
    int systolic as `value` and the composite "sys/dia mmHg" as `unit`,
    pattern_matcher.py:188-192);
  - the block struct is the DOM-block recast of DisplayRegion
    (reference src/processing/roi_detector.py:6-14);
  - the result row mirrors ProcessingResult
    (reference src/processing/data_processor.py:26-35).

Schemas are declared once and never inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- pages
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),  # oracle main text
        T.StructField("lang", T.StringType(), True),
    ]
)

# ------------------------------------------------------------- DOM block
# One candidate content region per row after explode; the web-text recast
# of the reference's DisplayRegion (x,y,w,h,confidence,is_lcd).
BLOCK_STRUCT = T.StructType(
    [
        T.StructField("block_idx", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("text_len", T.IntegerType(), True),
        T.StructField("link_len", T.IntegerType(), True),
        T.StructField("word_count", T.IntegerType(), True),
    ]
)
BLOCKS_SCHEMA = T.ArrayType(BLOCK_STRUCT)

# Block struct enriched with the R3/R4 score + classification fields —
# produced either natively (operators/blocks.score_blocks) or inside the
# fused tokenizer Arrow batch (tokenize_scored), identical values.
SCORED_BLOCK_STRUCT = T.StructType(
    list(BLOCK_STRUCT.fields)
    + [
        T.StructField("score", T.DoubleType(), True),
        T.StructField("is_content", T.BooleanType(), True),
    ]
)
SCORED_BLOCKS_SCHEMA = T.ArrayType(SCORED_BLOCK_STRUCT)

# ------------------------------------------------------------- reading span
READING_STRUCT = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("unit", T.StringType(), False),
        T.StructField("is_valid", T.BooleanType(), False),
    ]
)
READINGS_SCHEMA = T.ArrayType(READING_STRUCT)

# ------------------------------------------------------------ number span
# Mirror of ExtractedNumber (reference number_extractor.py:5-11).
NUMBER_STRUCT = T.StructType(
    [
        T.StructField("value", T.DoubleType(), False),
        T.StructField("unit", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("raw_text", T.StringType(), False),
    ]
)
NUMBERS_SCHEMA = T.ArrayType(NUMBER_STRUCT)

# -------------------------------------------------------- validation result
VALIDATION_STRUCT = T.StructType(
    [
        T.StructField("is_valid", T.BooleanType(), False),
        T.StructField("confidence_adjustment", T.DoubleType(), False),
        T.StructField("error_reason", T.StringType(), True),
        T.StructField("suggested_correction", T.StringType(), True),
    ]
)

# -------------------------------------------------------------- result row
RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("readings", READINGS_SCHEMA, False),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("extracted_text", T.StringType(), True),
    ]
)

# Canonical reading-type names, in enum declaration order
# (reference pattern_matcher.py:5-14); aggregations zero-fill all nine.
READING_TYPE_NAMES = [
    "TEMPERATURE",
    "WEIGHT",
    "BLOOD_PRESSURE",
    "OXYGEN",
    "HEART_RATE",
    "BLOOD_GLUCOSE",
    "RESPIRATORY_RATE",
    "PAIN_SCALE",
    "HEIGHT",
]
