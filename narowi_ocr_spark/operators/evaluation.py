"""Extraction-quality evaluation: token-level precision/recall/F1.

The north-rule contract is byte-identical extracted text per url; this
module quantifies HOW CLOSE an extractor gets when the corpus is not
byte-clean — the CleanEval-style scoring harness (token multiset
overlap between extracted text and gold truth) that every boilerplate-
removal paper reports, run as a distributed job instead of a perl
script. Reference analogue: the accuracy assertions of the golden OCR
tests (tests/test_ocr_real_world.py:60-101), which compare recognized
text against known fixture strings — recast corpus-scale and graded
(P/R/F1) instead of pass/fail.

All metrics are exact integers (milli-units, floor division) so Spark
and any ANSI-SQL oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(c: Column) -> Column:
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_prf(
    df: DataFrame,
    key: str = "doc_id",
    truth_col: str = "truth",
    extracted_col: str = "extracted",
) -> DataFrame:
    """Per-document token-multiset precision/recall/F1 of
    ``extracted_col`` against ``truth_col``.

    Whitespace tokenization; multiset semantics (a token appearing 3×
    in truth and 1× in the extraction scores 1 tp + 2 fn, the standard
    bag-of-words CleanEval protocol). Returns one row per input row:
    (key, n_truth, n_extracted, tp, fp, fn, precision_milli,
    recall_milli, f1_milli) — milli metrics are floor(1000·metric) in
    exact integer arithmetic; empty-side conventions: precision 0 when
    nothing extracted AND truth non-empty, 1000 when both empty
    (vacuous perfection), symmetrically for recall.

    Scale shape: per-token counting is a higher-order aggregate INSIDE
    the row (map_from tokens → counts via F.aggregate) — no explode, no
    (key, token) shuffle, no join; the whole eval is a single codegen
    projection over the scan, so it runs in the same stage as the
    extractor it grades. A 100 TB eval is therefore scan-bound, which
    is the correct cost model for a metric.
    """
    def counts(col: Column) -> Column:
        # token -> multiplicity, built by folding the token array into a map
        return F.aggregate(
            _tokens(col),
            F.create_map().cast("map<string,int>"),
            lambda acc, t: F.map_zip_with(
                acc,
                F.create_map(t, F.lit(1)),
                lambda _, a, b: F.coalesce(a, F.lit(0))
                + F.coalesce(b, F.lit(0)),
            ),
        )

    staged = df.select(
        key,
        counts(F.col(truth_col)).alias("_tc"),
        counts(F.col(extracted_col)).alias("_ec"),
    )
    # tp = sum over token keys of min(truth_count, extracted_count)
    tp = F.aggregate(
        F.map_values(
            F.map_zip_with(
                F.col("_tc"),
                F.col("_ec"),
                lambda _, a, b: F.least(
                    F.coalesce(a, F.lit(0)), F.coalesce(b, F.lit(0))
                ),
            )
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    total = lambda m: F.aggregate(  # noqa: E731
        F.map_values(F.col(m)), F.lit(0), lambda acc, v: acc + v
    )
    m = staged.select(
        key,
        total("_tc").cast("bigint").alias("n_truth"),
        total("_ec").cast("bigint").alias("n_extracted"),
        tp.cast("bigint").alias("tp"),
    ).select(
        key,
        "n_truth",
        "n_extracted",
        "tp",
        (F.col("n_extracted") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
    )
    prec = F.when(
        F.col("n_extracted") > 0,
        F.expr("tp * 1000 div n_extracted"),
    ).otherwise(F.when(F.col("n_truth") == 0, F.lit(1000)).otherwise(F.lit(0)))
    rec = F.when(
        F.col("n_truth") > 0, F.expr("tp * 1000 div n_truth")
    ).otherwise(
        F.when(F.col("n_extracted") == 0, F.lit(1000)).otherwise(F.lit(0))
    )
    denom = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    # pure integer floor-division end to end — no double rounding to
    # diverge between engines
    f1 = F.when(denom > 0, F.expr("2000 * tp div (2*tp + fp + fn)")).otherwise(
        F.lit(1000)
    )
    return m.select(
        key,
        "n_truth",
        "n_extracted",
        "tp",
        "fp",
        "fn",
        prec.cast("bigint").alias("precision_milli"),
        rec.cast("bigint").alias("recall_milli"),
        f1.cast("bigint").alias("f1_milli"),
    )
