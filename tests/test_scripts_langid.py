"""Unicode-script profiling + script-gated lang-ID (functions/scripts.py).

Golden expectations per script/language snippet, edge cases (empty,
digits-only, mixed han/kana), and the staged-profile invariants.
"""

from pyspark.sql import functions as F

from narowi_ocr_spark.functions.scripts import (
    SCRIPT_RANGES,
    with_lang_id_v2,
    with_script_profile,
)

CASES = [
    # (text, expected dominant script, expected lang)
    ("the cat sat on the mat and it is that", "latin", "en"),
    ("der Hund ist nicht mit der Katze", "latin", "de"),
    ("le chat est dans la maison pour que", "latin", "fr"),
    ("el perro que los gatos en un no por", "latin", "es"),
    ("il cane che non sono per con una della", "latin", "it"),
    ("o gato não com para mais dos como um", "latin", "pt"),
    ("de kat het een van niet met voor dat", "latin", "nl"),
    ("и в не на что с это как по но", "cyrillic", "ru"),
    ("і в не на що з це як по але", "cyrillic", "uk"),
    ("これは日本語のテキストです", "kana", "ja"),  # 10 kana vs 3 han chars
    ("ひらがなとカタカナのみ", "kana", "ja"),
    ("这是一个中文文本", "han", "zh"),
    ("이것은 한국어 텍스트입니다", "hangul", "ko"),
    ("هذا نص باللغة العربية", "arabic", "ar"),
    ("זהו טקסט בעברית", "hebrew", "he"),
    ("यह हिंदी में पाठ है", "devanagari", "hi"),
    ("αυτό είναι ένα ελληνικό κείμενο", "greek", "el"),
    ("", "none", "und"),
    ("12345 67890 !!!", "none", "und"),
    ("zzz qqq xxx", "latin", "und"),  # latin but zero stopword hits
]


def _df(spark):
    rows = [(i, t) for i, (t, _, _) in enumerate(CASES)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dominant_script_golden(spark):
    out = {
        r["doc_id"]: r["script"]
        for r in with_script_profile(_df(spark)).select("doc_id", "script").collect()
    }
    for i, (text, script, _) in enumerate(CASES):
        assert out[i] == script, f"{text!r}: {out[i]} != {script}"


def test_lang_id_v2_golden(spark):
    out = {
        r["doc_id"]: r["lang_pred2"]
        for r in with_lang_id_v2(_df(spark)).select("doc_id", "lang_pred2").collect()
    }
    for i, (text, _, lang) in enumerate(CASES):
        assert out[i] == lang, f"{text!r}: {out[i]} != {lang}"


def test_script_counts_sum_bounded(spark):
    """Per-script counts are each ≤ total chars and ASCII digits count
    in no script; scripts are disjoint ranges so the sum is ≤ length."""
    df = with_script_profile(_df(spark))
    total = F.length("text")
    s = df.select(
        F.max(
            sum([F.col(f"n_{n}") for n in SCRIPT_RANGES], F.lit(0)) > total
        ).alias("over")
    ).collect()[0]
    assert s["over"] is False or s["over"] is None


def test_mixed_han_kana_is_japanese(spark):
    """Any kana at all forces 'ja' even when han dominates the counts —
    the rule that separates zh from ja."""
    df = spark.createDataFrame(
        [(0, "漢字漢字漢字漢字の")], "doc_id long, text string"
    )
    row = with_lang_id_v2(df).select("script", "lang_pred2").collect()[0]
    assert row["script"] == "han"
    assert row["lang_pred2"] == "ja"


def test_profile_composes_with_plan(spark):
    """The whole profile is native exprs: no Python eval nodes and no
    exchange in the plan."""
    df = with_lang_id_v2(_df(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan
