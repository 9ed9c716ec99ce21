"""token_prf: CleanEval-style token-multiset P/R/F1 (operators/evaluation)."""

from pyspark.sql import Row


def test_token_prf_multiset_and_conventions(spark):
    from narowi_ocr_spark.operators.evaluation import token_prf

    df = spark.createDataFrame(
        [
            # 5 tp ('the' twice, cat sat mat once), 1 fp (extra mat), 1 fn
            Row(doc_id="d1", truth="the cat sat on the mat",
                extracted="the cat sat the mat mat"),
            Row(doc_id="both_empty", truth="", extracted=""),
            Row(doc_id="nothing_extracted", truth="a b c", extracted=""),
            Row(doc_id="all_spurious", truth="", extracted="x y"),
            Row(doc_id="perfect", truth="a  b", extracted="a b"),
        ]
    )
    got = {r["doc_id"]: r for r in token_prf(df).collect()}

    d1 = got["d1"]
    assert (d1["tp"], d1["fp"], d1["fn"]) == (5, 1, 1)
    # floor(1000*5/6) on both axes — multiset, not set, semantics
    assert d1["precision_milli"] == d1["recall_milli"] == 833
    assert d1["f1_milli"] == 833

    # empty-side conventions: vacuous perfection only when BOTH empty
    be = got["both_empty"]
    assert (be["precision_milli"], be["recall_milli"], be["f1_milli"]) == (
        1000, 1000, 1000)
    ne = got["nothing_extracted"]
    assert (ne["precision_milli"], ne["recall_milli"], ne["f1_milli"]) == (
        0, 0, 0)
    sp = got["all_spurious"]
    assert (sp["precision_milli"], sp["recall_milli"], sp["f1_milli"]) == (
        0, 0, 0)

    # repeated whitespace tokenizes identically to single spaces
    pf = got["perfect"]
    assert pf["f1_milli"] == 1000 and pf["n_truth"] == 2


def test_token_prf_single_stage_no_shuffle(spark):
    from narowi_ocr_spark.operators.evaluation import token_prf

    df = spark.createDataFrame(
        [Row(doc_id="d", truth="a b", extracted="a")]
    )
    plan = token_prf(df)._jdf.queryExecution().executedPlan().toString()
    # per-row map aggregates: the eval runs in the scan stage — no
    # explode-join, no Exchange
    assert "Exchange" not in plan
