"""Per-source quality gate + token-budget mixture sampling
(operators/corpus.py: adaptive_quality_gate, token_budget_sample)."""

from pyspark.sql import functions as F

from narowi_ocr_spark.operators.corpus import (
    adaptive_quality_gate,
    token_budget_sample,
)


def _scored(spark):
    # two sources with opposite quality regimes: a global threshold
    # would keep all of 'hi' and none of 'lo'
    rows = [(i, "hi", 0.8 + 0.01 * i) for i in range(10)] + [
        (100 + i, "lo", 0.1 + 0.01 * i) for i in range(10)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, q double")


def test_gate_keeps_exact_fraction_per_source(spark):
    out = adaptive_quality_gate(_scored(spark), keep_frac=0.3)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"hi": 3, "lo": 3}  # ceil(0.3*10) each, NOT 6/0


def test_gate_keeps_top_scores(spark):
    out = adaptive_quality_gate(_scored(spark), keep_frac=0.3)
    lo_kept = sorted(
        r["doc_id"] for r in out.where("source = 'lo'").collect()
    )
    assert lo_kept == [107, 108, 109]  # highest q in 'lo'


def test_gate_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "s", 0.5) for i in range(4)], "doc_id long, source string, q double"
    )
    out = adaptive_quality_gate(df, keep_frac=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1]  # min ids win ties


def test_gate_null_scores_rank_last_not_dropped(spark):
    """NULL-q rows must behave like the single-window formulation: they
    rank after every scored row (desc nulls-last) and are kept when
    keep_n reaches them — never silently dropped by the cell join."""
    rows = [(i, "s", 0.5 + 0.1 * i) for i in range(4)] + [
        (10, "s", None),
        (11, "s", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    half = adaptive_quality_gate(df, keep_frac=0.5)  # keep_n = ceil(3)
    assert sorted(r["doc_id"] for r in half.collect()) == [1, 2, 3]
    full = adaptive_quality_gate(df, keep_frac=1.0)  # NULLs now in range
    got = {r["doc_id"]: r["q_rank"] for r in full.collect()}
    assert sorted(got) == [0, 1, 2, 3, 10, 11]
    assert {got[10], got[11]} == {5, 6}  # NULL scores rank strictly last


def test_gate_null_stratum_is_its_own_stratum(spark):
    rows = [(1, None, 0.9), (2, None, 0.1), (3, "s", 0.5), (4, "s", 0.4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    out = adaptive_quality_gate(df, keep_frac=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def _toks(spark):
    rows = [(i, "a", 100) for i in range(10)] + [(100 + i, "b", 100) for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")


def test_budget_admits_prefix_and_bounds_overshoot(spark):
    out = token_budget_sample(_toks(spark), {"a": 250, "b": 1000})
    agg = {
        r["source"]: (r["n"], r["tot"])
        for r in out.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("tot"))
        .collect()
    }
    # 'a': admitted while cum-prior < 250 → 3 docs (0,100,200 prior) = 300 tokens:
    # overshoot strictly less than one document
    assert agg["a"] == (3, 300)
    assert agg["b"] == (10, 1000)  # budget ≥ corpus → everything admitted


def test_budget_zero_admits_nothing_and_default_applies(spark):
    df = _toks(spark)
    out = token_budget_sample(df, {"a": 0}, default_budget=150)
    agg = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert "a" not in agg  # zero budget: no admissions
    assert agg["b"] == 2  # default 150 → 2 docs (prior 0 and 100 < 150)


def test_budget_admission_is_hash_prefix(spark):
    """Admitted set must be a prefix of the md5-ordered sequence — no
    doc admitted after a rejected one within a source."""
    out = token_budget_sample(_toks(spark), {"a": 450, "b": 450})
    rows = out.withColumn(
        "k", F.md5(F.concat(F.lit("tb0"), F.col("doc_id").cast("string")))
    ).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["k"], r["doc_id"], r["cum_tokens"]))
    for src, lst in by_src.items():
        lst.sort()
        cums = [c for _, _, c in lst]
        assert cums == sorted(cums)
        assert cums[-1] - 100 < 450  # last admission started inside budget


def test_rfm_quintiles_bounded_and_deterministic(spark):
    """Rank-exact quintiles stay in 1..5 even when n < 5, and the
    segmentation is stable across partitionings (pure function of the
    deterministic rank order)."""
    import __spark_entry__ as entrymod

    fn = entrymod.queries()["events_rfm"]
    a = {r["user_id"]: r["rfm_segment"]
         for r in fn(spark, "/root/testdata/sf0.001").collect()}
    b = {r["user_id"]: r["rfm_segment"]
         for r in fn(spark, "/root/testdata/sf0.001").collect()}
    assert a == b and len(a) > 0
    for seg in a.values():
        assert len(seg) == 3
        assert all(ch in "12345" for ch in seg)


def test_c4_rules_line_and_page_gates(spark):
    """Hand-built pages against the C4 recipe: line keeps (terminal
    punct + >=5 words + no javascript), page gates (>=3 kept lines, no
    brace/lorem/blocklist), and kept_md5 = digest of kept lines only."""
    import hashlib

    from narowi_ocr_spark.functions.textstats import with_c4_rules

    good = (
        "This is a proper sentence one.\n"
        "Here is another proper sentence two!\n"
        "And a third full sentence ends here?\n"
        "short one.\n"
        "no terminal punctuation on this line\n"
        "This line mentions JavaScript heavily today."
    )
    braced = good + "\nfunction() { return 1; }."
    lorem = good + "\nLorem ipsum dolor sit amet there."
    thin = "Only one proper sentence lives here.\nmeh\nnope"
    rows = [(1, good), (2, braced), (3, lorem), (4, thin), (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in with_c4_rules(df).collect()}

    kept_good = [
        "This is a proper sentence one.",
        "Here is another proper sentence two!",
        "And a third full sentence ends here?",
    ]
    assert out[1]["n_kept_lines"] == 3 and out[1]["c4_keep"] is True
    assert out[1]["kept_md5"] == hashlib.md5(
        "\n".join(kept_good).encode()
    ).hexdigest()
    # brace/lorem pages lose the page gate even with enough kept lines
    assert out[2]["has_brace"] is True and out[2]["c4_keep"] is False
    assert out[3]["has_lorem"] is True and out[3]["c4_keep"] is False
    # fewer than 3 kept lines → dropped
    assert out[4]["n_kept_lines"] == 1 and out[4]["c4_keep"] is False
    # empty page: one empty line, nothing kept
    assert out[5]["n_kept_lines"] == 0 and out[5]["c4_keep"] is False


# ---------------------------------------------------- blocklist_gate

def _bl(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_blocklist_token_exact_not_substring(spark):
    from narowi_ocr_spark.operators.corpus import blocklist_gate

    df = _bl(spark, [(1, "slows slowly unslow"), (2, "slow car")])
    out = {r["doc_id"]: r for r in blocklist_gate(df, ["slow"]).collect()}
    assert out[1]["n_hits"] == 0 and out[1]["keep"]  # no substring trips
    assert out[2]["n_hits"] == 1 and not out[2]["keep"]


def test_blocklist_ppm_threshold_and_terms(spark):
    from narowi_ocr_spark.operators.corpus import blocklist_gate

    # 2 hits in 100 tokens = 20000 ppm
    text = "dup slow " + "ok " * 98
    df = _bl(spark, [(1, text.strip())])
    strict = blocklist_gate(df, ["slow", "dup"]).first()
    assert strict["n_tokens"] == 100
    assert strict["hit_ppm"] == 20000 and not strict["keep"]
    assert strict["hit_terms"] == "dup,slow"  # sorted distinct audit col
    lax = blocklist_gate(df, ["slow", "dup"], max_hit_ppm=20000).first()
    assert lax["keep"]


def test_blocklist_case_fold_and_empty(spark):
    from narowi_ocr_spark.operators.corpus import blocklist_gate

    df = _bl(spark, [(1, "SLOW Slow sLoW"), (2, "   "), (3, None)])
    out = {r["doc_id"]: r for r in blocklist_gate(df, ["Slow"]).collect()}
    assert out[1]["n_hits"] == 3
    for d in (2, 3):  # zero-token docs keep deterministically
        assert out[d]["n_hits"] == 0 and out[d]["hit_ppm"] == 0
        assert out[d]["keep"] and out[d]["hit_terms"] == ""
