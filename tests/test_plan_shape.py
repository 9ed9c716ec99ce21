"""Physical-plan invariants (SURVEY.md §4): the extraction pipeline is
shuffle-free, prunes the html payload early, and scans push filters."""

from pyspark.sql import functions as F

from narowi_ocr_spark.plans.pipeline import extract_pages
from narowi_ocr_spark.sources.pages import synth_pages


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_has_no_shuffle(spark):
    pages = synth_pages(spark, 50, partitions=2)
    plan = _physical_plan(extract_pages(pages))
    assert "Exchange" not in plan, f"unexpected shuffle in:\n{plan}"


def test_html_dropped_after_tokenize(spark):
    pages = synth_pages(spark, 50, partitions=2)
    out = extract_pages(pages)
    assert "html" not in out.columns
    # the physical plan must not carry html past the (single) Python
    # stage: everything above the MapInArrow extraction node operates on
    # results only
    plan = _physical_plan(out)
    above_udf = plan.split("MapInArrow")[0]
    assert "html" not in above_udf, above_udf


def test_parquet_filter_pushdown(spark, tmp_path):
    path = str(tmp_path / "pages")
    synth_pages(spark, 100, partitions=2).write.parquet(path)
    df = spark.read.parquet(path).where(F.col("lang") == "en").select("url", "lang")
    plan = _physical_plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan.replace(
        "`", ""
    ), plan
    assert "ReadSchema" in plan
    assert "html" not in plan.split("ReadSchema:")[1].splitlines()[0], (
        "column pruning failed: html read for a url/lang projection"
    )


def test_fastpath_kernel_is_pure_jvm_and_shuffle_free(spark):
    """The byte_identical=False kernel path must introduce neither a
    Python boundary nor a shuffle — it is one narrow native projection."""
    from narowi_ocr_spark.functions.readings import extract_readings

    pages = synth_pages(spark, 50, partitions=2).select(
        "url", extract_readings("text", byte_identical=False).alias("r")
    )
    plan = _physical_plan(pages)
    body = plan.split("MapInPandas")[0]  # synth generator node excluded
    assert "Exchange" not in body, body
    for marker in ("MapInArrow", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in body, body


def test_curation_full_has_exactly_two_shuffles(spark, tmp_path):
    """The full curation recipe (lang → quality → repetition → exact
    dedup → per-source cap) is gates-as-narrow-projections plus exactly
    the two window shuffles (fingerprint, source)."""
    import importlib

    entry = importlib.import_module("__spark_entry__")
    df = entry.queries()["curation_full"](spark, "/root/testdata/sf0.001")
    plan = _physical_plan(df)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, f"{n_exchanges} shuffles in:\n{plan}"


def test_asof_join_single_window_pass(spark):
    """events_asof: one sort-based window shuffle, no join node at all
    (the range-join explosion is designed out)."""
    import importlib

    entry = importlib.import_module("__spark_entry__")
    df = entry.queries()["events_asof"](spark, "/root/testdata/sf0.001")
    plan = _physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_bucketed_join_is_shuffle_free(spark):
    """Co-located joins via bucketing (the 100 TB join strategy for
    repeated equi-joins on the same key): two tables bucketed+sorted on
    the join key sort-merge-join with NO Exchange on either side."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    for name in ("t_bucket_a", "t_bucket_b"):
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(name)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_bucket_a").join(
            spark.table("t_bucket_b"), "k"
        )
        assert joined.count() == 1000
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for name in ("t_bucket_a", "t_bucket_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_whole_stage_codegen_covers_native_stages(spark):
    pages = synth_pages(spark, 50, partitions=2)
    plan = _physical_plan(extract_pages(pages))
    # "*(n)" is the WholeStageCodegen marker in the plan-tree string
    assert "*(" in plan, plan
    # ONE extraction Arrow boundary (the synth-pages generator adds its
    # own MapInPandas source node, which a parquet scan wouldn't have)
    assert plan.count("MapInArrow") == 1, plan
    assert plan.count("ArrowEvalPython") == 0, plan


def test_contamination_broadcasts_eval_grams(spark):
    """Decontamination joins the corpus grams against the eval-set gram
    table via broadcast — the corpus side must not exchange for that
    join (only the (id, count) rollup and the final id-join shuffle)."""
    import importlib

    entry = importlib.import_module("__spark_entry__")
    df = entry.queries()["decontamination"](spark, "/root/testdata/sf0.001")
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastExchange" in plan, plan
    # raw text must never cross an exchange, and at most ONE exchange
    # may carry gram strings — the eval-side distinct (O(eval-set),
    # negligible); the corpus side's grams only cross the broadcast
    # probe, and its rollup shuffles (id, count) pairs
    gram_exchanges = 0
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, f"raw text shuffled:\n{line}"
            if "g#" in line:
                gram_exchanges += 1
    assert gram_exchanges <= 1, plan


def test_stratified_sample_is_broadcast_filter_only(spark):
    """The sampling predicate is a broadcast dim join + narrow filter:
    the fact side must not shuffle at all."""
    import importlib

    entry = importlib.import_module("__spark_entry__")
    df = entry.queries()["stratified_sample"](spark, "/root/testdata/sf0.001")
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_char_lm_model_is_broadcast(spark):
    """The learned bigram model (|V|²-bounded) must broadcast into the
    apply join; doc text must never appear in any exchange."""
    import importlib

    entry = importlib.import_module("__spark_entry__")
    df = entry.queries()["char_lm_scores"](spark, "/root/testdata/sf0.001")
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, f"raw text shuffled:\n{line}"
