"""Host-level curation gate (corpus.host_quality)."""


def test_host_quality_verdicts_and_dup_mass(spark):
    from narowi_ocr_spark.operators.corpus import host_quality

    long = "x" * 200
    rows = (
        # clean host: 4 long unique docs
        [("good.example", "en", long + str(i)) for i in range(4)]
        # mirror host: copies of good's docs → 100% dup on mirror side,
        # and marks the originals as dups too (cross-host, both sides)
        + [("mirror.example", "en", long + "0"),
           ("mirror.example", "en", long + "1")]
        # short-text host: unique but tiny docs
        + [("tiny.example", "en", "short %d" % i) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {r["host"]: r for r in host_quality(df).collect()}

    g = got["good.example"]
    # 2 of 4 docs mirrored → 500000 ppm → block (>= 300000)
    assert (g["n_docs"], g["n_dup_docs"], g["dup_ppm"]) == (4, 2, 500000)
    assert g["verdict"] == "block"

    m = got["mirror.example"]
    assert m["dup_ppm"] == 1000000 and m["verdict"] == "block"

    t = got["tiny.example"]
    assert t["n_dup_docs"] == 0 and t["mean_chars"] < 100
    assert t["verdict"] == "block"


def test_host_quality_keep_and_review_thresholds(spark):
    from narowi_ocr_spark.operators.corpus import host_quality

    long = "y" * 150
    # 10 docs, exactly 1 duplicated pair inside the host → 200000 ppm
    rows = [("h.example", "en", long + str(i)) for i in range(9)]
    rows.append(("h.example", "en", long + "0"))
    # and a clean host → keep
    rows += [("k.example", "de", long + "k" + str(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {r["host"]: r for r in host_quality(df).collect()}
    assert got["h.example"]["verdict"] == "review"
    assert got["h.example"]["n_dup_docs"] == 2   # both sides of the pair
    assert got["k.example"]["verdict"] == "keep"
    assert got["k.example"]["n_langs"] == 1
