"""Equivalence tests for the staged/chunked text-stat evaluation paths:
`with_text_stats` must be value-identical to the scalar column functions,
and the chunked `rolling_fingerprint` must be invariant to chunk size
(both against each other and against a pure-Python reference fold)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from narowi_ocr_spark.functions.textstats import (  # noqa: F401
    ROLL_BASE,
    ROLL_MOD,
    ROLL_SEED,
    lang_id,
    quality_score,
    rolling_fingerprint,
    subword_token_estimate,
    token_count,
    with_text_stats,
)

TEXTS = [
    "the quick brown fox is on the hill for the day",
    "der hund ist nicht mit der katze und den anderen",
    "le chat est dans la maison pour les vacances",
    "",
    "   ",
    "one",
    "Zahlen 42 und zeichen!? the of to in is that for with on",
    "x" * 9000,  # multi-chunk for the rolling hash
]


def _df(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)]
    )


def test_with_text_stats_matches_scalar_functions(spark):
    df = _df(spark)
    staged = {
        r["doc_id"]: r
        for r in with_text_stats(df)
        .select("doc_id", "n_tokens", "n_subword", "lang_pred", "q")
        .collect()
    }
    scalar = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_count("text").alias("n_tokens"),
            subword_token_estimate("text").alias("n_subword"),
            lang_id("text").alias("lang_pred"),
            quality_score("text").alias("q"),
        ).collect()
    }
    for i in staged:
        assert staged[i].asDict() == scalar[i].asDict()


def _roll_py(text: str) -> int:
    h = ROLL_SEED
    for ch in text:
        h = (h * ROLL_BASE + ord(ch)) % ROLL_MOD
    return h


def test_rolling_fingerprint_null_stays_null(spark):
    """NULL text → NULL fingerprint (like the oracle's list_reduce), not
    the seed; empty text → the seed."""
    df = spark.createDataFrame(
        [(0, None), (1, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["rfp"]
        for r in df.select(
            "doc_id", rolling_fingerprint("text").alias("rfp")
        ).collect()
    }
    assert got == {0: None, 1: ROLL_SEED}


def test_rolling_fingerprint_chunk_invariant(spark):
    df = _df(spark)
    for chunk in (7, 4096):
        got = {
            r["doc_id"]: r["rfp"]
            for r in df.select(
                "doc_id", rolling_fingerprint("text", chunk=chunk).alias("rfp")
            ).collect()
        }
        assert got == {i: _roll_py(t) for i, t in enumerate(TEXTS)}, chunk


PII_CASES = [
    # (text, n_url, n_email, n_ip, redacted)
    (
        "visit https://a.b/c or mail x@y.zz from 1.2.3.4",
        1, 1, 1,
        "visit <URL> or mail x@y.zz from 1.2.3.4".replace(
            "x@y.zz", "<EMAIL>"
        ).replace("1.2.3.4", "<IP>"),
    ),
    # URL userinfo (user@host) is swallowed by the URL pass, so the
    # email pass must NOT count it
    ("see http://bob@example.com/page now", 1, 0, 0, "see <URL> now"),
    # \b: no boundary inside v1.2.3.4000 (digit run too long / glued)
    ("release v1.2.3.4000 shipped", 0, 0, 0, "release v1.2.3.4000 shipped"),
    # trailing period sits outside the IP match
    ("host is 10.0.0.1.", 0, 0, 1, "host is <IP>."),
    ("plain text, no pii at all", 0, 0, 0, "plain text, no pii at all"),
    # two of a kind
    ("a@b.cc then c@d.ee", 0, 2, 0, "<EMAIL> then <EMAIL>"),
]


def test_pii_scrub_counts_and_redaction(spark):
    from narowi_ocr_spark.functions.textstats import with_pii_scrub

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, (t, *_rest) in enumerate(PII_CASES)]
    )
    got = {
        r["doc_id"]: r
        for r in with_pii_scrub(df)
        .select("doc_id", "n_url", "n_email", "n_ip", "redacted")
        .collect()
    }
    for i, (t, nu, ne, ni, red) in enumerate(PII_CASES):
        r = got[i]
        assert (r["n_url"], r["n_email"], r["n_ip"]) == (nu, ne, ni), t
        assert r["redacted"] == red, t


def test_pii_scrub_null_stays_null(spark):
    from narowi_ocr_spark.functions.textstats import with_pii_scrub

    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    r = with_pii_scrub(df).collect()[0]
    assert r["n_url"] is None
    assert r["redacted"] is None


def test_normalize_text_canonicalizes_before_hashing(spark):
    """Decomposed and precomposed spellings must normalize to the same
    bytes (else every dedup family under-merges); singletons remap
    (OHM SIGN -> omega); whitespace collapses; NFC is idempotent."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from narowi_ocr_spark.functions.normalize import normalize_text

    rows = [
        Row(i=0, t="Cafe\u0301"),   # decomposed
        Row(i=1, t="Caf\u00e9"),    # precomposed
        Row(i=2, t="Ohm Ω"),
        Row(i=3, t="  a \t b\n"),
        Row(i=4, t=None),
    ]
    out = {
        r["i"]: r["n"]
        for r in spark.createDataFrame(rows)
        .select("i", normalize_text("t").alias("n"))
        .collect()
    }
    assert out[0] == out[1] == "café"
    assert out[2] == "ohm ω"
    assert out[3] == "a b"
    assert out[4] is None

    # idempotence: normalizing the normalized column changes nothing
    df = spark.createDataFrame(rows).select(normalize_text("t").alias("n"))
    again = df.select(normalize_text("n").alias("m"), "n")
    assert again.where(
        F.col("m").isNotNull() & (F.col("m") != F.col("n"))
    ).count() == 0


def test_compression_ratio_matches_pure_python(spark):
    """Byte-exact cross-check vs an independent zlib computation (the
    op has no SQL oracle — DuckDB has no zlib surface)."""
    import zlib

    from pyspark.sql import Row

    from narowi_ocr_spark.functions.textstats import (
        COMP_SCALE,
        with_compression_ratio,
    )

    texts = [
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 20,  # highly compressible
        "the quick brown fox jumps over the lazy dog",
        "Zx9!kQ2@pL7#mN4$vB8%",  # short, incompressible
        "",
        None,
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {r["doc_id"]: r for r in with_compression_ratio(df).collect()}
    for i, t in enumerate(texts):
        r = got[i]
        if t is None:
            assert r["n_bytes"] is None and r["ratio"] is None
            continue
        raw = t.encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert r["n_compressed"] == len(zlib.compress(raw, 6))
        if raw:
            exp = (COMP_SCALE * r["n_compressed"]) // r["n_bytes"]
            assert r["ratio_scaled"] == exp
            assert r["ratio"] == exp / COMP_SCALE
        else:
            assert r["ratio"] is None
    # repetitive text compresses far better than prose
    assert got[0]["ratio"] < 0.05 < got[1]["ratio"]


def test_linear_quality_classifier_plan_and_edges(spark):
    # weight vector folds into the plan: no Exchange, no Python eval;
    # zero-token docs score 0/0/False; 16-bucket variant accepted
    from pyspark.sql import Row

    from narowi_ocr_spark.functions.textstats import (
        linear_quality_classifier,
        stub_classifier_weights,
    )

    df = spark.createDataFrame(
        [Row(doc_id=0, text="hello world"), Row(doc_id=1, text="   ")]
    )
    out = linear_quality_classifier(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["n_tokens"] == 0
    assert got[1]["score_milli"] == 0 and got[1]["mean_milli"] == 0
    assert got[1]["keep"] is False
    # hand-check doc 0 against the stub weights
    import hashlib

    w = stub_classifier_weights()
    exp = sum(
        w[int(hashlib.md5(t.encode()).hexdigest()[:2], 16)]
        for t in ("hello", "world")
    )
    assert got[0]["score_milli"] == exp
    assert got[0]["mean_milli"] == exp // 2

    # 16-bucket variant
    out16 = linear_quality_classifier(df, weights=list(range(16)))
    assert out16.where(F.col("doc_id") == 0).collect()[0]["n_tokens"] == 2

    # negative weights rejected (integer-div portability)
    try:
        linear_quality_classifier(df, weights=[-1] * 256)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_fix_mojibake_round_trip_and_safety(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.functions.normalize import fix_mojibake

    clean = "café señor naïve über élan"
    moji = clean.encode("utf-8").decode("latin-1")
    genuine_latin1 = "résumé"  # real accents: must NOT be touched
    rows = [
        Row(doc_id=0, text=moji),
        Row(doc_id=1, text="plain ascii only"),
        Row(doc_id=2, text=genuine_latin1),
        Row(doc_id=3, text="日本語テキスト"),  # not latin-1 encodable
        Row(doc_id=4, text=None),
    ]
    df = spark.createDataFrame(rows)
    out = df.select(
        "doc_id",
        fix_mojibake("text")["text_fixed"].alias("t"),
        fix_mojibake("text")["was_fixed"].alias("f"),
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["t"] == clean and got[0]["f"] is True
    assert got[1]["t"] == "plain ascii only" and got[1]["f"] is False
    assert got[2]["t"] == genuine_latin1 and got[2]["f"] is False
    assert got[3]["t"] == "日本語テキスト" and got[3]["f"] is False
    assert got[4]["t"] is None and got[4]["f"] is None
    # double mojibake: two passes reach the fixpoint
    double = moji.encode("utf-8").decode("latin-1")
    df2 = spark.createDataFrame([Row(text=double)])
    once = df2.select(fix_mojibake("text")["text_fixed"].alias("text"))
    twice = once.select(fix_mojibake("text")["text_fixed"].alias("t"))
    assert twice.collect()[0]["t"] == clean
