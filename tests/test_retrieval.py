"""Chunking + BM25 retrieval operator tests (operators/retrieval.py)."""

import math

import pytest

from narowi_ocr_spark.operators.retrieval import (
    BM25_SCALE,
    bm25_topk,
    chunk_documents,
    postings,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e f g h i j"),   # 10 tokens
        (1, "x y z"),                  # shorter than one chunk
        (2, ""),                       # empty -> no chunks, no postings
        (3, "  "),                     # whitespace-only -> same as empty
        (4, "a a a b b join"),         # repeated terms for tf
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_cover_and_overlap(spark, docs):
    out = chunk_documents(docs, chunk_size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: 10 tokens, starts 0,3,6,9 -> 4 chunks; tail kept with 1 token
    c0 = sorted(by_doc[0], key=lambda r: r.chunk_id)
    assert [r.start_tok for r in c0] == [0, 3, 6, 9]
    assert [r.n_tokens for r in c0] == [4, 4, 4, 1]
    assert c0[0].chunk_text == "a b c d"
    assert c0[-1].chunk_text == "j"
    # consecutive chunks overlap by chunk_size - stride tokens
    assert c0[0].chunk_text.split()[3] == c0[1].chunk_text.split()[0]
    # doc 1: single short chunk, full text
    assert [r.chunk_text for r in by_doc[1]] == ["x y z"]
    # empty / whitespace docs emit nothing
    assert 2 not in by_doc and 3 not in by_doc


def test_postings_tf(spark, docs):
    rows = {(r.term, r.doc_id): r.tf for r in postings(docs).collect()}
    assert rows[("a", 4)] == 3
    assert rows[("b", 4)] == 2
    assert rows[("join", 4)] == 1
    assert not any(d == 2 or d == 3 for (_, d) in rows)


def test_bm25_ranks_tf_and_idf(spark, docs):
    out = bm25_topk(docs, [("q1", ["a"]), ("q2", ["join"])], k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    q1 = sorted(by_q["q1"], key=lambda r: r.rank)
    # 'a' appears 3x in doc 4 (6 tokens) vs 1x in doc 0 (10 tokens):
    # higher tf in a shorter doc must rank first.
    assert [r.doc_id for r in q1] == [4, 0]
    assert q1[0].score_sum > q1[1].score_sum
    # 'join' only in doc 4
    assert [r.doc_id for r in by_q["q2"]] == [4]
    # fixed-point projection is consistent
    for r in out:
        assert r.bm25 == r.score_sum / BM25_SCALE


def test_bm25_matches_float_reference(spark, docs):
    """Integer fixed-point score tracks the float BM25 formula to ~1e-4
    per term (one unit of BM25_SCALE per idf division + one per term)."""
    rows = [(i, " ".join(["t%d" % (j % 7) for j in range(i + 3)]) + " needle" * (i % 3))
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.bm25 for r in bm25_topk(df, [("q", ["needle"])], k=8).collect()}
    texts = {i: t.split() for i, t in rows}
    texts = {i: [w for w in ws if w] for i, ws in texts.items()}
    n = len(rows)
    total = sum(len(ws) for ws in texts.values())
    avgdl = total / n
    dfc = sum(1 for ws in texts.values() if "needle" in ws)
    k1, b = 1.2, 0.75
    for i, ws in texts.items():
        tf = ws.count("needle")
        if tf == 0:
            assert i not in out
            continue
        idf = (n - dfc + 0.5) / (dfc + 0.5)
        exp = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        assert math.isclose(out[i], exp, rel_tol=5e-4, abs_tol=2e-4), (i, out[i], exp)


def test_bm25_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(3, "same text here"), (1, "same text here"), (2, "same text here")],
        "doc_id long, text string",
    )
    out = bm25_topk(df, [("q", ["same"])], k=3).collect()
    out = sorted(out, key=lambda r: r.rank)
    assert [r.doc_id for r in out] == [1, 2, 3]
    assert len({r.score_sum for r in out}) == 1


def test_sentence_spans_offsets_and_edges(spark):
    from narowi_ocr_spark.operators.retrieval import sentence_spans

    rows = [
        ("d1", "First one. Second bit!  Third?? tail no end"),
        ("d2", "no terminals at all"),
        ("d3", "!!leading. x"),
        ("d4", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = sentence_spans(df).collect()
    src = dict(rows)
    # every span indexes back into its source exactly
    for r in got:
        s = src[r["doc_id"]]
        assert s[r["start_char"]:r["start_char"] + r["n_chars"]] == \
            r["sentence"]
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["sentence"])
    assert by_doc["d1"] == ["First one.", "Second bit!", "Third??",
                            "tail no end"]
    # unterminated text is one sentence; empty text emits nothing
    assert by_doc["d2"] == ["no terminals at all"]
    assert "d4" not in by_doc
    # terminal runs stay attached; leading bare terminals are their own
    # (documented) segment
    assert by_doc["d3"] == ["!!", "leading.", "x"]
    # no shuffle: segmentation runs in the scan stage
    plan = sentence_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
