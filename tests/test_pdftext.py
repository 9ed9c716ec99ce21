"""PDF text-object extraction (operators/pdftext.py) and its T2 mode
wiring: parser round-trips, Flate handling, garbage tolerance, and the
fused pipeline running mixed HTML+PDF corpora under one plan."""

from pyspark.sql import functions as F

from narowi_ocr_spark.operators.pdftext import (
    build_pdf,
    pdf_content_streams,
    pdf_text_objects,
    tokenize_pdf_py,
)


def test_pdf_roundtrip_pure():
    cases = [
        "hello world",
        "line one\nline two\nline three",
        "parens (nested (deep)) and \\ backslash",
        "tabs\tand\x0bodd\fws kept",
        "BP: 120/80 mmHg and TEMP: 98.6F",
        "unicode ümlaut Σίσυφος 漢字",
        "  leading/trailing  ",
    ]
    for c in cases:
        for compress in (False, True):
            got = "\n".join(pdf_text_objects(build_pdf(c, compress=compress)))
            assert got.strip(" \t\n\x0b\f\r") == c.strip(" \t\n\x0b\f\r"), (
                compress,
                c,
            )


def test_pdf_flate_trailing_eol_bytes():
    """Compressed data ending in 0x0a/0x0d must survive (the writer's
    EOL before endstream is ambiguous without /Length; decompressobj
    resolves it by stopping at the deflate end marker)."""
    import zlib

    found = 0
    i = 0
    while found < 3 and i < 200_000:
        text = f"probe {i} " + "x" * (i % 97)
        # check the deflate tail the same way build_pdf produces it
        ops = "\n".join(["BT", "/F1 12 Tf", "72 720 Td", f"({text}) Tj", "ET"])
        z = zlib.compress(ops.encode(), 6)
        if z.endswith((b"\n", b"\r")):
            found += 1
            pdf = build_pdf(text, compress=True)
            got = "\n".join(pdf_text_objects(pdf))
            assert got.strip(" \t\n\x0b\f\r") == text.strip(), i
        i += 1
    assert found == 3, "could not synthesize ambiguous-EOL deflate tails"


def test_pdf_operators_tj_array_and_quote():
    raw = (
        b"%PDF-1.4\n4 0 obj << /Length 60 >>\nstream\n"
        b"BT [(Hel) -120 (lo)] TJ (next)' (q2)\" ET\nendstream\nendobj"
    )
    assert pdf_text_objects(raw) == ["Hello\nnext\nq2"]


def test_pdf_escapes_and_octal():
    raw = (
        b"%PDF-1.4\n4 0 obj << /Length 40 >>\nstream\n"
        b"BT (a\\(b\\)c \\\\ \\101\\102 \\n) Tj ET\nendstream\nendobj"
    )
    assert pdf_text_objects(raw) == ["a(b)c \\ AB \n"]


def _text_object_lines_bytewalk(body: bytes) -> list[str]:
    """Reference copy of the original per-byte BT…ET scanner — the
    token-regex rewrite in operators/pdftext.py must match it on every
    input (differential fuzz below)."""
    from narowi_ocr_spark.operators.pdftext import (
        _scan_string,
        _unescape_pdf_bytes,
    )

    lines: list[list[bytes]] = [[]]
    pending: list[bytes] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == 0x28:
            raw, i = _scan_string(body, i)
            pending.append(_unescape_pdf_bytes(raw))
            continue
        if body.startswith(b"TJ", i) or body.startswith(b"Tj", i):
            lines[-1].extend(pending)
            pending = []
            i += 2
            continue
        if body.startswith(b"T*", i) or body.startswith(b"TD", i) or (
            body.startswith(b"Td", i)
        ):
            lines.append([])
            pending = []
            i += 2
            continue
        if c in (0x27, 0x22):
            lines.append(pending)
            pending = []
            i += 1
            continue
        i += 1
    return [b"".join(p).decode("utf-8", errors="replace") for p in lines]


def _scan_string_slow(data: bytes, start: int):
    """Reference copy of the original nesting/escape byte loop behind
    _scan_string's fast path."""
    depth = 0
    i, n = start, len(data)
    begin = start + 1
    while i < n:
        c = data[i]
        if c == 0x5C:
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return data[begin:i], i + 1
        i += 1
    return data[begin:], n


def test_scan_string_fast_path_differential():
    import random

    from narowi_ocr_spark.operators.pdftext import _scan_string

    rng = random.Random(0xFACE)
    alphabet = b"ab\\()\n )x("
    for case in range(5000):
        body = b"(" + bytes(
            alphabet[rng.randrange(len(alphabet))]
            for _ in range(rng.randrange(0, 24))
        )
        assert _scan_string(body, 0) == _scan_string_slow(body, 0), (case, body)


def test_text_object_lines_differential_fuzz():
    """5k random operator/literal soups (escapes, octal, nesting,
    unterminated strings, line continuations, stray backslashes): the
    token-regex scanner and the per-byte reference walk must agree
    byte-for-byte."""
    import random

    from narowi_ocr_spark.operators.pdftext import _text_object_lines

    rng = random.Random(0xBEEF)
    atoms = [
        b"(hello)", b"(a\\(b\\)c)", b"(oct \\101\\12\\3)", b"(nest (in(ner)) out)",
        b"(dangling", b"(bs \\\\ end)", b"(cont\\\nline)", b"(cont\\\r\nline)",
        b"(lone \\q drop)", b"Tj", b"TJ", b"Td", b"TD", b"T*", b"'", b"\"",
        b" 12 -3.5 ", b"/F1 ", b"\n", b"[", b"]", b"(\xff\xfe raw bytes)",
        b"()", b"(())", b"T", b"J", b"j{", b"Tx",
    ]
    for case in range(5000):
        body = b"".join(
            atoms[rng.randrange(len(atoms))]
            for _ in range(rng.randrange(1, 14))
        )
        assert _text_object_lines(body) == _text_object_lines_bytewalk(body), (
            case,
            body,
        )


def test_pdf_garbage_tolerant():
    assert tokenize_pdf_py(None) == []
    assert tokenize_pdf_py(b"") == []
    assert tokenize_pdf_py(b"<html><p>not a pdf</p></html>") == []
    assert tokenize_pdf_py(b"%PDF-1.4 no streams at all") == []
    # truncated/corrupt flate stream: skipped, not crashed
    corrupt = (
        b"%PDF-1.4\n4 0 obj << /Length 10 /Filter /FlateDecode >>\n"
        b"stream\n\x78\x9c\x01\x02\x03\nendstream\nendobj"
    )
    assert tokenize_pdf_py(corrupt) == []
    # unsupported filter: skipped
    dct = (
        b"%PDF-1.4\n4 0 obj << /Length 4 /Filter /DCTDecode >>\n"
        b"stream\n\xff\xd8\xff\xe0\nendstream\nendobj"
    )
    assert pdf_content_streams(dct) == []


def test_pdf_block_shape_feeds_html_scorer():
    b = tokenize_pdf_py(build_pdf("some body text with enough words"))
    assert len(b) == 1
    blk = b[0]
    assert blk["tag"] == "pdftext" and blk["link_len"] == 0
    from narowi_ocr_spark.operators.blocks import _score_block_py

    scored = _score_block_py(dict(blk), 1.0 / 3.0, 1)
    assert scored["is_content"] is True and scored["score"] > 0


def test_extract_pages_pdf_mode_byte_identity(spark):
    from narowi_ocr_spark.plans.pipeline import extract_pages
    from narowi_ocr_spark.sources.pages import synth_pdf_pages

    pdfs = synth_pdf_pages(spark, 300, partitions=4).withColumn(
        "doc_type", F.lit("pdf")
    )
    out = extract_pages(pdfs, doc_type_col="doc_type")
    j = out.join(pdfs.select("url", F.col("text").alias("expected")), "url")
    assert j.where(F.col("extracted_text") != F.col("expected")).count() == 0
    # golden snippets embedded every 5th doc must yield readings
    assert out.where(F.size("readings") > 0).count() > 0


def test_extract_pages_mixed_corpus_one_plan(spark):
    """HTML and PDF rows interleaved under ONE extract_pages call: the
    mode dispatch is per-row, the plan stays single-Arrow-stage and
    shuffle-free."""
    from narowi_ocr_spark.plans.pipeline import extract_pages
    from narowi_ocr_spark.sources.pages import synth_pages, synth_pdf_pages

    html = synth_pages(spark, 150, partitions=2).withColumn(
        "doc_type", F.lit("article")
    )
    pdfs = synth_pdf_pages(spark, 150, partitions=2).withColumn(
        "doc_type", F.lit("pdf")
    )
    both = html.unionByName(pdfs)
    out = extract_pages(both, doc_type_col="doc_type")
    j = out.join(both.select("url", F.col("text").alias("expected")), "url")
    assert j.where(F.col("extracted_text") != F.col("expected")).count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("MapInArrow")[0]
    assert plan.count("MapInArrow") == 1
