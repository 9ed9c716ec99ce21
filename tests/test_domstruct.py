"""DOM structure extraction: tables → cells, headings → outline."""

from pyspark.sql import Row


def _one(spark, html):
    return spark.createDataFrame([Row(url="u", html=html)])


def test_extract_tables_indexes_headers_and_strip(spark):
    from narowi_ocr_spark.operators.domstruct import extract_tables

    html = (
        "<h1>t</h1>"
        '<table class="x"><tr><th>Name</th><th>Age</th></tr>'
        "<tr><td><b>Ann</b></td><td> 31 </td></tr>"
        "<tr><td>Bo</td><td>7</td></tr></table>"
        "<TABLE><TR><TD>x</TD></TR></TABLE>"
    )
    got = extract_tables(_one(spark, html)).collect()
    by_key = {(r["table_idx"], r["row_idx"], r["col_idx"]): r for r in got}
    assert len(got) == 7
    # header row flagged, data rows not
    assert by_key[(0, 0, 0)]["is_header"] and by_key[(0, 0, 0)]["cell"] == "Name"
    assert not by_key[(0, 1, 0)]["is_header"]
    # inner markup stripped, whitespace trimmed
    assert by_key[(0, 1, 0)]["cell"] == "Ann"
    assert by_key[(0, 1, 1)]["cell"] == "31"
    # second table, case-insensitive tags, 0-based table_idx
    assert by_key[(1, 0, 0)]["cell"] == "x"
    assert not by_key[(1, 0, 0)]["is_header"]


def test_extract_tables_tableless_page_yields_nothing(spark):
    from narowi_ocr_spark.operators.domstruct import extract_tables

    assert extract_tables(_one(spark, "<p>no tables</p>")).count() == 0


def test_extract_tables_plan_shuffle_free(spark):
    from narowi_ocr_spark.operators.domstruct import extract_tables

    out = extract_tables(_one(spark, "<table><tr><td>a</td></tr></table>"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_heading_outline_pos_level_strip(spark):
    from narowi_ocr_spark.operators.domstruct import heading_outline

    html = (
        "<h1>Main</h1><p>body</p><h2>Sec <i>One</i></h2>"
        "<H3> Deep </H3><h6>tiny</h6>"
    )
    got = heading_outline(_one(spark, html)).orderBy("pos").collect()
    assert [(r["pos"], r["level"], r["text"]) for r in got] == [
        (0, 1, "Main"),
        (1, 2, "Sec One"),
        (2, 3, "Deep"),
        (3, 6, "tiny"),
    ]


def test_heading_outline_headingless_page(spark):
    from narowi_ocr_spark.operators.domstruct import heading_outline

    assert heading_outline(_one(spark, "<p>plain</p>")).count() == 0


def test_pdf_layout_positions_exact(spark):
    from narowi_ocr_spark.operators.domstruct import pdf_layout
    from narowi_ocr_spark.operators.pdftext import build_pdf

    df = spark.createDataFrame(
        [("u", build_pdf("alpha\nbeta\ngamma"))], "url string, html binary"
    )
    got = pdf_layout(df).orderBy("line_idx").collect()
    # build_pdf places line 0 at 72 720 Td then 0 -14 Td per line —
    # exact milli-points, no float round trip
    assert [(r["x_milli"], r["y_milli"], r["text"]) for r in got] == [
        (72000, 720000, "alpha"),
        (72000, 706000, "beta"),
        (72000, 692000, "gamma"),
    ]


def test_pdf_layout_reading_order_two_columns(spark):
    from narowi_ocr_spark.operators.domstruct import (
        pdf_layout,
        reading_order,
    )

    # column-major stream: A0 A1 then B0 B1 — visual order is row-major
    ops = ["BT", "/F1 12 Tf"]
    for k, w in enumerate(["A0", "A1", "B0", "B1"]):
        x, y = 72 + 228 * (k // 2), 720 - 14 * (k % 2)
        ops += [f"1 0 0 1 {x} {y} Tm", f"({w}) Tj"]
    ops.append("ET")
    stream = "\n".join(ops).encode()
    pdf = (b"%PDF-1.4\n4 0 obj << /Length " + str(len(stream)).encode()
           + b" >>\nstream\n" + stream + b"\nendstream\nendobj\n%%EOF\n")
    df = spark.createDataFrame([("u", pdf)], "url string, html binary")
    got = reading_order(pdf_layout(df)).orderBy("rank").collect()
    assert [r["text"] for r in got] == ["A0", "B0", "A1", "B1"]


def test_pdf_layout_tl_tstar_and_garbage(spark):
    from narowi_ocr_spark.operators.domstruct import pdf_layout

    # TL + T* line advances; decimal operands keep milli precision
    stream = (b"BT /F1 12 Tf 16 TL 72 700.5 Td (one) Tj T* (two) Tj ET")
    pdf = (b"%PDF-1.4\n4 0 obj << /Length " + str(len(stream)).encode()
           + b" >>\nstream\n" + stream + b"\nendstream\nendobj\n%%EOF\n")
    rows = [("u", pdf), ("bad", b"not a pdf"), ("nul", None)]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = pdf_layout(df).orderBy("line_idx").collect()
    assert [(r["url"], r["y_milli"], r["text"]) for r in got] == [
        ("u", 700500, "one"),
        ("u", 684500, "two"),
    ]
