"""WARC ingest (sources/warc.py): record round-trips (plain and
per-record-gzip), garbage tolerance, and the full archive → pages →
extraction chain running byte-identically."""

from pyspark.sql import functions as F

from narowi_ocr_spark.sources.warc import build_warc, parse_warc, warc_pages

RECS = [
    ("https://a.example/1", "2024-01-01T00:00:01Z", b"<html><p>one</p></html>"),
    ("https://b.example/2", "2024-01-01T00:00:02Z", "<p>unicode ü</p>".encode()),
    ("https://c.example/3", "2024-01-01T00:00:03Z", b""),
]


def test_warc_roundtrip_plain_and_gzip():
    for gz in (False, True):
        got = parse_warc(build_warc(RECS, gzip_members=gz))
        assert [(g["url"], g["warc_date"], g["html"]) for g in got] == RECS, gz
    # determinism (mtime pinned)
    assert build_warc(RECS, gzip_members=True) == build_warc(
        RECS, gzip_members=True
    )


def test_warc_skips_non_response_and_garbage():
    blob = build_warc(RECS, with_warcinfo=True)
    assert len(parse_warc(blob)) == len(RECS)  # warcinfo skipped
    assert parse_warc(b"") == []
    assert parse_warc(b"not a warc") == []
    # truncation: well-formed prefix records survive, tail dropped
    assert len(parse_warc(blob[: len(blob) // 2])) < len(RECS)
    assert parse_warc(build_warc(RECS, gzip_members=True)[:40]) == []
    # http payload without header split: body passthrough
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.example/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 5\r\n\r\n"
        b"nohdr\r\n\r\n"
    )
    got = parse_warc(raw)
    assert got[0]["html"] == b"nohdr"


def test_warc_to_extraction_chain(spark):
    """Archive blobs → warc_pages → extract_pages: the recovered html
    extracts byte-identically to the synthetic oracle text (the full
    Common-Crawl-shaped path: segment bytes in, per-url text out)."""
    from narowi_ocr_spark.plans.pipeline import extract_pages
    from narowi_ocr_spark.sources.pages import build_page

    import pandas as pd

    n = 200

    def mk(batches):
        for pdf in batches:
            blobs = []
            for i in pdf["id"]:
                url, ts, html, text, lang = build_page(int(i))
                iso = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                blobs.append(
                    build_warc([(url, iso, html)], gzip_members=(int(i) % 2 == 0))
                )
            yield pd.DataFrame({"blob": blobs})

    blobs = spark.range(n, numPartitions=4).mapInPandas(mk, "blob binary")
    pages = warc_pages(blobs)
    assert pages.count() == n
    out = extract_pages(pages)
    expected = spark.createDataFrame(
        [(build_page(i)[0], build_page(i)[3]) for i in range(n)],
        "url string, expected string",
    )
    j = out.join(expected, "url")
    assert j.count() == n
    assert j.where(F.col("extracted_text") != F.col("expected")).count() == 0
    # plan: blob bytes must not survive past the ingest Arrow stage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "blob" not in plan.split("MapInArrow")[0]


def test_warc_extraction_stream_resumes(spark, tmp_path):
    """Streaming archive ingest: WARC segment blobs arriving as files →
    parse → extract → idempotent per-batch sink; a resume with no new
    input processes 0 batches, a new segment processes only itself."""
    import pandas as pd

    from narowi_ocr_spark.sources.pages import build_page
    from narowi_ocr_spark.streaming.stream import run_warc_extraction_stream

    src = str(tmp_path / "segments")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def segment(lo, hi, gz):
        recs = []
        for i in range(lo, hi):
            url, ts, html, text, lang = build_page(i)
            recs.append((url, ts.strftime("%Y-%m-%dT%H:%M:%SZ"), html))
        return build_warc(recs, gzip_members=gz)

    def land(name, blob):
        spark.createDataFrame(
            pd.DataFrame({"segment": [name], "blob": [blob]})
        ).write.mode("append").parquet(src)

    land("seg-0", segment(0, 40, False))
    land("seg-1", segment(40, 80, True))

    b1 = run_warc_extraction_stream(spark, src, out, ckpt, timeout_s=180)
    assert len(b1) >= 1
    got = spark.read.parquet(out)
    assert got.count() == 80
    expected = spark.createDataFrame(
        [(build_page(i)[0], build_page(i)[3]) for i in range(80)],
        "url string, expected string",
    )
    j = got.join(expected, "url")
    assert j.where(F.col("extracted_text") != F.col("expected")).count() == 0

    # pure resume: nothing new → no batches re-processed
    b2 = run_warc_extraction_stream(spark, src, out, ckpt, timeout_s=180)
    assert b2 == []

    # one new segment → exactly the new data lands
    land("seg-2", segment(80, 100, True))
    b3 = run_warc_extraction_stream(spark, src, out, ckpt, timeout_s=180)
    assert len(b3) == 1
    assert spark.read.parquet(out).count() == 100


def test_warc_mixed_modality_sniff_routing(spark):
    """A WARC carrying both HTML and PDF responses, no type metadata:
    sniff_routing picks the parser per record and both modalities
    round-trip their text."""
    import pandas as pd

    from narowi_ocr_spark.operators.pdftext import build_pdf
    from narowi_ocr_spark.plans.pipeline import extract_pages

    txt = "temperature 98.6 F reading"
    recs = [
        ("https://h.example/page", "2024-01-01T00:00:00Z",
         f"<html><body><nav><a href='/'>n</a></nav><p>{txt}</p>"
         "</body></html>".encode()),
        ("https://h.example/report.pdf", "2024-01-01T00:00:01Z",
         build_pdf(txt, compress=True)),
    ]
    blobs = spark.createDataFrame(
        pd.DataFrame({"blob": [build_warc(recs)]}), "blob binary"
    )
    out = extract_pages(warc_pages(blobs), sniff_routing=True)
    got = {r["url"]: r for r in out.collect()}
    assert len(got) == 2
    for r in got.values():
        assert r["status"] == "success"
        assert r["extracted_text"] == txt
        assert len(r["readings"]) == 1
