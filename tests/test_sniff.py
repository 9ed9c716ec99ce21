"""Magic-byte content-type sniffing (functions/sniff)."""

from pyspark.sql import functions as F


def _sniff(spark, payloads):
    from narowi_ocr_spark.functions.sniff import sniff_type

    df = spark.createDataFrame([(p,) for p in payloads], "payload binary")
    return [r["t"] for r in
            df.select(sniff_type(F.col("payload")).alias("t")).collect()]


def test_sniff_magic_signatures(spark):
    got = _sniff(spark, [
        b"%PDF-1.4\n",
        b"\x1f\x8b\x08\x00",
        b"PK\x03\x04rest",
        b"\x89PNG\r\n\x1a\n",
        b"\xff\xd8\xff\xe0JFIF",
        b"GIF89a",
        b"RIFF\x00\x00\x00\x00WEBPVP8 ",
        b"RIFF\x00\x00\x00\x00WAVEfmt ",
    ])
    assert got == ["pdf", "gzip", "zip", "png", "jpeg", "gif",
                   "webp", "riff"]


def test_sniff_text_signatures_tolerant(spark):
    got = _sniff(spark, [
        b"<!DOCTYPE html><html>",
        b"  \n\t<HTML><body>",          # leading whitespace + case
        b"\xef\xbb\xbf<html>",          # UTF-8 BOM
        b'<?xml version="1.0"?>',
        b'  {"key": 1}',
        b"[1, 2]",
        b"just some plain text",
        b"",
    ])
    assert got == ["html", "html", "html", "xml", "json", "json",
                   "unknown", "unknown"]


def test_sniff_null_payload(spark):
    from narowi_ocr_spark.functions.sniff import sniff_type

    df = spark.createDataFrame([(None,)], "payload binary")
    assert df.select(sniff_type(F.col("payload")).alias("t")) \
             .collect()[0]["t"] == "unknown"


def test_recrawl_stats_change_counting(spark):
    from narowi_ocr_spark.operators.urls import recrawl_stats

    rows = [
        # u1: 3 fetches 1h apart, content changes once
        ("u1", "2024-01-01 00:00:00", "aaa"),
        ("u1", "2024-01-01 01:00:00", "aaa"),
        ("u1", "2024-01-01 02:00:00", "bbb"),
        # u2: 2 fetches, static
        ("u2", "2024-01-01 00:00:00", "ccc"),
        ("u2", "2024-01-02 00:00:00", "ccc"),
        # u3: single fetch — excluded (no interval evidence)
        ("u3", "2024-01-01 00:00:00", "ddd"),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts string, content_md5 string"
    ).withColumn("fetch_ts", F.col("fetch_ts").cast("timestamp"))
    got = {r["url"]: r for r in recrawl_stats(df).collect()}
    assert set(got) == {"u1", "u2"}
    u1 = got["u1"]
    assert (u1["n_fetches"], u1["n_changes"]) == (3, 1)
    assert u1["change_ppm"] == 500000          # 1 change / 2 intervals
    assert u1["span_us"] == 2 * 3600 * 10**6
    assert u1["mean_interval_us"] == 3600 * 10**6
    u2 = got["u2"]
    assert (u2["n_changes"], u2["change_ppm"]) == (0, 0)


def test_extract_pages_sniff_routing_mixed_corpus(spark):
    import datetime

    from narowi_ocr_spark.operators.pdftext import build_pdf
    from narowi_ocr_spark.plans.pipeline import extract_pages

    ts = datetime.datetime(2024, 1, 1)
    txt = "temperature 98.6 F reading"
    rows = [
        ("pdf://0", ts, build_pdf(txt, compress=False)),
        ("pdf://1", ts, build_pdf(txt, compress=True)),
        ("doc://2", ts,
         f"<html><body><nav><a href='/'>n</a></nav><p>{txt}</p>"
         "</body></html>".encode()),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    # no doc_type column anywhere — magic bytes pick the parser per row
    got = {r["url"]: r for r in
           extract_pages(pages, sniff_routing=True).collect()}
    assert all(r["status"] == "success" for r in got.values())
    # both modalities round-trip the text AND find the reading span
    for u in ("pdf://0", "pdf://1", "doc://2"):
        assert got[u]["extracted_text"] == txt
        assert len(got[u]["readings"]) == 1
