"""WET export (sources/wet.py) and the deterministic training-order
shuffle (corpus.training_order)."""

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Window

from narowi_ocr_spark.operators.corpus import training_order
from narowi_ocr_spark.sources.wet import wet_export, write_wet


def _pages(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, ts string, extracted_text string"
    )
    return df.withColumn("warc_ts", F.col("ts").cast("timestamp")).drop("ts")


def test_wet_record_exact_bytes(spark):
    df = _pages(spark, [("https://a.example/x", "2024-01-01 00:00:05", "hi there")])
    r = wet_export(df).first()
    url, d, body = "https://a.example/x", "2024-01-01T00:00:05Z", "hi there"
    rid = hashlib.md5((url + d).encode()).hexdigest()
    dig = hashlib.md5(body.encode()).hexdigest()
    expected = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {d}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Block-Digest: md5:{dig}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
        f"{body}\r\n\r\n"
    )
    assert r["wet_record"] == expected
    assert r["n_bytes"] == len(body)


def test_wet_content_length_is_utf8_bytes(spark):
    df = _pages(spark, [("https://a.example/u", "2024-01-01 00:00:00", "héllo✓")])
    r = wet_export(df).first()
    nb = len("héllo✓".encode("utf-8"))
    assert r["n_bytes"] == nb
    assert f"Content-Length: {nb}\r\n" in r["wet_record"]


def test_wet_null_text_empty_body(spark):
    df = _pages(spark, [("https://a.example/n", "2024-01-01 00:00:00", None)])
    r = wet_export(df).first()
    assert r["n_bytes"] == 0
    assert "Content-Length: 0\r\n\r\n\r\n\r\n" in r["wet_record"]


def test_wet_date_is_utc_regardless_of_session_timezone(spark):
    """WARC-Date must be real UTC even when the session renders
    timestamps in a local zone (ADVICE r4: a spark-submit driver that
    never pinned the zone would otherwise emit local wall-clock
    falsely labelled 'Z')."""
    row = [("https://a.example/tz", "2024-06-01 12:34:56", "body")]
    baseline = wet_export(_pages(spark, row)).first()["wet_record"]
    tz_key = "spark.sql.session.timeZone"
    prev = spark.conf.get(tz_key)
    try:
        # analysis is eager per DataFrame op, so the string→timestamp
        # cast's zone is baked when the frame is BUILT: rebuild under
        # each zone so the literal parses as local wall-clock there;
        # the record must then carry that instant's true UTC
        spark.conf.set(tz_key, "America/New_York")
        shifted = wet_export(_pages(spark, row)).first()["wet_record"]
        assert "WARC-Date: 2024-06-01T16:34:56Z" in shifted  # EDT = UTC-4
        spark.conf.set(tz_key, "Asia/Tokyo")
        again = wet_export(_pages(spark, row)).first()["wet_record"]
        assert "WARC-Date: 2024-06-01T03:34:56Z" in again  # JST = UTC+9
    finally:
        spark.conf.set(tz_key, prev)
    assert "WARC-Date: 2024-06-01T12:34:56Z" in baseline


def test_write_wet_roundtrip(spark, tmp_path):
    rows = [
        (f"https://h{i}.example/p", "2024-01-01 00:00:01", f"doc {i} body\nline2")
        for i in range(20)
    ]
    recs = wet_export(_pages(spark, rows))
    out = str(tmp_path / "wet")
    write_wet(recs, out)
    # read the concatenated segment back and re-slice by Content-Length
    import glob

    blob = b"".join(
        open(p, "rb").read() for p in sorted(glob.glob(out + "/part-*"))
    )
    assert blob.count(b"WARC/1.0\r\n") == 20
    bodies = set()
    pos = 0
    while True:
        h = blob.find(b"Content-Length: ", pos)
        if h < 0:
            break
        eol = blob.index(b"\r\n", h)
        n = int(blob[h + 16 : eol])
        start = blob.index(b"\r\n\r\n", eol) + 4
        bodies.add(blob[start : start + n].decode())
        pos = start + n
    assert bodies == {r[2] for r in rows}


def test_training_order_matches_global_window(spark):
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: (r["train_pos"], r["reader"])
        for r in training_order(docs, seed="s1", n_readers=4).collect()
    }
    key = F.md5(F.concat(F.lit("s1"), F.col("doc_id").cast("string")))
    w = Window.orderBy(key.asc(), F.col("doc_id").asc())
    want = {
        r["doc_id"]: r["p"]
        for r in docs.withColumn("p", F.row_number().over(w)).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert {v[1] for v in got.values()} == {0, 1, 2, 3}
    # round-robin striding: each reader gets an equal share (500/4 ± 1)
    from collections import Counter

    c = Counter(v[1] for v in got.values())
    assert max(c.values()) - min(c.values()) <= 1


def test_training_order_reseeding_and_repartition(spark):
    docs = spark.range(300).select(F.col("doc_id") if False else F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["train_pos"] for r in training_order(docs).collect()}
    b = {
        r["doc_id"]: r["train_pos"]
        for r in training_order(docs.repartition(13)).collect()
    }
    assert a == b  # partitioning-independent
    c = {
        r["doc_id"]: r["train_pos"]
        for r in training_order(docs, seed="epoch1").collect()
    }
    assert a != c  # a new seed is a new permutation
    assert sorted(c.values()) == list(range(1, 301))  # still a permutation
