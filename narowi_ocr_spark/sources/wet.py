"""WET export — the conversion-record twin of the WARC ingest
(`sources/warc.py`): serialize extracted main text back out in the
format Common Crawl publishes its own extractions in (``.wet`` =
WARC ``conversion`` records), so a corpus produced by this engine is a
drop-in replacement for CC-MAIN WET segments in downstream LLM-data
tooling.

Record layout (ISO 28500 conversion record, the subset WET files use):

    WARC/1.0\\r\\n
    WARC-Type: conversion\\r\\n
    WARC-Target-URI: <url>\\r\\n
    WARC-Date: <ISO-8601 Z>\\r\\n
    WARC-Record-ID: <urn:md5:...>\\r\\n
    WARC-Block-Digest: md5:<hex of text>\\r\\n
    Content-Type: text/plain\\r\\n
    Content-Length: <UTF-8 BYTE length of text>\\r\\n
    \\r\\n
    <text>\\r\\n\\r\\n

Two deliberate, documented divergences from Common Crawl's writer —
both chosen for engine-portable determinism (the whole record string is
hash-gated against DuckDB byte for byte):
- ``WARC-Record-ID`` is ``urn:md5:<md5(url ‖ date)>`` instead of a
  random ``urn:uuid`` (reproducible across reruns — the property a
  resumable writer needs anyway);
- ``WARC-Block-Digest`` uses md5 hex instead of sha1 base32 (md5 is
  the one digest both engines expose; the digest's job — corruption
  detection on read — is unchanged).

Scale shape: record assembly is a pure-codegen ``concat`` projection —
zero shuffles, zero Python, composes with the shuffle-free extraction
stage so "extract + export WET" is still ONE stage end to end. The
writer emits one ``.wet``/``.wet.gz`` part-file per partition
(partition-parallel, no coalesce); record boundaries are
Content-Length-delimited, so files are safely concatenable and
readable mid-stream, exactly like the crawl's own segments.

Reference analogue: the reference prints per-image extracted text to
stdout/CSV (main.py report path); this is the web-corpus-native
serialization of the same artifact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CRLF = "\r\n"


def wet_record(
    url: Column,
    date_iso: Column,
    text: Column,
) -> Column:
    """One conversion record as a string column (see module docstring
    for the exact byte layout). ``date_iso`` must already be an
    ISO-8601 ``...Z`` string — format timestamps with
    ``F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")``. NULL text is
    exported as an empty body (Content-Length: 0), never a NULL
    record: a WET segment must carry one record per input row for the
    manifest row counts to reconcile."""
    body = F.coalesce(text, F.lit(""))
    return F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), date_iso, F.lit(_CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"),
        F.md5(F.concat(url, date_iso)),
        F.lit(">" + _CRLF),
        F.lit("WARC-Block-Digest: md5:"), F.md5(body), F.lit(_CRLF),
        F.lit("Content-Type: text/plain" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(body).cast("string"),
        F.lit(_CRLF + _CRLF),
        body,
        F.lit(_CRLF + _CRLF),
    )


def wet_export(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "extracted_text",
) -> DataFrame:
    """Per-row conversion records: (url, n_bytes, wet_record) where
    ``n_bytes`` is the text's UTF-8 byte length (the record's
    Content-Length). Pure narrow projection.

    WARC-Date is rendered in REAL UTC regardless of
    ``spark.sql.session.timeZone``: ``date_format`` renders wall-clock
    in the session zone, so the timestamp is first shifted with
    ``to_utc_timestamp(ts, <session tz>)`` — on a session pinned to a
    local zone this would otherwise emit local wall-clock falsely
    labelled ``Z``, breaking byte-reproducibility across clusters."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    date_iso = F.date_format(
        F.to_utc_timestamp(F.col(ts_col), tz), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )
    body = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(url_col).alias("url"),
        F.octet_length(body).cast("long").alias("n_bytes"),
        wet_record(F.col(url_col), date_iso, F.col(text_col)).alias(
            "wet_record"
        ),
    )


def write_wet(
    records: DataFrame,
    path: str,
    record_col: str = "wet_record",
    compress: bool = False,
    mode: str = "error",
) -> None:
    """Write records as WET segment files, one part per partition.
    ``compress=True`` writes gzip part-files (``.wet.gz``-style; Spark
    gzips each part as a single stream — per-record gzip members, the
    ``.warc.gz`` trick that allows mid-file seeks, matter for 1 GB
    archive segments, not for extracted-text parts a reader consumes
    whole). Records embed CRLFs; the text writer appends one ``\\n``
    per record, which WET readers skip as inter-record slack
    (Content-Length delimits the payload)."""
    w = records.select(F.col(record_col).cast("string")).write.mode(mode)
    if compress:
        w = w.option("compression", "gzip")
    w.text(path)
