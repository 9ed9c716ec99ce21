"""WARC ingest — the step between raw Common-Crawl archives and the
pages table every other operator consumes (north_star: "Iceberg table
of Common-Crawl-style pages"; a real deployment lands WARC segments in
object storage and this stage turns them into (url, warc_ts, html)
rows).

Format scope (ISO 28500, the subset Common Crawl actually ships):
WARC/1.0 and /1.1 records with CRLF header blocks, ``Content-Length``
-delimited payloads, and per-record-gzip-member compression (the
``.warc.gz`` convention: each record is its own gzip member, so a
reader can split the stream without decompressing the whole file —
``zlib.decompressobj(16+MAX_WBITS)`` consumes one member and hands
back ``unused_data``). Only ``WARC-Type: response`` records become
rows; warcinfo/request/metadata records are skipped. The HTTP response
inside the payload is split at the first CRLFCRLF; the body is the
page's raw ``html`` bytes (Content-Encoding passthrough — body bytes
are preserved verbatim, like the crawl does).

Scale shape: one ``mapInPandas`` over a table of archive blobs —
embarrassingly parallel, no shuffle; blob bytes never leave the Arrow
stage (output rows carry only the record payloads). On a cluster the
blob table is ``spark.read.format('binaryFile')`` over the WARC
segment listing; each ~1 GB segment is one row = one task, the same
unit Common Crawl shards by.

Parsing is byte-domain and tolerant: malformed records (bad lengths,
truncated members, missing URI) are skipped, never a crash — the same
garbage policy as the extraction pipeline.
"""

from __future__ import annotations

import gzip
import zlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------- writing

def build_warc(
    records: list[tuple[str, str, bytes]],
    gzip_members: bool = False,
    with_warcinfo: bool = True,
) -> bytes:
    """Serialize ``(url, iso_date, html_bytes)`` triples as a WARC blob
    (deterministic — the fixture generator for tests and oracles).
    ``gzip_members=True`` writes the ``.warc.gz`` convention: one gzip
    member per record (mtime pinned to 0 for byte-determinism)."""

    def member(headers: list[tuple[str, str]], payload: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in headers
        )
        rec = head + _CRLF + payload + _CRLF + _CRLF
        if gzip_members:
            return gzip.compress(rec, compresslevel=6, mtime=0)
        return rec

    out = bytearray()
    if with_warcinfo:
        info = b"software: narowi-ocr-spark synth\r\n"
        out += member(
            [
                ("WARC-Type", "warcinfo"),
                ("Content-Length", str(len(info))),
            ],
            info,
        )
    for url, iso_date, html in records:
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(html)}\r\n".encode()
            + _CRLF
            + html
        )
        out += member(
            [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", url),
                ("WARC-Date", iso_date),
                ("Content-Type", "application/http; msgtype=response"),
                ("Content-Length", str(len(http))),
            ],
            http,
        )
    return bytes(out)


# ---------------------------------------------------------------- parsing

def _gunzip_members(blob: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a multi-member stream (the .warc.gz
    layout). Truncated/corrupt tails are dropped, not raised."""
    rest = blob
    while rest.startswith(_GZIP_MAGIC):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(rest) + d.flush()
        except zlib.error:
            return
        if not d.eof:
            return
        yield out
        rest = d.unused_data


def _parse_record(data: bytes, pos: int) -> tuple[dict | None, int]:
    """One WARC record at ``pos`` → (headers+payload dict | None, next
    position). None when no well-formed record starts here."""
    head_end = data.find(_CRLF + _CRLF, pos)
    if head_end < 0:
        return None, len(data)
    head = data[pos:head_end]
    if not head.startswith(b"WARC/"):
        return None, len(data)
    headers: dict[str, str] = {}
    for line in head.split(_CRLF)[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        return None, len(data)
    body_start = head_end + 4
    body_end = body_start + length
    if body_end > len(data):
        return None, len(data)  # truncated record: stop
    payload = data[body_start:body_end]
    # records are terminated by CRLF CRLF; tolerate its absence
    nxt = body_end
    while data.startswith(_CRLF, nxt):
        nxt += 2
    return {"headers": headers, "payload": payload}, nxt


def _http_body(payload: bytes) -> bytes:
    split = payload.find(_CRLF + _CRLF)
    return payload[split + 4 :] if split >= 0 else payload


def parse_warc(blob: bytes) -> list[dict]:
    """All response records of a (possibly per-record-gzipped) WARC
    blob: [{url, warc_date (ISO str), html (bytes)}, ...]."""
    if blob[:2] == _GZIP_MAGIC:
        chunks: Iterator[bytes] = _gunzip_members(blob)
    else:
        chunks = iter([blob])
    out: list[dict] = []
    for data in chunks:
        pos = 0
        while pos < len(data):
            rec, pos = _parse_record(data, pos)
            if rec is None:
                break
            h = rec["headers"]
            if h.get("warc-type") != "response":
                continue
            url = h.get("warc-target-uri")
            if not url:
                continue
            out.append(
                {
                    "url": url,
                    "warc_date": h.get("warc-date", ""),
                    "html": _http_body(rec["payload"]),
                }
            )
    return out


WARC_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
    ]
)


def _parse_date(s: str):
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        return dt.astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


def warc_pages(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Archive blobs → pages rows (url, warc_ts, html). One narrow
    Arrow stage; join ``lang``/``doc_type`` enrichment downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                for rec in parse_warc(bytes(blob)):
                    rows.append(
                        (
                            rec["url"],
                            _parse_date(rec["warc_date"]),
                            rec["html"],
                        )
                    )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return blobs.select(blob_col).mapInPandas(run, WARC_PAGES_SCHEMA)
