"""Content-type sniffing from payload magic bytes.

A crawl's Content-Type headers lie constantly (PDFs served as
text/html, gzip members labeled octet-stream), so the byte-level
sniff is the router that decides which EXTRACTION_MODES branch a
payload takes (plans/pipeline.py) and which payloads skip the text
path entirely (images → the multimodal family). Mirrors the WHATWG
MIME-sniffing approach: fixed byte signatures first, then a
whitespace/BOM-tolerant scan for markup/JSON openers.

Scale shape: pure Catalyst — a binary substring compare ladder plus
one latin-1 decode (total, never throws: every byte sequence is valid
ISO-8859-1) of a 64-byte prefix for the text signatures. No Python,
no shuffle, column-pruned to the payload prefix at the scan.

Reference analogue: the image-header probe that rejects non-image
inputs before OCR (src/processing/image_processor.py:62-80).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (label, magic bytes) — checked in order, first match wins.
MAGIC = [
    ("pdf", b"%PDF"),
    ("gzip", b"\x1f\x8b"),
    ("zip", b"PK\x03\x04"),
    ("png", b"\x89PNG"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("riff", b"RIFF"),
]

# regexes over the whitespace/BOM-trimmed, lowercased 64-byte prefix
_TEXT_SIGS = [
    ("html", r"^(<!doctype html|<html)"),
    ("xml", r"^<\?xml"),
    ("json", r"^[\[{]"),
]


def sniff_type(payload: Column) -> Column:
    """Label a binary payload by its leading bytes: one of pdf, gzip,
    zip, png, jpeg, gif, webp, riff, html, xml, json, unknown. NULL
    payloads sniff to 'unknown'."""
    expr = F.lit("unknown")
    # text signatures (checked after magics, so build the when-chain
    # from the bottom up)
    # a UTF-8 BOM decodes to 'ï»¿' under latin-1 — strip it with the
    # leading whitespace before matching the text signatures
    head = F.lower(
        F.regexp_replace(
            F.decode(F.substring(payload, 1, 64), "ISO-8859-1"),
            "^(ï»¿|\\s)+",
            "",
        )
    )
    for label, pat in reversed(_TEXT_SIGS):
        expr = F.when(head.rlike(pat), F.lit(label)).otherwise(expr)
    # RIFF containers: bytes 9-12 name the member format
    webp = F.when(
        F.substring(payload, 9, 4) == F.lit(b"WEBP"), F.lit("webp")
    ).otherwise(F.lit("riff"))
    for label, magic in reversed(MAGIC):
        hit = F.substring(payload, 1, len(magic)) == F.lit(magic)
        expr = F.when(hit, webp if label == "riff" else F.lit(label)).otherwise(
            expr
        )
    return F.when(payload.isNull(), F.lit("unknown")).otherwise(expr)
