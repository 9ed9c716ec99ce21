"""Unicode text normalization — the canonicalization step CCNet-style
pipelines apply BEFORE any content hashing: visually identical strings
with different codepoint sequences (precomposed é vs e+combining acute,
compatibility ligatures, width variants) must fingerprint identically
or every dedup family silently under-merges.

Spark has no built-in Unicode normalizer, so this is an Arrow-batched
iterator pandas UDF over ``unicodedata.normalize`` — one Python worker
pass per document, amortized per batch like the extraction kernels.
Whitespace collapse and lowercasing stay JVM-side (codegen) around the
UDF; only the normalization itself crosses the Arrow boundary.

Cross-engine note: NFC here is byte-identical to DuckDB's
``nfc_normalize`` (both implement the Unicode standard; probed in this
environment), which is what makes the ``text_normalize`` query
hash-checkable. NFKC/NFD/NFKD are exposed for pipeline use but have no
DuckDB twin.
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _make_normalizer(form: str):
    @pandas_udf("string")
    def _norm(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(
                lambda t: unicodedata.normalize(form, t)
                if t is not None
                else None
            )

    return _norm


_NORMALIZERS: dict[str, object] = {}


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """``unicodedata.normalize(form, ·)`` as an Arrow-batched column."""
    assert form in ("NFC", "NFKC", "NFD", "NFKD"), form
    if form not in _NORMALIZERS:
        _NORMALIZERS[form] = _make_normalizer(form)
    c = F.col(col) if isinstance(col, str) else col
    return _NORMALIZERS[form](c)


def normalize_text(
    col: Column | str,
    form: str = "NFC",
    lower: bool = True,
    collapse_ws: bool = True,
) -> Column:
    """Full canonicalization: Unicode normalize (Arrow UDF) → optional
    lowercase → optional whitespace collapse+trim (both codegen).

    The collapse uses the EXPLICIT class ``[ \\t\\n\\x0b\\f\\r]+``
    instead of ``\\s+``: Java's ``\\s`` includes \\x0b while RE2's does
    not, so the explicit class is what keeps the DuckDB oracle
    bit-equal on control-character input."""
    out = unicode_normalize(col, form)
    if lower:
        out = F.lower(out)
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"[ \t\n\x0b\f\r]+", " "))
    return out


_MOJIBAKE_UDF = None


def _make_mojibake_udf():
    @pandas_udf("struct<text_fixed:string,was_fixed:boolean>")
    def _fix_mojibake(
        batches: Iterator[pd.Series],
    ) -> Iterator[pd.DataFrame]:
        def fix(t):
            if t is None:
                return None, None
            try:
                b = t.encode("latin-1")
            except UnicodeEncodeError:
                return t, False
            try:
                u = b.decode("utf-8")
            except UnicodeDecodeError:
                return t, False
            return (u, True) if u != t else (t, False)

        for s in batches:
            pairs = [fix(t) for t in s]
            yield pd.DataFrame(
                {
                    "text_fixed": [p[0] for p in pairs],
                    "was_fixed": [p[1] for p in pairs],
                }
            )

    return _fix_mojibake


def fix_mojibake(col: Column | str) -> Column:
    """UTF-8/Latin-1 double-encoding repair — the ftfy-core heuristic
    every web-text pipeline needs: a page whose bytes were UTF-8 but
    were decoded as Latin-1 somewhere upstream shows 'cafÃ©' for
    'café'. If the WHOLE string round-trips encode('latin-1') →
    decode('utf-8') and the round trip changes it, the decoded form is
    the repair (was_fixed=true); any failure leaves the text untouched
    (pure ASCII round-trips unchanged → false; genuine Latin-1 text
    with real accents fails the UTF-8 decode → false — the heuristic
    never corrupts clean input).

    Returns struct(text_fixed, was_fixed). Single deterministic pass
    (the double-mojibake fixpoint loop composes by calling this twice).
    Arrow-batched iterator UDF — same cost class as unicode_normalize;
    per-batch C-speed codecs, no per-row Python at the driver.

    Reference analogue: the pre-OCR bilateral denoise
    (image_processor.py:96-117) — reverse a known upstream corruption
    before recognition, never touching already-clean inputs.
    """
    global _MOJIBAKE_UDF
    if _MOJIBAKE_UDF is None:
        _MOJIBAKE_UDF = _make_mojibake_udf()
    c = F.col(col) if isinstance(col, str) else col
    return _MOJIBAKE_UDF(c)
