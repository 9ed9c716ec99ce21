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
