"""PDF byte-stream text extraction — the second parser behind the T2
extraction-mode dispatch (north_rule: "HTML boilerplate strip, PDF/layout
parse, DOM heuristics"). Reference analogue: the same
preprocess → extract chain the HTML path recasts
(image_processor.py:82-156 → ocr_engine.py:51-70), applied to a
different input modality.

Scope (honest, dependency-free): the TEXT-OBJECT subset of PDF —
content streams that are uncompressed or FlateDecode-compressed (zlib
is stdlib), text shown with ``Tj`` / ``TJ`` / ``'`` / ``"`` operators
inside ``BT``…``ET`` blocks, PDF string-literal escapes, and
``Td``/``TD``/``T*`` line advances. That covers machine-generated
text-first PDFs (the bulk of a crawl's PDF text value); image-only or
exotically-filtered PDFs yield no blocks and flow through the pipeline
as failed-status rows, exactly like unparseable HTML. Strings are
decoded as UTF-8 with replacement — real-world font/CMap decoding
needs a codec stack this sandbox doesn't ship, and is the same
documented gap as the multimodal decode stub.

Every text object (BT…ET) becomes one candidate block in the SAME
shape the HTML tokenizer emits, so the downstream scorer, classifier,
assembler, readings kernels and status rules apply unchanged — one
fused Arrow stage, one unbranched plan for arbitrarily interleaved
doc types.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------- parsing

# object/stream scanning is done on BYTES (PDF is a binary format; the
# text inside string literals is decoded only at the end)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_DICT_BEFORE_STREAM_RE = re.compile(rb"<<(?:[^<>]|<<[^<>]*>>)*>>\s*$")
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _unescape_pdf_bytes(raw: bytes) -> bytes:
    """PDF string-literal unescape (ISO 32000 §7.3.4.2): named escapes,
    1-3 digit octal codes, and line-continuation backslash. Escape-free
    literals (the overwhelming majority of crawl-PDF strings) return in
    one C-level containment check."""
    if b"\\" not in raw:
        return raw
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):
            i += 2  # line continuation: backslash-eol vanishes
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        else:
            i += 1  # lone backslash: dropped, per spec
    return bytes(out)


def _scan_string(data: bytes, start: int) -> tuple[bytes, int]:
    """Scan a ``(``-opened literal from ``start`` (index of the paren);
    returns (raw bytes inside, index past the closing paren). Tracks
    nesting and escapes. Fast path: when the span up to the next ``)``
    holds no backslash and no nested ``(`` — the common case — the
    literal is a single C-level find + slice; the byte loop only runs
    for escaped or nested strings."""
    end = data.find(b")", start + 1)
    if end != -1:
        seg = data[start + 1 : end]
        if b"\\" not in seg and b"(" not in seg:
            return seg, end + 1
    elif b"\\" not in data[start + 1 :] and b"(" not in data[start + 1 :]:
        return data[start + 1 :], len(data)  # unterminated tail
    depth = 0
    i, n = start, len(data)
    begin = start + 1
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash: skip escaped byte
            i += 2
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return data[begin:i], i + 1
        i += 1
    return data[begin:], n  # unterminated: take the tail


def _flate(body: bytes) -> bytes | None:
    """Inflate a stream body without guessing where the writer's EOL
    before ``endstream`` starts: compressed data can END in 0x0a/0x0d
    bytes, so any rstrip heuristic corrupts ~1/128 of streams.
    ``decompressobj`` stops exactly at the deflate stream's own end
    marker and leaves the trailing EOL as unused_data."""
    d = zlib.decompressobj()
    try:
        out = d.decompress(body) + d.flush()
    except zlib.error:
        return None
    return out if d.eof else None


def pdf_content_streams(payload: bytes) -> list[bytes]:
    """All content streams, FlateDecode'd when so declared. Streams
    whose filter we can't decode are skipped (never a crash)."""
    out: list[bytes] = []
    for m in _STREAM_RE.finditer(payload):
        body = m.group(1)
        head = payload[: m.start()]
        d = _DICT_BEFORE_STREAM_RE.search(head[-512:])
        filt = d.group(0) if d else b""
        if b"/FlateDecode" in filt:
            inflated = _flate(body)
            if inflated is None:
                continue
            body = inflated
        elif b"/Filter" in filt:
            continue  # unsupported filter (DCT, LZW, ...): no text here
        out.append(body)
    return out


# scanner for the tokens _text_object_lines dispatches on; everything
# between tokens is operands/whitespace and is skipped at C speed. The
# alternatives can never match at the same offset, so order is inert.
_TEXT_TOK_RE = re.compile(rb"\(|TJ|Tj|T\*|TD|Td|'|\"")


def _text_object_lines(body: bytes) -> list[str]:
    """One BT…ET body → display lines: ``Td/TD/T*/'/"`` advance the
    line, ``Tj/TJ/'/"`` append shown strings to the current line.
    Token-driven (one regex search per token) rather than per-byte —
    semantics identical to the byte-walk the differential fuzz test
    pins (tests/test_pdftext.py)."""
    lines: list[list[bytes]] = [[]]
    pending: list[bytes] = []  # string literals seen since the last op
    pos = 0
    search = _TEXT_TOK_RE.search
    while True:
        m = search(body, pos)
        if m is None:
            break
        tok = m.group()
        if tok == b"(":  # string literal
            raw, pos = _scan_string(body, m.start())
            pending.append(_unescape_pdf_bytes(raw))
            continue
        if tok in (b"TJ", b"Tj"):
            lines[-1].extend(pending)
            pending = []
        elif tok in (b"T*", b"TD", b"Td"):
            lines.append([])
            pending = []
        else:  # ' or " : next-line-and-show
            lines.append(pending)
            pending = []
        pos = m.end()
    text_lines = [b"".join(parts) for parts in lines]
    return [ln.decode("utf-8", errors="replace") for ln in text_lines]


def pdf_text_objects(payload: bytes) -> list[str]:
    """One string per BT…ET text object across all content streams;
    lines within an object joined by newline."""
    objs: list[str] = []
    for stream in pdf_content_streams(payload):
        for m in _BT_ET_RE.finditer(stream):
            objs.append("\n".join(_text_object_lines(m.group(1))))
    return objs


_PDF_WS = " \t\n\x0b\f\r"  # the Java-\s class words()/oracles use


def tokenize_pdf_py(payload: bytes | str | None) -> list[dict]:
    """PDF twin of ``blocks.tokenize_html_py``: one block per text
    object, same dict shape, tag ``pdftext``, zero link length (PDFs
    carry no anchor markup), so the HTML scorer/classifier/assembler
    apply verbatim downstream."""
    if payload is None:
        return []
    data = payload.encode("latin-1", errors="replace") if isinstance(
        payload, str
    ) else bytes(payload)
    if not data.lstrip()[:5].startswith(b"%PDF"):
        return []
    blocks: list[dict] = []
    for obj in pdf_text_objects(data):
        text = obj.strip(_PDF_WS)
        if not text:
            continue  # P8: drop empty specks
        blocks.append(
            {
                "block_idx": len(blocks),
                "tag": "pdftext",
                "text": text,
                "text_len": len(text),
                "link_len": 0,
                "word_count": len(text.split()),
            }
        )
    return blocks


# ---------------------------------------------------------------- fixtures

def _escape_pdf_text(s: str) -> str:
    return (
        s.replace("\\", r"\\")
        .replace("(", r"\(")
        .replace(")", r"\)")
        .replace("\r", r"\r")
    )


def build_pdf(text: str, compress: bool = False) -> bytes:
    """Deterministic minimal one-page PDF whose single text object shows
    ``text`` (one ``Tj`` + ``Td`` per line). ``pdf_text_objects`` on the
    result round-trips the input exactly — the fixture contract the
    extract_pdf_text oracle relies on. ``compress=True`` exercises the
    FlateDecode path (zlib level fixed for determinism)."""
    lines = text.split("\n")
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, ln in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({_escape_pdf_text(ln)}) Tj")
    ops.append("ET")
    stream = "\n".join(ops).encode("utf-8")
    filt = b""
    if compress:
        stream = zlib.compress(stream, 6)
        filt = b" /Filter /FlateDecode"
    head = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(stream)).encode()
        + filt + b" >>\nstream\n"
    )
    return head + stream + b"\nendstream\nendobj\n%%EOF\n"


# ------------------------------------------------------------- layout parse

# PDF numeric operand (ints and reals, ISO 32000 §7.3.3)
_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")
_NAME_RE = re.compile(rb"/[^\s/()<>\[\]{}%]*")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _milli(tok: bytes) -> int:
    """Exact decimal-string → milli-point integer (no float round
    trip): '72' → 72000, '-14.5' → -14500; fractional digits beyond
    milli precision truncate (documented resolution)."""
    s = tok.decode("ascii")
    neg = s.startswith("-")
    s = s.lstrip("+-")
    ip, _, fp = s.partition(".")
    v = int(ip or "0") * 1000 + int((fp + "000")[:3] or "0")
    return -v if neg else v


def pdf_layout_lines(
    payload: bytes | str | None,
) -> list[tuple[int, int, int, int, str]]:
    """Position-aware twin of ``pdf_text_objects``: one tuple per shown
    line, (obj_idx, line_idx, x_milli, y_milli, text) — the line-start
    position in milli-points tracked through ``Td``/``TD``/``T*``/
    ``TL``/``Tm`` (translation components only; rotation/shear in Tm is
    out of the text-object subset's scope, like font CMaps). This is
    the north-rule "layout parse": downstream ``reading_order`` turns
    stream order (writers emit column-major, footers first, whatever)
    into visual order.
    """
    if payload is None:
        return []
    data = payload.encode("latin-1", errors="replace") if isinstance(
        payload, str
    ) else bytes(payload)
    if not data.lstrip()[:5].startswith(b"%PDF"):
        return []
    rows: list[tuple[int, int, int, int, str]] = []
    obj_idx = -1
    for stream in pdf_content_streams(data):
        for m in _BT_ET_RE.finditer(stream):
            obj_idx += 1
            body = m.group(1)
            x = y = leading = 0
            nums: list[int] = []
            pending: list[bytes] = []
            parts: list[bytes] = []
            line_idx = 0

            def flush() -> None:
                nonlocal line_idx, parts
                text = (
                    b"".join(parts)
                    .decode("utf-8", errors="replace")
                    .strip(_PDF_WS)
                )
                if text:
                    rows.append((obj_idx, line_idx, x, y, text))
                    line_idx += 1
                parts = []

            i, n = 0, len(body)
            while i < n:
                c = body[i]
                if c == 0x28:  # ( string literal
                    raw, i = _scan_string(body, i)
                    pending.append(_unescape_pdf_bytes(raw))
                    continue
                if c == 0x2F:  # / name token (may contain digits)
                    i = _NAME_RE.match(body, i).end()
                    continue
                nm = _NUM_RE.match(body, i)
                if nm:
                    nums.append(_milli(nm.group(0)))
                    i = nm.end()
                    continue
                om = _OP_RE.match(body, i)
                if not om:
                    i += 1
                    continue
                op = om.group(0)
                i = om.end()
                if op in (b"Tj", b"TJ"):
                    parts.extend(pending)
                elif op in (b"Td", b"TD") and len(nums) >= 2:
                    flush()
                    x += nums[-2]
                    y += nums[-1]
                    if op == b"TD":
                        leading = -nums[-1]
                elif op == b"Tm" and len(nums) >= 6:
                    flush()
                    x, y = nums[-2], nums[-1]
                elif op == b"TL" and nums:
                    leading = nums[-1]
                elif op in (b"T*", b"'", b'"'):
                    flush()
                    y -= leading
                    if op != b"T*":
                        parts.extend(pending)
                pending = []
                nums = []
            flush()
    return rows
