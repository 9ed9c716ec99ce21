"""Property-based tests (hypothesis) over the pure-Python kernels — the
invariants the reference's golden tests imply but never state. These run
without a SparkSession (the Python kernels are exactly the code executed
inside the Arrow batches; byte-equivalence between kernel and pipeline is
covered by tests/test_pipeline_fused.py)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from narowi_ocr_spark.functions.readings import extract_readings_py
from narowi_ocr_spark.operators.blocks import round4_py, tokenize_and_score_py
from narowi_ocr_spark.plans.pipeline import extract_page_py

# Text fragments that plausibly contain readings + pure noise.
SNIPPETS = st.sampled_from(
    [
        "Temp: 98.6F",
        "BP: 120/80",
        "HR: 72 bpm",
        "O2 98%",
        "Weight: 150 lbs",
        "glucose 95 mg/dL",
        "R: 16",
        "P: 7/10",
        "no readings here",
        "just words and 42 things",
        "",
    ]
)
LINES = st.lists(SNIPPETS, min_size=0, max_size=8)
NOISE = st.text(alphabet=string.printable, max_size=80)


@given(LINES)
@settings(max_examples=200, deadline=None)
def test_readings_dedup_invariants(lines):
    """Reference semantics (pattern_matcher.py:122-220): at most one
    reading per type per line, and (type, value, unit) never repeats
    across the document."""
    text = "\n".join(lines)
    out = extract_readings_py(text)
    triples = [(r["type"], r["value"], r["unit"]) for r in out]
    assert len(triples) == len(set(triples))
    # per-line type uniqueness is implied by global triple dedup + the
    # one-per-type-per-line rule; check the count can never exceed
    # 9 types × distinct lines
    distinct_lines = len({l for l in lines if l})
    assert len(out) <= 9 * max(distinct_lines, 1)


@given(LINES)
@settings(max_examples=100, deadline=None)
def test_readings_deterministic_and_order_stable(lines):
    text = "\n".join(lines)
    assert extract_readings_py(text) == extract_readings_py(text)


@given(NOISE)
@settings(max_examples=200, deadline=None)
def test_readings_never_crash_on_garbage(s):
    out = extract_readings_py(s)
    for r in out:
        assert set(r) == {"type", "value", "unit", "is_valid"}
        assert isinstance(r["value"], float)
        assert isinstance(r["is_valid"], bool)


@given(st.binary(max_size=400))
@settings(max_examples=200, deadline=None)
def test_tokenizer_total_on_arbitrary_bytes(payload):
    """The html tokenizer is total: any byte string produces a block list
    with well-formed fields and scores in [0, 100]."""
    blocks = tokenize_and_score_py(payload)
    for b in blocks:
        assert 0.0 <= b["score"] <= 100.0
        assert b["text_len"] >= 0 and b["link_len"] >= 0
        assert isinstance(b["is_content"], bool)


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_extract_page_confidence_bounds(payload):
    text, confidence, readings = extract_page_py(payload)
    assert 0.0 <= confidence <= 100.0
    assert isinstance(text, str)


@given(st.floats(min_value=0.0, max_value=100.0, allow_nan=False))
@settings(max_examples=500, deadline=None)
def test_round4_contract(x):
    """round4_py is idempotent, within 5e-5 of x, and 4-decimal."""
    r = round4_py(x)
    assert abs(r - x) <= 5e-5 + 1e-12
    assert round4_py(r) == r


@given(st.text(min_size=0, max_size=400))
@settings(max_examples=300, deadline=None)
def test_phash64_totality_and_band_bounds(s):
    """phash64 never crashes, returns None exactly on empty input, and
    every band is a 16-bit value."""
    from narowi_ocr_spark.operators.multimodal import phash64

    out = phash64(s)
    if len(s) == 0:
        assert out is None
    else:
        assert len(out) == 4
        assert all(0 <= b < (1 << 16) for b in out)
        # deterministic
        assert phash64(s) == out


@given(st.text(alphabet=string.printable, min_size=64, max_size=300))
@settings(max_examples=200, deadline=None)
def test_phash64_constant_shift_invariance(s):
    """Shifting every sampled luminance by a constant must not change
    the hash: bit_j compares 64·v_j against Σv, and both sides shift by
    the same 64·c. (Caesar-shifting the whole string by +1 code point
    shifts every sample by exactly 1.)"""
    from narowi_ocr_spark.operators.multimodal import phash64

    shifted = "".join(chr(ord(c) + 1) for c in s)
    assert phash64(s) == phash64(shifted)


@given(st.integers(min_value=-(10**12), max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_cents_roundtrip_exact(k):
    """_cents inverts the cents→double division exactly over the whole
    int64-cents range the events table can produce (the spend-alert
    twins rely on this to agree bit-for-bit)."""
    from narowi_ocr_spark.streaming.stateful import _cents

    assert _cents(k / 100.0) == k
