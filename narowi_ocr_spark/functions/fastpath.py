"""Native fast-path variants of the reading/number span kernels
(SURVEY.md §4/§7: "native-Spark variants offered as a fast path where
byte-identity is not required", flag ``byte_identical=False``).

The byte-identical kernels (functions/readings.py, functions/numbers.py)
execute Python ``re`` inside Arrow batches. These variants stay
ENTIRELY inside the JVM: Java regex via ``regexp_extract_all``, line
dispatch and the three dedup sets via higher-order array functions, and
a single ``aggregate`` fold per document. No UDF, no shuffle, no
per-row Python — the whole extraction is one narrow projection.

MEASURED cost (BENCH.md §Kernel variants, 100k ~300-char docs,
local[8], steady state): Arrow kernel 55.6k docs/s vs all-JVM 44.3k
docs/s — the interpreted HOF expression tree (no whole-stage codegen
for higher-order functions) costs MORE per doc than the Arrow
round-trip on this corpus, so "fast path" is about OPERATIONAL cost,
not wall-clock: no Python runtime needed on executors, no Arrow
worker pools to size, and the expression composes into surrounding
codegen plans. Pick the Arrow kernel for throughput, this variant
for Python-free clusters or when byte-identity is not required and
the deployment cannot ship Python workers.

Semantics replicated from the reference kernel
(pattern_matcher.py:122-220 for readings, number_extractor.py:73-144 for
numbers), structured exactly like functions/readings.py:

  1. newline normalization, per-line matching, digit-free lines skipped;
  2. line-prefix dispatch (R: → respiratory; P: → pain if "/10" hint
     else heart rate; otherwise all categories in DEFAULT order);
  3. the document-global matched-substring dedup set, the global
     (type, value, unit) dedup set, and max-one-type-per-line — all
     folded sequentially in hit order, exactly as the Python kernel
     iterates;
  4. value/unit coercion per category (feet'inches → inches, BP
     composite unit, unit inference from the matched text);
  5. per-type range validation via the native validators.

Known divergences from the byte-identical kernel (differential-fuzzed in
tests/test_fastpath.py):
  - Java vs Python regex semantics: none observed for these patterns
    (no construct used differs between the engines for ASCII input);
  - inputs where the REFERENCE ITSELF CRASHES (e.g. "170 centimeters":
    'cm' ∉ matched.lower() routes to the feet-inches branch, whose
    group(2) raises IndexError in the reference and in the
    byte-identical kernel). The fast path instead returns the sensible
    cm-branch reading — a divergence only on inputs the contract
    implementation cannot process at all.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from narowi_ocr_spark.functions.patterns import (
    BP_DIA_RANGE,
    BP_SYS_RANGE,
    DEFAULT_CATEGORY_ORDER,
    DEFAULT_UNITS,
    LINE_PREFIX_P,
    LINE_PREFIX_R,
    NUMBER_PATTERNS,
    PAIN_HINT,
    READING_PATTERNS,
    READING_RANGES,
)

READING_TYPE = "struct<type:string,value:double,unit:string,is_valid:boolean>"
_HIT_TYPE = (
    "array<struct<li:int,matched:string,type:string,value:double,"
    "unit:string,is_valid:boolean>>"
)
_NUM_TYPE = (
    "array<struct<value:double,unit:string,confidence:double,raw_text:string>>"
)


def _java(pat: str, flags: int = re.IGNORECASE) -> str:
    """Python pattern → Java pattern string (the constructs used —
    lookaheads, \\b, non-capturing groups, anchors — are identical; only
    the IGNORECASE flag moves inline)."""
    return ("(?i)" + pat) if flags & re.IGNORECASE else pat


def _norm(t: Column) -> Column:
    return F.regexp_replace(t, "\r\n|\r", "\n")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --------------------------------------------------------------------------
# K6 readings fast path
# --------------------------------------------------------------------------

def _value_unit(cat: str, ngroups: int, m: Column, a: Column, b: Column):
    """Per-category value/unit coercion (reference kernel :171-198),
    resolved statically where the pattern decides (group count) and
    dynamically where the matched text decides (unit inference).
    Returns (value, unit, static_unit) — static_unit is the Python
    string when the unit is plan-time constant (lets the validator pick
    its range branch statically instead of emitting a lit==lit CASE)."""
    low = F.lower(m)
    if cat == "BLOOD_PRESSURE":
        sys_i, dia_i = a.cast("int"), b.cast("int")
        value = sys_i.cast("double")
        unit = F.concat(
            sys_i.cast("string"), F.lit("/"), dia_i.cast("string"), F.lit(" mmHg")
        )
        return value, unit, None
    if cat == "HEIGHT" and ngroups >= 2:  # feet'inches patterns
        value = (a.cast("int") * 12 + b.cast("int")).cast("double")
        return value, F.lit("in"), "in"
    if cat == "TEMPERATURE":
        unit = F.when(low.contains("f"), F.lit("F")).otherwise(F.lit("C"))
        return a.cast("double"), unit, None
    if cat == "WEIGHT":
        unit = F.when(low.contains("kg"), F.lit("kg")).otherwise(F.lit("lb"))
        return a.cast("double"), unit, None
    if cat == "BLOOD_GLUCOSE":
        unit = F.when(low.contains("mmol"), F.lit("mmol/L")).otherwise(
            F.lit("mg/dL")
        )
        return a.cast("double"), unit, None
    # two-group HR/RESP patterns take group(2) (lastindex == 2)
    g = b if (cat in ("HEART_RATE", "RESPIRATORY_RATE") and ngroups == 2) else a
    su = DEFAULT_UNITS.get(cat, "")
    return g.cast("double"), F.lit(su), su


def _valid_expr(
    cat: str, value: Column, unit: Column, static_unit: str | None = None
) -> Column:
    """Per-type range validation with the type resolved STATICALLY —
    the expression carries only this category's unit branches (the
    generic ``is_valid_reading`` builds the full 9-type CASE per call);
    a plan-time-constant unit collapses to the single range check."""
    if cat == "BLOOD_PRESSURE":
        sys_v = F.split(unit, "/").getItem(0).cast("int")
        dia_v = F.regexp_extract(unit, r"/(\d+)", 1).cast("int")
        return sys_v.between(*BP_SYS_RANGE) & dia_v.between(*BP_DIA_RANGE)
    by_unit = READING_RANGES[cat]
    if static_unit is not None:
        lo, hi = by_unit.get(static_unit, by_unit[""])
        return value.between(F.lit(lo), F.lit(hi))
    lo, hi = by_unit[""]
    branch = value.between(F.lit(lo), F.lit(hi))
    for u, (ulo, uhi) in by_unit.items():
        if u:
            branch = F.when(
                unit == F.lit(u), value.between(F.lit(ulo), F.lit(uhi))
            ).otherwise(branch)
    return branch


def _cat_allowed(cat: str, s: Column) -> Column:
    """Line-prefix dispatch (reference :147-161) — ``cat`` is static, so
    each branch folds to a literal."""
    return (
        F.when(s["is_r"], F.lit(cat == "RESPIRATORY_RATE"))
        .when(
            s["is_p"],
            F.when(s["pain"], F.lit(cat == "PAIN_SCALE")).otherwise(
                F.lit(cat == "HEART_RATE")
            ),
        )
        .otherwise(F.lit(True))
    )


def _pattern_gate(cat: str, idx: int, s: Column) -> Column:
    """Cheap NECESSARY condition of pattern ``idx`` of ``cat`` matching —
    literal substring checks against the staged lowercase line (plain
    memchr-style ``contains``, no regex). A digit-bearing web-text line
    rarely carries any of these unit tokens, so most of the 57 regex
    scans are skipped entirely; semantics are unchanged because a gate
    failure implies the pattern cannot match (differential-fuzzed)."""
    low = s["low"]

    def any_of(*subs: str) -> Column:
        out = low.contains(subs[0])
        for sub in subs[1:]:
            out = out | low.contains(sub)
        return out

    if cat == "TEMPERATURE":
        return any_of("f", "c")
    if cat == "WEIGHT":
        return any_of("lb", "kg", "kilo", "pound")
    if cat == "BLOOD_PRESSURE":
        # patterns 0-4 require a literal '/'; 5-6 are case-SENSITIVE
        return (
            low.contains("/")
            if idx <= 4
            else s["line"].contains("SYS" if idx == 5 else "S")
        )
    if cat == "OXYGEN":
        return low.contains("%")
    if cat == "HEART_RATE":
        return [
            any_of("bpm", "hr"), any_of("bpm", "hr"), low.contains("hr"),
            low.contains("pulse"), low.contains("p"),
        ][idx]
    if cat == "BLOOD_GLUCOSE":
        return low.contains("mmol") if idx in (2, 3) else low.contains("mg")
    if cat == "RESPIRATORY_RATE":
        return [
            low.contains("rr"), low.contains("rr"), low.contains("resp"),
            low.contains("r"),
        ][idx]
    if cat == "PAIN_SCALE":
        return any_of("/10", "/ 10", "out of 10")
    if cat == "HEIGHT":
        if idx == 2:
            return low.contains("in")
        if idx == 3:
            return low.contains('"')
        return any_of("cm", "centimeter")
    return F.lit(True)


def _line_hit_arrays(s: Column) -> Column:
    """All pattern hits of one line, in the kernel's iteration order
    (category precedence → pattern order → match position), with
    value/unit/validity already coerced. Disallowed categories
    short-circuit to empty arrays, so prefixed lines never run the
    other 8 categories' regexes."""
    arrays = []
    empty = F.array().cast(_HIT_TYPE)
    for cat in DEFAULT_CATEGORY_ORDER:
        allowed = _cat_allowed(cat, s)
        for idx, (pat, flags) in enumerate(READING_PATTERNS[cat]):
            gate = _pattern_gate(cat, idx, s)
            ngroups = re.compile(pat).groups
            jp = _java(pat, flags)
            # ONE full-line scan per pattern (group 0 only); capture
            # groups are recovered by re-matching the pattern on each
            # (short) matched substring — a match re-matches itself at
            # position 0 with identical group assignment (leftmost
            # semantics; the patterns have no positive lookahead that a
            # truncated suffix could break), so this is 3× fewer line
            # scans than extracting each group from the line. Measured
            # ~7× end-to-end on reading-dense corpora.
            m0 = F.regexp_extract_all(s["line"], F.lit(jp), 0)

            # NB: closure factory, not default-arg lambdas — PySpark
            # reads HOF lambda arity from the signature, so default
            # args would be miscounted as lambda parameters.
            def _mk_factory(cat: str, ngroups: int, s: Column, jp: str):
                def mk(m):
                    a = F.regexp_extract(m, jp, 1)
                    b = F.regexp_extract(m, jp, 2) if ngroups >= 2 else F.lit("")
                    value, unit, su = _value_unit(cat, ngroups, m, a, b)
                    return F.struct(
                        s["li"].alias("li"),
                        m.alias("matched"),
                        F.lit(cat).alias("type"),
                        value.alias("value"),
                        unit.alias("unit"),
                        _valid_expr(cat, value, unit, su).alias("is_valid"),
                    )

                return mk

            mk = _mk_factory(cat, ngroups, s, jp)
            arrays.append(
                F.when(allowed & gate, F.transform(m0, mk)).otherwise(empty)
            )
    return F.concat(*arrays)


def _fold_hits(hits: Column) -> Column:
    """Sequential emission fold — the exact dedup semantics of the
    kernel's two phases: the matched-substring set claims on FIRST
    occurrence regardless of emission; the (type,value,unit) and
    per-line type sets claim only on emission (reference :167-169,
    :209-213)."""
    acc0 = F.struct(
        F.array().cast(f"array<{READING_TYPE}>").alias("out"),
        F.array().cast("array<string>").alias("sub"),
        F.array().cast("array<string>").alias("tri"),
        F.array().cast("array<string>").alias("lt"),
    )

    def merge(acc, h):
        sub_seen = F.array_contains(acc["sub"], h["matched"])
        tri_key = F.concat_ws("|", h["type"], h["value"].cast("string"), h["unit"])
        lt_key = F.concat_ws(":", h["li"].cast("string"), h["type"])
        emit = (
            (~sub_seen)
            & (~F.array_contains(acc["tri"], tri_key))
            & (~F.array_contains(acc["lt"], lt_key))
        )
        reading = F.struct(
            h["type"].alias("type"),
            h["value"].alias("value"),
            h["unit"].alias("unit"),
            h["is_valid"].alias("is_valid"),
        )
        return F.struct(
            F.when(emit, F.array_append(acc["out"], reading))
            .otherwise(acc["out"])
            .alias("out"),
            F.when(sub_seen, acc["sub"])
            .otherwise(F.array_append(acc["sub"], h["matched"]))
            .alias("sub"),
            F.when(emit, F.array_append(acc["tri"], tri_key))
            .otherwise(acc["tri"])
            .alias("tri"),
            F.when(emit, F.array_append(acc["lt"], lt_key))
            .otherwise(acc["lt"])
            .alias("lt"),
        )

    return F.aggregate(hits, acc0, merge, lambda acc: acc["out"])


def extract_readings_fast(text: Column | str) -> Column:
    """array<struct<type,value,unit,is_valid>> of typed reading spans —
    all-JVM fast path of ``functions.readings.extract_readings``.

    Dataflow per document (one narrow projection, zero Python):
      split lines → keep digit-bearing lines (the reference patterns all
      require a digit, so this prefilter is semantics-preserving and
      skips the overwhelming majority of web-text lines) → per-line
      regex hits with dispatch → sequential dedup fold → spans.
    """
    t = _norm(_col(text))
    line_structs = F.transform(
        F.split(t, "\n"),
        lambda l, i: F.struct(i.cast("int").alias("li"), l.alias("line")),
    )
    # digit filter FIRST: dispatch flags + the lowercase copy are only
    # computed for digit-bearing lines (3 unanchored regexes + a lower()
    # per prose line would otherwise dominate on real web text)
    digit_lines = F.filter(line_structs, lambda s: s["line"].rlike(r"\d"))
    flagged = F.transform(
        digit_lines,
        lambda s: F.struct(
            s["li"].alias("li"),
            s["line"].alias("line"),
            F.lower(s["line"]).alias("low"),
            s["line"].rlike(_java(*LINE_PREFIX_R)).alias("is_r"),
            s["line"].rlike(_java(*LINE_PREFIX_P)).alias("is_p"),
            s["line"].rlike(_java(*PAIN_HINT)).alias("pain"),
        ),
    )
    hits = F.flatten(F.transform(flagged, _line_hit_arrays))
    out = _fold_hits(hits)
    # whole-document digit pre-gate on the RAW column (digit presence is
    # invariant under newline normalization, and HOF-bearing expressions
    # are interpreted — no common-subexpression elimination — so gating
    # on _norm(text) would re-run the full-copy regexp_replace just for
    # the test): a digit-free document short-circuits after ONE scan
    return F.when(
        _col(text).isNotNull() & _col(text).rlike(r"\d"), out
    ).otherwise(F.array().cast(f"array<{READING_TYPE}>"))


# --------------------------------------------------------------------------
# K2 numbers fast path
# --------------------------------------------------------------------------

def extract_numbers_fast(
    text: Column | str, confidence: Column | float
) -> Column:
    """array<struct<value,unit,confidence,raw_text>> — all-JVM fast path
    of ``functions.numbers.extract_numbers``. Same semantics: whole-text
    matching after newline normalization, NO dedup, blood-pressure
    matches emit two spans (systolic, diastolic), emission order =
    category order → pattern order → match position."""
    t = _norm(_col(text))
    # NULL confidence coerces to 0.0, matching the byte-identical
    # kernel's `float(c) if c is not None else 0.0` (numbers.py)
    ccol = (
        F.lit(float(confidence))
        if isinstance(confidence, (int, float))
        else F.coalesce(confidence.cast("double"), F.lit(0.0))
    )
    arrays = []
    for cat, pats in NUMBER_PATTERNS.items():
        for pat in pats:
            jp = _java(pat)
            # one whole-text scan; groups recovered from the matched
            # substring (see the readings fast path for why this is safe)
            m0 = F.regexp_extract_all(t, F.lit(jp), 0)
            if cat == "blood_pressure":

                def _mk_bp_factory(c: Column, jp: str):
                    def mk_bp(m):
                        def span(g):
                            return F.struct(
                                F.regexp_extract(m, jp, g)
                                .cast("double")
                                .alias("value"),
                                F.lit("mmHg").alias("unit"),
                                c.alias("confidence"),
                                m.alias("raw_text"),
                            )

                        return F.array(span(1), span(2))

                    return mk_bp

                arrays.append(F.flatten(F.transform(m0, _mk_bp_factory(ccol, jp))))
            else:

                def _mk_factory(cat: str, c: Column, jp: str):
                    def mk(raw):
                        if cat == "temperature":
                            unit = F.when(
                                F.upper(raw).contains("F"), F.lit("°F")
                            ).otherwise(F.lit("°C"))
                        elif cat == "weight":
                            unit = F.when(
                                F.lower(raw).contains("lbs"), F.lit("lbs")
                            ).otherwise(F.lit("kg"))
                        elif cat == "oxygen":
                            unit = F.lit("%")
                        elif cat == "heart_rate":
                            unit = F.lit("BPM")
                        else:
                            unit = F.lit(None).cast("string")
                        return F.struct(
                            F.regexp_extract(raw, jp, 1).cast("double").alias("value"),
                            unit.alias("unit"),
                            c.alias("confidence"),
                            raw.alias("raw_text"),
                        )

                    return mk

                arrays.append(F.transform(m0, _mk_factory(cat, ccol, jp)))
    out = F.concat(*arrays)
    # digit-free documents short-circuit (semantics-preserving: every
    # pattern requires a digit), and null text yields the empty array;
    # the gate scans the RAW column so the normalization copy is never
    # made for digit-free docs (no CSE in interpreted HOF expressions)
    return F.when(
        _col(text).isNotNull() & _col(text).rlike(r"\d"), out
    ).otherwise(F.array().cast(_NUM_TYPE))


# --------------------------------------------------------------------------
# K9 intended semantics: extract_weight (reference pattern_matcher.py:
# 328-348). The reference implementation crashes on every match
# (``match.group(2)`` with 1-group patterns → IndexError), so there is no
# byte-identical behavior to preserve; this implements the INTENDED
# semantics — whole-text scan of the weight patterns with a document-
# global raw-text dedup set — natively. Deliberately NOT byte-compatible
# with the broken reference (COVERAGE.md K9).
# --------------------------------------------------------------------------

_WEIGHT_UNIT_RX = r"(?i)(lbs?|pounds?|lb\.|kg|kilos?|kilograms?)"


def extract_weight_spans(
    text: Column | str, confidence: Column | float
) -> Column:
    """array<struct<value,unit,raw_text,conf>> of weight spans: pattern
    order → match order, first occurrence of each raw_text wins (the
    ``seen_raw_texts`` set of the reference), value = group(1), unit =
    the lowercased unit token of the match (what the reference's
    ``match.group(2)`` intended to capture)."""
    t = _norm(_col(text))
    ccol = (
        F.lit(float(confidence))
        if isinstance(confidence, (int, float))
        else confidence.cast("double")
    )
    span_t = "array<struct<value:double,unit:string,raw_text:string,conf:double>>"
    arrays = []
    for pat, flags in READING_PATTERNS["WEIGHT"]:
        jp = _java(pat, flags)
        m0 = F.regexp_extract_all(t, F.lit(jp), 0)

        def _mk_factory(c: Column, jp: str):
            def mk(m):
                return F.struct(
                    F.regexp_extract(m, jp, 1).cast("double").alias("value"),
                    F.lower(
                        F.regexp_extract(m, _WEIGHT_UNIT_RX, 1)
                    ).alias("unit"),
                    m.alias("raw_text"),
                    c.alias("conf"),
                )

            return mk

        arrays.append(F.transform(m0, _mk_factory(ccol, jp)))
    spans = F.concat(*arrays)

    acc0 = F.struct(
        F.array().cast(span_t).alias("out"),
        F.array().cast("array<string>").alias("seen"),
    )

    def merge(acc, sp):
        dup = F.array_contains(acc["seen"], sp["raw_text"])
        return F.struct(
            F.when(dup, acc["out"]).otherwise(F.array_append(acc["out"], sp)).alias(
                "out"
            ),
            F.when(dup, acc["seen"])
            .otherwise(F.array_append(acc["seen"], sp["raw_text"]))
            .alias("seen"),
        )

    out = F.aggregate(spans, acc0, merge, lambda acc: acc["out"])
    return F.when(_col(text).isNotNull(), out).otherwise(F.array().cast(span_t))
