"""Text-analysis column functions for large-scale training-data pipelines:
language ID (stopword-hit heuristic), quality scoring, token counting, and
document fingerprinting.

All fully native Catalyst expressions — zero Python at runtime, SQL-
expressible (each has a DuckDB oracle in __spark_entry__.py), and they stay
inside whole-stage codegen at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword inventories. Deliberately small: the point is
# the distributed pattern (pure column exprs, no UDF), not lexical coverage.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
}


def words(text: Column | str) -> Column:
    """Whitespace tokens; empty input → empty array (not [''])."""
    t = F.col(text) if isinstance(text, str) else text
    trimmed = F.regexp_replace(t, r"^\s+|\s+$", "")
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    """Whitespace token count (int)."""
    return F.size(words(text))


def subword_token_estimate(text: Column | str) -> Column:
    """BPE-ish token-count estimate: runs of letters, runs of digits, and
    single punctuation marks each count as one token."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Count of tokens (case-folded, deduplicated) found in the language's
    stopword list. array_intersect is set-semantics — adequate for scoring
    and identical in the DuckDB oracle (list_intersect)."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.array_distinct(words(F.lower(t)))
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def lang_id(text: Column | str) -> Column:
    """Best-scoring language among {en, de, fr} by stopword hits;
    ties break in en→de→fr order; zero hits → 'und' (undetermined)."""
    hits = {lg: stopword_hits(text, lg) for lg in STOPWORDS}
    best = F.greatest(*hits.values())
    expr: Column = F.lit("und")
    for lg in reversed(list(STOPWORDS)):  # earlier langs win ties
        expr = F.when(hits[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic:
    0.4·stopword-ratio + 0.3·alpha-char-ratio + 0.3·capped length factor.
    Rounded to 4 decimals so Spark and the DuckDB oracle hash-match."""
    t = F.col(text) if isinstance(text, str) else text
    n_words = token_count(t).cast("double")
    n_chars = F.length(t).cast("double")
    alpha_chars = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
    stops = stopword_hits(t, "en").cast("double")
    safe_words = F.greatest(n_words, F.lit(1.0))
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    score = (
        0.4 * F.least(stops / safe_words, F.lit(1.0))
        + 0.3 * (alpha_chars / safe_chars)
        + 0.3 * F.least(n_words / F.lit(100.0), F.lit(1.0))
    )
    # floor(x·10⁴ + 0.5)/10⁴ instead of F.round: Spark rounds the
    # SHORTEST DECIMAL REPR half-up (BigDecimal) while other engines
    # round the raw binary double, so x.xxxx5 boundaries diverge; the
    # floor form is pure IEEE arithmetic — bit-identical everywhere
    # given the same double input (5 of 5000 sf0.1 docs hit a boundary).
    return F.floor(score * 10000.0 + 0.5) / 10000.0


ROLL_BASE = 31
ROLL_MOD = 2147483647  # 2^31 - 1 (Mersenne prime)
ROLL_SEED = 7


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash (Rabin-Karp family) of the whole document:
    h = fold(seed, codepoints, (acc, c) -> (acc·31 + c) mod 2³¹−1).
    Unlike the md5 ``fingerprint`` this is incrementally updatable — the
    building block for content-defined chunking / shift-resistant
    near-dup detection. Native aggregate HOF: narrow, codegen-adjacent,
    and bit-identical in the DuckDB oracle (list_reduce)."""
    t = F.col(text) if isinstance(text, str) else text
    codes = F.transform(
        F.filter(F.split(t, ""), lambda c: F.length(c) > 0),
        lambda c: F.ascii(c).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(ROLL_SEED).cast("long"),
        lambda acc, c: (acc * ROLL_BASE + c) % ROLL_MOD,
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint (md5 hex) for exact-dup grouping;
    identical function exists in the DuckDB oracle."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(t.cast("binary"))
