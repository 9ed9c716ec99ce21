"""Unicode-script profiling and script-gated language identification.

Upgrades the 3-language stopword `lang_id` (textstats.py) the way a real
web-scale pipeline does it: first bucket each document by its dominant
Unicode script (pure per-character counting — cheap, language-agnostic,
and decisive for the non-Latin half of the web), then run a stopword
vote only among the languages that actually use that script.

Everything here is a native Catalyst expression — no UDFs, whole-stage
codegen end to end — and every regex uses LITERAL BMP characters in its
character classes so the identical pattern string means the identical
thing to Java regex (Spark) and RE2 (the DuckDB oracle).

Scale notes (100 TB): per-document cost is O(n_chars) regex scans with
no shuffle; the operator composes into the same narrow scoring stage as
quality/token stats, so adding it to a curation pipeline costs zero
extra exchanges. Lexicons are deliberately ~10 words/language: the
point is the dispatch architecture; swapping in full stopword tables is
a constants change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: earlier scripts win count ties. Character-class bodies use
# literal characters (written via \u escapes in the SOURCE, so the
# compiled pattern contains the chars themselves, not backslash-u text).
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "hebrew": "֐-׿",
    "devanagari": "ऀ-ॿ",
    "hangul": "ᄀ-ᇿ가-힣",
    "kana": "぀-ヿ",
    "han": "一-鿿",
}

# Latin-script languages voted by case-folded distinct-token stopword
# hits; ties break in dict order. Tiny public common-word lists.
LATIN_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "los", "las", "de", "que", "y", "en", "un", "por", "no"],
    "it": ["il", "di", "che", "non", "per", "con", "una", "sono", "della", "come"],
    "pt": ["o", "os", "um", "uma", "não", "com", "para", "mais", "dos", "como"],
    "nl": ["de", "het", "een", "van", "niet", "met", "voor", "dat", "zijn", "ook"],
}

CYRILLIC_STOPWORDS: dict[str, list[str]] = {
    "ru": ["и", "в", "не", "на", "что",
           "с", "это", "как", "по", "но"],
    "uk": ["і", "в", "не", "на", "що",
           "з", "це", "як", "по", "але"],
}

# Single-language scripts: dominant script decides outright.
_SCRIPT_TO_LANG = {
    "greek": "el",
    "arabic": "ar",
    "hebrew": "he",
    "devanagari": "hi",
    "hangul": "ko",
}


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def script_char_count(text: Column | str, script: str) -> Column:
    """Number of characters of ``text`` in the script's Unicode ranges,
    as length-minus-length-after-strip (one regex scan, no arrays)."""
    t = _col(text)
    pat = f"[{SCRIPT_RANGES[script]}]"
    return (F.length(t) - F.length(F.regexp_replace(t, pat, ""))).alias(
        f"n_{script}"
    )


def dominant_script(counts: dict[str, Column]) -> Column:
    """Argmax over per-script counts; ties break in SCRIPT_RANGES order;
    all-zero → 'none'."""
    best = F.greatest(*counts.values())
    expr: Column = F.lit("none")
    for name in reversed(list(SCRIPT_RANGES)):
        expr = F.when(counts[name] == best, F.lit(name)).otherwise(expr)
    return F.when(best == 0, F.lit("none")).otherwise(expr)


def with_script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add one ``n_<script>`` int column per script plus ``script``
    (dominant). Counts are staged in a projection so the dominant-script
    argmax reuses them instead of re-scanning the text per reference."""
    t = F.col(text_col)
    for name in SCRIPT_RANGES:
        df = df.withColumn(f"n_{name}", script_char_count(t, name))
    counts = {name: F.col(f"n_{name}") for name in SCRIPT_RANGES}
    return df.withColumn("script", dominant_script(counts))


def _vote(df: DataFrame, toks_col: str, lexicons: dict[str, list[str]]) -> Column:
    """Stopword vote among ``lexicons`` over a staged distinct-token
    array column; ties break in dict order; zero hits → 'und'."""
    hits = {
        lg: F.size(
            F.array_intersect(F.col(toks_col), F.array(*[F.lit(w) for w in ws]))
        )
        for lg, ws in lexicons.items()
    }
    best = F.greatest(*hits.values())
    expr: Column = F.lit("und")
    for lg in reversed(list(lexicons)):
        expr = F.when(hits[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def with_lang_id_v2(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``lang_pred2``: script-gated language ID.

    Dispatch (deterministic, documented order):
      1. any kana → 'ja' (kana is unique to Japanese; han alone is not);
      2. no letters in any known script → 'und';
      3. dominant script greek/arabic/hebrew/devanagari/hangul → that
         script's single language;
      4. dominant han (no kana by rule 1) → 'zh';
      5. dominant cyrillic → stopword vote among {ru, uk}, zero → 'und';
      6. dominant latin → stopword vote among 7 Latin-script languages,
         zero hits → 'und'.
    """
    df = with_script_profile(df, text_col)
    toks = F.array_distinct(
        F.when(
            F.length(F.regexp_replace(F.lower(F.col(text_col)), r"^\s+|\s+$", ""))
            == 0,
            F.array().cast("array<string>"),
        ).otherwise(
            F.split(
                F.regexp_replace(F.lower(F.col(text_col)), r"^\s+|\s+$", ""),
                r"\s+",
            )
        )
    )
    df = df.withColumn("_dtoks2", toks)
    latin_vote = _vote(df, "_dtoks2", LATIN_STOPWORDS)
    cyr_vote = _vote(df, "_dtoks2", CYRILLIC_STOPWORDS)
    script = F.col("script")
    expr = (
        F.when(F.col("n_kana") > 0, F.lit("ja"))
        .when(script == "none", F.lit("und"))
        .when(script == "han", F.lit("zh"))
        .when(script == "cyrillic", cyr_vote)
        .when(script == "latin", latin_vote)
    )
    for sc, lg in _SCRIPT_TO_LANG.items():
        expr = expr.when(script == sc, F.lit(lg))
    return df.withColumn("lang_pred2", expr.otherwise(F.lit("und"))).drop("_dtoks2")
