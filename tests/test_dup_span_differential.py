"""Differential battery for the dup-span family (Lee et al. window dedup).

``dup_span_stats`` and ``dup_span_removal`` are the trickiest corpus ops
in the repo (corpus-wide window digests, struct-min first-occurrence,
gaps-and-islands arithmetic, array reassembly). Their sf0.01/sf0.1
oracles pin them on the synthetic tables; this battery pins the exact
documented semantics on an ADVERSARIAL corpus — empty/whitespace docs,
sub-k docs, verbatim and case-folded cross-doc duplicates, heavy
self-repetition, messy separators, a triplicated long doc, and 30
seeded-random short docs over a 6-token vocabulary (dense gram
collisions) — against an independent pure-Python reference that
implements the docstring contract directly (gram strings as keys, no
hashing; md5 collisions are impossible at this scale so digest
equality IS string equality).

One Spark job per op: the whole battery is a single DataFrame.
"""

import random

import pytest
from pyspark.sql import types as T

from narowi_ocr_spark.operators.corpus import (
    DUPF_SCALE,
    dup_span_removal,
    dup_span_stats,
)

K = 4


def _battery():
    rng = random.Random(0xC0FFEE)
    docs = []

    def add(text):
        docs.append((len(docs), text))

    add("")  # empty
    add("   ")  # whitespace-only
    add("one two three")  # < k tokens
    add("a b c d")  # exactly k tokens
    add("a b c d")  # verbatim cross-doc duplicate
    add("A B C D")  # case-folded duplicate
    add(("x " * 30).strip())  # single-token self-repetition
    add("p q r s t p q r s t p q r s t")  # in-doc repeated phrase
    add("  multi   space\tsep a b c d  ")  # messy whitespace
    vocab = [f"t{i}" for i in range(6)]
    for _ in range(30):
        n = rng.randint(0, 24)
        add(" ".join(rng.choice(vocab) for _ in range(n)))
    long_doc = " ".join(rng.choice(vocab) for _ in range(60))
    add(long_doc)
    add(long_doc)
    add(long_doc)
    return docs


def _tokens(text):
    return text.split()


def _wins(docs, fold_tokens):
    """(gram-string, doc_id, pos) for every k-window; gram over
    case-folded tokens (both ops fold; they differ only in where)."""
    wins = []
    for did, text in docs:
        lw = [w.lower() for w in _tokens(text)] if fold_tokens else _tokens(text)
        for i in range(len(lw) - K + 1):
            wins.append((" ".join(lw[i : i + K]), did, i))
    return wins


def _ref_stats(docs):
    occ = {}
    for g, did, i in _wins(docs, fold_tokens=True):
        occ[g] = occ.get(g, 0) + 1
    per_doc = {}
    for g, did, i in _wins(docs, fold_tokens=True):
        if occ[g] >= 2:
            per_doc.setdefault(did, []).append(i)
    out = {}
    n_tok = {did: len(_tokens(text)) for did, text in docs}
    for did, ps in per_doc.items():
        ps.sort()
        diffs = [b - a for a, b in zip(ps, ps[1:])]
        n_spans = 1 + sum(1 for d in diffs if d > K)
        dup_tokens = K + sum(min(d, K) for d in diffs)
        scaled = (DUPF_SCALE * dup_tokens) // n_tok[did]
        out[did] = (
            n_tok[did],
            len(ps),
            n_spans,
            dup_tokens,
            scaled,
            scaled / float(DUPF_SCALE),
        )
    return out


def _ref_removal(docs):
    occ = {}
    for g, did, i in _wins(docs, fold_tokens=True):
        occ.setdefault(g, []).append((did, i))
    removable = {}
    for g, lst in occ.items():
        if len(lst) >= 2:
            first = min(lst)
            for did, i in lst:
                if (did, i) != first:
                    removable.setdefault(did, set()).add(i)
    out = {}
    for did, text in docs:
        ws = _tokens(text)
        removed = set()
        for p in removable.get(did, ()):
            removed.update(range(p, p + K))
        kept = [w for j, w in enumerate(ws) if j not in removed]
        out[did] = (len(ws), len(removed), " ".join(kept))
    return out


@pytest.fixture(scope="module")
def battery_df(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return spark.createDataFrame(_battery(), schema).repartition(4)


def test_dup_span_stats_matches_python_reference(battery_df):
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_dup_windows"],
            r["n_spans"],
            r["dup_tokens"],
            r["dup_frac_scaled"],
            r["dup_frac"],
        )
        for r in dup_span_stats(battery_df, k=K).collect()
    }
    assert got == _ref_stats(_battery())


def test_dup_span_removal_matches_python_reference(battery_df):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_dedup"])
        for r in dup_span_removal(battery_df, k=K).collect()
    }
    ref = _ref_removal(_battery())
    assert set(got) == set(ref)  # left join: every doc present
    assert got == ref


def test_removal_consistent_with_stats(battery_df):
    """Cross-op invariant: every doc the stats op reports as containing
    duplicated windows must lose tokens in the removal pass UNLESS all
    its duplicated windows are corpus-wide first occurrences (removal
    keeps one canonical copy; stats counts both sides)."""
    stats = {
        r["doc_id"]: r["dup_tokens"]
        for r in dup_span_stats(battery_df, k=K).collect()
    }
    removal = {
        r["doc_id"]: r["n_removed"]
        for r in dup_span_removal(battery_df, k=K).collect()
    }
    ref_rem = _ref_removal(_battery())
    for did, dup_tokens in stats.items():
        assert removal[did] <= dup_tokens
        assert removal[did] == ref_rem[did][1]
    # and no doc outside the stats set loses anything
    for did, n_removed in removal.items():
        if did not in stats:
            assert n_removed == 0
