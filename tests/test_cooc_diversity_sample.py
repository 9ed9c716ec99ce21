"""Unit tests for windowed co-occurrence/PMI, weighted Poisson
sampling with HT reweights, and Gini-Simpson lexical diversity,
against hand-computed pure-Python references."""

import hashlib
from collections import Counter

from pyspark.sql import Row
from pyspark.sql import functions as F

from narowi_ocr_spark.operators.corpus import (
    PMI_SCALE,
    WS_HT_SCALE,
    WS_U_SPACE,
    cooccurrence_topk,
    lexical_diversity,
    weighted_sample,
)


def _py_pairs(texts, window):
    """Reference directed skip-gram pair counts + unigram counts."""
    uni, pairs = Counter(), Counter()
    for t in texts:
        w = t.lower().split()
        uni.update(w)
        for i in range(len(w)):
            for j in range(i + 1, min(i + window, len(w) - 1) + 1):
                pairs[(w[i], w[j])] += 1
    return uni, pairs


def test_cooccurrence_counts_and_lift(spark):
    texts = [
        "a b c a b",
        "b a a",
        "c",          # single word: no pairs, one unigram
        "",           # empty: nothing
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        (r.a, r.b): (r.pair_count, r.lift_scaled, r.rank)
        for r in cooccurrence_topk(df, k=100, window=2).collect()
    }
    uni, pairs = _py_pairs(texts, window=2)
    n_tok = sum(uni.values())
    n_pair = sum(pairs.values())
    assert set(got) == set(pairs)
    for (a, b), c_ab in pairs.items():
        lift = (
            (((PMI_SCALE * c_ab) // uni[a]) * n_tok) // n_pair
        ) * n_tok // uni[b]
        assert got[(a, b)][0] == c_ab, (a, b)
        assert got[(a, b)][1] == lift, (a, b)
    # ranks are 1..n in (count desc, a, b) order
    ranked = sorted(got.items(), key=lambda kv: kv[1][2])
    keys = [k for k, _ in ranked]
    expect = sorted(pairs, key=lambda ab: (-pairs[ab], ab[0], ab[1]))
    assert keys == expect


def test_cooccurrence_topk_truncates(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x y x y x y z")])
    out = cooccurrence_topk(df, k=2, window=2).collect()
    assert len(out) == 2
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2]


def _py_weighted(rows, expected, salt):
    sum_w = sum(w for _, w in rows if w > 0)
    kept = {}
    for i, w in rows:
        if w <= 0:
            continue
        u = int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16)
        thr = min(WS_U_SPACE, (expected * w * WS_U_SPACE) // sum_w)
        if u < thr:
            kept[i] = (w, u, thr, (WS_U_SPACE * WS_HT_SCALE) // thr)
    return kept


def test_weighted_sample_matches_reference_and_is_deterministic(spark):
    rows = [(i, (i * 37) % 900 + 1) for i in range(400)] + [(400, 0), (401, -5)]
    df = spark.createDataFrame([Row(doc_id=i, n_chars=w) for i, w in rows])
    got = {
        r.doc_id: (r.weight, r.sample_u, r.inc_scaled, r.ht_scaled)
        for r in weighted_sample(df, expected_rows=50, salt="t0").collect()
    }
    ref = _py_weighted(rows, expected=50, salt="t0")
    assert got == ref
    assert 400 not in got and 401 not in got  # non-positive weights never sample
    # expected-size calibration: within 3 sigma of 50 for this corpus
    assert 25 <= len(got) <= 75
    # deterministic under repartitioning
    again = {
        r.doc_id: (r.weight, r.sample_u, r.inc_scaled, r.ht_scaled)
        for r in weighted_sample(
            df.repartition(7), expected_rows=50, salt="t0"
        ).collect()
    }
    assert again == got


def test_weighted_sample_ht_unbiasedness_shape(spark):
    # a heavy row (weight >> sum/expected) is ALWAYS kept with p=1, ht=1
    df = spark.createDataFrame(
        [Row(doc_id=0, n_chars=10_000)] + [Row(doc_id=i, n_chars=1) for i in range(1, 5)]
    )
    out = {r.doc_id: r for r in weighted_sample(df, expected_rows=3, salt="x").collect()}
    assert out[0].inc_scaled == WS_U_SPACE
    assert out[0].ht_weight == 1.0


def test_lexical_diversity_reference(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a a a a"),          # pure repetition -> 0
            Row(doc_id=1, text="a b c d"),          # all distinct -> 1
            Row(doc_id=2, text="a a b b"),          # 1 - (2+2)/12 = 2/3
            Row(doc_id=3, text="solo"),             # n=1 -> NULL
            Row(doc_id=4, text="A a"),              # case-folded: same word -> 0
        ]
    )
    got = {r.doc_id: r for r in lexical_diversity(df).collect()}
    assert got[0].div_scaled == 0 and got[0].diversity == 0.0
    assert got[1].div_scaled == 1_000_000
    assert got[2].div_scaled == 666_666  # floor(1e6 * 8/12)
    assert got[3].div_scaled is None and got[3].diversity is None
    assert got[4].div_scaled == 0
    assert got[2].n_tokens == 4 and got[2].n_distinct == 2


def _py_dupfrac(texts, n):
    grams = {i: [" ".join(ws) for ws in zip(*[t.lower().split()[k:] for k in range(n)])]
             for i, t in enumerate(texts)}
    docs_of = {}
    for i, gs in grams.items():
        for g in set(gs):
            docs_of.setdefault(g, set()).add(i)
    out = {}
    for i, gs in grams.items():
        if not gs:
            continue
        dup = sum(1 for g in gs if len(docs_of[g]) >= 2)
        out[i] = (len(gs), dup, (1_000_000 * dup) // len(gs))
    return out


def test_corpus_dup_fraction_reference(spark):
    from narowi_ocr_spark.operators.corpus import corpus_dup_fraction

    texts = [
        "the cat sat on the mat today",     # shares "the cat sat" with doc 2
        "dogs bark loudly at night",        # unique
        "he said the cat sat on a rug",     # shares with doc 0
        "tiny",                             # < n tokens: absent
        "the cat sat the cat sat",          # internal repeat + cross-doc dup
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        r.doc_id: (r.n_grams, r.dup_grams, r.dup_frac_scaled)
        for r in corpus_dup_fraction(df, n=3).collect()
    }
    assert got == _py_dupfrac(texts, 3)
    assert 3 not in got


def test_incremental_near_dup_semantics(spark):
    from narowi_ocr_spark.operators.dedup import incremental_near_dup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    idx = spark.createDataFrame(
        [Row(doc_id=0, text=base), Row(doc_id=1, text="completely unrelated corpus entry about spark shuffles")]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=100, text=base + " extra tail"),       # near-dup of idx 0
            Row(doc_id=101, text="novel content nothing shares these words"),
            # two identical NEW docs: near-dups of each other but of nothing
            # indexed — must NOT appear (batch-internal dedup is a separate op)
            Row(doc_id=102, text="twin text unique to the new batch right here"),
            Row(doc_id=103, text="twin text unique to the new batch right here"),
        ]
    )
    got = incremental_near_dup(new, idx, threshold=0.5).collect()
    pairs = {(r.new_id, r.index_id) for r in got}
    assert (100, 0) in pairs
    assert all(n == 100 for n, _ in pairs), pairs  # 101/102/103 novel vs index


def test_ann_recall_bounds_and_self_agreement(spark):
    from narowi_ocr_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
    )

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = vecs.where(F.col("vec_id") < 4)
    # exact-vs-exact recall is 1.0 for every query by construction
    self_r = ann_recall(vecs, qs, k=3, approx=brute_force_topk).collect()
    assert len(self_r) == 4
    assert all(r.recall == 1.0 and r.n_found == r.n_exact == 3 for r in self_r)
    # bucketed recall is bounded in [0, 1] and n_found <= n_exact
    buck = ann_recall(vecs, qs, k=3).collect()
    assert all(0.0 <= r.recall <= 1.0 and r.n_found <= r.n_exact for r in buck)
