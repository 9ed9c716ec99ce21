"""Deduplication operators for large-scale corpus curation: exact
(hash-groupBy), MinHash + LSH banding (Broder, "On the resemblance and
containment of documents", 1997; banding per Leskovec/Rajaraman/Ullman,
Mining of Massive Datasets ch. 3), SimHash (Charikar, "Similarity
estimation techniques from rounding algorithms", STOC 2002; the
Hamming-band blocking follows Manku/Jain/Sarma, "Detecting
near-duplicates for web crawling", WWW 2007), and n-gram Jaccard
verification.

All of these are pure Catalyst expression trees — no Python executes at
runtime, every hash is derived from ``md5`` so the DuckDB oracles in
``__spark_entry__.py`` can reproduce values bit-for-bit (production-scale
users can switch the hash family to ``xxhash64`` for ~3× cheaper hashing;
the dataflow shape is identical).

Scale notes (the part that matters at 100 TB):
  - exact dedup is one shuffle on a 32-byte digest — the payload column is
    dropped before the shuffle and re-joined only if needed;
  - MinHash signatures are computed per row with higher-order array
    functions (narrow, no shuffle); only the tiny (doc_id, band_idx, band
    hash) triples shuffle for the LSH bucket join — never text;
  - candidate pairs come from an equi-join on (band_idx, band_hash), which
    AQE splits if a degenerate bucket (all-identical docs) skews;
  - Jaccard verification joins shingle ARRAYS only for candidate pairs —
    a tiny fraction of the corpus — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from narowi_ocr_spark.functions.native import round4
from narowi_ocr_spark.functions.textstats import fingerprint, words

# MinHash geometry: NUM_PERM permutations folded into NUM_BANDS bands of
# ROWS_PER_BAND rows (b·r = NUM_PERM). With b=8, r=2 the LSH S-curve has
# its 50% capture threshold at (1/b)^(1/r) ≈ 0.35 Jaccard. This is the
# DEV/ORACLE geometry — small enough that the DuckDB oracle re-derives
# every hash, loose enough to exercise the verify stage.
NUM_PERM = 16
ROWS_PER_BAND = 2
NUM_BANDS = NUM_PERM // ROWS_PER_BAND

# PRODUCTION geometry (pass to with_minhash_bands/minhash_signature):
# 128 permutations in 16 bands of 8 rows → 50% capture threshold
# (1/16)^(1/8) ≈ 0.71 Jaccard with a much steeper S-curve — near-dups
# above ~0.8 are captured w.p. >0.97 while ~0.5-similar pairs are almost
# never candidates, which is what keeps the candidate join sparse at
# 10⁹+ docs. Same dataflow, same digest-sharing (4 perms/md5 → 32 md5
# per shingle); benched as `minhash_prod` in bench.py.
PROD_NUM_PERM = 128
PROD_ROWS_PER_BAND = 8
PROD_NUM_BANDS = PROD_NUM_PERM // PROD_ROWS_PER_BAND

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 4×16-bit blocking keys: pigeonhole covers hamming ≤ 3


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ------------------------------------------------------------- shingling

def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (lowercased), the MinHash input set.
    Empty/short docs yield a single shingle of the whole text so every
    document has a non-empty set (stable signatures). The word array is
    bound once per row (``bind_once``) — slicing the raw split inside
    the lambda would re-tokenize per shingle, O(len²) per document."""
    from narowi_ocr_spark.functions.native import bind_once

    def _sh(w: Column) -> Column:
        k = F.size(w)
        grams = F.transform(
            F.sequence(F.lit(1), k - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        )
        return F.when(k >= n, F.array_distinct(grams)).otherwise(
            F.array(F.array_join(w, " "))
        )

    return bind_once(words(F.lower(_col(text))), _sh)


# ----------------------------------------------------------- exact dedup

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the minimum-id representative of every exact-content group.
    One shuffle on the 32-byte md5 digest; text never shuffles."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def build_fingerprint_index(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct content fingerprints of a corpus — the persistent state
    an INCREMENTAL pipeline carries between runs (write it partitioned/
    bucketed by ``fp`` so the next run's anti-join co-locates)."""
    return df.select(fingerprint(text_col).alias("fp")).distinct()


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: from a batch of incoming documents, keep
    only those whose content fingerprint is NOT already in the corpus
    index — the crawl-refresh pattern (each run processes only genuinely
    new content, then unions its survivors' fingerprints into the index).

    Two-level dedup: first within the batch (min-id representative per
    fingerprint, exactly like ``exact_dedup``), then a left-anti join
    against the index. Scale shape: only (id, fp) pairs shuffle — text
    stays behind until the final id-join pullback; the anti-join
    partitions on the 32-byte digest, and with the index stored bucketed
    by fp it degenerates to a co-located sort-merge anti-join with no
    exchange on the index side."""
    fps = new_docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    batch_reps = fps.groupBy("fp").agg(F.min(id_col).alias(id_col))
    fresh = batch_reps.join(index, "fp", "left_anti")
    return fresh.join(new_docs, id_col).select(
        id_col, "fp", *[c for c in new_docs.columns if c != id_col]
    )


# --------------------------------------------------------------- MinHash

def minhash_signature(text: Column | str, num_perm: int = NUM_PERM) -> Column:
    """array<string> of ``num_perm`` MinHash values: permutation *p* is the
    lexicographic min of ``md5('<p>:' || shingle)`` over the shingle set.
    Pure higher-order expressions — narrow, shuffle-free, oracle-exact.

    NOTE: when chaining further operators over the signature, go through
    ``with_minhash_bands`` — it inserts projection boundaries so Catalyst
    does not re-inline this (expensive) expression once per downstream
    reference (CollapseProject keeps multi-referenced non-cheap
    projections separate)."""
    sh = shingles(text)
    return _signature_from_shingles(sh, num_perm)


# Permutation p draws its value from md5 call group p//4: one 128-bit md5
# digest yields FOUR independent 32-bit (8-hex-char) permutation values.
# 4× fewer hash invocations than one-md5-per-permutation — at 100 TB the
# hash kernel IS the dedup cost, so this is the knob that matters.
PERMS_PER_DIGEST = 4


def _perm_hash(p: int):
    # NB: a closure, NOT a default-arg lambda — ``lambda s, p=p`` would be
    # seen by PySpark as a binary (element, index) lambda and p would be
    # bound to the array index column.
    prefix = f"{p // PERMS_PER_DIGEST}:"
    start = (p % PERMS_PER_DIGEST) * 8 + 1
    return lambda s: F.substring(
        F.md5(F.concat(F.lit(prefix), s)), start, 8
    )


def _signature_from_shingles(sh: Column, num_perm: int = NUM_PERM) -> Column:
    return F.array(
        *[F.array_min(F.transform(sh, _perm_hash(p))) for p in range(num_perm)]
    )


def with_minhash_bands(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = NUM_PERM, rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """(id, band_idx, band_hash) rows via the explode → hash → partial-agg
    dataflow:

        explode(shingles)                 narrow, 1→|shingles| rows
        → md5 per permutation            16 codegen'd JVM hashes per row
        → groupBy(id).agg(min ×16)       ONE shuffle; map-side combine
                                          reduces to ≤1 row per doc per
                                          input partition before it
        → band digests + posexplode      narrow

    This deliberately avoids the all-in-one higher-order-function
    expression (array_min∘transform per permutation): HOF lambdas don't
    participate in whole-stage codegen and Catalyst's CollapseProject
    re-inlines the signature array into each of its 16 downstream
    element_at references — measured >100× slower on sf0.01. The shuffle
    here moves only (id, 16×32-hex) rows — never text."""
    sh_rows = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col)).alias("s")
    )
    n_digests = (num_perm + PERMS_PER_DIGEST - 1) // PERMS_PER_DIGEST
    digests = sh_rows.select(
        "id",
        *[
            F.md5(F.concat(F.lit(f"{g}:"), F.col("s"))).alias(f"m{g}")
            for g in range(n_digests)
        ],
    )
    # per-permutation value = 8 hex chars of the digest, min'd AS A
    # STRING. This plans a SortAggregate (min over var-length strings
    # has no UnsafeRow-mutable buffer) — a DELIBERATE exception to the
    # hash-aggregable-keys discipline: the alternative (parse each
    # slice to a long via conv() so the agg hashes, reconstruct hex
    # after — tried in r4) paid a 128×-per-shingle-row parse tax that
    # exceeded what the sort costs, measured interleaved-A/B on the
    # same session at sf0.1×128 perms: string/sort-agg median 1.71 s
    # vs conv/hash-agg 2.29 s (+35%). The sort is per-partition over
    # fixed-width 8-char keys with map-side combine — O(n log n) with
    # a small constant and spill support, not a scale cliff. The
    # AT-SCALE kernel is ``with_minhash_bands_fast`` below: xxhash64
    # longs min natively in a HashAggregate with no parse step at all;
    # this md5 variant exists for DuckDB-reproducible byte identity.
    hashed = digests.select(
        "id",
        *[
            F.substring(
                F.col(f"m{p // PERMS_PER_DIGEST}"),
                (p % PERMS_PER_DIGEST) * 8 + 1,
                8,
            ).alias(f"h{p}")
            for p in range(num_perm)
        ],
    )
    sig = hashed.groupBy("id").agg(
        *[F.min(f"h{p}").alias(f"h{p}") for p in range(num_perm)]
    )
    num_bands = num_perm // rows_per_band
    bands = sig.select(
        "id",
        F.array(
            *[
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"h{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                )
                for b in range(num_bands)
            ]
        ).alias("bands"),
    )
    return bands.select("id", F.posexplode("bands").alias("band_idx", "band_hash"))


def with_minhash_bands_fast(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = PROD_NUM_PERM, rows_per_band: int = PROD_ROWS_PER_BAND,
) -> DataFrame:
    """(id, band_idx, band_hash) via xxhash64 permutations — the
    production HOT-KERNEL variant of ``with_minhash_bands``. Same
    dataflow (explode → per-permutation hash → groupBy-min → band
    digests), but permutation *p* is ``xxhash64(p, shingle)`` — a
    codegen'd JVM long with zero string allocation — instead of an
    md5-hex substring, and the band digest is one more xxhash64 over
    the band's longs (8+8-byte shuffle keys vs 32-hex strings).
    Measured ~10× on a shingle-heavy corpus (20k docs × ~300 words:
    the md5 signature pass alone took ~170 s at local[8]; the whole
    xxhash64 release composition runs in 67 s) and 1.8× on the small
    sf0.1 bench corpus where scan/shuffle fixed costs dominate — the
    gap grows with shingle volume, and at 100 TB the hash kernel IS
    the dedup cost.

    The md5 variant stays for engine-portable oracle parity (DuckDB
    has no xxhash64); both are MinHash over the same shingle sets, so
    they are statistically interchangeable — capture/recall behavior
    is pinned by tests, not by byte equality."""
    sh_rows = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col)).alias("s")
    )
    hashed = sh_rows.select(
        "id",
        *[
            F.xxhash64(F.lit(p), F.col("s")).alias(f"h{p}")
            for p in range(num_perm)
        ],
    )
    sig = hashed.groupBy("id").agg(
        *[F.min(f"h{p}").alias(f"h{p}") for p in range(num_perm)]
    )
    num_bands = num_perm // rows_per_band
    bands = sig.select(
        "id",
        F.array(
            *[
                F.xxhash64(
                    *[
                        F.col(f"h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ]
                )
                for b in range(num_bands)
            ]
        ).alias("bands"),
    )
    return bands.select(
        "id", F.posexplode("bands").alias("band_idx", "band_hash")
    )


def band_hashes(signature: Column | str, num_bands: int = NUM_BANDS,
                rows_per_band: int = ROWS_PER_BAND) -> Column:
    """Fold the signature into ``num_bands`` band digests
    (md5 of the concatenated band rows)."""
    sig = _col(signature)
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(sig, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(num_bands)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = NUM_PERM,
    rows_per_band: int = ROWS_PER_BAND,
    kernel: str = "md5",
) -> DataFrame:
    """Distinct candidate near-duplicate pairs (id_a < id_b) that share at
    least one MinHash band bucket.

    Dataflow: per-row signatures (narrow) → explode to (id, band_idx,
    band_hash) triples → self-equi-join on the band key. Only ~48 bytes
    per (doc, band) cross the shuffle. A pathological bucket (the same
    boilerplate on millions of urls) is exactly the skew AQE's skew-join
    splitting handles; for known-degenerate corpora run exact_dedup first.

    ``num_perm``/``rows_per_band`` select the band geometry: the dev
    default (16/2, capture threshold ≈ 0.35 Jaccard) keeps oracle
    fixtures exercised; production compositions pass
    (PROD_NUM_PERM, PROD_ROWS_PER_BAND) = (128, 8), whose ≈0.71
    threshold keeps the candidate join sparse on real corpora.
    ``kernel="xxhash64"`` swaps in ``with_minhash_bands_fast`` (JVM
    long hashes — up to ~10× cheaper signatures on shingle-heavy
    corpora, long join keys; not DuckDB-reproducible, so dev oracles
    stay on md5).
    """
    mk = with_minhash_bands_fast if kernel == "xxhash64" else with_minhash_bands
    bands = mk(
        df, text_col, id_col, num_perm=num_perm, rows_per_band=rows_per_band
    )
    # Explicit exchange on the join keys: both self-join sides share ONE
    # identical Exchange subtree, so ReuseExchange materializes the
    # signature dataflow (shingle explode → 16 hashes → min-agg) once
    # instead of once per side. Shuffled rows stay (id, band_idx,
    # band_hash) — ~48 bytes. (The DISTINCT stays, unlike
    # simhash_near_pairs' first-band trick: deduping by first matching
    # band would require carrying every band digest on both sides —
    # ~264 bytes/row, 5× the shuffle — and band digests must stay full
    # md5 strings because 64-bit truncation collides at 10⁹-doc scale.)
    bands = bands.repartition(F.col("band_idx"), F.col("band_hash"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs; keeps pairs ≥ threshold.
    Joined only to the candidate pairs, never all-pairs — and the
    shingle arrays are projected AFTER each join, so only docs that
    appear in a candidate pair ever pay the shingle computation (on a
    release corpus the non-candidate majority is nearly everything),
    and what moves through the join is the raw text, several times
    smaller than its n-gram array."""
    txt = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_t")
    )
    j = (
        pairs.join(txt, pairs.id_a == txt.id)
        .select("id_a", "id_b", shingles("_t").alias("sh_a"))
        .join(txt, F.col("id_b") == txt.id)
        .select("id_a", "id_b", "sh_a", shingles("_t").alias("sh_b"))
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        j.select(
            "id_a",
            "id_b",
            round4(inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------- SimHash

def _word_hash(t: Column) -> Column:
    """64 hex digits of bit votes per word: md5(w) ‖ md5('1:'+w).
    TWO md5 calls per word carry all 64 independent bit parities — still
    O(1) hash invocations per word, never one per (word, bit)."""
    return F.concat(F.md5(t), F.md5(F.concat(F.lit("1:"), t)))


def simhash(text: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """``bits``-bit SimHash over the distinct word set (long column).

    TWO md5 per word (see ``_word_hash``): bit *b* of word *w* is the
    parity of hex digit *b*+1 of the 64-digit concatenated digest
    (digit ≥ '8' → 1). The per-document bit is the sign of the ±1 vote
    sum — all computed with ``aggregate`` over the hashed-word array:
    narrow, shuffle-free, and byte-reproducible in the DuckDB oracle.

    For hot paths use ``with_simhash`` — it stages the hash-per-word
    projection so the tokenize+hash expression runs once per row, not
    re-inlined once per bit.
    """
    hw = F.transform(
        F.array_distinct(words(F.lower(_col(text)))), _word_hash
    )
    return _simhash_from_hashes(hw, bits)


def with_simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS
) -> DataFrame:
    """(id, h) via explode → ``bits`` conditional SUMs → hash aggregate.

    Value-identical to ``simhash()`` (same digest/digit-parity
    definition, same oracle), but executes entirely in whole-stage
    codegen: the narrow ``aggregate()``-fold variant evaluates its
    lambda per (word, bit) in Catalyst's INTERPRETED higher-order-
    function path, which measured ~1 ms/doc at sf0.1 — the hash
    aggregation here is ~6× faster warm and JIT-compiles in seconds
    instead of tens of seconds. Cost shape at scale: one exchange of
    (id, 64 longs) rows — map-side partial aggregation collapses each
    document's words before the shuffle (a document's exploded words
    stay in its input partition), so shuffle volume is ~0.5 KB/doc,
    independent of document length; text never moves.

    Vote extraction is numeric, not textual: each row's 64-hex-digit
    digest is parsed ONCE into eight 32-bit longs (``conv``), and bit
    *b*'s vote is a shift-and-mask off the right chunk — 8 string ops +
    64 ALU ops per word instead of 64 substring allocations (measured
    ~3.5× the whole-operator cost at sf0.1). Digit *b* (parity ≥ '8')
    is the msb of nibble 7−(b mod 8) of chunk b/8, so ``digit ≥ 8`` ≡
    ``(chunk >> (4·(7−b%8)+3)) & 1``. The ±1 vote sum over *n* words
    equals ``2·popcount_b − n``, so the sign test is ``2·Σbit_b > n``.

    ``explode_outer`` keeps zero-word documents (null digest row →
    null sums → every sign test false → h = 0, matching the fold
    variant)."""
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.array_distinct(words(F.lower(F.col(text_col))))
        ).alias("w"),
    ).select("id", _word_hash(F.col("w")).alias("hw"))
    chunks = [
        F.conv(F.substring("hw", 8 * k + 1, 8), 16, 10)
        .cast("long")
        .alias(f"c{k}")
        for k in range(8)
    ]
    ch = exploded.select("id", *chunks)
    aggs = [F.count(F.col("c0")).alias("nw")]
    for b in range(bits):
        k, j = divmod(b, 8)
        shift = 4 * (7 - j) + 3
        aggs.append(
            F.sum(
                F.shiftright(F.col(f"c{k}"), shift).bitwiseAND(F.lit(1))
            ).alias(f"s{b}")
        )
    sums = ch.groupBy("id").agg(*aggs)
    h = F.lit(0).cast("long")
    for b in range(bits):
        h = h + F.when(
            F.lit(2) * F.col(f"s{b}") > F.col("nw"), F.lit(_bit_value(b))
        ).otherwise(F.lit(0)).cast("long")
    return sums.select("id", h.alias("h"))


def _bit_value(b: int) -> int:
    """Signed-long value of bit ``b`` (bit 63 is the two's-complement
    sign bit, so its contribution is negative)."""
    return (1 << b) if b < 63 else -(1 << 63)


def with_simhash_arrow(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-kernel twin of ``with_simhash`` — value-identical (same
    tokenize → distinct → 2×md5 digest → nibble-msb votes → majority
    sign; asserted equal by tests/test_dedup_similarity.py incl. a
    unicode-edge differential), but ONE narrow mapInPandas projection:
    no explode, no shuffle, and none of the 64-aggregate codegen tree
    whose JIT dominated the JVM variant's wall time at small-to-medium
    scale (3.8–5.5 s run-to-run wobble at sf0.1, VERDICT r2 item 4).

    Kernel shape: per distinct word, the 64 hex digits of
    md5(w) ‖ md5('1:'+w) are one ``bytes.fromhex`` + ``unpackbits``;
    each digit's parity vote is the msb of its nibble = every 4th bit
    of the unpacked stream, so a word's 64 votes are one strided slice
    and a document's bit counts are one ``sum(axis=0)``. A per-worker
    word→votes memo collapses the Zipfian corpus vocabulary, so md5
    cost is ~O(|vocab|) per worker, not O(tokens). Word splitting uses
    the EXPLICIT Java-``\\s`` class ``[ \\t\\n\\x0b\\f\\r]+`` (the
    ``words()`` contract — Python ``\\s`` and ``str.split`` both
    disagree at the edges, see ``bpe_encode_udf``).

    Scale shape: embarrassingly parallel scan-side projection —
    (id, h) longs out, text never leaves the stage. At 100 TB this is
    strictly better than the JVM variant's exchange of (id, 64 longs)
    partial-agg rows; keep ``with_simhash`` where a Python-free
    executor matters more than wall time."""
    import re
    from collections.abc import Iterator as _Iter
    from hashlib import md5 as _md5

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    ws_re = re.compile(r"[ \t\n\x0b\f\r]+")

    def run(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        votes_memo: dict[str, np.ndarray] = {}

        def word_votes(w: str) -> np.ndarray:
            got = votes_memo.get(w)
            if got is None:
                b = w.encode("utf-8")
                digest = _md5(b).hexdigest() + _md5(b"1:" + b).hexdigest()
                got = votes_memo[w] = np.unpackbits(
                    np.frombuffer(bytes.fromhex(digest), dtype=np.uint8)
                )[::4].astype(np.int64)
            return got

        def doc_hash(t: str | None) -> int:
            if t is None:
                return 0
            toks = {w for w in ws_re.split(t.lower()) if w}
            n = len(toks)
            if n == 0:
                return 0
            counts = np.sum([word_votes(w) for w in toks], axis=0)
            h = 0
            for b in np.nonzero(2 * counts > n)[0]:
                h += _bit_value(int(b))
            return h

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "h": [doc_hash(t) for t in pdf[text_col]],
                }
            )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("h", T.LongType(), False),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def _simhash_from_hashes(hw: Column, bits: int = SIMHASH_BITS) -> Column:
    assert bits <= 64, "the concatenated digests carry 64 hex-digit votes"
    out = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(hw, F.lit(0), _vote_fn(b))
        out = out + F.when(vote > 0, F.lit(_bit_value(b))).otherwise(F.lit(0)).cast(
            "long"
        )
    return out


def _vote_fn(b: int):
    def vote(acc: Column, h: Column) -> Column:
        return acc + F.when(
            F.substring(h, b + 1, 1).isin(*"89abcdef"),
            F.lit(1),
        ).otherwise(F.lit(-1))

    return vote


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two long hash columns (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_band_key(h: Column, band: int) -> Column:
    """16-bit blocking key ``band`` of a 64-bit SimHash: bits
    [16·band, 16·band+16). The mask makes the arithmetic shift's
    sign-fill irrelevant."""
    shifted = F.shiftright(h, 16 * band) if band else h
    return shifted.bitwiseAND(F.lit(65535)).cast("long")


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, engine: str = "arrow",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Candidate generation
    uses the four 16-bit bands of the 64-bit hash as blocking keys: a
    pair within hamming ≤ 3 differs in at most 3 of the 4 bands, so by
    pigeonhole it agrees exactly on at least one band — the join is an
    equi-join on a small (band, key) pair, never a cross join. With
    2¹⁶ values per band the expected bucket occupancy stays tiny even at
    10⁹ docs (vs the 256-bucket 8-bit-half scheme this replaced, whose
    self-join degraded toward O(N²/256)).

    The d+1-band guarantee requires ``max_hamming`` ≤ 3; larger radii
    would need more/finer bands (recall would silently drop otherwise).

    ``engine``: 'arrow' (default — one-pass kernel, see
    ``with_simhash_arrow``; note the self-join evaluates the signature
    subtree twice, amortized by the per-worker vote memo) or 'jvm'
    (Python-free executors, ``with_simhash``). Both produce identical
    hashes, so identical pairs.
    """
    if max_hamming > SIMHASH_BANDS - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the {SIMHASH_BANDS}-band "
            f"pigeonhole guarantee (≤ {SIMHASH_BANDS - 1})"
        )
    sig = with_simhash_arrow if engine == "arrow" else with_simhash
    h = sig(df, text_col, id_col)
    halves = h.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("part"),
                        simhash_band_key(F.col("h"), i).alias("key"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("blk"),
    ).select("id", "h", "blk.part", "blk.key")
    # Explicit exchange on the join keys: both self-join sides then
    # share ONE identical Exchange subtree, so ReuseExchange
    # materializes the signature stage once — without it each side
    # (and each branch of a unioned input) re-runs the Arrow kernel.
    # The shuffled rows are (id, h, part, key) — 28 bytes/band-row,
    # never text.
    halves = halves.repartition(F.col("part"), F.col("key"))
    a, b = halves.alias("a"), halves.alias("b")
    # Each pair is emitted from its FIRST matching band only: band i
    # qualifies iff every earlier band's keys differ (computable from
    # the carried full hashes). This replaces the old post-join
    # DISTINCT — a shuffle of every (pair × matching-band) candidate
    # row, 4× the pair count for identical docs — with a residual
    # ALU predicate; the output pair set is identical.
    def _bands_differ(upto: int) -> Column:
        c = F.lit(True)
        for j in range(upto):
            c = c & (
                simhash_band_key(F.col("a.h"), j)
                != simhash_band_key(F.col("b.h"), j)
            )
        return c

    first_match = F.lit(False)
    for i in range(SIMHASH_BANDS):
        first_match = F.when(
            F.col("a.part") == i, _bands_differ(i)
        ).otherwise(first_match)
    return (
        a.join(
            b,
            (F.col("a.part") == F.col("b.part"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .where(first_match)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.h"), F.col("b.h")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def winnow_near_pairs(
    df: DataFrame,
    min_shared: int = 10,
    max_df: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MOSS-style near-duplicate pairs from winnowing fingerprints
    (Schleimer et al., SIGMOD'03 — the plagiarism-detection member of
    the dedup family; unlike MinHash's whole-document similarity, the
    winnow guarantee is per-SUBSTRING: any shared run ≥ k+w-1 chars
    yields a shared fingerprint, so it catches long verbatim spans
    inside otherwise-different documents).

    Returns (id_a, id_b, n_shared, jaccard) for pairs sharing at least
    ``min_shared`` fingerprints (id_a < id_b), with jaccard over the
    docs' fingerprint SETS.

    Scale shape: only (id, fp8) pairs shuffle. The fp self-join is the
    classic hot-key risk — boilerplate substrings appear corpus-wide —
    so fingerprints hitting more than ``max_df`` documents are dropped
    FIRST (one partial-agg count over the same exploded pass; the MOSS
    service does exactly this with its "common code" threshold). That
    bounds the join's per-key fanout at max_df² regardless of corpus
    size."""
    from narowi_ocr_spark.functions.textstats import winnow_fingerprints

    fps = df.select(
        F.col(id_col).alias("id"),
        F.explode(winnow_fingerprints(text_col)).alias("fp"),
        # materialize ONCE: the winnowing projection (O(len) md5s per
        # doc) is the dominant cost and this frame feeds the df-count,
        # the size table, and BOTH sides of the self-join
    ).localCheckpoint(eager=True)
    rare = fps.groupBy("fp").agg(F.count("*").alias("df_cnt")).where(
        F.col("df_cnt") <= max_df
    )
    kept = fps.join(rare.select("fp"), "fp")
    sizes = kept.groupBy("id").agg(F.count("*").alias("n_fp"))
    shared = (
        kept.alias("a")
        .join(kept.alias("b"), "fp")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").cast("int").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_fp").alias("n_b"))
    from narowi_ocr_spark.functions.native import round4

    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            round4(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


def incremental_near_dup(
    new_docs: DataFrame,
    index_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Crawl-refresh NEAR-dedup — the MinHash twin of
    ``incremental_dedup``: which documents of an incoming batch
    near-duplicate something already in the corpus index? Returns
    (new_id, index_id, jaccard) for verified pairs with n-gram Jaccard
    ≥ ``threshold``; ``new_id``s absent from the result are genuinely
    novel content and proceed to extraction.

    Dataflow: both sides reduce to (id, band_idx, band_hash) triples
    (``with_minhash_bands`` — explode → codegen md5 → partial-agg min,
    only ~48-byte rows shuffle); candidates come from the band
    equi-join NEW × INDEX (never new×new or index×index — re-crawls
    only need novelty vs the corpus, which is what keeps this linear in
    the batch, not the corpus); verification projects shingle arrays
    AFTER the candidate joins, so only docs that band-collided ever pay
    the n-gram computation — in particular the INDEX side (the whole
    corpus) is never shingled wholesale on a refresh.

    Production shape: the index side's band triples and shingle-digest
    arrays are PERSISTED tables (written bucketed by (band_idx,
    band_hash) and id respectively), so the candidate join is
    co-located with no exchange on the corpus side and each refresh
    recomputes signatures only for the new batch; this function derives
    them from ``index_docs`` inline because the dev harness has no
    persistent store. After the run, union the novel docs' bands into
    the index — exactly the fingerprint-index lifecycle of
    ``build_fingerprint_index``.
    """
    bn = with_minhash_bands(new_docs, text_col, id_col)
    bi = with_minhash_bands(index_docs, text_col, id_col)
    cand = (
        bn.alias("n")
        .join(
            bi.alias("i"),
            (F.col("n.band_idx") == F.col("i.band_idx"))
            & (F.col("n.band_hash") == F.col("i.band_hash")),
        )
        .select(
            F.col("n.id").alias("new_id"), F.col("i.id").alias("index_id")
        )
        .distinct()
    )
    txt_n = new_docs.select(
        F.col(id_col).alias("new_id"), F.col(text_col).alias("_t")
    )
    txt_i = index_docs.select(
        F.col(id_col).alias("index_id"), F.col(text_col).alias("_t")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(txt_n, "new_id")
        .select("new_id", "index_id", shingles("_t").alias("sh_a"))
        .join(txt_i, "index_id")
        .select("new_id", "index_id", "sh_a", shingles("_t").alias("sh_b"))
        .select(
            "new_id",
            "index_id",
            round4(inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------- bloom-pruned incremental

def bloom_build(
    index: DataFrame, fp_col: str = "fp", m_bits: int = 1 << 14, k: int = 5
) -> DataFrame:
    """Distributed Bloom-filter build over a corpus fingerprint index:
    explode the ``k`` probe positions per fingerprint, OR the bits into
    64-bit words with a partial-aggregating ``bit_or``, then densify
    into ONE ``array<long>`` row of ``m_bits/64`` words.

    Scale shape: the only shuffle moves ``(word_idx, word_bits)`` pairs
    — at most ``m_bits/64`` distinct groups regardless of index size —
    and map-side combine collapses each partition to ≤ ``m_bits/64``
    rows before the exchange. The finished bitmap is broadcast-sized by
    construction (2²⁷ bits = 16 MB covers ~10⁹ fingerprints at ~1% FPR
    with k=9; size via m/n = -ln(p)/ln²2, k = (m/n)·ln 2).

    Bloom filters of two indexes OR-merge (``bloom_merge``), so a crawl
    pipeline maintains the bitmap INCREMENTALLY alongside the index —
    each refresh ORs in the new batch's bits instead of rebuilding.
    Uses ``xxhash64`` (no oracle-parity constraint: the filter only
    prunes, it never appears in query output)."""
    assert m_bits % 64 == 0, (
        "m_bits must be a multiple of 64 — probe positions beyond the "
        "last full word would index past the dense bitmap (NULL probes "
        "silently drop rows from BOTH routes of the bloom split)"
    )
    n_words = m_bits // 64
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(fp_col), F.lit(i)), F.lit(m_bits))
                for i in range(k)
            ]
        )
    ).alias("pos")
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")
    word_rows = (
        index.select(pos)
        .select(F.shiftright(F.col("pos"), 6).alias("w"), bit.alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("mm"), i.cast("long")), F.lit(0).cast("long")
        ),
    )
    return word_rows.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("mm")
    ).select(dense.alias("bitmap"))


def bloom_merge(a: Column | str, b: Column | str) -> Column:
    """OR-merge two equal-geometry Bloom bitmaps (array<long>)."""
    return F.zip_with(_col(a), _col(b), lambda x, y: x.bitwiseOR(y))


def bloom_might_contain(
    bitmap: str = "bitmap", fp: str = "fp", m_bits: int = 1 << 14, k: int = 5
) -> Column:
    """True iff all ``k`` probe bits for ``fp`` are set — one Catalyst
    expression over the broadcast bitmap, no shuffle, no Python.
    ``bitmap``/``fp`` are column NAMES (the probe literals must be typed
    identically to ``bloom_build``'s: integer ``i``, so the xxhash64
    seeds agree)."""
    assert m_bits % 64 == 0, "m_bits must match bloom_build's (×64) geometry"
    terms = []
    for i in range(k):
        p = f"pmod(xxhash64({fp}, {i}), {m_bits})"
        word = f"element_at({bitmap}, CAST(shiftright({p}, 6) AS INT) + 1)"
        mask = f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({p}, 64) AS INT))"
        terms.append(f"(({word} & {mask}) != 0)")
    return F.expr(" AND ".join(terms))


def incremental_dedup_bloom(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 14,
    k: int = 5,
) -> DataFrame:
    """``incremental_dedup`` with a Bloom-filter fast path: batch
    fingerprints whose probe bits are not all set are DEFINITELY absent
    from the index (no false negatives) and skip the anti-join
    entirely; only the maybe-duplicate remainder — the true-dup
    fraction plus the filter's ~1% false positives — pays for the exact
    anti-join against the index. Output is EXACTLY ``incremental_dedup``'s
    (the filter only routes rows, it never decides).

    Why this matters at 100 TB: the fingerprint index is corpus-sized,
    but the bitmap is megabytes and OR-maintained incrementally
    (``bloom_merge``), so a mostly-novel crawl batch resolves almost
    entirely against a broadcast bitmap — the per-batch anti-join
    touches only the candidate sliver, and partition-prunes the
    fp-bucketed index to matching buckets."""
    fps = new_docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    # materialize the batch reps once: the maybe/definitely split below
    # consumes them through TWO filters, which would otherwise re-run
    # the md5 fingerprint scan and the groupBy exchange per branch
    batch_reps = (
        fps.groupBy("fp").agg(F.min(id_col).alias(id_col)).localCheckpoint()
    )
    bloom = bloom_build(index, m_bits=m_bits, k=k)
    probed = batch_reps.crossJoin(F.broadcast(bloom))
    maybe = bloom_might_contain("bitmap", "fp", m_bits, k)
    definitely_new = probed.where(~maybe).select("fp", id_col)
    candidates = probed.where(maybe).select("fp", id_col)
    fresh = definitely_new.unionByName(candidates.join(index, "fp", "left_anti"))
    return fresh.join(new_docs, id_col).select(
        id_col, "fp", *[c for c in new_docs.columns if c != id_col]
    )


def dedup_eval(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    salt: str = "de0",
    hex_lt: str = "4",
) -> DataFrame:
    """Precision/recall of MinHash-LSH candidate generation against
    exact all-pairs n-gram Jaccard ground truth — the harness that sizes
    the (NUM_PERM, bands, rows) geometry, mirroring ``ann_recall`` for
    the dedup family.

    Ground truth needs ALL pairs, which is O(n²) by definition, so the
    evaluation runs on a deterministic md5 sample (hex-prefix predicate:
    reproducible across engines and partitionings). At 100 TB you size
    the SAMPLE (e.g. 100k docs), never the corpus: the quadratic term is
    confined to the eval job, and the measured precision/recall of the
    geometry transfers to the full corpus.

    Returns ONE row: n_truth, n_pred, n_hit, precision_ppm, recall_ppm
    (parts-per-million integer fixed point: exact cross-engine, no float
    division drift).
    """
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    sampled = df.where(key < F.lit(hex_lt))
    sh = sampled.select(F.col(id_col).alias("id"), shingles(text_col).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
    union = F.size(F.array_union("a.sh", "b.sh")).cast("double")
    truth = (
        a.join(b, F.col("a.id") < F.col("b.id"))  # eval-only all-pairs
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            round4(inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        # materialized once: consumed by both the hit join and n_truth —
        # without this the O(n²) truth join runs twice (same pattern as
        # winnow_near_pairs above)
        .localCheckpoint(eager=True)
    )
    pred = lsh_candidate_pairs(sampled, text_col, id_col).localCheckpoint(
        eager=True
    )
    hit = pred.join(truth.select("id_a", "id_b"), ["id_a", "id_b"])
    nt = truth.agg(F.count("*").cast("long").alias("n_truth"))
    np_ = pred.agg(F.count("*").cast("long").alias("n_pred"))
    nh = hit.agg(F.count("*").cast("long").alias("n_hit"))
    return (
        nt.crossJoin(np_)
        .crossJoin(nh)
        .select(
            "n_truth",
            "n_pred",
            "n_hit",
            F.expr(
                "CASE WHEN n_pred = 0 THEN NULL"
                " ELSE (1000000 * n_hit) div n_pred END"
            ).alias("precision_ppm"),
            F.expr(
                "CASE WHEN n_truth = 0 THEN NULL"
                " ELSE (1000000 * n_hit) div n_truth END"
            ).alias("recall_ppm"),
        )
    )
