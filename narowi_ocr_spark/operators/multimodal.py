"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode step defaults to a STUB (the sandbox has no image/audio
codecs): ``decode_stub`` derives deterministic fake features from the
raw bytes. Everything around it — schema, batch shape, partition
behavior, the Arrow-batched UDF signature — is real and tested. A
cluster with codecs installed opts into true pixel decode by setting
``NAROWI_MEDIA_CODEC=pil`` (``spark.executorEnv.NAROWI_MEDIA_CODEC``);
``resolve_decoder`` picks the kernel per worker, and the real-codec
path is exercised by a skip-marked test that runs wherever PIL exists.

Scale notes: payload columns are fat, so
  - metadata extraction keeps only (id, metadata) — payloads are dropped
    before any shuffle;
  - Arrow batch size must be bounded by bytes, not rows
    (config.ARROW_BATCH_ROWS); a 10 MB image at 2048 rows/batch would be
    a 20 GB batch — callers repartition by size first at real scale.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.IntegerType(), False),
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("decode_status", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("byte_offset", T.IntegerType(), False),
        T.StructField("sample_byte", T.IntegerType(), False),
    ]
)


def decode_stub(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode: (width, height, status). A real codec
    (PIL.Image.open etc.) drops in here; nothing else changes."""
    # NotImplementedError would be raised by a real-codec build without
    # the codec installed; the stub keeps the pipeline runnable + testable.
    n = len(payload)
    return n % 640, (n * 7) % 480, "stub"


def decode_pil(payload: bytes) -> tuple[int, int, str]:
    """Real-codec decode: true pixel dimensions via PIL. Import happens
    inside the call so only the real-codec path needs the dependency;
    undecodable payloads degrade to (0, 0, 'decode_error') — a status
    row, never a crash, matching the extraction pipeline's garbage
    policy."""
    import io

    from PIL import Image  # noqa: PLC0415 — executor-side lazy import

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return int(im.width), int(im.height), "ok"
    except Exception:
        return 0, 0, "decode_error"


def decode_bmp(payload: bytes) -> tuple[int, int, str]:
    """Pure-stdlib real decode for uncompressed BMP payloads
    (functions/bmp.py — no PIL needed, so this path runs REAL pixels
    in-sandbox); non-BMP payloads degrade to a ``decode_error`` status
    row, never a crash."""
    from narowi_ocr_spark.functions.bmp import decode_bmp_gray

    dec = decode_bmp_gray(payload)
    if dec is None:
        return 0, 0, "decode_error"
    return dec[0], dec[1], "ok"


def resolve_decoder():
    """Select the decode function from ``NAROWI_MEDIA_CODEC`` (read on
    the EXECUTOR at kernel start, so a cluster sets it via
    ``spark.executorEnv.NAROWI_MEDIA_CODEC``):

    - unset / ``stub`` → ``decode_stub`` (sandbox default; the
      geometry, schema and batch shape are identical to a real build);
    - ``bmp`` → ``decode_bmp`` (pure-stdlib REAL decode for
      uncompressed BMPs — the in-sandbox real-pixel path);
    - ``pil`` → ``decode_pil`` (true pixel decode; raises ImportError
      with a clear message if PIL is absent rather than silently
      falling back — a cluster that ASKS for real decode must get it).
    """
    import os

    codec = os.environ.get("NAROWI_MEDIA_CODEC", "stub").lower()
    if codec in ("", "stub"):
        return decode_stub
    if codec == "bmp":
        return decode_bmp
    if codec == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "NAROWI_MEDIA_CODEC=pil but PIL is not installed on this "
                "executor; install pillow or unset the variable"
            ) from e
        return decode_pil
    raise ValueError(f"unknown NAROWI_MEDIA_CODEC {codec!r}")


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Dev helper: materialize a binary payload column from text (UTF-8).
    In production the payload arrives as a real binary column."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_media_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=None,
) -> DataFrame:
    """binary payload → typed metadata row, one Arrow-batched stage.
    Output carries no payload bytes — safe to shuffle/aggregate.
    ``decoder`` overrides the env-driven codec selection (e.g. pass
    ``decode_bmp`` to force the stdlib real-pixel path for a fixture
    table without touching executor env)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-worker, env-driven (stub | bmp | pil) unless overridden
        decode = decoder if decoder is not None else resolve_decoder()
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                w, h, status = decode(b)
                rows.append(
                    (int(i), len(b), hashlib.md5(b).hexdigest(), w, h, status)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "byte_len", "content_md5",
                    "width", "height", "decode_status",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, MEDIA_META_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("byte_len", T.IntegerType(), False),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """binary payload → fixed-dim float feature vector (the
    embedding-producer stage that feeds operators/similarity.py). The
    featurizer is a deterministic stub — each dim is the ASCII code of one
    md5-hex digit of the payload — standing in for a real image/audio
    encoder; the Arrow batch shape, schema, and payload-dropping are the
    real plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                h = hashlib.md5(bytes(payload)).hexdigest()
                ids.append(int(i))
                feats.append([float(ord(h[k])) for k in range(FEATURE_DIM)])
            yield pd.DataFrame({"doc_id": ids, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, FEATURES_SCHEMA)


def resize_media(
    df: DataFrame,
    max_bytes: int = 4096,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """payload → size-capped payload (a real build re-encodes at a target
    resolution; the stub keeps the byte prefix). Unlike the metadata ops
    this one RETURNS a binary column — the pattern for
    transform-and-rewrite media pipelines, where the output is written
    straight back out partitioned by size, never shuffled wide."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)[:max_bytes]
                rows.append((int(i), b, len(b)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "byte_len"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    stride: int = 64,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit one row per
    sampled byte offset (a real build decodes a frame per offset). 1→N
    expansion happens inside the Arrow batch, not via explode of a
    materialized array — the payload is read once and dropped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                offsets = range(0, len(b), stride)
                for fi, off in enumerate(offsets):
                    if fi >= max_frames:
                        break
                    rows.append((int(i), fi, off, b[off]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "byte_offset", "sample_byte"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


def media_dedup(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Exact dedup over BINARY media payloads — the multimodal twin of
    ``dedup.exact_dedup`` (same keep-min-id-per-digest rule; kept
    separate because the text op returns surviving ROWS while media
    pipelines want the digest→keep_id decision table, payloads staying
    in place): group by content digest, keep the min-id copy.
    The digest is computed in the scan projection so only
    (md5, id) pairs shuffle — payload bytes (images can be MBs) never
    leave their scan stage, which is the entire point at 100 TB of
    media. Returns (content_md5, n_copies, keep_id)."""
    digests = df.select(
        F.md5(F.col(payload_col)).alias("content_md5"),
        F.col(id_col).alias("id"),
    )
    return digests.groupBy("content_md5").agg(
        F.count("*").cast("int").alias("n_copies"),
        F.min("id").alias("keep_id"),
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("b0", T.IntegerType(), False),
        T.StructField("b1", T.IntegerType(), False),
        T.StructField("b2", T.IntegerType(), False),
        T.StructField("b3", T.IntegerType(), False),
    ]
)

PHASH_SAMPLES = 64  # one bit per grid sample, packed into 4×16-bit bands

# row-preserving variant (emit_nulls=True): empty payloads keep their
# row with all-null bands instead of being dropped
PHASH_SCHEMA_NULLABLE = T.StructType(
    [T.StructField("doc_id", T.LongType(), False)]
    + [T.StructField(f"b{b}", T.IntegerType(), True) for b in range(4)]
)


def phash64(s: str) -> tuple[int, int, int, int] | None:
    """Pure perceptual-hash core (testable without Spark): 64 grid
    samples (code point at (j·n) div 64), integer-exact threshold
    64·v > Σv, bits packed into four 16-bit bands. None for empty
    input. The Arrow kernel below and the DuckDB oracle both implement
    exactly this function."""
    n = len(s)
    if n == 0:
        return None
    vals = [ord(s[(j * n) // PHASH_SAMPLES]) for j in range(PHASH_SAMPLES)]
    total = sum(vals)
    bands = [0, 0, 0, 0]
    for j, v in enumerate(vals):
        if PHASH_SAMPLES * v > total:
            bands[j // 16] |= 1 << (j % 16)
    return bands[0], bands[1], bands[2], bands[3]


def media_phash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    emit_nulls: bool = False,
) -> DataFrame:
    """Perceptual-hash stage for media payloads — the NEAR-dup
    complement of ``media_dedup``'s exact digests (aHash recipe:
    downsample to a fixed grid, threshold each cell against the global
    mean, pack the bits; Monga & Evans, "Perceptual image hashing via
    feature points", IEEE TIP 2006 popularized the family). Unlike a
    cryptographic digest, the hash has LOCALITY: payloads differing in
    a few regions differ in a few bits, so banded hamming join finds
    re-encoded/trimmed copies.

    The "decode" is the sandbox stub (sample luminance = code point of
    the character at each of 64 evenly-spaced grid positions — a real
    build reads pixel blocks); thresholding is integer-exact
    (64·v > Σv), so both engines agree bit-for-bit. The 64 bits are
    returned as four 16-bit band ints — exactly the blocking keys the
    pair join needs, and no signed-overflow trap at bit 63.

    Payload bytes never leave the Arrow stage; only (id, 4×int16)
    shuffles.

    Rows whose payload decodes to an EMPTY string carry no signal and
    are OMITTED from the output by default (one row in → zero rows
    out), so callers joining signatures back by id must left-join —
    or pass ``emit_nulls=True``, which keeps those rows with all-null
    bands (one row in → one row out; nulls never equi-join, so the
    banded pair join is unaffected). (ADVICE r2: the silent drop was
    previously undocumented.)"""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                bands = phash64(bytes(payload).decode("utf-8"))
                if bands is None:
                    if emit_nulls:
                        rows.append((int(i), None, None, None, None))
                    continue
                rows.append((int(i), *bands))
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    schema = PHASH_SCHEMA_NULLABLE if emit_nulls else PHASH_SCHEMA
    return df.select(id_col, payload_col).mapInPandas(run, schema)


BMP_FIXTURE_SIZE = 16

BMP_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

PIXEL_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("b0", T.IntegerType(), False),
        T.StructField("b1", T.IntegerType(), False),
        T.StructField("b2", T.IntegerType(), False),
        T.StructField("b3", T.IntegerType(), False),
    ]
)


def fixture_pixel(doc_id: int, r: int, c: int) -> int:
    """Deterministic fixture luminance — pure integer arithmetic of
    (doc_id, row, col), so an oracle can recompute the expected pixels
    (and therefore the expected perceptual hash) WITHOUT parsing the
    BMP: the Spark side must round-trip encode→decode→hash to match."""
    return ((doc_id % 251) * 3 + r * 17 + c * 29) % 256


def synth_bmp(
    df: DataFrame, id_col: str = "doc_id", size: int = BMP_FIXTURE_SIZE
) -> DataFrame:
    """(id) → (id, payload): a real 8-bit grayscale BMP per row with
    ``fixture_pixel`` luminances, built by the stdlib encoder. One
    Arrow stage, no shuffle — the dev stand-in for a crawl's image
    payload column."""
    from narowi_ocr_spark.functions.bmp import encode_bmp_gray

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                did = int(i)
                px = bytes(
                    fixture_pixel(did, r, c)
                    for r in range(size)
                    for c in range(size)
                )
                rows.append((did, encode_bmp_gray(size, size, px)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return df.select(id_col).mapInPandas(run, BMP_PAYLOAD_SCHEMA)


def media_phash_pixels(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual hash over REAL decoded pixels (the un-stubbed twin
    of ``media_phash``): stdlib BMP decode → 8×8 luminance grid →
    integer-exact aHash (functions/bmp.py: threshold ``64·v > Σv``),
    packed into the same four 16-bit bands the banded hamming join
    blocks on. Payload bytes never leave the Arrow stage; only
    (id, dims, 4×int16) come out. Undecodable payloads are dropped
    (status-row handling belongs to ``extract_media_meta``)."""
    from narowi_ocr_spark.functions.bmp import decode_bmp_gray, phash_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = decode_bmp_gray(bytes(payload))
                if dec is None:
                    continue
                w, h, px = dec
                bands = phash_pixels(px, w, h)
                if bands is None:
                    continue
                rows.append((int(i), w, h, *bands))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "b0", "b1", "b2", "b3"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, PIXEL_PHASH_SCHEMA
    )


def media_phash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Near-duplicate media pairs by banded hamming join over the
    64-bit perceptual hash: candidates must agree on at least one of
    the 4 16-bit bands (pigeonhole: 4 blocks cover hamming ≤ 3 — the
    d+1-blocks rule, same geometry as ``dedup.simhash_near_pairs``),
    then the exact hamming distance (Σ bit_count(bᵢ⊕bᵢ')) filters.
    Never an all-pairs join: each band is an equi-join on a 16-bit
    key, O(Σ bucket²) with 65 536 buckets per band.

    As with ``dedup.simhash_near_pairs``, the 4-band pigeonhole only
    guarantees recall for ``max_hamming`` ≤ 3 — larger radii would
    silently drop pairs whose differing bits spread across all bands,
    so they are rejected."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-band pigeonhole "
            "guarantee (<= 3)"
        )
    sig = media_phash(df, id_col=id_col, payload_col=payload_col)
    # One posexplode carries the FULL signature alongside each band row,
    # so the self-join produces both sides' bands in place — no
    # re-derivation joins back to the signature table. The Arrow decode
    # stage therefore runs exactly twice (once per join subtree), not
    # six times as a union-of-bands + two signature joins would; the
    # extra shuffle payload is 4 ints per row.
    bands = sig.select(
        "doc_id",
        *[f"b{b}" for b in range(4)],
        F.posexplode(
            F.array(*[F.col(f"b{b}") for b in range(4)])
        ).alias("band_idx", "band_val"),
    )
    # Explicit exchange on the join keys: both self-join sides share
    # ONE identical Exchange subtree, so ReuseExchange materializes the
    # Arrow decode+hash stage once instead of once per side.
    bands = bands.repartition(F.col("band_idx"), F.col("band_val"))
    x, y = bands.alias("x"), bands.alias("y")
    ham = sum(
        F.bit_count(
            F.col(f"x.b{b}")
            .bitwiseXOR(F.col(f"y.b{b}"))
            .cast("long")
        )
        for b in range(4)
    )

    # Each pair is emitted from its FIRST matching band only (every
    # earlier band's values — carried on both sides anyway — must
    # differ). Replaces the old post-join DISTINCT, a shuffle of every
    # (pair × matching-band) row, with a residual predicate; the output
    # pair set is identical. Same trick as dedup.simhash_near_pairs.
    def _earlier_differ(upto: int):
        c = F.lit(True)
        for j in range(upto):
            c = c & (F.col(f"x.b{j}") != F.col(f"y.b{j}"))
        return c

    first_match = F.lit(False)
    for i in range(4):
        first_match = F.when(
            F.col("x.band_idx") == i, _earlier_differ(i)
        ).otherwise(first_match)
    return (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .where(first_match)
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
