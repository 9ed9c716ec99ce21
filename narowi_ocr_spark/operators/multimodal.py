"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode step itself is a STUB (the sandbox has no image/audio codecs):
``decode_stub`` derives deterministic fake features from the raw bytes.
Everything around it — schema, batch shape, partition behavior, the
Arrow-batched UDF signature — is real and tested; swapping in a real
codec (PIL / torchaudio / pyav) changes only the function body.

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


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Dev helper: materialize a binary payload column from text (UTF-8).
    In production the payload arrives as a real binary column."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_media_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """binary payload → typed metadata row, one Arrow-batched stage.
    Output carries no payload bytes — safe to shuffle/aggregate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                w, h, status = decode_stub(b)
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
