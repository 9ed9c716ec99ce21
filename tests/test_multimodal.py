"""Multimodal binary-column plumbing tests (stubbed decode, real Arrow
batch dataflow)."""

import hashlib

from pyspark.sql import Row

from narowi_ocr_spark.operators.multimodal import (
    attach_binary,
    decode_stub,
    extract_media_meta,
    sample_frames,
)


def test_extract_media_meta(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="hello world"), Row(doc_id=2, text="x" * 200)]
    )
    out = {r["doc_id"]: r for r in extract_media_meta(attach_binary(df)).collect()}
    assert out[1]["byte_len"] == 11
    assert out[1]["content_md5"] == hashlib.md5(b"hello world").hexdigest()
    w, h, status = decode_stub(b"hello world")
    assert (out[1]["width"], out[1]["height"], out[1]["decode_status"]) == (w, h, status)
    assert out[2]["byte_len"] == 200


def test_sample_frames(spark):
    df = spark.createDataFrame([Row(doc_id=7, text="ab" * 100)])  # 200 bytes
    rows = sample_frames(attach_binary(df), stride=64, max_frames=8).collect()
    offs = sorted(r["byte_offset"] for r in rows)
    assert offs == [0, 64, 128, 192]
    for r in rows:
        expected = b"ab" * 100
        assert r["sample_byte"] == expected[r["byte_offset"]]
        assert r["frame_idx"] == r["byte_offset"] // 64


def test_extract_features_shape(spark):
    from narowi_ocr_spark.operators.multimodal import (
        FEATURE_DIM,
        attach_binary,
        extract_features,
    )
    from pyspark.sql import Row

    docs = attach_binary(
        spark.createDataFrame([Row(doc_id=1, text="hello"), Row(doc_id=2, text="hello")])
    )
    rows = extract_features(docs).collect()
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    # deterministic: identical payloads → identical features
    assert rows[0].features == rows[1].features
    assert all(48.0 <= f <= 102.0 for f in rows[0].features)  # hex-digit ascii


def test_resize_media_caps_payload(spark):
    from narowi_ocr_spark.operators.multimodal import attach_binary, resize_media
    from pyspark.sql import Row

    docs = attach_binary(
        spark.createDataFrame(
            [Row(doc_id=1, text="x" * 500), Row(doc_id=2, text="short")]
        )
    )
    out = {r.doc_id: r for r in resize_media(docs, max_bytes=100).collect()}
    assert out[1].byte_len == 100 and bytes(out[1].payload) == b"x" * 100
    assert out[2].byte_len == 5 and bytes(out[2].payload) == b"short"


def test_media_phash_locality_and_pairs(spark):
    """Identical payloads → identical hash; a 2-char mid-string edit →
    small hamming distance; unrelated text → not paired."""
    from pyspark.sql import Row
    from narowi_ocr_spark.operators.multimodal import (
        attach_binary,
        media_phash,
        media_phash_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = base[:10] + "XX" + base[12:]
    other = "completely different content with other words entirely " * 8
    df = attach_binary(
        spark.createDataFrame(
            [
                Row(doc_id=1, text=base),
                Row(doc_id=2, text=base),
                Row(doc_id=3, text=edited),
                Row(doc_id=4, text=other),
            ]
        )
    )
    sig = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
           for r in media_phash(df).collect()}
    assert sig[1] == sig[2]
    ham13 = sum(
        bin(a ^ b).count("1") for a, b in zip(sig[1], sig[3])
    )
    assert 0 < ham13 <= 3
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in media_phash_pairs(df).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)
    # all bands are 16-bit
    for b in sig.values():
        assert all(0 <= x < 65536 for x in b)


def test_media_phash_empty_payload_modes(spark):
    """Empty payloads: dropped by default (documented), row-preserving
    all-null bands with emit_nulls=True (ADVICE r2)."""
    from pyspark.sql import Row
    from narowi_ocr_spark.operators.multimodal import attach_binary, media_phash

    df = attach_binary(
        spark.createDataFrame(
            [Row(doc_id=1, text="some real content here"), Row(doc_id=2, text="")]
        )
    )
    dropped = media_phash(df).collect()
    assert {r["doc_id"] for r in dropped} == {1}

    kept = {r["doc_id"]: r for r in media_phash(df, emit_nulls=True).collect()}
    assert set(kept) == {1, 2}
    assert all(kept[2][f"b{b}"] is None for b in range(4))
    assert all(kept[1][f"b{b}"] is not None for b in range(4))


def test_resolve_decoder_env_switch(monkeypatch):
    """Default/stub → decode_stub; pil without PIL installed → loud
    ImportError (never a silent fallback); unknown codec → ValueError."""
    import pytest as _pytest

    from narowi_ocr_spark.operators import multimodal as mm

    monkeypatch.delenv("NAROWI_MEDIA_CODEC", raising=False)
    assert mm.resolve_decoder() is mm.decode_stub
    monkeypatch.setenv("NAROWI_MEDIA_CODEC", "stub")
    assert mm.resolve_decoder() is mm.decode_stub
    monkeypatch.setenv("NAROWI_MEDIA_CODEC", "nosuch")
    with _pytest.raises(ValueError):
        mm.resolve_decoder()
    monkeypatch.setenv("NAROWI_MEDIA_CODEC", "pil")
    try:
        import PIL  # noqa: F401

        assert mm.resolve_decoder() is mm.decode_pil
    except ImportError:
        with _pytest.raises(ImportError):
            mm.resolve_decoder()


def test_decode_pil_real_codec():
    """Real-codec path: runs wherever PIL exists (skipped in the
    sandbox). Asserts true pixel dimensions and the garbage policy."""
    import pytest as _pytest

    _pytest.importorskip("PIL")
    import io

    from PIL import Image

    from narowi_ocr_spark.operators.multimodal import decode_pil

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    assert decode_pil(buf.getvalue()) == (17, 9, "ok")
    assert decode_pil(b"not an image") == (0, 0, "decode_error")


# -------------------------------------------- stdlib BMP real-pixel path

def test_bmp_codec_roundtrip_and_garbage():
    """encode_bmp_gray → decode_bmp_gray is byte-exact for arbitrary
    sizes (incl. stride padding and bottom-up rows); garbage returns
    None, never raises."""
    import random

    from narowi_ocr_spark.functions.bmp import decode_bmp_gray, encode_bmp_gray

    rng = random.Random(7)
    for w, h in [(16, 16), (5, 3), (1, 1), (13, 7), (64, 2)]:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        assert decode_bmp_gray(encode_bmp_gray(w, h, px)) == (w, h, px)
    trunc = encode_bmp_gray(4, 4, bytes(16))[:-5]
    for g in (b"", b"BM", b"notabmp" * 10, trunc, b"\x00" * 2000):
        assert decode_bmp_gray(g) is None


def test_bmp_decode_24bit_and_topdown():
    """24-bit BI_RGB and negative-height (top-down) frames decode with
    the documented integer-mean luminance."""
    import struct

    from narowi_ocr_spark.functions.bmp import decode_bmp_gray

    # hand-build a 2x2 24-bit bottom-up BMP: rows padded to 8 bytes
    pix = {  # (r, c) -> (B, G, R)
        (0, 0): (10, 20, 30), (0, 1): (40, 50, 60),
        (1, 0): (70, 80, 90), (1, 1): (100, 110, 120),
    }
    stride = 8
    data = bytearray()
    for r in (1, 0):  # bottom-up
        row = bytearray()
        for c in (0, 1):
            row += bytes(pix[(r, c)])
        row += b"\x00" * (stride - len(row))
        data += row
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data), 0, 0, 0, 0)
    w, h, lum = decode_bmp_gray(bytes(hdr + info + data))
    assert (w, h) == (2, 2)
    assert list(lum) == [20, 50, 80, 110]  # (r+g+b)//3, top-down row-major
    # top-down variant: same pixels, height negative, rows in natural order
    data_td = bytearray()
    for r in (0, 1):
        row = bytearray()
        for c in (0, 1):
            row += bytes(pix[(r, c)])
        row += b"\x00" * (stride - len(row))
        data_td += row
    info_td = struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(data_td), 0, 0, 0, 0
    )
    assert decode_bmp_gray(bytes(hdr + info_td + data_td)) == (2, 2, lum)


def test_resolve_decoder_bmp_and_meta_override(spark, monkeypatch):
    """NAROWI_MEDIA_CODEC=bmp routes to the stdlib decoder; the
    decoder= override on extract_media_meta forces real dims without
    touching env; non-BMP payloads get status rows (garbage policy)."""
    from narowi_ocr_spark.functions.bmp import encode_bmp_gray
    from narowi_ocr_spark.operators import multimodal as mm

    monkeypatch.setenv("NAROWI_MEDIA_CODEC", "bmp")
    assert mm.resolve_decoder() is mm.decode_bmp
    monkeypatch.delenv("NAROWI_MEDIA_CODEC")

    bmp = encode_bmp_gray(6, 4, bytes(range(24)))
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(b"not a bmp"))],
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r
        for r in mm.extract_media_meta(df, decoder=mm.decode_bmp).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (6, 4)
    assert out[1]["decode_status"] == "ok"
    assert out[2] is not None and out[2]["decode_status"] == "decode_error"
    assert (out[2]["width"], out[2]["height"]) == (0, 0)


def test_media_phash_pixels_matches_arithmetic(spark):
    """The full Spark path (synth_bmp encode → stdlib decode → grid
    sample → integer threshold) must reproduce the fixture's pure
    arithmetic definition bit-for-bit — the same parity the DuckDB
    oracle checks at sf0.01."""
    from narowi_ocr_spark.operators.multimodal import (
        fixture_pixel,
        media_phash_pixels,
        synth_bmp,
    )

    ids = spark.createDataFrame(
        [(i,) for i in (0, 1, 7, 250, 251, 99999)], "doc_id long"
    )
    got = {
        r["doc_id"]: (r["width"], r["height"], r["b0"], r["b1"], r["b2"], r["b3"])
        for r in media_phash_pixels(synth_bmp(ids)).collect()
    }
    for did in (0, 1, 7, 250, 251, 99999):
        vals = [fixture_pixel(did, (j // 8) * 2, (j % 8) * 2) for j in range(64)]
        tot = sum(vals)
        bands = [0, 0, 0, 0]
        for j, v in enumerate(vals):
            if 64 * v > tot:
                bands[j // 16] |= 1 << (j % 16)
        assert got[did] == (16, 16, *bands)


def test_media_phash_pixels_drops_undecodable(spark):
    from narowi_ocr_spark.operators.multimodal import media_phash_pixels

    df = spark.createDataFrame(
        [(1, bytearray(b"junk"))], "doc_id long, payload binary"
    )
    assert media_phash_pixels(df).count() == 0
