"""Regenerate fixtures/compression_oracle.parquet — the value-level
oracle for the ``compression_ratio`` query (VERDICT r4 item 3).

DuckDB has no zlib surface, so the oracle cannot COMPUTE compressed
sizes in SQL. Instead this script computes them INDEPENDENTLY of the
Spark kernel — pure-Python ``zlib.compress(text.encode("utf-8"), 6)``
over every document text in every /root/testdata/sf* directory, read
with DuckDB (no Spark anywhere in the loop) — and persists a
(text_md5, n_compressed) lookup keyed by content digest, not by
scale factor, so one fixture serves sf0.001/0.01/0.1 alike. The
oracle SQL then joins ``md5(text)`` against this table and derives
n_bytes / ratio_scaled / ratio with pure SQL arithmetic, making the
driver's check value-level (hash-gated) instead of rows-only.

The fixture is only as independent as this generator: it shares the
zlib LIBRARY with the Spark kernel (same CPython zlib, level 6 — the
determinism contract documented in with_compression_ratio), but not
one line of the kernel's code path (no pandas UDF, no Spark, no
narowi_ocr_spark import). tests/test_textstats_staged.py separately
pins the kernel byte-exact against the same recipe.

Run: python tools/gen_compression_oracle.py   (idempotent)
"""
import glob
import hashlib
import os
import zlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures", "compression_oracle.parquet")


def main() -> None:
    seen: dict[str, int] = {}
    for d in sorted(glob.glob("/root/testdata/sf*")):
        p = os.path.join(d, "documents.parquet")
        if not os.path.exists(p):
            continue
        for (t,) in duckdb.sql(
            f"SELECT text FROM read_parquet('{p}') WHERE text IS NOT NULL"
        ).fetchall():
            raw = t.encode("utf-8")
            seen.setdefault(
                hashlib.md5(raw).hexdigest(), len(zlib.compress(raw, 6))
            )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    tbl = pa.table(
        {
            "text_md5": pa.array(sorted(seen), pa.string()),
            "n_compressed": pa.array(
                [seen[k] for k in sorted(seen)], pa.int32()
            ),
        }
    )
    pq.write_table(tbl, OUT)
    print(f"wrote {OUT}: {tbl.num_rows} distinct texts")


if __name__ == "__main__":
    main()
