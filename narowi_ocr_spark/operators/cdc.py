"""Changelog merge (CDC upsert/delete → snapshot) — the
merge-on-read compaction step every incrementally-maintained table
needs (the Iceberg/Delta MERGE pattern, expressed as plain DataFrame
aggregation so it runs on any store).

Scale shape: last-writer-wins is a ``max_by`` aggregation keyed on the
row key — partial aggregation collapses each key's change history
map-side before ONE shuffle of (key, winning row) pairs. This
deliberately avoids the window-function formulation
(row_number over key order), which would sort every partition and
cannot partially aggregate; at 10⁹ keys × deep histories the
hash-aggregate is the difference between one pass and a full sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_changelog(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Collapse a changelog into the current snapshot: per key, the
    change with the highest ``seq_cols`` (lexicographic) wins; keys
    whose winning change is a ``delete_op`` are absent from the output.

    ``seq_cols`` must totally order each key's changes (e.g.
    ``["ts", "change_id"]``) — ties would make the winner
    partition-order-dependent.

    Output: ``key_cols`` + every non-key, non-seq payload column of the
    winning change (seq columns are kept too, as the snapshot's
    per-row version metadata).
    """
    payload = [c for c in changes.columns if c not in key_cols]
    winner = changes.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.struct(*seq_cols)).alias("_w")
    )
    flat = winner.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
    # null-safe: a NULL op means upsert (the common CDC encoding that
    # only stamps deletes) — a bare `!=` would evaluate NULL and
    # silently drop the key as if deleted
    keep = F.col(op_col).isNull() | (F.col(op_col) != F.lit(delete_op))
    return flat.where(keep).drop(op_col)


def snapshot_with_base(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Apply a changelog on top of an existing base snapshot: base rows
    survive unless the changelog touches their key; touched keys take
    the changelog's winning row (or disappear on delete).

    The base is assumed deduplicated by key (it is a snapshot). One
    anti-join (base keys minus changed keys) + the ``merge_changelog``
    aggregate; with base and changes both bucketed by key the anti-join
    co-locates. Base rows carry no ``op_col``; the output schema is the
    base schema plus ``seq_cols`` version metadata on changed rows'
    columns where present.
    """
    merged = merge_changelog(changes, key_cols, seq_cols, op_col, delete_op)
    missing = [c for c in base.columns if c not in merged.columns]
    if missing:
        raise ValueError(
            "changelog is missing base snapshot columns "
            f"{missing}: applying it would silently drop them from "
            "every row (output contract is the base schema)"
        )
    changed_keys = changes.select(*key_cols).distinct()
    untouched = base.join(changed_keys, key_cols, "left_anti")
    return untouched.unionByName(merged.select(*base.columns))
