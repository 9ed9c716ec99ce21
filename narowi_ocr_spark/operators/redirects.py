"""Redirect / rel=canonical chain resolution by pointer doubling.

A crawl's url space is riddled with 301/308 redirects and
rel=canonical pointers; dedup keys, the frontier, and the link graph
all want the FINAL target, not the hop. Chains are short (a handful of
hops) but there are billions of them, and naive per-row walking is a
driver loop. Pointer doubling (f ← f∘f each round) resolves every
chain of length ≤ 2^R in R self-joins — the classic parallel
path-compression trick, the directed-functional-graph sibling of the
large-star/small-star rounds in operators/components.py.

Cycle safety: a canonical loop (a↔b) never reaches a fixed point, so
after the bounded rounds any src whose target still has an outgoing
pointer is reported ``resolved = false`` with ``hops`` pinned at the
``max_hops`` cap (the doubling distance, 2^R). Deterministic either
way — no round count sensitivity for resolved rows, whose ``hops`` is
the exact chain length.

Scale shape: R = ceil(log2(max_hops)) self-joins on the pointer table
(tiny next to the page table — only urls WITH a pointer appear), each
shuffling on the url key; lineage is cut per round with
localCheckpoint like the CC rounds. Reference analogue: the retry
ladder that re-runs extraction with the next config until one sticks
(src/core/ocr_engine.py:88-118) — a bounded chase to a fixed point.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
    early_exit: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve every pointer chain in ``edges`` (src → dst, at most one
    outgoing pointer per src — last wins is NOT applied here; feed a
    deduplicated mapping). Returns (src, final, hops, resolved).

    EAGER under the default ``early_exit=True``: each doubling round
    localCheckpoints eagerly and probes an ``isEmpty``, so the chase
    EXECUTES during this call rather than composing lazily. Callers
    that only inspect or compose the plan (audits, building a larger
    pipeline before triggering) should pass ``early_exit=False`` for
    the fully lazy fixed-round form; results are bit-identical.

    - resolved rows: ``final`` is the chain's terminal (a url with no
      outgoing pointer), ``hops`` the exact chain length;
    - unresolved rows (chain longer than ``max_hops`` or ending in a
      cycle): ``final`` is wherever the doubling landed, ``hops`` is
      pinned at the cap, ``resolved`` false.

    When ``nodes`` is given (a DataFrame whose ``src_col`` lists ALL
    urls), pointer-less urls are included as identity rows
    (final = self, hops 0, resolved true) so the output is a total
    mapping suitable for a left-join-free downstream rewrite.

    ``early_exit`` (default on): a doubling round is an exact no-op
    once no row's chase extended (``b`` side unmatched for every row) —
    further rounds leave dst and d bit-identical — so each round
    carries a ``moved`` flag and the loop stops after the first round
    in which no row moved. The probe costs one narrow ``isEmpty`` scan
    over the round's (eagerly checkpointed, so never recomputed) rows:
    no join, no extra shuffle, and EXACT — a cyclic or over-cap chain
    keeps moving every round, so those inputs still run all
    ceil(log2(max_hops)) rounds and the capped/unresolved output is
    unchanged. Real crawl chains are 1-4 hops, so the common case
    resolves in 2-3 rounds instead of always paying the worst-case 5
    (the per-round fixed stage cost was the flat region in BENCH.md's
    redirect_resolve_4m row). ``stats``, when given, records
    ``rounds_run`` for manifests/tests.
    """
    rounds = max(1, math.ceil(math.log2(max_hops)))
    f = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.lit(1).alias("d"),
    )
    rounds_run = 0
    for _ in range(rounds):
        a, b = f.alias("a"), f.alias("b")
        f = (
            a.join(b, F.col("a.dst") == F.col("b.src"), "left")
            .select(
                F.col("a.src").alias("src"),
                F.coalesce(F.col("b.dst"), F.col("a.dst")).alias("dst"),
                (
                    F.col("a.d")
                    + F.coalesce(F.col("b.d"), F.lit(0))
                ).alias("d"),
                F.col("b.src").isNotNull().alias("_moved"),
            )
            .localCheckpoint(eager=early_exit)
        )
        rounds_run += 1
        if early_exit and f.where(F.col("_moved")).isEmpty():
            break
    f = f.drop("_moved")
    if stats is not None:
        stats["rounds_run"] = rounds_run
    # a target with an outgoing pointer means the chase didn't finish
    srcs = edges.select(F.col(src_col).alias("_s")).distinct()
    out = (
        f.join(srcs, f["dst"] == srcs["_s"], "left")
        .select(
            "src",
            F.col("dst").alias("final"),
            F.when(F.col("_s").isNull(), F.col("d"))
            .otherwise(F.lit(max_hops)).alias("hops"),
            F.col("_s").isNull().alias("resolved"),
        )
    )
    if nodes is None:
        return out
    ident = (
        nodes.select(F.col(src_col).alias("src"))
        .distinct()
        .join(srcs, F.col("src") == F.col("_s"), "left_anti")
        .select(
            "src",
            F.col("src").alias("final"),
            F.lit(0).alias("hops"),
            F.lit(True).alias("resolved"),
        )
    )
    return out.unionByName(ident)
