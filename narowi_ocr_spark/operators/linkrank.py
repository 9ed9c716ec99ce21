"""Host-graph link analysis — PageRank as the web-curation quality
signal (CommonCrawl publishes exactly this: host/domain-level rank used
to prioritize and weight crawl data; harmonic-centrality variants serve
the same role in C4-descendant pipelines).

EXACT-INTEGER fixed point, like ``clustering.kmeans_lloyd``: ranks are
bigints scaled by ``RANK_SCALE``; each round is

    r'(v) = (15 · base) div 100  +  (85 · Σ_{u→v} (r(u) div outdeg(u))) div 100

— every operation is 64-bit integer arithmetic, so the result is
bit-identical across engines and an unrolled-SQL oracle can replay it.
(The float formulation differs by < 1e-9 per round; the integer form is
chosen for replayability, and its truncation loss — a few units of
1e-9 per node per round — is far below any ranking decision threshold.)

Dangling mass (nodes with no out-edges) is DROPPED, the standard
MapReduce-PageRank simplification; with damping it still converges,
total mass just decays slightly. Documented rather than redistributed
because redistribution needs an extra global aggregate per round.

Scale shape per round: ONE join of the (src, dst, outdeg) edge table
against the (id, rank) table — both shuffle-keyed on the node id, and
AQE handles hub skew — plus one partial-aggregated groupBy(dst). The
edge table is localCheckpointed once; rank state is (id, long) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000


def pagerank_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Run ``iters`` damped (0.85) PageRank rounds from the uniform
    start ``RANK_SCALE div N`` and return (id, rank_scaled). Fixed
    iteration count for oracle replay — a convergence-driven production
    run wraps the same round body in the driver-loop + localCheckpoint
    pattern of ``components.connected_components``."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ewd = e.join(deg, "src").localCheckpoint(eager=True)

    totals = nodes.agg(F.count("*").alias("n"))
    base = nodes.crossJoin(F.broadcast(totals)).select(
        "id", F.expr(f"CAST({RANK_SCALE} AS BIGINT) div n").alias("base")
    )
    ranks = base.select("id", F.col("base").alias("rank"))

    for _ in range(iters):
        msgs = ewd.join(ranks, ewd.src == ranks.id).select(
            F.col("dst").alias("id"),
            F.expr("rank div outdeg").alias("contrib"),
        )
        inflow = msgs.groupBy("id").agg(F.sum("contrib").alias("inflow"))
        ranks = (
            base.join(inflow, "id", "left")
            .select(
                "id",
                (
                    F.expr("(15 * base) div 100")
                    + F.expr("(85 * coalesce(inflow, 0)) div 100")
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", F.col("rank").alias("rank_scaled"))
