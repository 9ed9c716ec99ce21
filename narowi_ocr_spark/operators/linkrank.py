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


# HITS works at a smaller scale than PageRank: each round multiplies a
# per-node score (≤ the normalized total) by the scale again, so the
# intermediate product is bounded by HITS_SCALE² — 1e12 at 1e6, safely
# inside int64 where RANK_SCALE² (1e18) would flirt with overflow.
HITS_SCALE = 1_000_000


def hits_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Kleinberg HITS (hubs & authorities) in exact-integer fixed point —
    the complement of PageRank for link curation: PageRank scores global
    endorsement, HITS separates DIRECTORY pages (hubs: link to many good
    authorities) from CONTENT pages (authorities: linked by many good
    hubs), which is the split a crawl scheduler actually wants.

    Per round (all 64-bit integer ops, so an unrolled-SQL oracle replays
    it bit-for-bit):

        a_raw(v) = Σ_{u→v} h(u);  a(v) = (a_raw(v)·S) div Σa_raw
        h_raw(u) = Σ_{u→v} a(v);  h(u) = (h_raw(u)·S) div Σh_raw

    The L1 normalization per half-round is what PageRank's damping
    makes unnecessary there — without it HITS grows exponentially. Each
    half-round costs one edge⋈score join (id-keyed, AQE-skew-safe), one
    partial-agg groupBy, and one broadcast total. Returns
    (id, hub_scaled, auth_scaled); isolated nodes carry 0.
    """
    if iters < 1:
        raise ValueError("hits_fixed needs iters >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=True)

    totals = nodes.agg(F.count("*").alias("n"))
    hubs = nodes.crossJoin(F.broadcast(totals)).select(
        "id", F.expr(f"CAST({HITS_SCALE} AS BIGINT) div n").alias("score")
    )

    def _half(scores: DataFrame, join_on: str, group_to: str) -> DataFrame:
        raw = (
            e.join(scores, e[join_on] == scores.id)
            .groupBy(F.col(group_to).alias("id"))
            .agg(F.sum("score").alias("raw"))
        )
        tot = raw.agg(F.sum("raw").alias("t"))
        normed = (
            nodes.join(raw, "id", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "id",
                F.coalesce(
                    F.expr(f"(coalesce(raw, 0) * {HITS_SCALE}) div t"),
                    F.lit(0),
                ).cast("long").alias("score"),
            )
        )
        return normed.localCheckpoint(eager=True)

    auth = None
    for _ in range(iters):
        auth = _half(hubs, "src", "dst")   # authorities gather hub mass
        hubs = _half(auth, "dst", "src")   # hubs gather authority mass
    return (
        hubs.select("id", F.col("score").alias("hub_scaled"))
        .join(
            auth.select("id", F.col("score").alias("auth_scaled")), "id"
        )
    )


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED version of the
    graph — the local-clustering signal (link-farm rings and mutual-
    admiration clusters score high; organic link neighborhoods low).

    Uses the degree-ordered orientation (Cohen, "Graph twiddling in a
    MapReduce world", 2009): every undirected edge is directed from its
    lower-(degree, id) endpoint to the higher one, making the oriented
    graph acyclic with out-degree bounded by O(√m) on any graph — the
    wedge join (oriented ⋈ oriented on the middle vertex) therefore
    stays near-linear where a naive neighbor join explodes on hubs.
    Each triangle is counted exactly once as an oriented wedge
    a→b, b→c closed by oriented edge a→c, then credited back to all
    three corners. Three id-keyed joins + one partial-agg groupBy.

    ``nodes`` (an (id) table) widens the output domain to the full node
    set with zero-fill — without it the domain is edge endpoints only,
    so edge-less nodes are absent (unlike ``pagerank_fixed``/
    ``hits_fixed``, which always take the node table)."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
        .localCheckpoint(eager=True)
    )
    w1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    w2 = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    wedges = w1.join(w2, "b").where(F.col("a") != F.col("c"))
    closer = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    tris = wedges.join(closer, ["a", "c"])
    corners = (
        tris.select(F.col("a").alias("id"))
        .unionAll(tris.select(F.col("b").alias("id")))
        .unionAll(tris.select(F.col("c").alias("id")))
    )
    domain = nodes.select("id") if nodes is not None else deg.select("id")
    return (
        domain
        .join(corners.groupBy("id").agg(F.count("*").alias("n_triangles")),
              "id", "left")
        .select(
            "id", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
        )
    )
