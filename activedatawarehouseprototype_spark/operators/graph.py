"""Iterative graph algorithms over edge DataFrames.

Complements ``dedup.connected_components`` (min-label propagation with
pointer doubling) with PageRank — the canonical "importance over a
relationship graph" primitive a warehouse uses for entity ranking
(suppliers by trade flow, documents by citation, hosts by links).

Reference parity: the reference engine (a rule-streaming prototype,
see SURVEY §0) has no graph tier at all — this is a scale-path
extension. Design follows the public bulk-synchronous formulation
(Page et al. 1999; Malewicz et al. Pregel, SIGMOD 2010): ranks live in
a (node, rank) table, each superstep is one join + one aggregation —
both shuffles are ON THE NODE KEY, so at 100 TB the edge table can be
pre-bucketed by ``src`` and the rank join co-locates; lineage is cut
per iteration with ``localCheckpoint`` (an iterative plan would
otherwise grow exponentially and overwhelm the optimizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Weighted PageRank over ``edges`` for a FIXED iteration count.

    Semantics (deterministic, oracle-checkable): the *leaky* variant —
    a dangling node's rank mass is not redistributed, it decays into
    the teleport term. Every engine unrolling the same fixed ``iters``
    reproduces the exact values, which is what makes a SQL oracle twin
    possible; for ranking use-cases the ordering is the same as the
    mass-conserving variant on all but pathological graphs.

        r_0(v)     = 1/N
        r_{k+1}(v) = (1-d)/N + d * SUM_{(u,v) in E} r_k(u) * w(u,v)/outw(u)

    Returns (node, rank) with ``node`` = every distinct endpoint.
    Scale: per superstep one hash join (edges x ranks on ``src``) and
    one aggregation (by ``dst``) — no driver-side data, no collect;
    N is the single control-plane scalar."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).cast("bigint").alias("src"),
        F.col(dst).cast("bigint").alias("dst"),
        w.alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        # eager: the count() below materializes it anyway, and every
        # superstep + the final left join reuse the cached copy
        .localCheckpoint()
    )
    n = nodes.count()  # control-plane scalar
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # normalized out-weights once: contribution of edge (u,v) is
    # rank(u) * w/outw(u)
    outw = e.groupBy("src").agg(F.sum("w").alias("_ow"))
    # lazy: materializes with the first superstep's job and is cached
    # for the rest — no standalone pass just to checkpoint it
    norm = e.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("_ow")).alias("nw")
    ).localCheckpoint(eager=False)

    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            norm.join(ranks, norm.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("nw")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            # small iters: lazy checkpoint — the whole rank chain
            # computes in ONE cascading job instead of iters+1 (each
            # level caches as the cascade passes it). Large iters:
            # eager, because the lazy cascade's FIRST action compiles
            # a plan nesting every superstep — the exact plan blow-up
            # checkpointing exists to prevent.
            .localCheckpoint(eager=iters > 4)
        )
    if round_to is not None:
        ranks = ranks.select("node", F.round("rank", round_to).alias("rank"))
    return ranks
