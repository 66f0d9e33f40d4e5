"""Iterative graph algorithms over edge DataFrames.

Complements ``dedup.connected_components`` (min-label propagation with
pointer doubling) with PageRank — the canonical "importance over a
relationship graph" primitive a warehouse uses for entity ranking
(suppliers by trade flow, documents by citation, hosts by links) —
plus triangle counting and k-core peeling (density/community
structure over the same edge tables).

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

    Returns (node, rank) with ``node`` = every distinct endpoint of
    the NULL-free edge set: edges with a NULL endpoint (either side)
    are DROPPED up front, exactly like ``triangle_counts``. Rank over
    a "node" with no identity is not meaningful, and filtering both
    sides explicitly is what makes deriving the node set from the
    checkpointed ``norm`` frame below provably equivalent to deriving
    it from ``edges`` (round-11 ADVICE: the outw inner join silently
    dropped NULL ``src`` rows but kept NULL ``dst`` as a node —
    an asymmetric, undocumented contract).
    Scale: per superstep one hash join (edges x ranks on ``src``) and
    one aggregation (by ``dst``) — no driver-side data, no collect;
    N is the single control-plane scalar."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.filter(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    ).select(
        F.col(src).cast("bigint").alias("src"),
        F.col(dst).cast("bigint").alias("dst"),
        w.alias("w"),
    )
    # normalized out-weights once: contribution of edge (u,v) is
    # rank(u) * w/outw(u)
    outw = e.groupBy("src").agg(F.sum("w").alias("_ow"))
    norm = e.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("_ow")).alias("nw")
    ).localCheckpoint(eager=False)
    # nodes come from the checkpointed NORM, not from ``edges``: with
    # NULL endpoints filtered above, outw covers every remaining src,
    # so the inner join keeps every edge row and the endpoint set is
    # unchanged — deriving it upstream would evaluate the (often
    # expensive) edge input a second time. The count below is the ONE
    # materializing job for both frames.
    nodes = (
        norm.select(F.col("src").alias("node"))
        .unionByName(norm.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # control-plane scalar
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

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


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts of the UNDIRECTED simple graph behind
    ``edges`` (direction and duplicate edges are collapsed; self-loops
    dropped). Output: (node, triangles BIGINT), one row per node that
    touches at least one edge — isolated-in-triangles nodes report 0.

    Algorithm: the degree-ordered node-iterator (public, Schank &
    Wagner 2005 "forward" variant; the same orientation trick GraphX /
    Giraph-style systems use). Every undirected edge is oriented from
    its lower-rank endpoint to its higher-rank endpoint, where rank =
    (degree, node) — a total order. A triangle {a,b,c} then contains
    exactly ONE wedge a→b, a→c with both edges leaving the lowest-rank
    vertex, so joining oriented edges on their source enumerates every
    wedge once and a semi-join against the oriented edge set confirms
    closure without double counting.

    Why this survives scale/skew: in the naive wedge join, a hub with
    degree d contributes d² wedges; orientation caps every vertex's
    out-degree at O(sqrt(|E|)) (a classic arboricity bound), so the
    wedge table is O(|E|^1.5) worst-case and in practice near-linear —
    the skew of a celebrity node moves from d² to (its rank-forward
    degree)². All three joins shuffle on node / edge keys only."""
    e = (
        # native node type — a long cast would silently NULL (and so
        # DROP) string/uuid node ids; least/greatest and the rank
        # comparison below work on any orderable type
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        # lazy checkpoint: ``e`` feeds the degree table (twice, via
        # du/dv), the orientation join AND the final node lookup —
        # without the cut, the fwd localCheckpoint isolates its own
        # subtree and the final deg join re-evaluates the whole edge
        # input (e.g. a 4-table fact join) from scratch. One cascading
        # job still materializes everything.
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient u->v by rank (degree, node id): lower rank first
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    fwd = ranked.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
        .alias("o")
    ).select("o.s", "o.t").localCheckpoint(eager=False)

    w1 = fwd.select(F.col("s"), F.col("t").alias("x"))
    w2 = fwd.select(F.col("s"), F.col("t").alias("y"))
    wedges = w1.join(w2, "s").filter(F.col("x") < F.col("y"))
    closing = fwd.select(
        F.least("s", "t").alias("x"), F.greatest("s", "t").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"], "left_semi").select(
        F.col("s").alias("na"), F.col("x").alias("nb"), F.col("y").alias("nc")
    )
    per_node = (
        tris.select(F.col("na").alias("node"))
        .unionAll(tris.select(F.col("nb").alias("node")))
        .unionAll(tris.select(F.col("nc").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.select(F.col("n").alias("node"))
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("bigint").alias(
                "triangles"
            ),
        )
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """k-core decomposition membership (public algorithm — Seidman
    1983, "Network structure and minimum degree"): the maximal
    subgraph in which every vertex keeps degree >= k, found by
    repeatedly PEELING vertices of degree < k until a fixpoint. The
    warehouse reading: dense co-occurrence communities (parts bought
    together, entities co-mentioned) that survive after stripping
    casual one-off links.

    Returns (node, degree) for core members — ``degree`` is the
    IN-CORE degree, >= k by construction. Self-loops are dropped and
    the graph is treated as undirected (each edge counted once per
    endpoint).

    Scale shape (the pagerank/components discipline): each peel round
    is ONE degree aggregate + two anti-joins, all keyed on the vertex
    — co-locatable with an edge table bucketed by endpoint; lineage is
    cut per round (localCheckpoint) so the plan stays constant-size;
    the only driver traffic is one scalar (the number of vertices
    peeled) per round. Peeling is monotone, so rounds beyond the
    fixpoint are no-ops — which is exactly what lets a SQL twin
    unroll a fixed round count. Raises RuntimeError if ``max_iter``
    rounds don't reach the fixpoint (a silent partial peel would be a
    wrong answer).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    a, b = F.col(src).cast("bigint"), F.col(dst).cast("bigint")
    # symmetric closure as a self-union: ReuseExchange deduplicates the
    # branches' shared upstream exchange (see connected_components)
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .union(edges.select(b.alias("a"), a.alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    # Size the loop's parallelism to the GRAPH, not the session (the
    # connected_components discipline): a thresholded co-occurrence
    # graph is typically tiny next to the corpus, and paying
    # session-wide task scheduling for an aggregate + two anti-joins
    # + a checkpoint per peel round dominates wall time on small
    # graphs. One edge-count job up front (the frame is persisted and
    # every round reuses it); a billion-edge graph still gets full
    # parallelism.
    n_edges = und.count()
    sc = edges.sparkSession.sparkContext
    n_parts = max(1, min(sc.defaultParallelism, n_edges // 200_000 + 1))
    cur = und.repartition(n_parts, "a")
    converged = False
    # previous round's low-degree frame: released only AFTER the next
    # round's count has materialized the lazy checkpoint that reads it
    pending = None
    # single-partition graphs peel under non-adaptive single-partition
    # scheduling (operators/scheduling.py; same measured finding as
    # connected_components: with AQE each exchange per round is its
    # own stage-job, plus a broadcast build job per anti-join).
    from activedatawarehouseprototype_spark.operators.scheduling import (
        single_partition_loop,
    )

    try:
        with single_partition_loop(edges.sparkSession, n_parts):
            for _ in range(max_iter):
                deg = cur.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
                low = deg.filter(F.col("d") < k).select("a").persist()
                # ONE job per round: this count's plan runs low <- deg <-
                # cur, so it materializes the previous round's lazy
                # checkpoint AND caches low as a side effect — the
                # eager-checkpoint + count pair it replaces was two job
                # submissions for the same work
                n_low = low.count()
                if pending is not None:
                    pending.unpersist()
                    pending = None
                if n_low == 0:
                    converged = True
                    low.unpersist()
                    break
                cur = (
                    cur.join(low, "a", "left_anti")
                    .join(low.withColumnRenamed("a", "b"), "b", "left_anti")
                    .select("a", "b")
                    .localCheckpoint(eager=False)
                )
                pending = low
        if not converged:
            raise RuntimeError(
                f"kcore did not reach the peeling fixpoint in "
                f"{max_iter} rounds — raise max_iter (and widen the "
                f"oracle's unroll to match)"
            )
        return (
            cur.groupBy(F.col("a").alias("node"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        )
    finally:
        und.unpersist()
        if pending is not None:
            pending.unpersist()
