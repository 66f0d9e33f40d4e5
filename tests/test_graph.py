"""PageRank semantics pinned on tiny hand-computable graphs — the
corpus entry (graph_pagerank_suppliers) checks the full pipeline vs
the DuckDB-unrolled oracle; these pin the operator's contract directly.
"""

from __future__ import annotations

import math

import pytest

from activedatawarehouseprototype_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    return {
        r.node: r.rank for r in pagerank(df, weight="w", **kw).collect()
    }


def test_cycle_stays_uniform(spark):
    """On a directed cycle every node keeps rank 1/N at every
    iteration (the stationary distribution from a uniform start)."""
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)]
    for iters in (1, 3):
        got = _ranks(spark, edges, iters=iters)
        for v in (1, 2, 3):
            assert math.isclose(got[v], 1 / 3, rel_tol=1e-12)


def test_star_first_iteration_hand_computed(spark):
    """A -> B, C -> B after one superstep (d=0.85, N=3):
    r(B) = 0.15/3 + 0.85*(1/3 + 1/3); r(A) = r(C) = 0.15/3.
    A and C are dangling — the leaky variant lets their mass decay."""
    got = _ranks(spark, [(1, 2, 1.0), (3, 2, 1.0)], iters=1)
    assert math.isclose(got[2], 0.05 + 0.85 * (2 / 3), rel_tol=1e-12)
    assert math.isclose(got[1], 0.05, rel_tol=1e-12)
    assert math.isclose(got[3], 0.05, rel_tol=1e-12)
    # leaky: total mass < 1 in the presence of dangling nodes
    assert sum(got.values()) < 1.0


def test_weights_shift_rank(spark):
    """A splits 3:1 between B and C — B must outrank C, and the two
    in-contributions must be exactly 3x apart."""
    got = _ranks(
        spark, [(1, 2, 3.0), (1, 3, 1.0)], iters=1
    )
    in_b, in_c = got[2] - 0.05, got[3] - 0.05
    assert math.isclose(in_b, 3 * in_c, rel_tol=1e-12)


def test_validation(spark):
    df = spark.createDataFrame([(1, 2, 1.0)], "src bigint, dst bigint, w double")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_rank_mass_bounds(spark):
    """Every rank >= (1-d)/N (the teleport floor) and the total is
    <= 1 (leaky) — the two invariants any PageRank must satisfy."""
    edges = [(i, (i * 7) % 10, 1.0 + (i % 3)) for i in range(10)] + [
        (2, 5, 2.0),
        (7, 5, 1.0),
    ]
    got = _ranks(spark, edges, iters=4)
    n = len(got)
    floor = 0.15 / n
    assert all(r >= floor - 1e-12 for r in got.values())
    assert sum(got.values()) <= 1.0 + 1e-9
