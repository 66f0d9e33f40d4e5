"""Triangle counting (degree-ordered node-iterator): planted
topologies with known counts, invariance to direction/duplicates/
self-loops, a brute-force twin on a random graph, and the DuckDB
oracle for the fixture entry (``graph_triangle_counts``)."""

from __future__ import annotations

import itertools

import duckdb
import pytest

from activedatawarehouseprototype_spark.operators.graph import triangle_counts

SF = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def _got(spark, pairs):
    return {
        r["node"]: r["triangles"]
        for r in triangle_counts(_edges(spark, pairs)).collect()
    }


def test_single_triangle(spark):
    got = _got(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_k4_every_node_in_three(spark):
    got = _got(spark, list(itertools.combinations([1, 2, 3, 4], 2)))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_path_and_star_have_none(spark):
    got = _got(spark, [(1, 2), (2, 3), (3, 4), (0, 5), (0, 6), (0, 7)])
    assert set(got.values()) == {0}
    assert set(got) == {0, 1, 2, 3, 4, 5, 6, 7}  # every touched node reports


def test_direction_duplicates_selfloops_collapse(spark):
    got = _got(
        spark,
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1), (2, 3), (3, 3)],
    )
    assert got == {1: 1, 2: 1, 3: 1}


def test_matches_bruteforce_on_random_graph(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(40))
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(220)
            )
            if a != b
        }
    )
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for n in nodes:
        cnt = 0
        for x, y in itertools.combinations(sorted(adj[n]), 2):
            if y in adj[x]:
                cnt += 1
        if adj[n]:
            want[n] = cnt
    got = _got(spark, [(a, b) for a, b in pairs])
    assert got == want
    assert sum(want.values()) > 0  # non-vacuous


ORACLE_SQL = """
WITH raw AS (
  SELECT c.c_nationkey AS a, s.s_nationkey AS b
  FROM read_parquet('{sf}/orders.parquet') o
  JOIN read_parquet('{sf}/customer.parquet') c ON o.o_custkey = c.c_custkey
  JOIN read_parquet('{sf}/lineitem.parquet') l ON l.l_orderkey = o.o_orderkey
  JOIN read_parquet('{sf}/supplier.parquet') s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
e AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM raw
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
per_node AS (
  SELECT node, COUNT(*) AS t FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT CAST(n.node AS BIGINT) AS node,
       CAST(COALESCE(p.t, 0) AS BIGINT) AS triangles
FROM nodes n LEFT JOIN per_node p USING (node)
ORDER BY node
"""


def test_fixture_trade_graph_matches_duckdb_oracle(spark):
    """The corpus entry's exact shape: the undirected nation trade
    graph (customer nation <-> supplier nation via orders/lineitem)."""
    from activedatawarehouseprototype_spark.catalog import load
    from pyspark.sql import functions as F

    o = load(spark, SF, "orders")
    c = load(spark, SF, "customer")
    l = load(spark, SF, "lineitem")
    s = load(spark, SF, "supplier")
    raw = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
    )
    got = [
        (r["node"], r["triangles"])
        for r in triangle_counts(raw).orderBy("node").collect()
    ]
    want = duckdb.sql(ORACLE_SQL.format(sf=SF)).fetchall()
    assert len(got) == len(want) > 0
    assert got == want
    assert sum(t for _, t in got) > 0  # the trade graph is dense: non-vacuous


def test_string_node_ids_survive(spark):
    """Node ids keep their native type — a long cast would NULL (and
    silently drop) string ids."""
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "d": 0}
