"""Recursive CTE support (new in Spark 4.x): the IDENTICAL SQL text —
a WITH RECURSIVE reachability query over the nation trade graph — runs
on Spark and DuckDB and must agree exactly (the zero-dialect-
translation contract sql_shared_text_rollup pins for the core
relational dialect, extended to recursion).

Registered as the `sql_recursive_reachability` corpus entry in round 7
(corpus/extensions2.py) — the SQL text is imported from there so the
test and the driver entry can't drift.
"""

from __future__ import annotations

from activedatawarehouseprototype_spark.catalog import TABLES, load
from activedatawarehouseprototype_spark.corpus.extensions2 import REACHABILITY_SQL
from tests.oracle_harness import compare, run_oracle

SF = "/root/testdata/sf0.001"


def test_recursive_cte_shared_text_matches_duckdb(spark):
    for t in TABLES:
        load(spark, SF, t).createOrReplaceTempView(t)
    sdf = spark.sql(REACHABILITY_SQL)
    opdf = run_oracle(REACHABILITY_SQL, SF)
    assert compare(sdf, opdf) == []
    # non-vacuous: the traversal must actually reach beyond the anchor
    assert sdf.count() > 1


def test_recursive_cte_depth_bound_semantics(spark):
    """The hop bound is a real frontier cut: raising it can only ADD
    nodes (monotone reachability), and min_hops never exceeds it."""
    for t in TABLES:
        load(spark, SF, t).createOrReplaceTempView(t)
    three = {r.node: r.min_hops for r in spark.sql(REACHABILITY_SQL).collect()}
    one = {
        r.node: r.min_hops
        for r in spark.sql(REACHABILITY_SQL.replace("r.hops < 3", "r.hops < 1")).collect()
    }
    assert set(one) <= set(three)
    assert all(h <= 1 for h in one.values())
    assert all(h <= 3 for h in three.values())
    for n, h in one.items():
        assert three[n] == h  # min_hops of an already-reached node is stable
