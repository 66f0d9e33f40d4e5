"""Count-Min sketch: never under-estimates, exact when width is ample,
merges losslessly (cell-wise sum == sketch of the union), weighted
counts."""

from __future__ import annotations

import pytest
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.sketches import (
    cms_build,
    cms_estimate,
)

W, D = 256, 4


def _ests(spark, rows, width=W, depth=D):
    df = spark.createDataFrame([(v,) for v in rows], "v string")
    sk = cms_build(df, "v", width=width, depth=depth)
    keys = df.filter(F.col("v").isNotNull()).select("v").distinct()
    return {
        r["v"]: r["est"]
        for r in cms_estimate(sk, keys, "v", width=width, depth=depth).collect()
    }


def test_never_underestimates_and_exact_when_wide(spark):
    rows = [f"k{i % 17}" for i in range(500)] + [None] * 10
    exact = Counter(v for v in rows if v is not None)
    est = _ests(spark, rows)
    for k, c in exact.items():
        assert est[k] >= c
    # 17 keys in a 256x4 grid: collisions possible but min-over-rows
    # across 4 independent rows makes over-estimates vanishingly rare
    wide = _ests(spark, rows, width=4096, depth=5)
    assert wide == dict(exact)


def test_merge_is_cellwise_sum(spark):
    a = ["x"] * 3 + ["y"] * 2
    b = ["y"] * 5 + ["z"]
    df_a = spark.createDataFrame([(v,) for v in a], "v string")
    df_b = spark.createDataFrame([(v,) for v in b], "v string")
    sk_a = cms_build(df_a, "v", width=W, depth=D)
    sk_b = cms_build(df_b, "v", width=W, depth=D)
    merged = (
        sk_a.unionByName(sk_b).groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(df_a.unionByName(df_b), "v", width=W, depth=D)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_weighted_counts(spark):
    df = spark.createDataFrame(
        [("x", 10), ("x", 5), ("y", 2)], "v string, w long"
    )
    sk = cms_build(df, "v", width=4096, depth=5, weight_col="w")
    keys = df.select("v").distinct()
    est = {
        r["v"]: r["est"]
        for r in cms_estimate(sk, keys, "v", width=4096, depth=5).collect()
    }
    assert est == {"x": 15, "y": 2}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.one_of(st.sampled_from("abcdefgh"), st.none()),
        min_size=1,
        max_size=80,
    )
)
@pytest.mark.slow
def test_property_est_ge_exact(spark, rows):
    exact = Counter(v for v in rows if v is not None)
    if not exact:
        return
    est = _ests(spark, list(rows), width=64, depth=3)  # narrow: collisions
    for k, c in exact.items():
        assert est[k] >= c


def test_estimate_preserves_duplicate_key_rows(spark):
    """cms_estimate must return one output row PER INPUT ROW of keys —
    duplicate keys are not collapsed (advice-r8 finding)."""
    df = spark.createDataFrame([(f"k{i % 3}",) for i in range(30)], "v string")
    sk = cms_build(df, "v", width=W, depth=D)
    keys = spark.createDataFrame(
        [("k0",), ("k0",), ("k1",)], "v string"
    )
    out = cms_estimate(sk, keys, "v", width=W, depth=D).collect()
    assert sorted(r["v"] for r in out) == ["k0", "k0", "k1"]
    ests = {r["v"]: r["est"] for r in out}
    assert ests["k0"] >= 10 and ests["k1"] >= 10
