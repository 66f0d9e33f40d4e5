"""Bloom-filter semi-join pruning: never a false negative (the exact
result contract), effective pruning on disjoint keys, and the plan
shape that makes it worth having — the probe filter is a map-side
Column, not a join."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.bloom_filter import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_semi_join,
)

SF = "/root/testdata/sf0.001"


def test_params_sizing_monotone():
    m1, k1 = bloom_params(1_000, 0.01)
    m2, _ = bloom_params(1_000, 0.001)
    m3, _ = bloom_params(10_000, 0.01)
    assert m2 > m1 and m3 > m1
    assert m1 % 64 == 0 and k1 >= 1
    with pytest.raises(ValueError):
        bloom_params(100, 1.5)


def test_no_false_negatives_and_null_is_false(spark):
    df = spark.range(0, 5_000).select((F.col("id") * 7).alias("k"))
    bf = bloom_build(df, "k", num_bits=1 << 14, k=5)
    # every inserted key must test positive
    misses = (
        df.filter(~bloom_might_contain(bf, F.col("k"))).count()
    )
    assert misses == 0
    nulls = spark.sql("SELECT CAST(NULL AS BIGINT) AS k")
    assert nulls.filter(bloom_might_contain(bf, F.col("k"))).count() == 0


def test_pruning_effective_on_disjoint_keys(spark):
    """Keys 0..999 inserted; probes 1M..1M+10k are all absent — the
    filter must reject the vast majority (fpp-bounded), proving it
    actually cuts shuffle input rather than passing everything."""
    build = spark.range(0, 1_000).select(F.col("id").alias("k"))
    num_bits, k = bloom_params(1_000, 0.01)
    bf = bloom_build(build, "k", num_bits=num_bits, k=k)
    probe = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    survivors = probe.filter(bloom_might_contain(bf, F.col("k"))).count()
    assert survivors < 10_000 * 0.05  # 5x headroom over the 1% target


def test_semi_join_exact_vs_plain(spark):
    """bloom_semi_join == plain LEFT SEMI on real tables (orders
    pruned by a customer slice), including NULL-key behavior."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    hot = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    got = bloom_semi_join(orders, hot, "o_custkey", "c_custkey").collect()
    want = orders.join(
        hot, orders["o_custkey"] == hot["c_custkey"], "left_semi"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    build_keys=st.lists(st.integers(-1000, 1000), min_size=0, max_size=50),
    probe_keys=st.lists(
        st.one_of(st.integers(-1000, 1000), st.none()), min_size=1, max_size=50
    ),
)
@pytest.mark.slow
def test_property_semi_join_equals_set_semantics(spark, build_keys, probe_keys):
    small = spark.createDataFrame(
        [(k,) for k in build_keys] or [(None,)], "k bigint"
    )
    if not build_keys:
        small = small.filter(F.col("k").isNotNull())
    big = spark.createDataFrame([(k,) for k in probe_keys], "k bigint")
    got = sorted(
        r["k"] for r in bloom_semi_join(big, small, "k").collect()
    )
    want = sorted(k for k in probe_keys if k is not None and k in set(build_keys))
    assert got == want


def test_plan_probe_filter_is_map_side(spark):
    """The Bloom probe must appear as a Filter BELOW the semi join on
    the big side (map-side, pre-shuffle) — pruning after the join
    would be dead weight."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    hot = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    out = bloom_semi_join(orders, hot, "o_custkey", "c_custkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_at = min(
        i for i in (plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"))
        if i >= 0
    )
    filt_at = plan.find("xxhash64")  # the probe's seeded position hashes
    assert filt_at > join_at >= 0  # probe filter is a child of the join


def test_xxhash64_long_matches_spark(spark):
    """The Arrow probe's numpy XXH64 must be bit-identical to Spark's
    xxhash64(long, seed) — any divergence silently breaks large-m
    membership."""
    import numpy as np

    from activedatawarehouseprototype_spark.operators.bloom_filter import (
        _xxhash64_long,
    )

    vals = [0, 1, -1, 63, 2**33, -(2**40), 7777777777, -123456789012345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for seed in (0, 1, 5, 42):
        want = [
            r["h"]
            for r in df.select(
                F.xxhash64(F.col("v"), F.lit(seed)).alias("h")
            ).collect()
        ]
        got = (
            _xxhash64_long(np.array(vals, dtype=np.int64), seed)
            .view(np.int64)
            .tolist()
        )
        assert got == want, f"seed {seed}"


def test_large_m_dispatches_to_arrow_and_agrees(spark):
    """At m=2^22 (65536 words) the probe must switch to the Arrow
    path (no megabyte SQL literal in the plan) and return the exact
    same memberships as the inline rendering."""
    from activedatawarehouseprototype_spark.operators.bloom_filter import (
        bloom_build,
        bloom_might_contain,
    )

    keys = spark.range(0, 3000, 3).select(F.col("id").alias("k"))
    bf = bloom_build(keys, "k", num_bits=1 << 22, k=5)
    assert len(bf.words) == (1 << 22) // 64

    probe = spark.range(0, 500).select(F.col("id").alias("k"))
    arrow_col = bloom_might_contain(bf, "k")
    got = probe.select("k", arrow_col.alias("hit"))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "EvalPython" in plan
    # raising the inline cap forces the SQL rendering for comparison
    inline = probe.select(
        "k",
        bloom_might_contain(bf, "k", max_inline_words=1 << 20).alias("hit"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, inline.collect())
    )
    # no false negatives by construction
    members = {r["k"] for r in got.filter("hit").collect()}
    assert set(range(0, 500, 3)) <= members


def test_large_m_column_arg_raises(spark):
    from activedatawarehouseprototype_spark.operators.bloom_filter import (
        bloom_build,
        bloom_might_contain,
    )

    keys = spark.range(10).select(F.col("id").alias("k"))
    bf = bloom_build(keys, "k", num_bits=1 << 22, k=3)
    with pytest.raises(ValueError, match="Arrow path"):
        bloom_might_contain(bf, F.col("k"))
