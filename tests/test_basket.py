"""frequent_pairs vs a naive Python interpreter: dedup within basket,
canonical a<b orientation, NULL exclusion, basket-size cap, min
support."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.basket import frequent_pairs


def _naive(rows, min_support=1, cap=None):
    baskets: dict = {}
    for b, i in rows:
        if b is None or i is None:
            continue
        baskets.setdefault(b, set()).add(i)
    counts: dict = {}
    for items in baskets.values():
        if cap is not None and len(items) > cap:
            continue
        for a, b in combinations(sorted(items), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return sorted(
        (a, b, c) for (a, b), c in counts.items() if c >= min_support
    )


def test_small_example(spark):
    rows = [
        (1, "x"), (1, "y"), (1, "z"), (1, "x"),  # dup x counts once
        (2, "x"), (2, "y"),
        (3, "z"), (None, "x"), (3, None),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = sorted(
        tuple(r) for r in frequent_pairs(df, "basket", "item").collect()
    )
    assert got == [("x", "y", 2), ("x", "z", 1), ("y", "z", 1)]


def test_min_support_and_cap(spark):
    rows = [(1, i) for i in range(5)] + [(2, 0), (2, 1)]
    df = spark.createDataFrame(rows, "basket int, item int")
    # cap=4 drops basket 1 entirely (5 distinct items)
    got = sorted(
        tuple(r)
        for r in frequent_pairs(
            df, "basket", "item", max_basket_items=4
        ).collect()
    )
    assert got == [(0, 1, 1)]
    # min_support=2: only the pair present in both baskets
    got2 = sorted(
        tuple(r)
        for r in frequent_pairs(df, "basket", "item", min_support=2).collect()
    )
    assert got2 == [(0, 1, 2)]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.integers(0, 5), st.none()),
            st.one_of(st.integers(0, 8), st.none()),
        ),
        min_size=0,
        max_size=60,
    ),
    min_support=st.integers(1, 3),
    cap=st.one_of(st.none(), st.integers(1, 6)),
)
def test_property_vs_naive(spark, rows, min_support, cap):
    df = spark.createDataFrame(
        rows or [(None, None)], "basket int, item int"
    )
    got = sorted(
        tuple(r)
        for r in frequent_pairs(
            df, "basket", "item", min_support=min_support, max_basket_items=cap
        ).collect()
    )
    assert got == _naive(rows, min_support=min_support, cap=cap)


def test_plan_single_item_shuffle_and_pruned_scan(spark):
    """One shuffle on the basket key before pair expansion (the pair
    count's shuffle touches only pair rows), and the scan reads only
    the two needed columns."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    fp = frequent_pairs(li, "l_orderkey", "l_partkey")
    plan = fp._jdf.queryExecution().executedPlan().toString()
    gen_at = plan.find("Generate explode")
    assert gen_at >= 0
    below_expand = plan[gen_at:]
    assert below_expand.count("Exchange") == 1  # only the basket shuffle
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in plan
