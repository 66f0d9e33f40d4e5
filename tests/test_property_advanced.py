"""Property-based tests for the round-6 operators: each Spark
implementation must agree with a deliberately naive pure-Python
interpreter of the documented semantics (no shared code)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

interval_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),  # block
        st.integers(0, 30),  # lo
        st.integers(0, 12),  # length
    ),
    min_size=1,
    max_size=40,
)


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ivs=interval_strategy)
def test_interval_sweep_property(spark, ivs):
    from activedatawarehouseprototype_spark.operators.range_join import (
        interval_overlap_pair_counts,
    )

    rows = [(blk, lo, lo + ln) for blk, lo, ln in ivs]
    df = spark.createDataFrame(rows, "blk long, lo long, hi long")
    got = {
        r.blk: r.n_pairs
        for r in interval_overlap_pair_counts(df, "blk", "lo", "hi").collect()
    }
    want: dict[int, int] = {}
    by = {}
    for blk, lo, hi in rows:
        by.setdefault(blk, []).append((lo, hi))
    for blk, xs in by.items():
        c = sum(
            1
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
            if xs[i][0] <= xs[j][1] and xs[j][0] <= xs[i][1]
        )
        if c:
            want[blk] = c
    assert got == want


snapshot_strategy = st.tuples(
    st.dictionaries(st.integers(0, 15), st.sampled_from(["a", "b", None]),
                    max_size=12),
    st.dictionaries(st.integers(0, 15), st.sampled_from(["a", "b", None]),
                    max_size=12),
)


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snaps=snapshot_strategy)
@pytest.mark.slow
def test_snapshot_diff_property(spark, snaps):
    from activedatawarehouseprototype_spark.operators.warehouse import (
        snapshot_diff,
    )

    old_d, new_d = snaps
    schema = "id long, v string"
    old = spark.createDataFrame(list(old_d.items()) or [(None, None)], schema)
    new = spark.createDataFrame(list(new_d.items()) or [(None, None)], schema)
    if not old_d:
        old = old.filter("id IS NOT NULL")
    if not new_d:
        new = new.filter("id IS NOT NULL")
    got = {r.id: r.op for r in snapshot_diff(old, new, ["id"]).collect()}
    want = {}
    for k in set(old_d) | set(new_d):
        if k not in old_d:
            want[k] = "added"
        elif k not in new_d:
            want[k] = "removed"
        elif old_d[k] != new_d[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"  # incl. NULL == NULL
    assert got == want


quota_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=1, max_size=40
).filter(lambda xs: len({k for _, k in xs}) == len(xs))


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=quota_strategy, cap=st.integers(1, 6))
@pytest.mark.slow
def test_group_quota_cap_property(spark, rows, cap):
    """Exact per-group cap; survivors are a pure function of the key
    (idempotence: capping the capped output changes nothing)."""
    from activedatawarehouseprototype_spark.operators.sampling import (
        group_quota_cap,
    )

    df = spark.createDataFrame(rows, "g long, k long")
    capped = group_quota_cap(df, ["g"], ["k"], max_per_group=cap)
    out = capped.collect()
    sizes: dict[int, int] = {}
    for g, _ in rows:
        sizes[g] = sizes.get(g, 0) + 1
    per: dict[int, int] = {}
    for r in out:
        per[r.g] = per.get(r.g, 0) + 1
    for g, n in sizes.items():
        assert per.get(g, 0) == min(cap, n)
    again = group_quota_cap(capped, ["g"], ["k"], max_per_group=cap)
    assert {(r.g, r.k) for r in again.collect()} == {
        (r.g, r.k) for r in out
    }
