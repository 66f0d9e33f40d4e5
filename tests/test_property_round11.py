"""Property-based tests for the round-11 operators: the
large-star/small-star connected components must agree with a naive
pure-Python union-find on arbitrary small graphs (no shared code)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from activedatawarehouseprototype_spark.operators.dedup import (
    connected_components_twostar,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_strategy = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)),
    min_size=1,
    max_size=40,
)


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {(n, comp_min[find(n)]) for n in parent}


@settings(**_SETTINGS)
@given(pairs=edges_strategy)
@pytest.mark.slow
def test_twostar_agrees_with_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    got = {
        (r.id, r.comp) for r in connected_components_twostar(df).collect()
    }
    assert got == _union_find(pairs)
