"""Property-based tests for the round-9 second-wave operators: each
Spark implementation must agree with a deliberately naive pure-Python
interpreter of the documented semantics (no shared code)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- transition_counts vs a naive sequence walk ---------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),      # key
        st.integers(0, 20),     # ts
        st.integers(0, 1000),   # tie (unique-ified below)
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1,
    max_size=40,
)


@pytest.mark.slow
@settings(**_SETTINGS)
@given(evs=events_strategy)
def test_transition_counts_property(spark, evs):
    from activedatawarehouseprototype_spark.operators.timeseries import (
        transition_counts,
    )

    # unique tie per row (real event ids are unique) so both the naive
    # walk and the window order are total
    rows = [(k, ts, i, s) for i, (k, ts, _, s) in enumerate(evs)]
    df = spark.createDataFrame(rows, "k long, ts long, tie long, s string")
    got = {
        (r["src"], r["dst"]): (r["n"], r["p"])
        for r in transition_counts(df, "k", "ts", "s", "tie").collect()
    }

    seqs: dict[int, list[tuple[int, int, str]]] = {}
    for k, ts, tie, s in rows:
        seqs.setdefault(k, []).append((ts, tie, s))
    counts: dict[tuple[str, str], int] = {}
    for xs in seqs.values():
        xs.sort()
        for (_, _, a), (_, _, b) in zip(xs, xs[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    per_src: dict[str, int] = {}
    for (a, _), n in counts.items():
        per_src[a] = per_src.get(a, 0) + n
    want = {
        (a, b): (n, n / per_src[a]) for (a, b), n in counts.items()
    }
    assert got == want


# --- two_proportion_ztest vs the closed form -------------------------------

counts_strategy = st.tuples(
    st.integers(1, 40),  # n_a
    st.integers(1, 40),  # n_b
    st.integers(0, 40),  # conv_a (capped below)
    st.integers(0, 40),  # conv_b
)


@pytest.mark.slow
@settings(**_SETTINGS)
@given(c=counts_strategy)
def test_ztest_property(spark, c):
    from activedatawarehouseprototype_spark.operators.abtest import (
        two_proportion_ztest,
    )

    n_a, n_b, conv_a, conv_b = c
    conv_a, conv_b = min(conv_a, n_a), min(conv_b, n_b)
    rows = (
        [("g", "A", 1)] * conv_a + [("g", "A", 0)] * (n_a - conv_a)
        + [("g", "B", 1)] * conv_b + [("g", "B", 0)] * (n_b - conv_b)
    )
    df = spark.createDataFrame(rows, "g string, arm string, converted int")
    r = two_proportion_ztest(df, ["g"]).collect()[0]
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (
        n_a, n_b, conv_a, conv_b,
    )
    pooled = (conv_a + conv_b) / (n_a + n_b)
    var = pooled * (1.0 - pooled) * (1.0 / n_a + 1.0 / n_b)
    if var > 0:
        want = round(
            (conv_a / n_a - conv_b / n_b) / math.sqrt(var), 6
        )
        assert r["z"] == want
        assert r["significant"] == (abs(want) > 1.959964)
    else:
        assert r["z"] is None and r["significant"] is None


# --- cluster_safe_split vs union-find --------------------------------------

pairs_strategy = st.lists(
    st.tuples(st.integers(1, 12), st.integers(1, 12)),
    max_size=15,
)


@pytest.mark.slow
@settings(**_SETTINGS)
@given(ps=pairs_strategy)
@pytest.mark.slow
def test_cluster_safe_split_components_property(spark, ps):
    from pyspark.sql import Row

    from activedatawarehouseprototype_spark.operators.sampling import (
        cluster_safe_split,
    )

    ps = [(a, b) for a, b in ps if a != b]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="t") for i in range(1, 13)]
    )
    if ps:
        pairs = spark.createDataFrame(
            [Row(id_a=a, id_b=b) for a, b in ps]
        )
    else:
        pairs = spark.createDataFrame(
            [], "id_a long, id_b long"
        )
    got = {
        r["doc_id"]: r["cluster"]
        for r in cluster_safe_split(docs, "doc_id", pairs).collect()
    }

    parent = {i: i for i in range(1, 13)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in ps:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id = find root under min-union
    want = {i: min(j for j in range(1, 13) if find(j) == find(i))
            for i in range(1, 13)}
    assert got == want


# --- kcore vs naive peeling -------------------------------------------------


def _naive_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for u in adj.pop(v):
                adj[u].discard(v)
            changed = True
    return {v: len(ns) for v, ns in adj.items() if ns}


def test_kcore_hand_graph(spark):
    from pyspark.sql import Row

    from activedatawarehouseprototype_spark.operators.graph import kcore

    # triangle {1,2,3} + chain 3-4-5 (peels in 2 cascading rounds)
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r["node"]: r["degree"] for r in kcore(df, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}  # the triangle, in-core degrees


def test_kcore_drops_self_loops_both_directions(spark):
    """Round-10 advice regression: a self-loop (x, x) must not inflate
    x's degree via the REVERSED union branch. Node 3 has one real
    neighbor plus a self-loop — it must NOT survive a 2-core."""
    from pyspark.sql import Row

    from activedatawarehouseprototype_spark.operators.graph import kcore

    edges = [(1, 2), (2, 3), (1, 3), (1, 4), (4, 4)]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r["node"]: r["degree"] for r in kcore(df, k=2).collect()}
    # with the bug, 4's self-loop survives the reversed branch, its
    # degree reads 2, and NOTHING peels: {1,2,3,4} all "survive"
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_raises_without_fixpoint(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from activedatawarehouseprototype_spark.operators.graph import kcore

    # chain 1-2-3-4: k=2 peeling needs 2 rounds; max_iter=1 must raise,
    # never return the partial peel
    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in [(1, 2), (2, 3), (3, 4)]]
    )
    with _pytest.raises(RuntimeError, match="fixpoint"):
        kcore(df, k=2, max_iter=1)


@pytest.mark.slow
@settings(**_SETTINGS)
@given(
    es=st.lists(
        st.tuples(st.integers(1, 10), st.integers(1, 10)), max_size=20
    ),
    k=st.integers(1, 3),
)
@pytest.mark.slow
def test_kcore_property(spark, es, k):
    from pyspark.sql import Row

    from activedatawarehouseprototype_spark.operators.graph import kcore

    es = [(a, b) for a, b in es if a != b]
    if es:
        df = spark.createDataFrame([Row(src=a, dst=b) for a, b in es])
    else:
        df = spark.createDataFrame([], "src long, dst long")
    got = {r["node"]: r["degree"] for r in kcore(df, k=k).collect()}
    assert got == _naive_kcore(es, k)
