"""Property-based tests for the round-10 operators: each Spark
implementation must agree with a deliberately naive pure-Python
interpreter of the documented semantics (no shared code)."""

from __future__ import annotations

import math
from fractions import Fraction

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- exact_substring_spans vs a naive gram counter ------------------------

docs_strategy = st.lists(
    st.lists(st.sampled_from(list("abcd")), min_size=0, max_size=14),
    min_size=1,
    max_size=6,
)


def _naive_spans(docs: list[list[str]], n: int, min_count: int):
    """Count every length-n window across the corpus, mark positions
    whose window repeats >= min_count times, merge overlapping/touching
    fixed-length intervals per doc."""
    counts: dict[tuple, int] = {}
    for words in docs:
        for i in range(len(words) - n + 1):
            g = tuple(words[i : i + n])
            counts[g] = counts.get(g, 0) + 1
    out = set()
    for did, words in enumerate(docs):
        hits = [
            i
            for i in range(len(words) - n + 1)
            if counts[tuple(words[i : i + n])] >= min_count
        ]
        if not hits:
            continue
        start = prev = hits[0]
        for i in hits[1:]:
            if i - prev > n:  # gap: intervals no longer touch/overlap
                out.add((did, start, prev + n, prev + n - start))
                start = i
            prev = i
        out.add((did, start, prev + n, prev + n - start))
    return out


@pytest.mark.slow
@settings(**_SETTINGS)
@given(docs=docs_strategy, n=st.integers(2, 5))
def test_exact_substring_spans_property(spark, docs, n):
    from pyspark.sql import Row

    from activedatawarehouseprototype_spark.operators.dedup import (
        exact_substring_spans,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(w)) for i, w in enumerate(docs)]
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_words"])
        for r in exact_substring_spans(
            df, "doc_id", "text", ngram_words=n
        ).collect()
    }
    # split("", " ") yields [""] on both engines, so an empty doc is one
    # empty token — mirror that in the reference
    ref_docs = [w if w else [""] for w in docs]
    assert got == _naive_spans(ref_docs, n, 2)


# --- ridge_probe_solve vs exact rationals over random points --------------

points_strategy = st.lists(
    st.tuples(
        st.integers(-50, 50), st.integers(-50, 50), st.sampled_from([-1, 1])
    ),
    min_size=1,
    max_size=30,
)


@pytest.mark.slow
@settings(max_examples=50, deadline=None)
@given(pts=points_strategy, lam=st.integers(1, 5000))
def test_ridge_probe_solve_property(pts, lam):
    """For ANY integer point set and lam >= 1: det > 0 holds (positive
    definiteness) and every weight is EXACTLY floor(1000 * det_i / det)
    of the Fraction-exact Cramer solution."""
    from activedatawarehouseprototype_spark.operators.regression import (
        ridge_probe_solve,
    )

    s = {
        "n": len(pts),
        "s1": sum(x1 for x1, _, _ in pts),
        "s2": sum(x2 for _, x2, _ in pts),
        "s11": sum(x1 * x1 for x1, _, _ in pts),
        "s12": sum(x1 * x2 for x1, x2, _ in pts),
        "s22": sum(x2 * x2 for _, x2, _ in pts),
        "sy": sum(y for _, _, y in pts),
        "s1y": sum(x1 * y for x1, _, y in pts),
        "s2y": sum(x2 * y for _, x2, y in pts),
    }
    w = ridge_probe_solve(s, lam=lam)

    A = [
        [Fraction(s["n"] + lam), Fraction(s["s1"]), Fraction(s["s2"])],
        [Fraction(s["s1"]), Fraction(s["s11"] + lam), Fraction(s["s12"])],
        [Fraction(s["s2"]), Fraction(s["s12"]), Fraction(s["s22"] + lam)],
    ]
    b = [Fraction(s["sy"]), Fraction(s["s1y"]), Fraction(s["s2y"])]

    def det3(m):
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    det = det3(A)
    assert det > 0
    for i in range(3):
        Ai = [row[:] for row in A]
        for r in range(3):
            Ai[r][i] = b[r]
        assert w[i] == math.floor(Fraction(1000) * det3(Ai) / det)
