"""PMI collocations: hand-computed scores on a tiny corpus, min-count
gate, cross-document independence of counts."""

from __future__ import annotations

import math

import pytest

from activedatawarehouseprototype_spark.operators.text import (
    pmi_collocations,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def test_hand_computed_pmi(spark):
    # "a b" appears 3x; tokens: a:3, b:3 of N=6; pairs: N_pair=3
    # PMI = ln( (3/3) / ((3/6)*(3/6)) ) = ln 4
    df = _docs(spark, ["a b", "a b", "a b"])
    out = pmi_collocations(df, "doc_id", "text", min_count=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["w1"], r["w2"], r["c_xy"]) == ("a", "b", 3)
    assert r["pmi"] == pytest.approx(round(math.log(4.0), 6), abs=1e-9)


def test_min_count_gate(spark):
    df = _docs(spark, ["x y", "p q", "p q"])
    out = pmi_collocations(df, "doc_id", "text", min_count=2).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("p", "q")]


def test_pairs_do_not_cross_documents(spark):
    # last token of doc 0 and first of doc 1 never pair
    df = _docs(spark, ["a b", "c d"])
    out = pmi_collocations(df, "doc_id", "text", min_count=1).collect()
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("b", "c") not in pairs
    assert pairs == {("a", "b"), ("c", "d")}
