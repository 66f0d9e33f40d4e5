"""Blocked levenshtein matching: in-block pairs only, unordered-pair
dedup, block cap, keeper rule."""

from __future__ import annotations

from activedatawarehouseprototype_spark.operators.fuzzy import (
    fuzzy_dedup_keeper,
    fuzzy_join_blocked,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "blk string, rid bigint, txt string"
    )


def test_in_block_pairs_and_distance(spark):
    df = _df(
        spark,
        [
            ("a", 1, "kitten"),
            ("a", 2, "sitten"),   # dist 1
            ("a", 3, "xyzzyq"),   # far from both
            ("b", 4, "kitten"),   # same text, different block: no pair
        ],
    )
    out = fuzzy_join_blocked(df, "blk", "rid", "txt", max_dist=2)
    rows = [(r["blk"], r["a_rid"], r["b_rid"], r["dist"]) for r in out.collect()]
    assert rows == [("a", 1, 2, 1)]


def test_unordered_pairs_never_duplicated(spark):
    df = _df(spark, [("a", i, "same") for i in range(1, 5)])
    out = fuzzy_join_blocked(df, "blk", "rid", "txt", max_dist=0).collect()
    pairs = {(r["a_rid"], r["b_rid"]) for r in out}
    assert len(out) == 6  # C(4,2)
    assert all(a < b for a, b in pairs)


def test_max_block_rows_excludes_mega_block(spark):
    rows = [("big", i, "same") for i in range(1, 8)] + [
        ("ok", 10, "same"),
        ("ok", 11, "same"),
    ]
    out = fuzzy_join_blocked(
        _df(spark, rows), "blk", "rid", "txt", max_dist=0, max_block_rows=5
    ).collect()
    assert {r["blk"] for r in out} == {"ok"}


def test_dedup_keeper_keeps_lowest_id(spark):
    df = _df(
        spark,
        [
            ("a", 1, "kitten"),
            ("a", 2, "sitten"),
            ("a", 3, "mitten"),
            ("a", 9, "unrelatedzzz"),
        ],
    )
    pairs = fuzzy_join_blocked(df, "blk", "rid", "txt", max_dist=2)
    kept = fuzzy_dedup_keeper(pairs, df, "rid")
    assert sorted(r["rid"] for r in kept.collect()) == [1, 9]


def test_strategies_agree_and_bad_strategy_raises(spark):
    import pytest

    rows = [("a", i, t) for i, t in enumerate(
        ["kitten", "sitten", "mitten", "zebra", "zebrb"])]
    rows += [("b", 10, "kitten"), ("b", 11, "bitten")]
    df = _df(spark, rows)
    co = fuzzy_join_blocked(df, "blk", "rid", "txt", max_dist=2)
    bc = fuzzy_join_blocked(
        df, "blk", "rid", "txt", max_dist=2, strategy="broadcast"
    )
    assert sorted(map(tuple, co.collect())) == sorted(
        map(tuple, bc.collect())
    )
    with pytest.raises(ValueError, match="strategy"):
        fuzzy_join_blocked(df, "blk", "rid", "txt", strategy="nope")
