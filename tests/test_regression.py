"""Grouped closed-form OLS: hand-computed fits, rebase invariance,
degenerate groups, NULL exclusion."""

from __future__ import annotations

import pytest

from activedatawarehouseprototype_spark.operators.regression import (
    grouped_ols,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, x long, y long")


def test_hand_computed_line(spark):
    # y = 3 + 2x exactly: slope 2, intercept 3
    rows = [("a", x, 3 + 2 * x) for x in range(5)]
    r = grouped_ols(_df(spark, rows), ["g"], "x", "y").collect()[0]
    assert r["n"] == 5
    assert r["slope_num"] / r["slope_den"] == 2.0
    assert r["slope"] == 2.0
    assert r["intercept"] == 3.0


def test_rebase_leaves_slope_identical(spark):
    # OLS slope is translation-invariant in x: huge epoch-like x with
    # rebase must equal the small-x fit, and the moments stay small
    rows = [("a", 1_700_000_000 + x, 10 + 7 * x) for x in range(6)]
    r = grouped_ols(_df(spark, rows), ["g"], "x", "y", rebase_x=True)
    row = r.collect()[0]
    assert row["slope_num"] / row["slope_den"] == 7.0
    assert row["sxx"] == sum(x * x for x in range(6))


def test_degenerate_groups_null_slope(spark):
    rows = [("single", 4, 9), ("flat", 2, 5), ("flat", 2, 11)]
    out = {r["g"]: r for r in grouped_ols(_df(spark, rows), ["g"], "x", "y").collect()}
    assert out["single"]["slope"] is None
    assert out["flat"]["slope"] is None  # zero x-variance
    assert out["flat"]["slope_den"] == 0


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1, 2), ("a", None, 9), ("a", 2, None), ("a", 3, 6)],
        "g string, x long, y long",
    )
    r = grouped_ols(df, ["g"], "x", "y").collect()[0]
    assert r["n"] == 2
    assert r["slope"] == 2.0
