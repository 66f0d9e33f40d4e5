"""Column profiler: hand-checked stats, NULL handling, validation."""

from __future__ import annotations

import pytest

from activedatawarehouseprototype_spark.operators.profile import (
    profile_table,
)


def test_hand_checked_profile(spark):
    df = spark.createDataFrame(
        [
            (1, "a", None),
            (2, "b", 5.0),
            (2, None, 7.5),
            (3, "a", None),
        ],
        "k bigint, s string, v double",
    )
    rows = {r["col"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    k = rows["k"]
    assert (k["n"], k["n_null"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_str"], k["max_str"]) == ("1", "3")
    s = rows["s"]
    assert (s["n"], s["n_null"], s["n_distinct"]) == (4, 1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    v = rows["v"]
    assert (v["n"], v["n_null"], v["n_distinct"]) == (4, 2, 2)


def test_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    r = profile_table(df).collect()[0]
    assert (r["n"], r["n_null"], r["n_distinct"]) == (2, 2, 0)
    assert r["min_str"] is None and r["max_str"] is None


def test_column_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    out = profile_table(df, ["s"]).collect()
    assert [r["col"] for r in out] == ["s"]
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError):
        profile_table(df, [])
