"""lag_features: hand-computed per-key features, NULL exclusion,
trailing frames, validation."""

from __future__ import annotations

import datetime as dt

import pytest

from activedatawarehouseprototype_spark.operators.timeseries import lag_features


def _mk(spark, series):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(seconds=i), i, float(v))
        for k, xs in series.items()
        for i, v in enumerate(xs)
    ]
    return spark.createDataFrame(
        rows, "key string, ts timestamp, eid long, value double"
    )


def test_hand_computed(spark):
    df = _mk(spark, {"a": [10, 13, 11, 20]})
    got = {
        r["tie"]: r
        for r in lag_features(
            df, "key", "ts", "value", lags=(1, 2), trail=3, tie_col="eid"
        ).collect()
    }
    # row 0: no lags -> NULL lag cols, delta 0, trailing = itself
    assert got[0]["lag_1"] is None and got[0]["delta_1"] == 0.0
    assert got[0]["rmin_3"] == 10.0 and got[0]["rmax_3"] == 10.0
    # row 2: lag1=13, lag2=10, delta=-2, trailing over [10,13,11]
    assert got[2]["lag_1"] == 13.0 and got[2]["lag_2"] == 10.0
    assert got[2]["delta_1"] == -2.0
    assert got[2]["rmin_3"] == 10.0 and got[2]["rmax_3"] == 13.0
    # row 3: trailing window slides off row 0
    assert got[3]["rmin_3"] == 11.0 and got[3]["rmax_3"] == 20.0


def test_keys_independent_and_nulls_excluded(spark):
    df = _mk(spark, {"a": [1, 2], "b": [100, 50]})
    null_rows = spark.createDataFrame(
        [("a", None, 9, 5.0), ("a", dt.datetime(2024, 1, 2), 10, None)],
        "key string, ts timestamp, eid long, value double",
    )
    out = lag_features(
        df.unionByName(null_rows), "key", "ts", "value", tie_col="eid"
    ).collect()
    assert len(out) == 4  # the two NULL rows dropped
    by = {(r["key"], r["tie"]): r for r in out}
    assert by[("b", 1)]["lag_1"] == 100.0 and by[("b", 1)]["delta_1"] == -50.0
    assert by[("a", 1)]["lag_1"] == 1.0  # never sees key b


def test_validation(spark):
    df = _mk(spark, {"a": [1]})
    with pytest.raises(ValueError, match="trail"):
        lag_features(df, "key", "ts", "value", trail=0)
    with pytest.raises(ValueError, match="lags"):
        lag_features(df, "key", "ts", "value", lags=())
