"""Robust stats: MAD outlier counts and winsorized sums against
hand-computed values; NULL exclusion; floor_bounds lattice mode."""

from __future__ import annotations

import pytest

from activedatawarehouseprototype_spark.operators.robust import (
    mad_outlier_stats,
    winsorized_sum,
)


def _df(spark, values, grp="g"):
    return spark.createDataFrame(
        [(grp, float(v)) if v is not None else (grp, None) for v in values],
        "g string, v double",
    )


def test_mad_hand_computed(spark):
    # values 1..9 plus a wild 1000: median 5.5, deviations from it are
    # 4.5,3.5,...,0.5,0.5,...,994.5 -> MAD 2.5; only 1000 exceeds
    # 3*MAD=7.5
    vals = list(range(1, 10)) + [1000]
    out = mad_outlier_stats(_df(spark, vals), ["g"], "v").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 10
    assert r["median_value"] == 5.5
    assert r["mad_value"] == 2.5
    assert r["n_outliers"] == 1


def test_mad_excludes_nulls(spark):
    out = mad_outlier_stats(
        _df(spark, [1, 2, 3, None, None]), ["g"], "v"
    ).collect()
    assert out[0]["n"] == 3
    assert out[0]["median_value"] == 2.0


def test_winsorized_hand_computed(spark):
    # 1..10 at p10/p90: bounds interpolate to 1.9 and 9.1 -> clipped
    # sum = 1.9 + 2..9 + 9.1 = 55; one row clipped each end
    out = winsorized_sum(
        _df(spark, range(1, 11)), ["g"], "v", lo_p=0.1, hi_p=0.9
    ).collect()
    r = out[0]
    assert r["lo_bound"] == pytest.approx(1.9)
    assert r["hi_bound"] == pytest.approx(9.1)
    assert r["winsorized_sum"] == pytest.approx(55.0)
    assert r["n_clipped_low"] == 1 and r["n_clipped_high"] == 1


def test_winsorized_floor_bounds_stays_on_lattice(spark):
    out = winsorized_sum(
        _df(spark, range(1, 11)),
        ["g"],
        "v",
        lo_p=0.1,
        hi_p=0.9,
        floor_bounds=True,
    ).collect()
    r = out[0]
    assert r["lo_bound"] == 1.0 and r["hi_bound"] == 9.0
    # every clipped value is an integer -> exact sum 1+2..9+9 = 54
    assert r["winsorized_sum"] == 54.0
