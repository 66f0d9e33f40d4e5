"""CUSUM change-point statistic: the window-identity implementation
must equal the textbook fold, detect a planted mean shift, and stay
exact on integer inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from activedatawarehouseprototype_spark.operators.timeseries import cusum


def _fold(xs, target, slack):
    sp = sn = 0
    out = []
    for x in xs:
        sp = max(0, sp + (x - target - slack))
        sn = max(0, sn + (target - slack - x))
        out.append((sp, sn))
    return out


def _mk(spark, series):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(seconds=i), i, v)
        for k, xs in series.items()
        for i, v in enumerate(xs)
    ]
    return spark.createDataFrame(
        rows, "key string, ts timestamp, eid long, value long"
    )


def test_matches_textbook_fold(spark):
    series = {"a": [5, 9, 1, 12, 12, 12, 0], "b": [7, 7, 7]}
    df = _mk(spark, series)
    got = {
        (r["key"], r["seq"]): (r["s_pos"], r["s_neg"])
        for r in cusum(df, "key", "ts", "value", target=7, slack=1,
                       tie_col="eid").collect()
    }
    for k, xs in series.items():
        want = _fold(xs, 7, 1)
        for i, w in enumerate(want):
            assert got[(k, i)] == w, (k, i, got[(k, i)], w)


def test_detects_planted_shift_not_noise(spark):
    # mean 10 for 50 points, then mean 14: S+ must exceed h=40 only
    # after the shift
    xs = [10, 11, 9, 10] * 13 + [14, 15, 13, 14] * 13
    df = _mk(spark, {"u": xs})
    rows = sorted(
        (r["seq"], r["s_pos"])
        for r in cusum(df, "u"[:0] or "key", "ts", "value", target=10,
                       slack=1, tie_col="eid").collect()
    )
    pre = [s for i, s in rows if i < 52]
    post = [s for i, s in rows if i >= 90]
    assert max(pre) <= 40
    assert min(post) > 40


def test_null_values_and_ts_excluded(spark):
    df = spark.createDataFrame(
        [
            ("k", dt.datetime(2024, 1, 1), 0, 10),
            ("k", None, 1, 99),
            ("k", dt.datetime(2024, 1, 2), 2, None),
            ("k", dt.datetime(2024, 1, 3), 3, 12),
        ],
        "key string, ts timestamp, eid long, value long",
    )
    rows = cusum(df, "key", "ts", "value", target=10, tie_col="eid").collect()
    assert sorted(r["value"] for r in rows) == [10, 12]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(st.integers(-20, 20), min_size=1, max_size=40),
    target=st.integers(-5, 5),
    slack=st.integers(0, 3),
)
def test_property_identity_equals_fold(spark, xs, target, slack):
    df = _mk(spark, {"k": xs})
    got = [
        (r["s_pos"], r["s_neg"])
        for r in cusum(df, "key", "ts", "value", target=target, slack=slack,
                       tie_col="eid")
        .orderBy("seq")
        .collect()
    ]
    assert got == _fold(xs, target, slack)
