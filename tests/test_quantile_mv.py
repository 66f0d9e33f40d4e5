"""Quantile-ladder MV: deterministic rank-error contract, range
merging, append semantics, partition pruning."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.quantile_mv import (
    quantile_mv_append,
    quantile_mv_build,
    quantile_mv_query,
)

DAY = 86_400_000
BASE = 19_676 * DAY  # bucket-aligned epoch ms (~2016)


def _events(spark, values_by_day):
    rows = []
    for day, values in values_by_day.items():
        for i, v in enumerate(values):
            rows.append((BASE + day * DAY + i, float(v)))
    return spark.createDataFrame(rows, "ms long, value double").select(
        F.timestamp_millis(F.col("ms")).alias("ts"), "value"
    )


def _assert_rank_contract(values, q, res):
    """The estimate's rank must be within the returned bound of q*N —
    deterministic, no probability."""
    n = len(values)
    assert res["n"] == n
    below = sum(1 for v in values if v < res["value"])
    at_or_below = sum(1 for v in values if v <= res["value"])
    target = q * (n - 1)
    bound = res["rank_error_bound"] + 1  # +1: interpolation knot slack
    assert below - bound <= target <= at_or_below + bound, (
        q, res, below, at_or_below, target,
    )


@pytest.mark.parametrize("q", [0.0, 0.1, 0.5, 0.9, 0.99, 1.0])
def test_rank_contract_over_merged_buckets(spark, tmp_path, q):
    rng = random.Random(3)
    by_day = {
        0: [rng.gauss(100, 15) for _ in range(400)],
        1: [rng.gauss(500, 5) for _ in range(300)],  # disjoint mass
        2: [7.0] * 200,  # heavy duplicates
    }
    path = str(tmp_path / "qmv")
    quantile_mv_build(
        _events(spark, by_day), path, "value", bucket_ms=DAY, bins=32
    )
    res = quantile_mv_query(spark, path, q)
    allv = [v for vs in by_day.values() for v in vs]
    assert res["rank_error_bound"] == len(allv) / 32
    _assert_rank_contract(allv, q, res)


def test_range_query_prunes_buckets(spark, tmp_path):
    by_day = {0: list(range(100)), 1: list(range(1000, 1100))}
    path = str(tmp_path / "qmv")
    quantile_mv_build(_events(spark, by_day), path, "value", bucket_ms=DAY)
    only_day1 = quantile_mv_query(
        spark, path, 0.5, start_ms=BASE + DAY, end_ms=BASE + 2 * DAY
    )
    assert only_day1["n"] == 100
    assert 1000 <= only_day1["value"] <= 1100
    both = quantile_mv_query(spark, path, 0.5)
    assert both["n"] == 200


def test_append_new_bucket_and_overlap_raises(spark, tmp_path):
    path = str(tmp_path / "qmv")
    quantile_mv_build(
        _events(spark, {0: list(range(50))}), path, "value", bucket_ms=DAY
    )
    added = quantile_mv_append(
        _events(spark, {1: list(range(100, 150))}),
        path,
        "value",
        bucket_ms=DAY,
    )
    assert added == 1
    assert quantile_mv_query(spark, path, 1.0)["n"] == 100
    with pytest.raises(ValueError, match="already in the MV"):
        quantile_mv_append(
            _events(spark, {1: [1.0]}), path, "value", bucket_ms=DAY
        )


def test_empty_range_and_bad_q(spark, tmp_path):
    path = str(tmp_path / "qmv")
    quantile_mv_build(
        _events(spark, {0: [1.0, 2.0]}), path, "value", bucket_ms=DAY
    )
    res = quantile_mv_query(
        spark, path, 0.5, start_ms=BASE + 50 * DAY
    )
    assert res == {"value": None, "n": 0, "rank_error_bound": 0.0}
    with pytest.raises(ValueError, match="q must be"):
        quantile_mv_query(spark, path, 1.5)
