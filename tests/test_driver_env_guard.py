"""The driver host may run a ns-only pandas (timestamps bounded to
1677-09-21 .. 2262-04-11). Round 8's scd2 entry emitted the SCD2
high-date sentinel 9999-12-31 as a TIMESTAMP: every local mirror
passed (pandas >= 2 widens to datetime64[us]) and the DRIVER crashed
converting the DuckDB result. oracle_harness.compare() now rejects
any temporal cell outside the ns-safe years on either side — these
tests pin that the tripwire fires (and stays quiet in-range)."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import _ns_unsafe, compare


def test_ns_unsafe_classifier():
    assert _ns_unsafe(datetime.datetime(9999, 12, 31))
    assert _ns_unsafe(datetime.date(9999, 12, 31))
    assert _ns_unsafe(datetime.datetime(1066, 10, 14))
    assert not _ns_unsafe(datetime.datetime(1995, 6, 1, 12, 0))
    assert not _ns_unsafe(datetime.date(2262, 1, 1) - datetime.timedelta(days=1))
    assert not _ns_unsafe("9999-12-31")  # string render is the fix
    assert not _ns_unsafe(None)


@pytest.fixture()
def frames(spark):
    def make(iso_ts: str):
        sdf = spark.range(1).select(
            F.lit(iso_ts).cast("timestamp").alias("valid_to")
        )
        pdf = pd.DataFrame(
            {"valid_to": [datetime.datetime.fromisoformat(iso_ts)]}
        )
        return sdf, pdf

    return make


def test_guard_fires_on_out_of_range_sentinel(frames):
    sdf, pdf = frames("9999-12-31T00:00:00")
    problems = compare(sdf, pdf)
    assert problems and "ns-safe" in problems[0]


def test_guard_quiet_in_range(frames):
    sdf, pdf = frames("2199-01-01T00:00:00")
    assert compare(sdf, pdf) == []
