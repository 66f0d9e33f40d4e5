"""Driver-mirror: every corpus query with an oracle must match DuckDB
at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from activedatawarehouseprototype_spark.corpus import ORACLES, QUERIES
from tests.oracle_harness import compare, run_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name}: {problems}"


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0
