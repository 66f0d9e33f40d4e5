"""rule_to_sql: the generated ANSI-SQL twin of every window mode must
produce the same multiset of rows as the compiled DataFrame plan
(checked via DuckDB on the same parquet, like the driver does)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load
from activedatawarehouseprototype_spark.corpus.rule_engine import (
    RULE_COUNT_TUMBLING,
    RULE_PASSTHROUGH,
    RULE_PER_EVENT_AVG,
    RULE_SLIDING_MAX,
    RULE_TUMBLING_AVG,
)
from activedatawarehouseprototype_spark.rules.compiler import evaluate_rule
from activedatawarehouseprototype_spark.rules.sql_gen import rule_to_sql
from tests.oracle_harness import compare, run_oracle

SF = "/root/testdata/sf0.001"
NUMERIC = {"event_id", "ts", "user_id", "value"}


@pytest.mark.parametrize(
    "rule",
    [
        RULE_TUMBLING_AVG,
        RULE_SLIDING_MAX,
        RULE_PER_EVENT_AVG,
        RULE_PASSTHROUGH,
        RULE_COUNT_TUMBLING,
    ],
    ids=lambda r: f"q{r.query_id}",
)
def test_generated_sql_matches_compiled_plan(spark, rule):
    sql = rule_to_sql(rule, table="events", ts_col="ts", numeric_cols=NUMERIC)
    oracle = run_oracle(sql, SF)
    spark_df = evaluate_rule(load(spark, SF, "events"), rule).select(
        "query_id",
        "key",
        F.unix_millis("window_start").alias("window_start_ms"),
        F.unix_millis("window_end").alias("window_end_ms"),
        "agg_value",
        "fired",
    )
    problems = compare(spark_df, oracle, float_tol=1e-6)
    assert not problems, problems


# --- differential fuzz: random rules, three-way agreement ---------------

from hypothesis import HealthCheck, given, settings  # noqa: E402

from tests.test_property_rules import rule_strategy  # noqa: E402


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rule=rule_strategy)
def test_generated_sql_matches_compiled_plan_fuzzed(spark, rule):
    """Random rules (all window modes x filters x aggs x COUNT
    sentinel): the generated ANSI-SQL twin run by DuckDB must agree
    with the compiled DataFrame plan on the real events fixture.
    Together with test_compiler_matches_python_reference this
    triangulates compiler <-> SQL generator <-> naive interpreter."""
    sql = rule_to_sql(rule, table="events", ts_col="ts", numeric_cols=NUMERIC)
    oracle = run_oracle(sql, SF)
    spark_df = evaluate_rule(load(spark, SF, "events"), rule).select(
        "query_id",
        "key",
        F.unix_millis("window_start").alias("window_start_ms"),
        F.unix_millis("window_end").alias("window_end_ms"),
        "agg_value",
        "fired",
    )
    problems = compare(spark_df, oracle, float_tol=1e-6)
    assert not problems, (rule.to_dict() if hasattr(rule, "to_dict") else rule, problems)
