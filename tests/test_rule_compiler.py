"""Unit tests for the Rule model + compiler against hand-computed frames."""

from __future__ import annotations

import datetime as dt

import pytest

from activedatawarehouseprototype_spark.rules.model import (
    LimitOperatorType,
    Rule,
)
from activedatawarehouseprototype_spark.rules.compiler import (
    evaluate_rule,
    window_mode,
)
from activedatawarehouseprototype_spark.rules.snowflake import SnowflakeIdWorker

README_SPEEDING_RULE = """
{"lastTime":-1,"windowMilliseconds":10000,"frequencyMilliseconds":0,
 "groupingKeyNames":["carId"],"windowFilterRules":[],
 "alertRules":[{"windowFilterRules":[],"lastTime":10000,
   "windowMilliseconds":5000,"frequencyMilliseconds":0,
   "groupingKeyNames":["$carId"],"aggregatorFunctionType":"MAX",
   "limitOperatorType":"GREATER","limit":10,"queryState":"ACTIVE",
   "aggregateFieldName":"speed","queryId":2}],
 "aggregatorFunctionType":"AVG","limitOperatorType":"GREATER","limit":120,
 "queryState":"ACTIVE","aggregateFieldName":"speed","queryId":1}
"""


def test_parse_readme_rule_json():
    r = Rule.from_json(README_SPEEDING_RULE)
    assert r.query_id == 1
    assert r.aggregator_function_type.value == "AVG"
    assert r.limit_operator_type is LimitOperatorType.GREATER
    assert r.limit == 120.0
    assert r.grouping_key_names == ["carId"]
    assert window_mode(r) == "W1"  # frequency 0 → per-event slide
    child = r.alert_rules[0]
    assert child.grouping_key_names == ["$carId"]
    assert child.last_time == 10000
    # round-trip
    assert Rule.from_json(r.to_json()).to_dict() == r.to_dict()


def test_operator_parse_both_forms():
    assert LimitOperatorType.parse(">") is LimitOperatorType.GREATER
    assert LimitOperatorType.parse("GREATER") is LimitOperatorType.GREATER
    assert LimitOperatorType.parse("!=") is LimitOperatorType.NOT_EQUAL
    with pytest.raises(ValueError):
        LimitOperatorType.parse("~")


def test_window_mode_dispatch():
    def rule(w, f):
        return Rule.from_dict(
            {"queryId": 1, "windowMilliseconds": w, "frequencyMilliseconds": f}
        )

    assert window_mode(rule(0, None)) == "W0"
    assert window_mode(rule(-5, 0)) == "W0"
    assert window_mode(rule(1000, 0)) == "W1"
    assert window_mode(rule(1000, None)) == "W2"
    assert window_mode(rule(1000, 2000)) == "W2"  # freq > window → tumbling
    assert window_mode(rule(1000, 500)) == "W3"
    assert window_mode(rule(1000, 1000)) == "W3"


def test_validate_unknown_field():
    r = Rule.from_dict(
        {
            "queryId": 9,
            "windowFilterRules": [{"field": "nope", "operator": "=", "value": "x"}],
            "groupingKeyNames": ["user_id"],
            "aggregateFieldName": "value",
            "aggregatorFunctionType": "SUM",
        }
    )
    with pytest.raises(ValueError, match="nope"):
        r.validate(["user_id", "value", "ts"])
    r2 = Rule.from_dict(
        {
            "queryId": 10,
            "groupingKeyNames": ["$user_id"],  # $-prefixed resolves to user_id
            "aggregateFieldName": "COUNT_FLINK",
        }
    )
    r2.validate(["user_id", "value", "ts"])  # must not raise


@pytest.fixture(scope="module")
def tiny_events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # (event_id, ts_offset_sec, user_id, event_type, value)
        (1, 0, 1, "click", 10.0),
        (2, 30, 1, "click", 20.0),
        (3, 90, 1, "click", 40.0),  # > 60s after row 1
        (4, 95, 2, "click", 100.0),
        (5, 100, 1, "view", 999.0),  # filtered out by event_type
    ]
    return spark.createDataFrame(
        [
            (eid, base + dt.timedelta(seconds=off), uid, et, v)
            for (eid, off, uid, et, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_w1_trailing_window_inclusive_bounds(spark, tiny_events):
    # 60s trailing window, AVG, per user — inclusive both ends
    # (parity with isStateValueInWindow, DynamicQueryFunction.java:277-280)
    rule = Rule.from_dict(
        {
            "queryId": 1,
            "windowFilterRules": [
                {"field": "event_type", "operator": "=", "value": "click"}
            ],
            "groupingKeyNames": ["user_id"],
            "aggregateFieldName": "value",
            "aggregatorFunctionType": "AVG",
            "limitOperatorType": ">",
            "limit": 25,
            "windowMilliseconds": 60000,
            "frequencyMilliseconds": 0,
        }
    )
    out = {
        (r.key, r.window_end): (r.agg_value, r.fired)
        for r in evaluate_rule(tiny_events, rule).collect()
    }
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # event 1: alone → 10.0
    assert out[("{user_id=1}", base)] == (10.0, False)
    # event 2 @30s: includes event 1 (t-60 <= 0 <= t) → avg(10,20)=15
    assert out[("{user_id=1}", base + dt.timedelta(seconds=30))] == (15.0, False)
    # event 3 @90s: window [30,90] inclusive → includes event 2 AND boundary
    # event at exactly t-60 is EXCLUDED? No: 90-60=30 → event2@30 included.
    # events 2,3 → avg(20,40)=30 → fired (>25)
    assert out[("{user_id=1}", base + dt.timedelta(seconds=90))] == (30.0, True)
    # user 2 independent
    assert out[("{user_id=2}", base + dt.timedelta(seconds=95))] == (100.0, True)
    # filtered event 5 absent
    assert len(out) == 4


def test_w0_passthrough_emits_zero_unfired(spark, tiny_events):
    rule = Rule.from_dict(
        {
            "queryId": 7,
            "groupingKeyNames": ["user_id"],
            "aggregateFieldName": "value",
            "aggregatorFunctionType": "MAX",
            "limitOperatorType": ">",
            "limit": 0,
            "windowMilliseconds": 0,
        }
    )
    rows = evaluate_rule(tiny_events, rule).collect()
    assert len(rows) == 5
    assert all(r.agg_value == 0.0 and r.fired is False for r in rows)


def test_snowflake_ids_monotonic_unique():
    w = SnowflakeIdWorker(worker_id=1, datacenter_id=1)
    ids = [w.next_id() for _ in range(5000)]
    assert len(set(ids)) == len(ids)
    assert ids == sorted(ids)


def test_fanout_agrees_with_compiled_filters(spark, tiny_events):
    from activedatawarehouseprototype_spark.operators.fanout import (
        fan_out,
        rules_to_df,
    )
    from activedatawarehouseprototype_spark.corpus.rule_engine import FANOUT_RULES
    from activedatawarehouseprototype_spark.rules.compiler import compile_filter

    keyed = fan_out(tiny_events, rules_to_df(spark, FANOUT_RULES))
    per_rule = {
        r.query_id: tiny_events.filter(compile_filter(r, tiny_events)).count()
        for r in FANOUT_RULES
    }
    got = {
        row.query_id: row.n
        for row in keyed.groupBy("query_id").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()
    }
    assert got == {k: v for k, v in per_rule.items() if v > 0}
