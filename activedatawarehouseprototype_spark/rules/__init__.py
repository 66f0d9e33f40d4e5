"""Query-as-data: the JSON Rule model and its compiler to DataFrame plans."""

from activedatawarehouseprototype_spark.rules.model import (
    AggregatorFunctionType,
    ControlType,
    LimitOperatorType,
    Rule,
    RuleState,
    WindowFilterRule,
)
from activedatawarehouseprototype_spark.rules.compiler import (
    EVAL_COLUMNS,
    compile_filter,
    compile_having,
    composite_key,
    evaluate_rule,
    evaluate_rules,
    window_mode,
)

__all__ = [
    "AggregatorFunctionType",
    "ControlType",
    "EVAL_COLUMNS",
    "LimitOperatorType",
    "Rule",
    "RuleState",
    "WindowFilterRule",
    "compile_filter",
    "compile_having",
    "composite_key",
    "evaluate_rule",
    "evaluate_rules",
    "window_mode",
]
