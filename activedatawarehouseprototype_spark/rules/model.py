"""The Rule (query) model — the reference's JSON query language.

Mirrors the schema of ``rule/Rule.java:18-34`` and
``common/WindowFilterRules.java:16-20`` in the reference repo: a rule
is a standing query = filter conjuncts + grouping keys + one aggregate
over a sliding/tumbling window + a HAVING threshold, plus ECA metadata
(child ``alertRules`` spawned on fire, TTL expiry, CONTROL verbs).

JSON compatibility: accepts the exact README examples
(``README.md:71-132``): ``limitOperatorType`` may be an enum name
("GREATER") or a symbol (">"); ``windowFilterRules[].operator`` is a
symbol; unknown fields are ignored like Jackson's lenient binding in
``rule/RuleParser.java:21-35``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

# Sentinel aggregateFieldName values (DynamicQueryFunction.java:36-37):
# count events instead of aggregating a field.
COUNT_SENTINEL = "COUNT_FLINK"
COUNT_WITH_RESET_SENTINEL = "COUNT_WITH_RESET_FLINK"
COUNT_SENTINELS = frozenset({COUNT_SENTINEL, COUNT_WITH_RESET_SENTINEL})


class RuleState(str, Enum):
    ACTIVE = "ACTIVE"
    PAUSE = "PAUSE"
    DELETE = "DELETE"
    CONTROL = "CONTROL"


class AggregatorFunctionType(str, Enum):
    SUM = "SUM"
    AVG = "AVG"
    MIN = "MIN"
    MAX = "MAX"


class LimitOperatorType(str, Enum):
    """Six comparison ops (Rule.java:89-111). Value = the symbol form."""

    EQUAL = "="
    NOT_EQUAL = "!="
    GREATER_EQUAL = ">="
    LESS_EQUAL = "<="
    GREATER = ">"
    LESS = "<"

    @classmethod
    def parse(cls, text: str | None) -> "LimitOperatorType | None":
        if text is None:
            return None
        if text in cls._value2member_map_:
            return cls(text)
        try:
            return cls[text]  # enum name form, e.g. "GREATER"
        except KeyError:
            raise ValueError(f"unknown comparison operator {text!r}") from None


class ControlType(str, Enum):
    CLEAR_STATE_ALL = "CLEAR_STATE_ALL"
    CLEAR_STATE_ALL_STOP = "CLEAR_STATE_ALL_STOP"
    DELETE_RULES_ALL = "DELETE_RULES_ALL"
    EXPORT_RULES_CURRENT = "EXPORT_RULES_CURRENT"


@dataclass
class WindowFilterRule:
    """One filter conjunct {field, operator, value}."""

    field: str
    operator: LimitOperatorType
    value: str

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "WindowFilterRule":
        return cls(
            field=d["field"],
            operator=LimitOperatorType.parse(d["operator"]),
            value=str(d["value"]),
        )

    def to_dict(self) -> dict[str, Any]:
        return {"field": self.field, "operator": self.operator.value, "value": self.value}


@dataclass
class Rule:
    query_id: int | None = None
    query_state: RuleState = RuleState.ACTIVE
    window_filter_rules: list[WindowFilterRule] = field(default_factory=list)
    grouping_key_names: list[str] = field(default_factory=list)
    aggregate_field_name: str | None = None
    aggregator_function_type: AggregatorFunctionType | None = None
    limit_operator_type: LimitOperatorType | None = None
    limit: float | None = None
    window_milliseconds: int | None = None
    frequency_milliseconds: int | None = None
    alert_rules: list["Rule"] = field(default_factory=list)
    active_time: int | None = None  # wall-clock expiry instant (epoch ms)
    last_time: int | None = None  # TTL ms; -1 → never expires
    control_type: ControlType | None = None
    active_id: int | None = None  # parent rule instance that spawned this one
    # Batch id the rule was SPAWNED in (ECA children only; None for
    # rules arriving over the wire). "A spawned rule takes effect next
    # micro-batch" must hold across at-least-once replays: a child
    # spawned during batch N would otherwise evaluate a REPLAYED batch
    # N (it exists in the registry by then, unlike on the first run)
    # and the per-batch idempotent sinks would overwrite batch N's
    # rows with different ones (caught by the round-10 ECA soak).
    # Internal extension field — not part of the reference wire schema
    # (common/KafkaSender.java has no replay concept); serialized only
    # when set so reference-shaped rules round-trip byte-identical.
    born_batch_id: int | None = None

    # ---- JSON (reference-compatible) ----

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Rule":
        agg_type = d.get("aggregatorFunctionType")
        return cls(
            query_id=d.get("queryId"),
            query_state=RuleState(d.get("queryState", "ACTIVE")),
            window_filter_rules=[
                WindowFilterRule.from_dict(f) for f in d.get("windowFilterRules") or []
            ],
            grouping_key_names=list(d.get("groupingKeyNames") or []),
            aggregate_field_name=d.get("aggregateFieldName"),
            aggregator_function_type=(
                AggregatorFunctionType(agg_type) if agg_type else None
            ),
            limit_operator_type=LimitOperatorType.parse(d.get("limitOperatorType")),
            limit=(float(d["limit"]) if d.get("limit") is not None else None),
            window_milliseconds=d.get("windowMilliseconds"),
            frequency_milliseconds=d.get("frequencyMilliseconds"),
            alert_rules=[Rule.from_dict(r) for r in d.get("alertRules") or []],
            active_time=d.get("activeTime"),
            last_time=d.get("lastTime"),
            control_type=(
                ControlType(d["controlType"]) if d.get("controlType") else None
            ),
            active_id=d.get("activeId"),
            born_batch_id=d.get("bornBatchId"),
        )

    @classmethod
    def from_json(cls, s: str) -> "Rule":
        return cls.from_dict(json.loads(s))

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {
            "queryId": self.query_id,
            "queryState": self.query_state.value,
            "windowFilterRules": [f.to_dict() for f in self.window_filter_rules],
            "groupingKeyNames": list(self.grouping_key_names),
            "aggregateFieldName": self.aggregate_field_name,
            "aggregatorFunctionType": (
                self.aggregator_function_type.value
                if self.aggregator_function_type
                else None
            ),
            "limitOperatorType": (
                self.limit_operator_type.value if self.limit_operator_type else None
            ),
            "limit": self.limit,
            "windowMilliseconds": self.window_milliseconds,
            "frequencyMilliseconds": self.frequency_milliseconds,
            "alertRules": [r.to_dict() for r in self.alert_rules],
            "activeTime": self.active_time,
            "lastTime": self.last_time,
            "controlType": self.control_type.value if self.control_type else None,
            "activeId": self.active_id,
        }
        if self.born_batch_id is not None:
            d["bornBatchId"] = self.born_batch_id
        return d

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), separators=(",", ":"))

    # ---- semantics helpers ----

    @property
    def is_count(self) -> bool:
        return self.aggregate_field_name in COUNT_SENTINELS

    def validate(self, event_columns: list[str]) -> None:
        """Analysis-time validation — an improvement over the reference,
        which resolves field names reflectively per event and only fails
        at evaluation time (operator/FieldsExtractor.java:12-37)."""
        cols = set(event_columns)
        missing: list[str] = []
        for f in self.window_filter_rules:
            if f.field not in cols:
                missing.append(f.field)
        for k in self.grouping_key_names:
            plain = k[1:] if k.startswith("$") else k
            if plain not in cols:
                missing.append(k)
        if (
            self.aggregate_field_name
            and not self.is_count
            and self.aggregate_field_name not in cols
        ):
            missing.append(self.aggregate_field_name)
        if missing:
            raise ValueError(
                f"rule {self.query_id}: unknown event fields {missing}; have {sorted(cols)}"
            )
