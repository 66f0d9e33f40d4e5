"""The ECA (event-condition-action) active loop — the reference's
novel capability: a firing query instantiates new queries.

Reference flow (SURVEY §3.3): fired rule → KafkaSender.sendRule clones
each child template, substitutes ``$field`` grouping keys with values
from the trigger, assigns a snowflake queryId, publishes back to the
``rules`` topic → re-enters the pipeline on the next poll
(``common/KafkaSender.java:56-123``).

Spark realization: the loop closes through the RuleRegistry inside a
``foreachBatch`` driver — fired rows spawn children that take effect
next micro-batch. Same eventual semantics, no external round-trip.

Semantics upgrades (documented deltas):
- child expiry = spawn_time + lastTime (the reference sets
  activeTime=now at spawn, so a child is instantly expirable unless a
  re-trigger refreshes it — KafkaSender.java:109 vs
  DynamicKeyFunction.java:62-66; we give the child its full TTL).
- spawn throttle keyed on (template queryId, trigger key) like the
  reference's queryId+carId ring buffer (KafkaSender.java:30-31,65-79),
  but sized configurably.
"""

from __future__ import annotations

import copy
from collections import deque
from dataclasses import dataclass, field

from activedatawarehouseprototype_spark.rules.model import Rule, WindowFilterRule, LimitOperatorType
from activedatawarehouseprototype_spark.rules.snowflake import SnowflakeIdWorker


def parse_composite_key(
    key: str, key_names: list[str] | None = None
) -> dict[str, str]:
    """Inverse of the ``{k1=v1;k2=v2}`` composite key
    (operator/KeysExtractor.java:19-41).

    When ``key_names`` (the rule's groupingKeyNames, ``$`` allowed) is
    given, values are delimited by the *known* ``;nextKey=`` markers, so
    values containing ``;`` or ``=`` parse intact. Without it, falls
    back to the naive split (only safe for values without those chars).
    """
    body = key.strip()
    if body.startswith("{"):
        body = body[1:]
    if body.endswith("}"):
        body = body[:-1]
    out: dict[str, str] = {}
    if key_names:
        names = [n[1:] if n.startswith("$") else n for n in key_names]
        pos = 0
        for i, name in enumerate(names):
            prefix = f"{name}=" if i == 0 else f";{name}="
            start = body.find(prefix, pos)
            if start < 0:
                break
            start += len(prefix)
            if i + 1 < len(names):
                end = body.find(f";{names[i + 1]}=", start)
                if end < 0:
                    end = len(body)
            else:
                end = len(body)
            out[name] = body[start:end]
            pos = end
        return out
    for part in body.split(";"):
        if "=" in part:
            k, _, v = part.partition("=")
            out[k] = v
    return out


def instantiate_child(
    template: Rule,
    trigger_key_values: dict[str, str],
    parent_query_id: int,
    now_ms: int,
    id_worker: SnowflakeIdWorker,
) -> "Rule | None":
    """C6: clone the child template; every ``$field`` grouping key is
    stripped and pinned to the trigger's value via an appended equality
    filter (KafkaSender.java:82-115).

    Returns ``None`` — spawn skipped — when a ``$field`` resolves to
    the rendered NULL (composite keys print a NULL key as ``null``,
    String.valueOf parity). DOCUMENTED DEVIATION: the reference pins
    the literal string "null" and its stringified per-event comparison
    then MATCHES null-keyed events; this engine compares typed
    columns, so that pin would either never match (string field) or
    quarantine the child every batch (numeric field — float('null')
    fails validation). A null-key standing query is not expressible in
    the 6-operator filter grammar, so the spawn is refused loudly
    (callers count it) instead of registering a dead rule. A literal
    string value 'null' is indistinguishable from a rendered NULL in
    the key format and is skipped too."""
    child = copy.deepcopy(template)
    fixed_keys: list[str] = []
    for k in child.grouping_key_names:
        if k.startswith("$"):
            name = k[1:]
            value = trigger_key_values.get(name)
            if value == "null":
                return None
            if value is not None:
                child.window_filter_rules.append(
                    WindowFilterRule(field=name, operator=LimitOperatorType.EQUAL, value=value)
                )
            fixed_keys.append(name)
        else:
            fixed_keys.append(k)
    child.grouping_key_names = fixed_keys
    child.active_id = parent_query_id
    child.query_id = id_worker.next_id()
    if child.last_time and child.last_time > 0:
        child.active_time = now_ms + child.last_time
    else:
        child.active_time = None
    return child


@dataclass
class SpawnThrottle:
    """C7: ring buffer suppressing duplicate spawns of the same
    (template, trigger) in quick succession (KafkaSender.java:65-79)."""

    size: int = 10
    _recent: deque = field(default=None)

    def __post_init__(self) -> None:
        self._recent = deque(maxlen=self.size)

    def allow(self, template_query_id: int | None, trigger_key: str) -> bool:
        # a TUPLE tag, not string concatenation: two id-less templates
        # (or '1'+'2x' vs '12'+'x') must not collide into one entry and
        # wrongly suppress each other's spawns
        tag = (template_query_id, trigger_key)
        if tag in self._recent:
            return False
        self._recent.append(tag)
        return True
