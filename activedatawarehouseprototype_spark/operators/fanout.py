"""J1: the event x rules broadcast fan-out join — the only join in the
reference (``operator/DynamicKeyFunction.java:51-105``): every event is
tested against every active rule's filter conjuncts and duplicated once
per matching rule with a composite grouping key.

Spark realization: rules become a tiny DataFrame that is BROADCAST and
cross-joined against events with the predicate evaluated data-driven
(rules-as-data — no plan recompilation when the rule set changes
mid-stream, which is what a streaming micro-batch needs). The filter
logic runs entirely JVM-side via map lookups + ``forall`` over the
filter array; true per-rule AND (not the reference's §2.4 quirks).

This complements rules/compiler.py: compiled per-rule plans give
Catalyst literal predicates (max pushdown — right for standing batch
queries); the fan-out gives one fixed plan for N dynamic rules (right
for the hot streaming path where rules are rows in a table).

Scale: rules are control data (KBs) → BroadcastNestedLoopJoin; the
events side streams through unshuffled; the downstream groupBy on
(query_id, key) is the single shuffle, same as the reference's keyBy
(``App.java:73``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.rules.model import Rule, RuleState
from activedatawarehouseprototype_spark.session import local_rows_df

RULES_DF_SCHEMA = (
    "query_id bigint, "
    "filters array<struct<field:string, operator:string, value:string>>, "
    "grouping_keys array<string>"
)

from activedatawarehouseprototype_spark.rules.compiler import (  # noqa: E402
    _NUMERIC_PREFIXES,
)


def rules_to_df(spark: SparkSession, rules: list[Rule]) -> DataFrame:
    """ACTIVE rules → broadcastable control DataFrame."""
    rows = [
        (
            r.query_id,
            [(f.field, f.operator.value, f.value) for f in r.window_filter_rules],
            [k[1:] if k.startswith("$") else k for k in r.grouping_key_names],
        )
        for r in rules
        if r.query_state is RuleState.ACTIVE
    ]
    return local_rows_df(spark, rows, RULES_DF_SCHEMA)


def _event_maps(
    events: DataFrame, fields: set[str] | None = None
) -> tuple[Column, Column]:
    """(values-as-string map, numeric-values-as-double map) over the
    event columns — the data-driven analogue of the reference's
    reflective FieldsExtractor (operator/FieldsExtractor.java:12-37).
    ``fields`` prunes the maps to the columns any rule references —
    per-row map construction is the fan-out's main cost."""
    str_entries: list[Column] = []
    num_entries: list[Column] = []
    for name, dtype in events.dtypes:
        if fields is not None and name not in fields:
            continue
        str_entries += [F.lit(name), F.col(name).cast("string")]
        if dtype.startswith(_NUMERIC_PREFIXES):
            num_entries += [F.lit(name), F.col(name).cast("double")]
    return F.create_map(*str_entries), F.create_map(*num_entries)


def referenced_fields(
    rules_df: DataFrame, value_from: str | None = None
) -> set[str]:
    """Distinct field names any rule filters or groups on (one tiny
    driver-side job over the control-plane rules table). ``value_from``
    names a rules_df column holding an extra per-rule field name to
    include (the aggregate field, for grouped evaluation)."""
    arr = F.array_union(
        F.transform("filters", lambda f: f["field"]), F.col("grouping_keys")
    )
    if value_from is not None:
        arr = F.array_union(
            arr, F.filter(F.array(F.col(value_from)), lambda x: x.isNotNull())
        )
    rows = rules_df.select(arr.alias("fs")).collect()
    out: set[str] = set()
    for r in rows:
        out.update(r.fs)
    return out


def fan_out(
    events: DataFrame, rules_df: DataFrame, value_from: str | None = None
) -> DataFrame:
    """events x matching-rules: one output row per (event, rule) whose
    filter conjunction holds, carrying query_id + composite key
    (Keyed<event, key, ruleId> analogue, common/Keyed.java:14-18).

    Rules are DATA here, so the plan is O(1) in rule count — the path
    for very large dynamic rule sets, where a compiled literal plan
    would pay per-batch Catalyst analysis proportional to #rules
    (streaming/group_eval.py switches between the two). ``value_from``
    names a rules_df column holding the rule's aggregate field name;
    when set, each output row also carries ``_value`` = that field's
    numeric value for the row's rule."""
    fields = referenced_fields(rules_df, value_from)
    numeric_cols = [
        n for n, t in events.dtypes
        if t.startswith(_NUMERIC_PREFIXES) and n in fields
    ]
    str_map, num_map = _event_maps(events, fields)
    ev = events.withColumn("_strs", str_map).withColumn("_nums", num_map)

    num_cols_lit = F.array(*[F.lit(c) for c in numeric_cols])

    def conjunct_ok(f: Column) -> Column:
        field = f["field"]
        op = f["operator"]
        sval = f["value"]
        is_num = F.array_contains(num_cols_lit, field)
        lhs_num = F.element_at(F.col("_nums"), field)
        rhs_num = sval.cast("double")
        lhs_str = F.element_at(F.col("_strs"), field)

        def cmp(lhs: Column, rhs: Column) -> Column:
            return (
                F.when(op == "=", lhs == rhs)
                .when(op == "!=", lhs != rhs)
                .when(op == ">", lhs > rhs)
                .when(op == "<", lhs < rhs)
                .when(op == ">=", lhs >= rhs)
                .when(op == "<=", lhs <= rhs)
                .otherwise(F.lit(False))
            )

        return F.when(is_num, cmp(lhs_num, rhs_num)).otherwise(cmp(lhs_str, sval))

    matches = F.forall(F.col("filters"), conjunct_ok)

    key = F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(
                F.col("grouping_keys"),
                # null key values render as "null" (String.valueOf
                # parity with KeysExtractor) — without the coalesce,
                # array_join would silently drop the null element.
                lambda k: F.concat(
                    k,
                    F.lit("="),
                    F.coalesce(F.element_at(F.col("_strs"), k), F.lit("null")),
                ),
            ),
            ";",
        ),
        F.lit("}"),
    )

    joined = ev.join(F.broadcast(rules_df), matches, "inner").withColumn("key", key)
    if value_from is not None:
        joined = joined.withColumn(
            "_value", F.element_at(F.col("_nums"), F.col(value_from))
        )
    return joined.drop("_strs", "_nums", "filters", "grouping_keys")
