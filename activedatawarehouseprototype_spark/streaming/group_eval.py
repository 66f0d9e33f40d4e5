"""Single-scan N-rule evaluation — the engine's signature hot path.

The reference makes exactly ONE pass over the event stream regardless
of how many rules are registered: ``DynamicKeyFunction.java:51-105``
fans each event out to every matching rule before one keyBy shuffle,
and ``DynamicQueryFunction`` aggregates per (rule, key). The per-rule
compiled plans (rules/compiler.py) are the right shape for standing
batch queries — maximal per-rule pushdown — but unioning N of them
re-scans the buffer N times, which is the #1 scale-killer at 100 TB.

This module is the Spark analogue of the reference's topology:

1. Compiled fan-out: ONE projection over ONE scan builds, per event,
   an array of per-rule match structs — each guarded by that rule's
   compiled LITERAL predicate (whole-stage codegen, pushdown-eligible)
   — then ``array_compact`` + ``explode``. No join, no per-row field
   maps; each surviving row carries (query_id, key, _value, window
   metadata). foreachBatch rebuilds the plan every batch anyway, so
   literal predicates cost nothing in flexibility; the rules-as-data
   variant (operators/fanout.py, BroadcastNestedLoopJoin) remains for
   fixed long-lived plans over mutable rule tables.
2. ONE ``groupBy(query_id, key, window_start)`` for ALL W2/W3 rules at
   once — the window start is computed *data-driven* from the rule
   row's own window/frequency columns (epoch-millis integer math,
   identical to rules/compiler.py and rules/sql_gen.py), so rules with
   different window sizes still share the single shuffle.
3. W1 (per-event slide) rules share the scan and get one RANGE-frame
   window pass per *distinct* window size (frame bounds must be plan
   constants); W0 passthrough rules are a projection.

Per-batch Spark-job/scan count is therefore O(#modes), not O(#rules).

All five aggregates (SUM/AVG/MIN/MAX/COUNT) are computed in the single
shuffled aggregation (partial/map-side combine applies) and the rule's
own aggregate is selected per-row afterwards — 5 columns of partial agg
state per group versus N plans is the trade that buys the single scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.rules.compiler import (
    compile_filter,
    composite_key,
    key_columns,
    window_mode,
)
from activedatawarehouseprototype_spark.rules.model import Rule, RuleState

_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")


def validate_rule_fields(rule: Rule, dtypes: dict[str, str]) -> None:
    """Driver-side schema check standing in for the per-rule compile
    errors of the union path: a rule naming a field the event schema
    doesn't have must quarantine, not silently aggregate nulls."""
    for f in rule.window_filter_rules:
        if f.field not in dtypes:
            raise ValueError(f"rule {rule.query_id}: unknown filter field {f.field!r}")
    for k in key_columns(rule):
        if k not in dtypes:
            raise ValueError(f"rule {rule.query_id}: unknown grouping key {k!r}")
    if window_mode(rule) != "W0" and not rule.is_count:
        if rule.aggregator_function_type is None:
            raise ValueError(f"rule {rule.query_id}: no aggregator configured")
        fld = rule.aggregate_field_name
        if fld is None or fld not in dtypes:
            raise ValueError(f"rule {rule.query_id}: unknown aggregate field {fld!r}")
        if not dtypes[fld].startswith(_NUMERIC_PREFIXES):
            raise ValueError(
                f"rule {rule.query_id}: aggregate field {fld!r} is not numeric"
            )


def _rule_struct(rule: Rule, events: DataFrame) -> Column:
    """Literal per-rule match struct: NULL when the rule's (compiled,
    literal — full pushdown-eligible) filter rejects the row, else the
    rule's id/key/value/window metadata. One array of these per event,
    compacted and exploded, IS the fan-out — no join, no maps, pure
    whole-stage codegen."""
    if rule.is_count:
        value = F.lit(None).cast("double")
    else:
        value = F.col(rule.aggregate_field_name).cast("double")
    meta = F.struct(
        F.lit(rule.query_id).cast("bigint").alias("query_id"),
        composite_key(rule).alias("key"),
        value.alias("_value"),
        F.lit(window_mode(rule)).alias("mode"),
        F.lit(int(rule.window_milliseconds or 0)).cast("bigint").alias("window_ms"),
        F.lit(
            int(rule.frequency_milliseconds) if rule.frequency_milliseconds else 0
        ).cast("bigint").alias("freq_ms"),
        F.lit(
            rule.aggregator_function_type.value
            if rule.aggregator_function_type
            else None
        ).cast("string").alias("agg_fn"),
        F.lit(bool(rule.is_count)).alias("is_count"),
        F.lit(
            rule.limit_operator_type.value if rule.limit_operator_type else None
        ).cast("string").alias("limit_op"),
        F.lit(float(rule.limit) if rule.limit is not None else None)
        .cast("double")
        .alias("limit_val"),
    )
    return F.when(compile_filter(rule, events), meta)


def _fired(agg: Column) -> Column:
    op, lim = F.col("limit_op"), F.col("limit_val")
    return (
        F.when(op.isNull() | lim.isNull(), F.lit(False))
        .when(op == "=", agg == lim)
        .when(op == "!=", agg != lim)
        .when(op == ">", agg > lim)
        .when(op == "<", agg < lim)
        .when(op == ">=", agg >= lim)
        .when(op == "<=", agg <= lim)
        .otherwise(F.lit(False))
    )


def _select_agg(sum_c, avg_c, min_c, max_c, cnt_c) -> Column:
    fn = F.col("agg_fn")
    return (
        F.when(F.col("is_count"), cnt_c)
        .when(fn == "SUM", sum_c)
        .when(fn == "AVG", avg_c)
        .when(fn == "MIN", min_c)
        .when(fn == "MAX", max_c)
    ).cast("double")


def evaluate_rules_grouped(
    events: DataFrame,
    rules: list[Rule],
    ts_col: str = "ts",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Evaluate every ACTIVE rule over ``events`` with O(#modes) scans
    (ONE scan + ONE shuffle when all rules are W2/W3). Output schema and
    values match ``rules.compiler.evaluate_rules`` exactly.

    Rules must be pre-validated with ``validate_rule_fields`` — unknown
    fields here would aggregate nulls instead of raising.

    ``salt_buckets`` spreads each hot (rule, key, window) group over N
    sub-groups before the final merge (two-phase salted aggregation,
    operators/warehouse.salted_agg pattern). Spark's map-side partial
    aggregation already bounds reducer input to one partial per map
    task, so salting only matters at extreme fan-in (tens of thousands
    of map tasks hammering one composite key); results are identical up
    to float summation order for SUM/AVG.
    """
    active = [r for r in rules if r.query_state is RuleState.ACTIVE]
    if not active:
        raise ValueError("no ACTIVE rules")
    modes = {window_mode(r) for r in active}
    # Compiled fan-out: per-rule literal match structs in one projection
    # over a single scan; foreachBatch rebuilds the plan every batch
    # anyway, so literal predicates (codegen, pushdown-friendly) beat
    # rules-as-data lookups here. The rules-as-data variant
    # (operators/fanout.py) remains for fixed plans over dynamic tables.
    keyed = events.select(
        F.col(ts_col),
        F.explode(
            F.array_compact(F.array(*[_rule_struct(r, events) for r in active]))
        ).alias("_r"),
    ).select(ts_col, "_r.*")

    ts = F.col(ts_col)
    tsl = F.unix_millis(ts)
    qid = F.col("query_id")
    branches: list[DataFrame] = []

    if "W0" in modes:
        branches.append(
            keyed.filter(F.col("mode") == "W0").select(
                qid,
                F.col("key"),
                ts.alias("window_start"),
                ts.alias("window_end"),
                F.lit(0.0).alias("agg_value"),
                F.lit(False).alias("fired"),
            )
        )

    if "W1" in modes:
        # RANGE frame bounds must be plan constants → one window pass
        # per DISTINCT window size (control-plane cardinality), all over
        # the same fanned-out scan.
        w1_sizes = sorted(
            {int(r.window_milliseconds) for r in active if window_mode(r) == "W1"}
        )
        for w in w1_sizes:
            sub = keyed.filter((F.col("mode") == "W1") & (F.col("window_ms") == w))
            wspec = (
                Window.partitionBy("query_id", "key").orderBy(tsl).rangeBetween(-w, 0)
            )
            agg = _select_agg(
                F.sum("_value").over(wspec),
                F.avg("_value").over(wspec),
                F.min("_value").over(wspec),
                F.max("_value").over(wspec),
                F.count(F.lit(1)).over(wspec).cast("double"),
            )
            out = sub.select(
                qid,
                F.col("key"),
                (ts - F.expr(f"INTERVAL {w} MILLISECONDS")).alias("window_start"),
                ts.alias("window_end"),
                agg.alias("agg_value"),
                "limit_op",
                "limit_val",
            )
            branches.append(
                out.withColumn("fired", _fired(F.col("agg_value"))).drop(
                    "limit_op", "limit_val"
                )
            )

    if "W2" in modes or "W3" in modes:
        w = F.col("window_ms")
        f_ = F.col("freq_ms")
        # epoch-millis integer window math, identical to the compiler's
        # F.window bucketing and the SQL twin (rules/sql_gen.py):
        # tumbling start = tsl - tsl % w; sliding starts = multiples of
        # f in (tsl - w, tsl].
        tumb_start = tsl - F.pmod(tsl, w)
        slide_first = (tsl - w) - F.pmod(tsl - w, f_) + f_
        slide_last = tsl - F.pmod(tsl, f_)
        ws_arr = F.when(F.col("mode") == "W2", F.array(tumb_start)).otherwise(
            F.sequence(slide_first, slide_last, f_)
        )
        w23 = (
            keyed.filter(F.col("mode").isin("W2", "W3"))
            .withColumn("ws", F.explode(ws_arr))
        )
        # window_ms/agg_fn/is_count/limit_* are functionally dependent
        # on query_id — free riders in the grouping key.
        group_cols = [
            "query_id", "key", "ws",
            "window_ms", "agg_fn", "is_count", "limit_op", "limit_val",
        ]
        if salt_buckets and salt_buckets > 1:
            salted = w23.withColumn(
                "_salt", F.pmod(F.crc32(F.col(ts_col).cast("string")), salt_buckets)
            )
            partial = salted.groupBy(*group_cols, "_salt").agg(
                F.sum("_value").alias("_psum"),
                F.count("_value").alias("_pvcnt"),
                F.min("_value").alias("_pmin"),
                F.max("_value").alias("_pmax"),
                F.count(F.lit(1)).alias("_pcnt"),
            )
            grouped = partial.groupBy(*group_cols).agg(
                F.sum("_psum").alias("_sum"),
                (F.sum("_psum") / F.sum("_pvcnt")).alias("_avg"),
                F.min("_pmin").alias("_min"),
                F.max("_pmax").alias("_max"),
                F.sum("_pcnt").cast("double").alias("_cnt"),
            )
        else:
            grouped = w23.groupBy(*group_cols).agg(
                F.sum("_value").alias("_sum"),
                F.avg("_value").alias("_avg"),
                F.min("_value").alias("_min"),
                F.max("_value").alias("_max"),
                F.count(F.lit(1)).cast("double").alias("_cnt"),
            )
        agg = _select_agg(
            F.col("_sum"), F.col("_avg"), F.col("_min"), F.col("_max"), F.col("_cnt")
        )
        out = grouped.select(
            qid,
            F.col("key"),
            F.timestamp_millis(F.col("ws")).alias("window_start"),
            F.timestamp_millis(F.col("ws") + F.col("window_ms")).alias("window_end"),
            agg.alias("agg_value"),
            _fired(agg).alias("fired"),
        )
        branches.append(out)

    return reduce(lambda a, b: a.unionByName(b), branches)
