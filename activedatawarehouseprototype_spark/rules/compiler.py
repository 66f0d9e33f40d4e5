"""Rule → DataFrame plan compiler.

The reference interprets every rule per event via reflection
(``operator/DynamicKeyFunction.java:51-105``,
``operator/DynamicQueryFunction.java:70-204``). Here a rule is compiled
ONCE into a declarative DataFrame plan — filters, grouping keys, window
bucketing, one aggregate, HAVING threshold — and Catalyst provides
predicate pushdown, column pruning, partial (map-side) aggregation and
whole-stage codegen for free.

Window emission modes (``DynamicQueryFunction.processElement:91-147``):

- W0 passthrough (window <= 0): no aggregation; one output row per
  matching event with agg_value=0, fired=false
  (``DynamicQueryFunction.java:93-116``).
- W1 per-event slide (frequency == 0): aggregate the trailing
  ``[t - w, t]`` window — bounds inclusive both ends
  (``isStateValueInWindow``, ``DynamicQueryFunction.java:277-280``) —
  and emit per event. Batch analogue: RANGE window frame over epoch
  millis. Exact, and fully incremental in Spark's sort-based window exec.
- W2 tumbling (frequency null or > window): one aggregate per
  event-time tumbling window of size w.
- W3 sliding (0 < frequency <= window): sliding window, slide = f.

Time semantics upgrade (documented delta): the reference mixes
processing-time timers with a process-time window column and has no
watermarks (``App.java:50``); this engine uses clean event-time windows
(batch: the event's timestamp column; streaming: watermarked event time).

Scale notes:
- Every compiled plan is a scan → filter → (shuffle on grouping keys)
  → partial+final agg. Filters land before the shuffle and reach the
  parquet scan (PushedFilters) because they are plain literal
  predicates on scan columns.
- W1 shuffles once on the grouping keys and sorts within partitions —
  the standard, spillable window-exec path; no driver-side state.
- Uniform output schema across modes keeps N-rule evaluation a single
  ``unionByName`` plan.

Output schema (the reference's demo side-output K2, one row per
evaluation; alerts = ``fired`` rows):
``query_id bigint, key string, window_start timestamp,
window_end timestamp, agg_value double, fired boolean``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.rules.model import (
    AggregatorFunctionType,
    LimitOperatorType,
    Rule,
    RuleState,
)

EVAL_COLUMNS = (
    "query_id",
    "key",
    "window_start",
    "window_end",
    "agg_value",
    "fired",
)

# the ONE numeric-type classifier shared by the compiled-literal path
# here, the rules-as-data fan-out (operators/fanout.py), and grouped
# evaluation's field validation (streaming/group_eval.py) — the two
# physical strategies are equivalence-tested, so their type dispatch
# must come from a single definition
_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")


def _is_numeric(dtype: str) -> bool:
    return dtype.startswith(_NUMERIC_PREFIXES)


def _compare(col: Column, op: LimitOperatorType, value: Column) -> Column:
    if op is LimitOperatorType.EQUAL:
        return col == value
    if op is LimitOperatorType.NOT_EQUAL:
        return col != value
    if op is LimitOperatorType.GREATER:
        return col > value
    if op is LimitOperatorType.LESS:
        return col < value
    if op is LimitOperatorType.GREATER_EQUAL:
        return col >= value
    if op is LimitOperatorType.LESS_EQUAL:
        return col <= value
    raise ValueError(f"unknown operator {op}")


def compile_filter(rule: Rule, df: DataFrame) -> Column:
    """WindowFilterRules conjuncts → one boolean Column.

    True per-rule AND — deliberately NOT replicating the reference's
    evaluation quirks (a failed numeric conjunct aborts all remaining
    rules, and a later ``=`` overwrites an earlier failed one;
    ``DynamicKeyFunction.java:76-89``). Numeric fields compare
    numerically (reference: BigDecimal, ``DynamicKeyFunction.java:80-86``),
    string fields compare as strings (``:76-78``).
    """
    if not rule.window_filter_rules:
        return F.lit(True)
    dtypes = dict(df.dtypes)
    conjuncts: list[Column] = []
    for f in rule.window_filter_rules:
        dtype = dtypes.get(f.field)
        if dtype is None:
            raise ValueError(f"rule {rule.query_id}: unknown filter field {f.field!r}")
        if _is_numeric(dtype):
            conjuncts.append(
                _compare(F.col(f.field), f.operator, F.lit(float(f.value)))
            )
        else:
            conjuncts.append(_compare(F.col(f.field), f.operator, F.lit(f.value)))
    return reduce(lambda a, b: a & b, conjuncts)


def composite_key(rule: Rule) -> Column:
    """Composite grouping key string ``{k1=v1;k2=v2}`` — parity with
    ``operator/KeysExtractor.java:19-41``. Keys are sorted in rule
    order (the reference preserves groupingKeyNames order). NULL key
    values render as ``null`` (String.valueOf parity) instead of
    nulling the whole key via concat propagation."""
    names = [k[1:] if k.startswith("$") else k for k in rule.grouping_key_names]
    if not names:
        return F.lit("{}")
    parts: list[Column] = [F.lit("{")]
    for i, name in enumerate(names):
        if i:
            parts.append(F.lit(";"))
        parts.append(F.lit(f"{name}="))
        parts.append(F.coalesce(F.col(name).cast("string"), F.lit("null")))
    parts.append(F.lit("}"))
    return F.concat(*parts)


def key_columns(rule: Rule) -> list[str]:
    return [k[1:] if k.startswith("$") else k for k in rule.grouping_key_names]


def compile_aggregate(rule: Rule, value: Column | None = None) -> Column:
    """One aggregate Column (A1-A5: SUM/AVG/MIN/MAX/COUNT,
    ``common/accumulators/*`` + COUNT sentinels
    ``DynamicQueryFunction.java:282-297``), cast to double.

    No negative-value restriction (the reference's MAX accumulator
    throws on negatives, ``BigDecimalMaximum.java:55-59`` — a bug we
    don't replicate)."""
    if rule.is_count:
        return F.count(F.lit(1)).cast("double")
    if value is None:
        value = F.col(rule.aggregate_field_name)
    t = rule.aggregator_function_type
    if t is AggregatorFunctionType.SUM:
        return F.sum(value).cast("double")
    if t is AggregatorFunctionType.AVG:
        return F.avg(value).cast("double")
    if t is AggregatorFunctionType.MIN:
        return F.min(value).cast("double")
    if t is AggregatorFunctionType.MAX:
        return F.max(value).cast("double")
    raise ValueError(f"rule {rule.query_id}: no aggregator configured")


def compile_having(rule: Rule, agg_col: Column) -> Column:
    """Threshold predicate (F2; ``rule/Rule.java:57-74``) as a Column."""
    if rule.limit_operator_type is None or rule.limit is None:
        return F.lit(False)
    return _compare(agg_col, rule.limit_operator_type, F.lit(float(rule.limit)))


def window_mode(rule: Rule) -> str:
    """Dispatch per ``DynamicQueryFunction.processElement:91-147``."""
    w = rule.window_milliseconds
    if w is None or w <= 0:
        return "W0"
    f = rule.frequency_milliseconds
    if f == 0:
        return "W1"
    if f is None or f > w:
        return "W2"
    return "W3"


def evaluate_rule(
    df: DataFrame,
    rule: Rule,
    ts_col: str = "ts",
    fired_only: bool = False,
    dedup_same_ts: bool = False,
) -> DataFrame:
    """Compile + run one rule against an event DataFrame.

    Returns the evaluation stream (K2 demo-sink analogue): one row per
    window/key (W2/W3) or per event (W0/W1) with the uniform
    ``EVAL_COLUMNS`` schema. ``fired_only=True`` keeps only alert rows
    (K1 main-sink analogue).

    ``dedup_same_ts=True`` reproduces the reference's A7 quirk: its
    per-key state is a ``HashSet`` per millisecond, so value-equal
    events at the same timestamp collapse before aggregation
    (common/utils/ProcessUtils.java:16-25, lombok @Data equals on
    SHCarRide). Off by default — duplicate events normally count."""
    if rule.query_state is not RuleState.ACTIVE:
        raise ValueError(f"rule {rule.query_id} is not ACTIVE")

    mode = window_mode(rule)
    # An event without event time cannot be placed in any window — it is
    # excluded in every mode (the reference would NPE on it; dropping is
    # the documented contract of this event-time engine).
    filtered = df.filter(
        compile_filter(rule, df) & F.col(ts_col).isNotNull()
    )
    if dedup_same_ts:
        filtered = filtered.dropDuplicates()
    key = composite_key(rule)
    qid = F.lit(rule.query_id).cast("bigint")
    ts = F.col(ts_col)

    if mode == "W0":
        # Per-event passthrough: agg=0, fired=false
        # (DynamicQueryFunction.java:93-116).
        out = filtered.select(
            qid.alias("query_id"),
            key.alias("key"),
            ts.alias("window_start"),
            ts.alias("window_end"),
            F.lit(0.0).alias("agg_value"),
            F.lit(False).alias("fired"),
        )
        return out.filter("fired") if fired_only else out

    w_ms = int(rule.window_milliseconds)

    if mode == "W1":
        # Trailing [t - w, t] inclusive per event == RANGE frame over
        # epoch millis. Shuffle on keys, sort within partition; exact
        # batch analogue of the reference's per-event re-aggregation,
        # but computed incrementally by Spark's window exec.
        tsl = F.unix_millis(ts)
        keys = key_columns(rule)
        wspec = (
            Window.partitionBy(*[F.col(k) for k in keys])
            .orderBy(tsl)
            .rangeBetween(-w_ms, 0)
        )
        if rule.is_count:
            agg = F.count(F.lit(1)).over(wspec).cast("double")
        else:
            v = F.col(rule.aggregate_field_name)
            t = rule.aggregator_function_type
            fn = {
                AggregatorFunctionType.SUM: F.sum,
                AggregatorFunctionType.AVG: F.avg,
                AggregatorFunctionType.MIN: F.min,
                AggregatorFunctionType.MAX: F.max,
            }[t]
            agg = fn(v).over(wspec).cast("double")
        out = filtered.select(
            qid.alias("query_id"),
            key.alias("key"),
            (ts - F.expr(f"INTERVAL {w_ms} MILLISECONDS")).alias("window_start"),
            ts.alias("window_end"),
            agg.alias("agg_value"),
        ).withColumn("fired", compile_having(rule, F.col("agg_value")))
        return out.filter("fired") if fired_only else out

    # W2 tumbling / W3 sliding via the built-in event-time window
    # bucketing — incremental partial aggregation, no per-pane buffers.
    if mode == "W2":
        win = F.window(ts, f"{w_ms} milliseconds")
    else:
        f_ms = int(rule.frequency_milliseconds)
        win = F.window(ts, f"{w_ms} milliseconds", f"{f_ms} milliseconds")

    keys = key_columns(rule)
    grouped = filtered.groupBy(win.alias("w"), *[F.col(k) for k in keys]).agg(
        compile_aggregate(rule).alias("agg_value")
    )
    out = grouped.select(
        qid.alias("query_id"),
        composite_key(rule).alias("key"),
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("agg_value"),
    ).withColumn("fired", compile_having(rule, F.col("agg_value")))
    return out.filter("fired") if fired_only else out


def evaluate_rules(
    df: DataFrame,
    rules: list[Rule],
    ts_col: str = "ts",
    fired_only: bool = False,
) -> DataFrame:
    """Evaluate every ACTIVE rule and union the evaluation streams.

    The reference fans each event out to every matching rule before one
    shuffle (``DynamicKeyFunction.java:95-100``); compiled per-rule
    plans achieve the same result with per-rule pushdown — each rule's
    filter prunes the scan independently, and AQE coalesces the union's
    shuffles."""
    active = [r for r in rules if r.query_state is RuleState.ACTIVE]
    if not active:
        raise ValueError("no ACTIVE rules")
    parts = [evaluate_rule(df, r, ts_col=ts_col, fired_only=fired_only) for r in active]
    return reduce(lambda a, b: a.unionByName(b), parts)
