"""Rule → ANSI SQL generator: every JSON rule compiles not only to a
DataFrame plan (rules/compiler.py) but also to an equivalent SQL string
runnable by any ANSI engine (DuckDB, Spark SQL).

Uses the same epoch-millis integer window math as the compiler, so the
generated SQL is hash-identical to the DataFrame result — it can serve
as the correctness oracle for ad-hoc rules, or as an escape hatch to
run a standing rule on an external warehouse.

Numeric columns must be listed by the caller (SQL has no schema access
at generation time); string-typed filter fields compare as strings.
"""

from __future__ import annotations

import re

from activedatawarehouseprototype_spark.rules.model import Rule, RuleState
from activedatawarehouseprototype_spark.rules.compiler import window_mode


_IDENT_OK = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _ident(name: str) -> str:
    """Field names come from user-supplied rule JSON — refuse anything
    that is not a plain identifier (the injection surface the string
    escaping below can't close)."""
    if not _IDENT_OK.match(name):
        raise ValueError(f"unsafe field name in rule: {name!r}")
    return name


def _filters_sql(rule: Rule, numeric_cols: set[str]) -> str:
    parts = []
    for f in rule.window_filter_rules:
        op = "<>" if f.operator.value == "!=" else f.operator.value
        if f.field in numeric_cols:
            parts.append(f"{_ident(f.field)} {op} {float(f.value)}")
        else:
            escaped = str(f.value).replace("'", "''")
            parts.append(f"{_ident(f.field)} {op} '{escaped}'")
    return " AND ".join(parts) if parts else "TRUE"


def _key_sql(rule: Rule) -> str:
    names = [k[1:] if k.startswith("$") else k for k in rule.grouping_key_names]
    if not names:
        return "'{}'"
    # COALESCE(..., 'null') matches the compiler's null-safe composite
    # key (reference String.valueOf renders null keys as "null").
    inner = " || ';' || ".join(
        f"'{n}=' || COALESCE(CAST({_ident(n)} AS VARCHAR), 'null')" for n in names
    )
    return f"'{{' || {inner} || '}}'"


def _agg_sql(rule: Rule) -> str:
    if rule.is_count:
        return "CAST(COUNT(*) AS DOUBLE)"
    fn = rule.aggregator_function_type.value
    return f"CAST({fn}({_ident(rule.aggregate_field_name)}) AS DOUBLE)"


def _having_sql(rule: Rule, agg_expr: str) -> str:
    if rule.limit_operator_type is None or rule.limit is None:
        return "FALSE"
    op = "<>" if rule.limit_operator_type.value == "!=" else rule.limit_operator_type.value
    return f"{agg_expr} {op} {float(rule.limit)}"


def rule_to_sql(
    rule: Rule,
    table: str = "events",
    ts_col: str = "ts",
    numeric_cols: set[str] | None = None,
    fired_only: bool = False,
) -> str:
    """Generate the ANSI-SQL twin of ``evaluate_rule`` (projected to the
    corpus shape: window bounds as epoch-millis BIGINT, agg as DOUBLE).
    Works on DuckDB (epoch_ms) — for Spark SQL swap epoch_ms(x) with
    unix_millis(x)."""
    if rule.query_state is not RuleState.ACTIVE:
        raise ValueError("only ACTIVE rules generate SQL")
    numeric_cols = numeric_cols or set()
    mode = window_mode(rule)
    # the compiler drops NULL-timestamp rows in every mode
    # (compiler.py ts IS NOT NULL contract) — the SQL twin must too,
    # or it emits spurious NULL-bucket rows exactly when used as the
    # correctness oracle
    where = f"{_ident(ts_col)} IS NOT NULL AND ({_filters_sql(rule, numeric_cols)})"
    key = _key_sql(rule)
    qid = f"CAST({rule.query_id} AS BIGINT)"
    keys = ", ".join(
        _ident(k[1:] if k.startswith("$") else k) for k in rule.grouping_key_names
    )

    if mode == "W0":
        sql = f"""
SELECT {qid} AS query_id, {key} AS key,
       epoch_ms({ts_col}) AS window_start_ms,
       epoch_ms({ts_col}) AS window_end_ms,
       0.0 AS agg_value, FALSE AS fired
FROM {table} WHERE {where}"""
        return sql + ("\n" if not fired_only else "\nAND FALSE\n")

    w = int(rule.window_milliseconds)
    agg = _agg_sql(rule)
    fired = _having_sql(rule, agg)

    if mode == "W1":
        field = "1" if rule.is_count else _ident(rule.aggregate_field_name)
        fn = "COUNT" if rule.is_count else rule.aggregator_function_type.value
        partition = f"PARTITION BY {keys} " if keys else ""
        over = (
            f"{fn}({field}) OVER ({partition}ORDER BY epoch_ms({ts_col}) "
            f"RANGE BETWEEN {w} PRECEDING AND CURRENT ROW)"
        )
        inner = f"""
SELECT {qid} AS query_id, {key} AS key,
       epoch_ms({ts_col}) - {w} AS window_start_ms,
       epoch_ms({ts_col}) AS window_end_ms,
       CAST({over} AS DOUBLE) AS agg_value,
       {_having_sql(rule, f"CAST({over} AS DOUBLE)")} AS fired
FROM {table} WHERE {where}"""
        return (
            f"SELECT * FROM ({inner}\n) WHERE fired\n" if fired_only else inner + "\n"
        )

    if mode == "W2":
        bucket = f"(epoch_ms({ts_col}) // {w}) * {w}"
        slide_sql = f"""
SELECT {qid} AS query_id, {key} AS key,
       {bucket} AS window_start_ms,
       {bucket} + {w} AS window_end_ms,
       {agg} AS agg_value,
       {fired} AS fired
FROM {table} WHERE {where}
GROUP BY {f"{keys}, " if keys else ""}window_start_ms"""
    else:  # W3
        f_ms = int(rule.frequency_milliseconds)
        slide_sql = f"""
WITH e AS (SELECT *, epoch_ms({ts_col}) AS tms_ FROM {table} WHERE {where}),
win AS (
  SELECT e.*, t.ws FROM e, UNNEST(generate_series(
      (e.tms_ - {w}) // {f_ms} * {f_ms} + {f_ms},
      e.tms_ // {f_ms} * {f_ms}, {f_ms})) AS t(ws)
)
SELECT {qid} AS query_id, {key} AS key,
       ws AS window_start_ms, ws + {w} AS window_end_ms,
       {agg} AS agg_value, {fired} AS fired
FROM win GROUP BY {f"{keys}, " if keys else ""}ws"""
    return (
        f"SELECT * FROM ({slide_sql}\n) WHERE fired\n"
        if fired_only
        else slide_sql + "\n"
    )
