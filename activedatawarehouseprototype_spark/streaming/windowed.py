"""Native Structured Streaming path for W2/W3 rules: watermarked
event-time windowed aggregation (``withWatermark`` + ``window`` +
agg + HAVING), per rule.

This is the idiomatic Spark realization of the reference's
tumbling/sliding emission modes for a FIXED rule — Spark's windowed
state store handles buffering, incremental aggregation, late data and
state GC (the principled upgrade over the reference's wall-clock
timers and manual eviction, SURVEY §2.6). The dynamic-rule-set case
(rules change mid-stream) goes through ``ActivePipeline``'s
foreachBatch instead, because a running streaming plan cannot mutate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.rules.compiler import (
    compile_aggregate,
    compile_filter,
    compile_having,
    composite_key,
    key_columns,
    window_mode,
)
from activedatawarehouseprototype_spark.rules.model import Rule


def windowed_rule_stream(
    events: DataFrame,
    rule: Rule,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming DataFrame of EVAL rows for a W2/W3 rule. Attach any
    sink; append mode emits each window once, when the watermark passes
    its end (exactly-once finalized windows)."""
    mode = window_mode(rule)
    if mode not in ("W2", "W3"):
        raise ValueError(f"windowed_rule_stream handles W2/W3 rules, got {mode}")
    w_ms = int(rule.window_milliseconds)
    if mode == "W2":
        win = F.window(F.col(ts_col), f"{w_ms} milliseconds")
    else:
        win = F.window(
            F.col(ts_col),
            f"{w_ms} milliseconds",
            f"{int(rule.frequency_milliseconds)} milliseconds",
        )
    filtered = events.filter(
        compile_filter(rule, events) & F.col(ts_col).isNotNull()
    ).withWatermark(ts_col, watermark)
    grouped = filtered.groupBy(win.alias("w"), *key_columns(rule)).agg(
        compile_aggregate(rule).alias("agg_value")
    )
    return grouped.select(
        F.lit(rule.query_id).cast("bigint").alias("query_id"),
        composite_key(rule).alias("key"),
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("agg_value"),
    ).withColumn("fired", compile_having(rule, F.col("agg_value")))


def session_rule_stream(
    events: DataFrame,
    rule: Rule,
    gap_ms: int,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session-window variant (parity-plus: the reference has no session
    windows — SURVEY §2.6): per-key sessions close after ``gap_ms`` of
    inactivity; the rule's aggregate + threshold apply per session.
    Batch equivalence: the gaps-and-islands plan in corpus/temporal.py."""
    if gap_ms <= 0:
        raise ValueError(f"gap_ms must be positive, got {gap_ms}")
    # same contracts as windowed_rule_stream: NULL event times are
    # dropped (not a NULL session group), and a passthrough/per-event
    # rule must not silently acquire session semantics
    if rule.window_milliseconds is not None and rule.window_milliseconds <= 0:
        raise ValueError(
            "session_rule_stream: rule is W0 passthrough "
            "(windowMilliseconds <= 0) — sessionizing it would silently "
            "change its semantics"
        )
    filtered = (
        events.filter(F.col(ts_col).isNotNull())
        .filter(compile_filter(rule, events))
        .withWatermark(ts_col, watermark)
    )
    win = F.session_window(F.col(ts_col), f"{gap_ms} milliseconds")
    grouped = filtered.groupBy(win.alias("w"), *key_columns(rule)).agg(
        compile_aggregate(rule).alias("agg_value")
    )
    return grouped.select(
        F.lit(rule.query_id).cast("bigint").alias("query_id"),
        composite_key(rule).alias("key"),
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("agg_value"),
    ).withColumn("fired", compile_having(rule, F.col("agg_value")))


def windowed_distinct_stream(
    events: DataFrame,
    key_col: str,
    window_ms: int,
    group_cols: tuple[str, ...] = (),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    approximate: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Distinct-``key_col`` count per tumbling event-time window (e.g.
    unique users per minute) — the aggregation Structured Streaming
    does NOT allow directly (COUNT(DISTINCT) is unsupported in
    streaming aggs), expressed the two idiomatic ways:

    - exact (default): chained stateful ops — watermarked
      dropDuplicates on (window, key, groups) feeding a windowed
      count. State is O(distinct keys inside the watermark horizon);
      right answer, heavier state.
    - ``approximate=True``: ONE stateful op with an HLL++ sketch
      (``approx_count_distinct``) per (window, group) — state is
      O(1/rsd^2) REGARDLESS of cardinality, the 100 TB shape when
      +-rsd is acceptable.

    Output: (window_start_ms BIGINT, *group_cols, distinct_keys
    BIGINT); windows are epoch-aligned so the batch twin's integer
    floor(epoch_ms/window)*window arithmetic lands on identical
    buckets. Append mode emits each window once the watermark passes
    its end.
    """
    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")
    w = F.window(F.col(ts_col), f"{int(window_ms)} milliseconds")
    src = events.filter(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    ).withWatermark(ts_col, watermark)
    if approximate:
        agg = src.groupBy(w.alias("w"), *group_cols).agg(
            F.approx_count_distinct(key_col, rsd).alias("distinct_keys")
        )
    else:
        deduped = src.select(w.alias("w"), key_col, *group_cols).dropDuplicates(
            ["w", key_col, *group_cols]
        )
        agg = deduped.groupBy("w", *group_cols).agg(
            F.count(F.lit(1)).alias("distinct_keys")
        )
    return agg.select(
        F.unix_millis(F.col("w.start")).alias("window_start_ms"),
        *group_cols,
        F.col("distinct_keys").cast("bigint").alias("distinct_keys"),
    )


def windowed_distinct_batch(
    events: DataFrame,
    key_col: str,
    window_ms: int,
    group_cols: tuple[str, ...] = (),
    ts_col: str = "ts",
) -> DataFrame:
    """Batch twin of ``windowed_distinct_stream`` (exact path): same
    output contract over complete data, via epoch-millis integer
    window arithmetic (timezone-independent by construction)."""
    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")
    ws = (
        F.floor(F.unix_millis(F.col(ts_col)) / F.lit(int(window_ms)))
        * int(window_ms)
    ).cast("bigint")
    return (
        events.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(ws.alias("window_start_ms"), *group_cols)
        .agg(F.count_distinct(F.col(key_col)).alias("distinct_keys"))
    )


def windowed_topk_batch(
    events: DataFrame,
    key_col: str,
    window_ms: int,
    k: int = 5,
    group_cols: tuple[str, ...] = (),
    ts_col: str = "ts",
) -> DataFrame:
    """Exact top-``k`` keys per tumbling window: (window_start_ms,
    *group_cols, key STRING, n, rank), rank ordered by (count DESC,
    key ASC). Key is rendered as a string so one output contract
    serves any key type (and the SQL twin is a plain CAST).

    Two shuffles (count, then rank) over (window, groups) — the rank
    window reuses the count's partitioning keys plus none, so AQE
    coalesces; per-group state in the rank is O(1). The streaming
    variant below bounds state with Misra-Gries instead."""
    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window as W

    ws = (
        F.floor(F.unix_millis(F.col(ts_col)) / F.lit(int(window_ms)))
        * int(window_ms)
    ).cast("bigint")
    counts = (
        events.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            ws.alias("window_start_ms"),
            *group_cols,
            F.col(key_col).cast("string").alias("key"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = W.partitionBy("window_start_ms", *group_cols).orderBy(
        F.col("n").desc(), F.col("key").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def mg_merge(counters: dict, batch_counts, cap: int) -> dict:
    """Batched Misra-Gries update: merge ``batch_counts`` (iterable of
    (key, count)) into ``counters`` keeping at most ``cap`` entries.
    When the table is full, the overflow count is distributed as a
    uniform decrement across all cap+1 counters (incoming included) —
    the standard MG bound holds: every stored count undercounts its
    true frequency by at most total/(cap+1), and any key with true
    frequency > total/(cap+1) is guaranteed present. Pure function
    (returns the mutated dict) so the property suite can drive it
    directly; the streaming operator below is its only other caller."""
    for kk, c in batch_counts:
        c = int(c)
        if kk in counters:
            counters[kk] += c
        elif len(counters) < cap:
            counters[kk] = c
        else:
            d = min(c, min(counters.values()))
            counters = {q: v - d for q, v in counters.items() if v - d > 0}
            if c - d > 0:
                counters[kk] = c - d
    return counters


def windowed_topk_stream(
    events: DataFrame,
    key_col: str,
    window_ms: int,
    k: int = 5,
    capacity: int | None = None,
    group_cols: tuple[str, ...] = (),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming top-``k`` keys per tumbling event-time window — the
    "trending items per minute" shape. Structured Streaming cannot rank
    inside a streaming agg (no window functions over streams), so this
    is the custom-stateful-operator recipe the task brief prescribes:
    ``applyInPandasWithState`` keyed by (window, groups) holding a
    **Misra-Gries summary of at most ``capacity`` counters** (public
    algorithm, Misra & Gries 1982), emitted ONCE when the event-time
    watermark passes the window end (EventTimeTimeout).

    State per live window-group is O(capacity) — NOT O(distinct keys):
    at 100 TB the worst-case state is |live windows| x |groups| x
    capacity counters, independent of key cardinality. Guarantees:
    with capacity >= distinct keys in the group-window the counts (and
    the top-k) are EXACT (the equivalence test pins this against the
    batch twin); under overflow any key with true count >
    total/(capacity+1) is guaranteed present, counts undercount by at
    most total/(capacity+1) (the planted-skew test pins the bound).

    Late rows for an already-emitted window are dropped via the
    current-watermark guard (re-opening the group would double-emit
    the window)."""
    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    cap = int(capacity) if capacity is not None else max(4 * k, 64)
    if cap < k:
        raise ValueError(f"capacity {cap} must be >= k {k}")
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    win = int(window_ms)
    gtypes = ", ".join(
        f"`{g}` {events.schema[g].dataType.simpleString()}" for g in group_cols
    )
    out_schema = (
        "window_start_ms bigint"
        + (f", {gtypes}" if group_cols else "")
        + ", key string, n bigint, rank int"
    )
    state_schema = "ks array<string>, cs array<bigint>"

    def process(key, pdfs, state: "GroupState"):
        wstart = int(key[0])
        groups = key[1:]

        def emit(counters):
            order = sorted(counters.items(), key=lambda t: (-t[1], t[0]))[:k]
            if not order:
                return None
            cols = {"window_start_ms": [wstart] * len(order)}
            for g, v in zip(group_cols, groups):
                cols[g] = [v] * len(order)
            cols["key"] = [t[0] for t in order]
            cols["n"] = [int(t[1]) for t in order]
            cols["rank"] = list(range(1, len(order) + 1))
            return pd.DataFrame(cols)

        if state.hasTimedOut:
            ks, cs = state.get
            out = emit(dict(zip(ks, cs)))
            state.remove()
            if out is not None:
                yield out
            return

        # the watermark only advances BETWEEN triggers, so rows that
        # reach this call were on time when their batch was admitted —
        # but the window may have become due in the meantime:
        due = wstart + win <= state.getCurrentWatermarkMs()
        if due and not state.exists:
            # true straggler: the window already timed out and emitted;
            # re-opening the group would double-emit it (and a timeout
            # in the past cannot be set)
            return

        if state.exists:
            ks, cs = state.get
            counters = dict(zip(ks, cs))
        else:
            counters = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            counters = mg_merge(
                counters, pdf["_mgkey"].value_counts().items(), cap
            )
        if due:
            # same-trigger data + expired timeout arrive as ONE data
            # call (no separate timeout call follows): emit now
            out = emit(counters)
            if state.exists:  # due && !exists returned above
                state.remove()
            if out is not None:
                yield out
            return
        state.update((list(counters.keys()), [int(v) for v in counters.values()]))
        state.setTimeoutTimestamp(wstart + win)
        return

    ws = (
        F.floor(F.unix_millis(F.col(ts_col)) / F.lit(win)) * win
    ).cast("bigint")
    src = (
        events.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            ws.alias("_w"),
            *group_cols,
            F.col(key_col).cast("string").alias("_mgkey"),
        )
    )
    return src.groupBy("_w", *group_cols).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
