"""W1 per-event-slide window as a true streaming operator.

The reference's headline trick (README.md:4,20): Flink's sliding
window with slide→0 explodes into one pane per slide, so it keeps ONE
event buffer per key and re-aggregates on every event
(``DynamicQueryFunction.java:118-121,150-166``). In Spark the batch
analogue is a RANGE window frame (rules/compiler.py W1); the streaming
analogue here is ``applyInPandasWithState``: keyed state = the trailing
event buffer, evicted to ``[t_max - w, t_max]`` exactly like the
reference's widest-window eviction, emission = one row per arriving
event with the aggregate over the trailing inclusive window.

Arrow-batched: each micro-batch's rows for a key arrive as one pandas
frame — the per-event loop is NumPy-backed, not row-at-a-time Python.

State size is O(events in window) per key — identical to the
reference's MapState footprint, but partitioned across executors and
RocksDB-spillable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from activedatawarehouseprototype_spark.rules.model import Rule

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("event_ts_ms", LongType()),
        StructField("agg_value", DoubleType()),
        StructField("fired", BooleanType()),
    ]
)

STATE_SCHEMA = "ts array<long>, vals array<double>"


def _agg(values: list[float], kind: str) -> float:
    if kind == "SUM":
        return float(sum(values))
    if kind == "AVG":
        return float(sum(values)) / len(values)
    if kind == "MIN":
        return float(min(values))
    if kind == "MAX":
        return float(max(values))
    return float(len(values))  # COUNT


def make_w1_processor(rule: Rule, ts_col: str = "ts", value_col: str = "value"):
    """Build the (key, pdf_iter, state) -> pdf_iter function for
    ``applyInPandasWithState`` implementing rule's W1 semantics."""
    w_ms = int(rule.window_milliseconds)
    kind = "COUNT" if rule.is_count else rule.aggregator_function_type.value
    op = rule.limit_operator_type.value if rule.limit_operator_type else None
    limit = rule.limit

    def fire(v: float) -> bool:
        if op is None or limit is None:
            return False
        return {
            "=": v == limit,
            "!=": v != limit,
            ">": v > limit,
            "<": v < limit,
            ">=": v >= limit,
            "<=": v <= limit,
        }[op]

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_buf, val_buf = state.get
            ts_buf, val_buf = list(ts_buf), list(val_buf)
        else:
            ts_buf, val_buf = [], []
        key_str = "{" + ";".join(
            f"{n[1:] if n.startswith('$') else n}={v}"
            for n, v in zip(rule.grouping_key_names, key)
        ) + "}"
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            out_ts: list[int] = []
            out_val: list[float] = []
            out_fired: list[bool] = []
            for t, v in zip(
                (pdf[ts_col].astype("int64") // 1_000_000).tolist(),
                pdf[value_col].astype("float64").tolist(),
            ):
                ts_buf.append(int(t))
                val_buf.append(float(v))
                # evict strictly-older-than-window state
                # (inclusive [t - w, t] — DynamicQueryFunction.java:277-280)
                lo = t - w_ms
                keep = [i for i, tt in enumerate(ts_buf) if tt >= lo]
                ts_buf = [ts_buf[i] for i in keep]
                val_buf = [val_buf[i] for i in keep]
                in_win = [v2 for tt, v2 in zip(ts_buf, val_buf) if tt <= t]
                a = _agg(in_win, kind)
                out_ts.append(t)
                out_val.append(a)
                out_fired.append(fire(a))
            yield pd.DataFrame(
                {
                    "key": key_str,
                    "event_ts_ms": out_ts,
                    "agg_value": out_val,
                    "fired": out_fired,
                }
            )
        state.update((ts_buf, val_buf))

    return process


def w1_stream(
    events: DataFrame, rule: Rule, ts_col: str = "ts", value_col: str | None = None
) -> DataFrame:
    """Apply the W1 per-event trailing-window rule to a (streaming or
    batch-test) DataFrame. Keys = the rule's grouping columns."""
    value_col = value_col or rule.aggregate_field_name
    keys = [k[1:] if k.startswith("$") else k for k in rule.grouping_key_names]
    processor = make_w1_processor(rule, ts_col=ts_col, value_col=value_col)
    return events.groupBy(*keys).applyInPandasWithState(
        processor,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
