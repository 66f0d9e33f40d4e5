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

Vectorized: the whole Arrow batch is aggregated in O(n log n) numpy +
pandas time-rolling (C kernels) — no per-event Python loop. The
trailing ``[t - w, t]`` inclusive window (``isStateValueInWindow``,
DynamicQueryFunction.java:277-280) is computed as a causal time-based
rolling aggregate re-indexed to each timestamp's LAST peer position,
which makes same-timestamp events see each other — bit-equal to the
batch compiler's RANGE frame (peers included), the one place the old
per-event loop diverged from it.

State size is O(events in window) per key — identical to the
reference's MapState footprint, but partitioned across executors and
RocksDB-spillable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

_FIRE_OPS = {
    "=": np.equal,
    "!=": np.not_equal,
    ">": np.greater,
    "<": np.less,
    ">=": np.greater_equal,
    "<=": np.less_equal,
}


def trailing_window_aggregates(
    all_ts: np.ndarray,
    all_val: np.ndarray,
    w_ms: int,
    kinds: tuple[str, ...],
) -> tuple[dict, np.ndarray]:
    """THE causal trailing-window kernel — the one definition of the
    inclusive ``[t - w, t]`` RANGE-frame semantics shared by the W1
    streaming operator (``w1_batch_aggregate``) and the fused grouped
    evaluator (``group_eval._w1_fused_group``), so a boundary or
    NaN-handling fix cannot desynchronize the two paths.

    ``all_ts`` must be sorted ascending. Returns ``(aggs, empty)``:
    ``aggs[kind]`` is the per-row aggregate re-indexed to LAST-PEER
    positions (same-ts events aggregate together — RANGE-frame peer
    semantics, matching the batch compiler exactly), and ``empty``
    marks windows with zero non-null observations (pandas rolling
    yields NaN there — a NON-null double Spark orders above every
    number — so callers must emit NULL instead; COUNT callers ignore
    the mask, a row's own window always holds >= 1 row)."""
    idx = pd.to_datetime(all_ts, unit="ms")
    window = pd.Timedelta(milliseconds=w_ms)
    last_peer = np.searchsorted(all_ts, all_ts, side="right") - 1
    aggs: dict = {}
    roll = None
    for kind in kinds:
        if kind == "COUNT":
            causal = (
                pd.Series(np.ones(len(all_ts)), index=idx)
                .rolling(window, closed="both", min_periods=1)
                .sum()
            )
        else:
            if roll is None:
                roll = pd.Series(all_val, index=idx).rolling(
                    window, closed="both", min_periods=1
                )
            causal = {
                "SUM": roll.sum,
                "AVG": roll.mean,
                "MIN": roll.min,
                "MAX": roll.max,
            }[kind]()
        aggs[kind] = causal.to_numpy()[last_peer]
    nn = (
        pd.Series(np.where(np.isnan(all_val), 0.0, 1.0), index=idx)
        .rolling(window, closed="both", min_periods=1)
        .sum()
        .to_numpy()[last_peer]
    )
    return aggs, nn < 0.5


def w1_batch_aggregate(
    state_ts: np.ndarray,
    state_val: np.ndarray,
    new_ts: np.ndarray,
    new_val: np.ndarray,
    w_ms: int,
    kind: str,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized core of the W1 streaming operator.

    Merges the retained buffer with a batch of new events, computes the
    trailing ``[t - w, t]`` inclusive aggregate for every NEW event, and
    returns ``(out_ts, out_agg, out_empty, kept_ts, kept_val)`` where
    ``out_empty`` marks windows with zero non-null observations (emit
    NULL, never NaN — see inline note) and the kept arrays are the
    next state (evicted to ``[t_max - w, t_max]``).

    O(n log n) for the sort; the rolling aggregate itself is a single
    pandas time-window pass (C kernel) re-indexed to last-peer
    positions so same-ts events aggregate together (RANGE-frame peer
    semantics, matching the batch compiler exactly).
    """
    n_new = len(new_ts)
    all_ts = np.concatenate([state_ts, new_ts])
    all_val = np.concatenate([state_val, new_val])
    is_new = np.concatenate(
        [np.zeros(len(state_ts), dtype=bool), np.ones(n_new, dtype=bool)]
    )
    order = np.argsort(all_ts, kind="stable")
    all_ts, all_val, is_new = all_ts[order], all_val[order], is_new[order]

    aggs, empty = trailing_window_aggregates(all_ts, all_val, w_ms, (kind,))
    agg = aggs[kind]
    if kind == "COUNT":
        # a row's own window always holds >= 1 row; NULL values still
        # count as events (reference COUNT_FLINK counts events)
        empty = np.zeros(len(all_ts), dtype=bool)

    out_ts = all_ts[is_new]
    out_agg = agg[is_new]
    out_empty = empty[is_new]

    if len(all_ts):
        keep = all_ts >= all_ts[-1] - w_ms
        kept_ts, kept_val = all_ts[keep], all_val[keep]
    else:
        kept_ts, kept_val = all_ts, all_val
    return out_ts, out_agg, out_empty, kept_ts, kept_val


def make_w1_processor(rule: Rule, ts_col: str = "ts", value_col: str = "value"):
    """Build the (key, pdf_iter, state) -> pdf_iter function for
    ``applyInPandasWithState`` implementing rule's W1 semantics."""
    w_ms = int(rule.window_milliseconds)
    kind = "COUNT" if rule.is_count else rule.aggregator_function_type.value
    op = rule.limit_operator_type.value if rule.limit_operator_type else None
    limit = rule.limit
    is_count = rule.is_count

    def fire(agg: np.ndarray) -> np.ndarray:
        if op is None or limit is None:
            return np.zeros(len(agg), dtype=bool)
        return _FIRE_OPS[op](agg, float(limit))

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_buf, val_buf = state.get
            ts_buf = np.asarray(ts_buf, dtype=np.int64)
            val_buf = np.asarray(val_buf, dtype=np.float64)
        else:
            ts_buf = np.empty(0, dtype=np.int64)
            val_buf = np.empty(0, dtype=np.float64)
        def render(v) -> str:
            # String.valueOf / CAST AS STRING parity with the
            # compiler's composite_key: NULL -> "null", booleans
            # lowercase (Python would print None/True/False)
            if v is None:
                return "null"
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)

        key_str = "{" + ";".join(
            f"{n[1:] if n.startswith('$') else n}={render(v)}"
            for n, v in zip(rule.grouping_key_names, key)
        ) + "}"
        # merge ALL Arrow chunks before aggregating: a large group
        # arrives as several pdfs (maxRecordsPerBatch), and chunk 1's
        # trailing windows must see chunk 2's same-or-earlier
        # timestamps to stay bit-equal to the batch RANGE frame
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            new_ts = (whole[ts_col].astype("int64") // 1_000_000).to_numpy(
                dtype=np.int64
            )
            # COUNT-sentinel rules name no real value column
            # (aggregateFieldName is the COUNT_FLINK marker) — the
            # aggregate never reads values, so feed zeros.
            if is_count:
                new_val = np.zeros(len(whole), dtype=np.float64)
            else:
                new_val = whole[value_col].astype("float64").to_numpy(
                    dtype=np.float64
                )
            out_ts, out_agg, out_empty, ts_buf, val_buf = w1_batch_aggregate(
                ts_buf, val_buf, new_ts, new_val, w_ms, kind
            )
            agg_col = pd.array(out_agg, dtype="Float64")
            agg_col[out_empty] = pd.NA  # NULL, matching the RANGE frame
            yield pd.DataFrame(
                {
                    "key": key_str,
                    "event_ts_ms": out_ts,
                    "agg_value": agg_col,
                    "fired": np.where(out_empty, False, fire(out_agg)),
                }
            )
        state.update((ts_buf.tolist(), val_buf.tolist()))

    return process


def w1_stream(
    events: DataFrame, rule: Rule, ts_col: str = "ts", value_col: str | None = None
) -> DataFrame:
    """Apply the W1 per-event trailing-window rule to a (streaming or
    batch-test) DataFrame. Keys = the rule's grouping columns."""
    value_col = value_col or (
        ts_col if rule.is_count else rule.aggregate_field_name
    )
    keys = [k[1:] if k.startswith("$") else k for k in rule.grouping_key_names]
    processor = make_w1_processor(rule, ts_col=ts_col, value_col=value_col)
    # null event time ⇒ excluded (compiler contract)
    events = events.filter(F.col(ts_col).isNotNull())
    return events.groupBy(*keys).applyInPandasWithState(
        processor,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
