"""Watermarked stream-stream interval join + its batch twin.

The reference correlates two event flows only implicitly, through rules
that fire on one stream (SURVEY §2.6); Spark's Structured Streaming has
a first-class answer — the watermark-bounded stream-stream join — and a
"complete" engine must expose it: correlate an alert stream with the
raw telemetry around it, clicks with the purchases that follow, retries
with the errors that caused them.

Two entry points, ONE shared join-condition builder, so the pair is
equivalent by construction:

- ``interval_join_batch(left, right, on, ...)`` — plain DataFrames;
  this is the oracle-checkable twin (a DuckDB SQL join with the same
  time band must match it row-for-row).
- ``stream_interval_join(left, right, on, ...)`` — both sides
  ``withWatermark``; Spark's symmetric hash join buffers each side in
  the state store and the time-band condition gives it the eviction
  bound, so state is O(watermark-window of rows per key), not O(stream).

Semantics: for equi-keys ``on``, emit (l, r) pairs where

    lower_ms  <=  right_ts - left_ts  <=  upper_ms

(milliseconds; bounds may be negative — e.g. ``(-5000, 5000)`` is a
symmetric ±5 s band). Non-key columns sharing a name on both sides are
suffixed ``_l`` / ``_r`` in the output (and the renamed time columns
are what the watermarks attach to).

Scale notes (100 TB): the equi-keys are REQUIRED — they are what makes
this a hash join; a pure time-band join degrades to a broadcast
nested loop, which is the wrong tool (use operators/range_join.py's
bucketed band join for that shape). The interval arithmetic stays on
the event-time attributes themselves (no unix_millis detour) because
Spark's streaming planner derives the state-eviction watermark from
exactly that condition.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_JOIN_TYPES = ("inner", "left_outer", "right_outer", "full_outer")


def _interval(ms: int) -> Column:
    # a plain INTERVAL literal, not make_interval(expr): Spark's
    # StreamingJoinHelper can only derive the state-eviction watermark
    # from `ts ± <literal interval>` terms — a make_interval() call
    # node makes it give up ("Failed to extract state value
    # watermark"), which silently turns the outer join's NULL-side
    # flush off and lets per-key state grow without bound.
    # MILLISECONDS keeps integer-ms bounds exact.
    return F.expr(f"INTERVAL {int(ms)} MILLISECONDS")


def _prepare(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
):
    """Suffix colliding non-key columns, resolve renamed ts names."""
    if not on:
        raise ValueError(
            "interval join requires at least one equi-key column: "
            "without one the join cannot hash-partition (see "
            "band_range_join for key-less time bands)"
        )
    for k in on:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"equi-key {k!r} must exist on both sides")
    if left_ts in on or right_ts in on:
        raise ValueError("the time columns cannot also be equi-keys")
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    for c in sorted(overlap):
        left = left.withColumnRenamed(c, c + "_l")
        right = right.withColumnRenamed(c, c + "_r")
    lts = left_ts + "_l" if left_ts in overlap else left_ts
    rts = right_ts + "_r" if right_ts in overlap else right_ts
    return left, right, lts, rts


def _joined(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    lts: str,
    rts: str,
    lower_ms: int,
    upper_ms: int,
    join_type: str,
) -> DataFrame:
    if lower_ms > upper_ms:
        raise ValueError(f"empty band: lower_ms {lower_ms} > upper_ms {upper_ms}")
    if join_type not in _JOIN_TYPES:
        raise ValueError(f"join_type {join_type!r}; one of {_JOIN_TYPES}")
    # alias both sides: the two inputs routinely share lineage (e.g.
    # two filters of ONE events table), where bare left[k] == right[k]
    # is ambiguous / trivially true
    lcols, rcols = left.columns, right.columns
    left, right = left.alias("_ijl"), right.alias("_ijr")

    def lc(c):
        return F.col(f"_ijl.{c}")

    def rc(c):
        return F.col(f"_ijr.{c}")

    keys = reduce(lambda a, b: a & b, [lc(k).eqNullSafe(rc(k)) for k in on])
    band = (rc(rts) >= lc(lts) + _interval(lower_ms)) & (
        rc(rts) <= lc(lts) + _interval(upper_ms)
    )
    out = left.join(right, keys & band, join_type)
    # one copy of each equi-key, NULL-coalesced for the outer sides
    key_cols = [F.coalesce(lc(k), rc(k)).alias(k) for k in on]
    rest = [lc(c) for c in lcols if c not in on] + [
        rc(c) for c in rcols if c not in on
    ]
    return out.select(*key_cols, *rest)


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_ms: int = 0,
    upper_ms: int = 0,
    join_type: str = "inner",
) -> DataFrame:
    """Batch twin — identical output contract to ``stream_interval_join``
    run over the same (complete, in-watermark) data."""
    l, r, lts, rts = _prepare(left, right, on, left_ts, right_ts)
    return _joined(l, r, on, lts, rts, lower_ms, upper_ms, join_type)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_ms: int = 0,
    upper_ms: int = 0,
    join_type: str = "inner",
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming interval join; attach any sink in append mode.

    Inner pairs emit as soon as both rows have arrived; outer-side
    NULL rows emit only once the watermark proves no partner can still
    arrive — so an outer join's completeness is bounded by (watermark +
    band width), which is also the state-store retention per side.
    """
    l, r, lts, rts = _prepare(left, right, on, left_ts, right_ts)
    if not l.isStreaming or not r.isStreaming:
        raise ValueError(
            "stream_interval_join needs two streaming DataFrames; "
            "use interval_join_batch for the batch shape"
        )
    l = l.withWatermark(lts, left_watermark)
    r = r.withWatermark(rts, right_watermark)
    return _joined(l, r, on, lts, rts, lower_ms, upper_ms, join_type)
