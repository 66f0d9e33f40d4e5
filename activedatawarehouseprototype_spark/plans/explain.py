"""Plan inspection helpers: make scale properties testable.

"Would this plan survive a 100x scale-up?" is checked here as concrete
plan assertions: filters pushed to the parquet scan, projection pruned
to the needed columns, small dimensions broadcast (no sort-merge join
of a fact against a dim), top-k via TakeOrderedAndProject rather than
a global sort.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reached a parquet scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(fragment in f for f in pushed_filters(df))


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read from each parquet scan (pruning check)."""
    return [
        {c.split(":")[0] for c in s.split(",") if c}
        for s in read_schemas(df)
    ]


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def sort_merge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", formatted_plan(df)))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def parquet_scan_count(df: DataFrame) -> int:
    """Number of parquet scans in the physical plan — the N-rules-one-
    scan property of grouped rule evaluation is asserted with this.
    Counts the numbered detail headers (each scan node appears twice in
    the formatted explain: once in the tree, once as a detail)."""
    return len(re.findall(r"\(\d+\) Scan parquet", formatted_plan(df)))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — 0 asserts an operator is
    scan-local (embarrassingly parallel, no data movement), the
    strongest scale property a transform can have. Broadcast exchanges
    don't count (they move only the small side)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange", plan)) - len(
        re.findall(r"\(\d+\) BroadcastExchange", plan)
    )
