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
    # greedy to end-of-line: a NESTED column type (struct/array/map)
    # contains '>' characters, and a lazy [^>]* capture would truncate
    # at the first one, leaking nested field names into scan_columns
    return re.findall(r"ReadSchema: struct<(.*)>", formatted_plan(df))


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(fragment in f for f in pushed_filters(df))


def scan_columns(df: DataFrame) -> list[set[str]]:
    """TOP-LEVEL column sets read by each parquet scan (pruning
    check). Splits on commas at nesting depth 0 only, so a nested
    struct/array column counts as one column under its own name."""
    out = []
    for s in read_schemas(df):
        cols, depth, cur = set(), 0, []
        for ch in s:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                frag = "".join(cur)
                if frag:
                    cols.add(frag.split(":")[0])
                cur = []
                continue
            cur.append(ch)
        frag = "".join(cur)
        if frag:
            cols.add(frag.split(":")[0])
        out.append(cols)
    return out


def broadcast_join_count(df: DataFrame) -> int:
    """Counts the numbered detail headers only — each join node appears
    TWICE in a formatted explain (tree line + '(N) <Node>' detail), so
    an unanchored match would double-count every join."""
    return len(
        re.findall(
            r"\(\d+\) (?:BroadcastHashJoin|BroadcastNestedLoopJoin)",
            formatted_plan(df),
        )
    )


def broadcast_hash_join_count(df: DataFrame) -> int:
    """BHJ ONLY — use this for 'dims must broadcast' assertions on
    EQUI-joins: broadcast_join_count also counts
    BroadcastNestedLoopJoin, so it would keep passing if a refactor
    lost the key equality and the plan degraded to an O(n*m)
    nested-loop join (the exact scale regression those tests pin)."""
    return len(re.findall(r"\(\d+\) BroadcastHashJoin", formatted_plan(df)))


def sort_merge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"\(\d+\) SortMergeJoin", formatted_plan(df)))


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
    # '(N) Exchange' headers are exactly the shuffle exchanges —
    # broadcast exchanges print as '(N) BroadcastExchange', which this
    # pattern does not match. (The old subtraction of broadcast
    # headers under-counted: it could return -1, or report 0 for a
    # plan with one real shuffle plus one broadcast join.)
    return len(re.findall(r"\(\d+\) Exchange", plan))
