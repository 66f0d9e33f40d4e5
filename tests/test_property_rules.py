"""Property-based testing of the rule compiler (SURVEY §5): for random
rules and random event sets, the compiled DataFrame plan must agree
with an independent pure-Python interpreter of the documented
semantics (filters → grouping → W0/W1/W2/W3 window → agg → HAVING).

The Python interpreter is deliberately naive (per-event loops, exact
reference semantics incl. inclusive [t-w, t] bounds) — it shares no
code with the compiler, so agreement is meaningful.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from activedatawarehouseprototype_spark.rules.compiler import evaluate_rule, window_mode
from activedatawarehouseprototype_spark.rules.model import Rule

BASE = dt.datetime(2024, 1, 1)
BASE_MS = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)

OPS = ["=", "!=", ">", "<", ">=", "<="]
AGGS = ["SUM", "AVG", "MIN", "MAX"]


def _cmp(v, op, limit):
    return {
        "=": v == limit,
        "!=": v != limit,
        ">": v > limit,
        "<": v < limit,
        ">=": v >= limit,
        "<=": v <= limit,
    }[op]


def _agg(vals, kind):
    if kind == "COUNT":
        return float(len(vals))
    if kind == "SUM":
        return float(sum(vals))
    if kind == "AVG":
        return sum(vals) / len(vals)
    if kind == "MIN":
        return float(min(vals))
    return float(max(vals))


def python_reference(events, rule: Rule):
    """events: list of (user_id, ts_offset_sec, value). Returns the
    multiset of (key, window_start_ms, window_end_ms, agg, fired)."""
    filt = [
        (u, BASE_MS + s * 1000, v)
        for (u, s, v) in events
        if all(
            _cmp(
                {"user_id": float(u), "value": v}[f.field],
                f.operator.value,
                float(f.value),
            )
            for f in rule.window_filter_rules
        )
    ]
    kind = "COUNT" if rule.is_count else rule.aggregator_function_type.value
    # mode dispatch reimplemented HERE, independent of the compiler's
    # window_mode (README W0-W3 spec): importing window_mode would make
    # the trickiest part of the semantics shared code — a dispatch bug
    # would produce identical wrong output on both sides and the
    # property tests would pass with the documented behavior broken
    w_ms = int(rule.window_milliseconds or 0)
    f_ms = rule.frequency_milliseconds
    if w_ms <= 0:
        mode = "W0"
    elif f_ms is not None and int(f_ms) == 0:
        mode = "W1"
    elif f_ms is None or int(f_ms) > w_ms:
        mode = "W2"
    else:
        mode = "W3"
    assert mode == window_mode(rule), (
        f"python reference and compiler disagree on the window mode "
        f"for w={w_ms} f={f_ms}: {mode} vs {window_mode(rule)}"
    )
    out = []
    if mode == "W0":
        for u, tms, v in filt:
            out.append((f"{{user_id={u}}}", tms, tms, 0.0, False))
        return sorted(out)
    w = int(rule.window_milliseconds)
    if mode == "W1":
        for u, tms, v in filt:
            in_win = [
                v2 for (u2, t2, v2) in filt if u2 == u and tms - w <= t2 <= tms
            ]
            a = _agg(in_win, kind)
            out.append(
                (f"{{user_id={u}}}", tms - w, tms, a, _cmp(a, rule.limit_operator_type.value, rule.limit))
            )
        return sorted(out)
    slide = w if mode == "W2" else int(rule.frequency_milliseconds)
    buckets: dict = {}
    for u, tms, v in filt:
        lo = (tms - w) // slide * slide + slide
        hi = tms // slide * slide
        ws = lo
        while ws <= hi:
            buckets.setdefault((u, ws), []).append(v)
            ws += slide
    for (u, ws), vals in buckets.items():
        a = _agg(vals, kind)
        out.append(
            (f"{{user_id={u}}}", ws, ws + w, a, _cmp(a, rule.limit_operator_type.value, rule.limit))
        )
    return sorted(out)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        st.integers(min_value=0, max_value=240),  # seconds offset
        st.sampled_from([1.0, 5.0, 10.0, 50.0, 100.0, -20.0]),  # value
    ),
    min_size=1,
    max_size=25,
)

rule_strategy = st.builds(
    lambda flt_op, flt_val, agg, op, limit, w, f, use_filter, use_count: Rule.from_dict(
        {
            "queryId": 1,
            "queryState": "ACTIVE",
            "windowFilterRules": (
                [{"field": "value", "operator": flt_op, "value": str(flt_val)}]
                if use_filter
                else []
            ),
            "groupingKeyNames": ["user_id"],
            "aggregateFieldName": "COUNT_FLINK" if use_count else "value",
            "aggregatorFunctionType": agg,
            "limitOperatorType": op,
            "limit": limit,
            "windowMilliseconds": w,
            "frequencyMilliseconds": f,
        }
    ),
    flt_op=st.sampled_from(OPS),
    flt_val=st.sampled_from([1.0, 10.0, 50.0]),
    agg=st.sampled_from(AGGS),
    op=st.sampled_from(OPS),
    limit=st.sampled_from([0.0, 10.0, 55.0, 150.0]),
    w=st.sampled_from([0, 30_000, 60_000, 120_000]),
    f=st.sampled_from([None, 0, 30_000, 60_000]),
    use_filter=st.booleans(),
    use_count=st.booleans(),
)


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, rule=rule_strategy)
def test_compiler_matches_python_reference(spark, events, rule):
    df = spark.createDataFrame(
        [
            (u, BASE + dt.timedelta(seconds=s), float(v))
            for (u, s, v) in events
        ],
        "user_id int, ts timestamp, value double",
    )
    got = sorted(
        (
            r.key,
            int(r.window_start.replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
            int(r.window_end.replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
            r.agg_value,
            r.fired,
        )
        for r in evaluate_rule(df, rule).collect()
    )
    want = python_reference(events, rule)
    assert len(got) == len(want)
    for g, w_ in zip(got, want):
        assert g[0] == w_[0] and g[1] == w_[1] and g[2] == w_[2], (g, w_)
        assert math.isclose(g[3], w_[3], rel_tol=1e-9, abs_tol=1e-9), (g, w_)
        assert g[4] == w_[4], (g, w_)


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, rule=rule_strategy)
def test_grouped_eval_matches_python_reference(spark, events, rule):
    """The single-scan fan-out evaluator (streaming/group_eval.py) must
    satisfy the same independent-interpreter property as the compiler —
    it is the hot path for large rule sets."""
    from activedatawarehouseprototype_spark.streaming.group_eval import (
        evaluate_rules_grouped,
    )

    df = spark.createDataFrame(
        [
            (u, BASE + dt.timedelta(seconds=s), float(v))
            for (u, s, v) in events
        ],
        "user_id int, ts timestamp, value double",
    )
    got = sorted(
        (
            r.key,
            int(r.window_start.replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
            int(r.window_end.replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
            r.agg_value,
            r.fired,
        )
        for r in evaluate_rules_grouped(df, [rule]).collect()
    )
    want = python_reference(events, rule)
    assert len(got) == len(want)
    for g, w_ in zip(got, want):
        assert g[0] == w_[0] and g[1] == w_[1] and g[2] == w_[2], (g, w_)
        assert math.isclose(g[3], w_[3], rel_tol=1e-9, abs_tol=1e-9), (g, w_)
        assert g[4] == w_[4], (g, w_)


keyless_rule_strategy = st.builds(
    lambda agg, op, limit, w, f, use_count, keyless: Rule.from_dict(
        {
            "queryId": 7,
            "queryState": "ACTIVE",
            "windowFilterRules": [],
            "groupingKeyNames": [] if keyless else ["user_id"],
            "aggregateFieldName": "COUNT_FLINK" if use_count else "value",
            "aggregatorFunctionType": agg,
            "limitOperatorType": op,
            "limit": limit,
            "windowMilliseconds": w,
            "frequencyMilliseconds": f,
        }
    ),
    agg=st.sampled_from(AGGS),
    op=st.sampled_from(OPS),
    limit=st.sampled_from([0.0, 10.0, 55.0]),
    w=st.sampled_from([30_000, 60_000, 120_000]),
    f=st.sampled_from([None, 0, 30_000]),
    use_count=st.booleans(),
    keyless=st.booleans(),
)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, rule=keyless_rule_strategy)
def test_sql_twin_matches_compiled_plan_property(spark, events, rule, tmp_path_factory):
    """Property form of the SQL-generator check: for random rules —
    including KEYLESS ones — the generated ANSI SQL run on DuckDB must
    agree with the compiled DataFrame plan."""
    import duckdb

    from activedatawarehouseprototype_spark.rules.sql_gen import rule_to_sql

    df = spark.createDataFrame(
        [(u, BASE + dt.timedelta(seconds=s), float(v)) for (u, s, v) in events],
        "user_id int, ts timestamp, value double",
    )
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    sql = rule_to_sql(
        rule, table="events", ts_col="ts", numeric_cols={"user_id", "value"}
    )
    # SQL columns: query_id, key, window_start_ms, window_end_ms,
    # agg_value, fired
    oracle = sorted(
        (str(row[1]), int(row[2]), int(row[3]), round(float(row[4]), 9), bool(row[5]))
        for row in con.execute(sql).fetchall()
    )
    got = sorted(
        (
            r.key,
            int(r.window_start.replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
            int(r.window_end.replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
            round(r.agg_value, 9),
            r.fired,
        )
        for r in evaluate_rule(df, rule).collect()
    )
    assert len(got) == len(oracle)
    for g, o in zip(got, oracle):
        assert g[0] == o[0] and g[1] == o[1] and g[2] == o[2], (g, o)
        assert math.isclose(g[3], o[3], rel_tol=1e-9, abs_tol=1e-9), (g, o)
        assert g[4] == o[4], (g, o)


def python_reference_two_key(events, rule: Rule):
    """Two-key variant of the interpreter: events are
    (user_id, kind, ts_offset_sec, value); key = {user_id=..;kind=..}."""
    filt = [
        (u, k, BASE_MS + s * 1000, v)
        for (u, k, s, v) in events
        if all(
            _cmp(
                {"user_id": float(u), "value": v}[f.field],
                f.operator.value,
                float(f.value),
            )
            for f in rule.window_filter_rules
        )
    ]
    kind_agg = "COUNT" if rule.is_count else rule.aggregator_function_type.value
    w = int(rule.window_milliseconds)
    slide = (
        w
        if (rule.frequency_milliseconds is None or rule.frequency_milliseconds > w)
        else int(rule.frequency_milliseconds)
    )
    buckets: dict = {}
    for u, k, tms, v in filt:
        lo = (tms - w) // slide * slide + slide
        hi = tms // slide * slide
        ws = lo
        while ws <= hi:
            buckets.setdefault((u, k, ws), []).append(v)
            ws += slide
    out = []
    for (u, k, ws), vals in buckets.items():
        a = _agg(vals, kind_agg)
        out.append(
            (
                f"{{user_id={u};kind={k}}}",
                ws,
                ws + w,
                a,
                _cmp(a, rule.limit_operator_type.value, rule.limit),
            )
        )
    return sorted(out)


two_key_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.sampled_from(["x", "y"]),
        st.integers(min_value=0, max_value=240),
        st.sampled_from([1.0, 5.0, 50.0, 100.0]),
    ),
    min_size=1,
    max_size=25,
)

two_key_rule = st.builds(
    lambda agg, op, limit, w, f, use_count: Rule.from_dict(
        {
            "queryId": 9,
            "queryState": "ACTIVE",
            "windowFilterRules": [],
            "groupingKeyNames": ["user_id", "kind"],
            "aggregateFieldName": "COUNT_FLINK" if use_count else "value",
            "aggregatorFunctionType": agg,
            "limitOperatorType": op,
            "limit": limit,
            "windowMilliseconds": w,
            "frequencyMilliseconds": f,
        }
    ),
    agg=st.sampled_from(AGGS),
    op=st.sampled_from(OPS),
    limit=st.sampled_from([0.0, 10.0, 55.0]),
    w=st.sampled_from([30_000, 60_000]),
    f=st.sampled_from([None, 30_000]),
    use_count=st.booleans(),
)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=two_key_events, rule=two_key_rule)
def test_composite_key_rules_match_reference(spark, events, rule):
    """P4 composite keys under the property harness: both the compiler
    and the grouped evaluator agree with the two-key interpreter."""
    from activedatawarehouseprototype_spark.streaming.group_eval import (
        evaluate_rules_grouped,
    )

    df = spark.createDataFrame(
        [
            (u, k, BASE + dt.timedelta(seconds=s), float(v))
            for (u, k, s, v) in events
        ],
        "user_id int, kind string, ts timestamp, value double",
    )
    want = python_reference_two_key(events, rule)
    for evaluator in (
        lambda: evaluate_rule(df, rule),
        lambda: evaluate_rules_grouped(df, [rule]),
    ):
        got = sorted(
            (
                r.key,
                int(r.window_start.replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
                int(r.window_end.replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
                r.agg_value,
                r.fired,
            )
            for r in evaluator().collect()
        )
        assert len(got) == len(want)
        for g, w_ in zip(got, want):
            assert g[0] == w_[0] and g[1] == w_[1] and g[2] == w_[2], (g, w_)
            assert math.isclose(g[3], w_[3], rel_tol=1e-9, abs_tol=1e-9), (g, w_)
            assert g[4] == w_[4], (g, w_)


# --- resample_ffill vs a naive per-key Python interpreter ---------------


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),            # key
            st.integers(min_value=0, max_value=20 * 86_400),  # offset sec
            st.integers(min_value=-1000, max_value=1000),     # value (x0.5)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_resample_ffill_matches_naive_interpreter(spark, data):
    """For random sparse per-key series, the distributed gap-fill must
    equal a naive Python forward-fill over per-key daily grids."""
    from activedatawarehouseprototype_spark.operators.timeseries import (
        resample_ffill,
    )

    day_ms = 86_400_000
    rows = [
        (k, BASE + dt.timedelta(seconds=off), v * 0.5, i)
        for i, (k, off, v) in enumerate(data)
    ]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, value double, tie int"
    )
    got = {
        (r.k, r.bucket_ms): (r.value, r.observed)
        for r in resample_ffill(
            df, "k", "ts", "value", step_ms=day_ms, tie_col="tie"
        ).collect()
    }

    # naive reference: bucket -> last (ts, tie) row per (key, bucket),
    # grid from min to max bucket, carry forward
    per_key: dict[int, dict[int, tuple]] = {}
    for k, ts, v, tie in rows:
        ms = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
        b = ms // day_ms
        cur = per_key.setdefault(k, {})
        if b not in cur or (ms, tie) > cur[b][:2]:
            cur[b] = (ms, tie, v)
    want = {}
    for k, buckets in per_key.items():
        b0, b1 = min(buckets), max(buckets)
        last = None
        for b in range(b0, b1 + 1):
            if b in buckets:
                last = buckets[b][2]
                want[(k, b * day_ms)] = (last, True)
            else:
                want[(k, b * day_ms)] = (last, False)
    assert got == want


# --- repeated-span dedup properties -----------------------------------------

_span_docs = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]),
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=8,
)


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_span_docs, chunk_words=st.sampled_from([2, 3, 4]))
@pytest.mark.slow
def test_repeated_span_dedup_matches_python_reference(spark, docs, chunk_words):
    """Pure-Python reference implementation vs the distributed plan on
    random small-vocab corpora (small vocab => collisions are common,
    exercising the removal path), plus the round-trip invariant: when a
    doc shares no chunk with any other doc, clean_text == text."""
    from activedatawarehouseprototype_spark.operators.dedup import (
        repeated_span_dedup,
    )

    texts = [" ".join(ws) for ws in docs]
    rows = [(i, t) for i, t in enumerate(texts)]

    # reference: chunk, count distinct docs per chunk, rebuild
    chunks_per_doc = {}
    for i, ws in enumerate(docs):
        nc = len(ws) // chunk_words
        chunks_per_doc[i] = [
            " ".join(ws[j * chunk_words : (j + 1) * chunk_words])
            for j in range(nc)
        ]
    doc_freq = {}
    for i, cs in chunks_per_doc.items():
        for c in set(cs):
            doc_freq[c] = doc_freq.get(c, 0) + 1
    expect = {}
    for i, ws in enumerate(docs):
        nc = len(ws) // chunk_words
        kept = [c for c in chunks_per_doc[i] if doc_freq[c] < 2]
        tail = ws[nc * chunk_words :]
        parts = [t for t in [" ".join(kept), " ".join(tail)] if t]
        expect[i] = (nc, nc - len(kept), " ".join(parts))

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_chunks, r.chunks_removed, r.clean_text)
        for r in repeated_span_dedup(
            df, "doc_id", "text", chunk_words=chunk_words, min_docs=2
        ).collect()
    }
    assert got == expect
