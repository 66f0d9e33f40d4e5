"""Corpus-wide physical-plan audit: EVERY registry entry's plan is
checked for the two regressions that silently destroy 100 TB
viability — an unintended cartesian/nested-loop join, and a
row-at-a-time (non-Arrow) Python UDF in the data path.

test_plans.py pins specific plan SHAPES for chosen operators; this
audit is the broad backstop: a new entry (or a refactor of a shared
helper) cannot ship a quadratic join or a slow-path UDF without
either fixing it or adding itself to the explicit allowlist below
with a reason.
"""

from __future__ import annotations

import pytest

from activedatawarehouseprototype_spark.corpus import QUERIES

SF = "/root/testdata/sf0.001"

# Entries whose plan legitimately contains a BroadcastNestedLoopJoin /
# CartesianProduct — the MEASURED minimal set (every other entry's plan
# was checked NLJ-free at sf0.001 under the test session config), each
# with the reason the join is bounded, not quadratic. If Catalyst's
# strategy shifts for an entry, extend this list only with a
# boundedness argument.
NLJ_ALLOWED = {
    # rules-as-data fan-out: BroadcastNLJ of events x O(rules) literal
    # rows — bounded by the rule count, the reference's core shape
    "rule_fanout_match_counts",
    # 1-row corpus-stats literal cross-joined back (broadcast, 1 row)
    "bm25_topk_docs",
    "lm_unigram_doc_scores",
    "dsir_importance_weights",
    "tfidf_top_terms_per_doc",
    # scalar-subquery thresholds: 1-row broadcast x the filtered table
    "tpch_q11_important_stock",
    "tpch_q22_idle_balances",
    # users x the |event types| metric dimension (5 rows, broadcast):
    # one unit row per (user, metric) for the per-metric z-test
    "ab_ztest_event_conversion",
    # two 1-row broadcast literals: the midpoint-day bound and the
    # pooled moment totals (|arms|-row frame x 1-row total)
    "cuped_arm_components",
}

# Entries allowed to run row-at-a-time Python (non-Arrow) — ONLY the
# deliberate slow-tier demonstrations.
PY_UDF_ALLOWED = {
    "udf_sql_registered_brand_code",  # SQL-registered row UDF tier
    "udtf_token_explode",  # lateral UDTF tier
}


# deliberately NOT @pytest.mark.slow: since round 12 the default
# profile excludes `slow`, and this audit is the broad 100 TB
# regression backstop — it must run in the driver-attested default
# set (~3 min for the whole registry at sf0.001)
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unbounded_joins_or_slow_udfs(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in NLJ_ALLOWED:
        bad = [
            tok
            for tok in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if tok in plan
        ]
        assert not bad, (
            f"{name}: {bad} in plan — quadratic at scale; fix the join "
            f"or allowlist with a boundedness argument"
        )
    if name not in PY_UDF_ALLOWED:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in the data path — use "
            f"an Arrow pandas UDF or built-in expressions"
        )
