"""Guards the driver-window composition of the query registry.

The CORRECTNESS driver runs exactly the first 50 entries of
``__spark_entry__.queries()`` (round-2 judge-verified).  Rounds 3-5
rotated every never-checked entry through that window; round 6
front-loaded the then-oldest (r3) evidence; rounds 7-11 each
front-loaded the previous round's documented deferral, debuted that
round's new operators in-window, and deferred the overflow with an
explicit list.  Round 12 (an optimization round — no debuts)
front-loads the 45 r8-era deferrals (the oldest evidence in the
registry, age 4 this round) and takes 2 of the 47-entry r9 cohort,
deferring the other 45 to round 13 (at 189 entries / 50 slots the
steady-state refresh period is 3.8 rounds; the invariant is "refresh
strictly oldest-first, debuts always in-window, worst-case age =
ceil(N/50) + 1 rounds, documented per round").  These tests make sure
a refactor can't silently undo the rotation or drop a query, and —
after three rounds of prose counts drifting from the real lists —
that every count CLAIMED in the rotation comments matches the list it
describes (test_rotation_prose_counts).
"""

from __future__ import annotations

import json
import os
import re

from activedatawarehouseprototype_spark.corpus import (
    _DRIVER_ROTATION,
    _STABLE_CORE,
    ORACLES,
    QUERIES,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_CAP = 50

# The 45 r8-green entries the round-11 rotation deferred to round 12 —
# round 12 front-loads EXACTLY this list (their r8 evidence is the
# oldest in the registry, reaching age 4 this round).
_DEFERRED_TO_R12 = {
    "alert_cooldown_bursts",
    "balanced_downsample_by_lang",
    "bloom_semijoin_hot_customer_orders",
    "bm25_index_search_topk",
    "cdc_enrich_pipeline_evals",
    "cdc_merge_changelog_orders",
    "cms_event_type_counts",
    "compaction_small_files_rollup",
    "cube_orders_status_priority",
    "cusum_user_value_shifts",
    "dedup_minhash_components",
    "distinct_suppliers_per_flag",
    "emb_quantized_int8_stats",
    "frequent_part_pairs",
    "funnel_view_click_purchase",
    "geo_cell_geometry",
    "ivf_pq_search_topk",
    "join_full_outer_nation_activity",
    "join_left_order_counts",
    "join_mv_cdc_maintenance_orders",
    "join_semi_customers_with_open_orders",
    "lag_features_user_values",
    "mv_histogram_merge_algebra",
    "pii_redaction_scrub",
    "quality_constraints_orders",
    "resample_ffill_daily_values",
    "rule_count_tumbling",
    "rule_fanout_match_counts",
    "rule_sliding_max",
    "scalar_conditional_fns",
    "scalar_date_fns",
    "scalar_math_fns",
    "schema_evolution_orders_union",
    "session_windows_per_user",
    "setop_union_intersect_except",
    "sql_correlated_subquery_share",
    "timetravel_orders_rollup",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q18_large_volume_customers",
    "tpch_q1_pricing_summary",
    "tpch_q21_lone_returner",
    "tpch_q2_min_cost_supplier",
    "window_order_price_delta",
    "zorder_key_part_layout",
}

# The 2 r9-cohort entries refreshed in the round-12 window
# (family-diverse vs the 45 front-loads: the only graph-family
# candidate, and the hypothesis-testing stats path — neither family
# appears among the r8 deferrals).
_R9_REFRESH = {
    "kcore_copurchase_parts",
    "ab_ztest_event_conversion",
}

# The 45 r9-green entries the round-12 rotation defers to round 13:
# the window holds the 45 r8 deferrals + 2 r9 refreshes + 3 stable
# core, leaving no further slots for the 47-entry r9 cohort.  Their
# evidence reaches age 4 in round 13 — the round-13 editor
# front-loads EXACTLY this list first.  The full-corpus pytest mirror
# (tests/test_corpus_oracle.py) re-checks each every round.
_DEFERRED_TO_R13 = {
    "ann_ivf_topk",
    "asof_click_latest_purchase",
    "audio_exact_stats",
    "bpe_token_bounds",
    "classifier_gate_stats",
    "cluster_safe_split_stats",
    "contrastive_pairs_mining",
    "cross_decontaminate_embeddings",
    "cuped_arm_components",
    "dedup_minhash_lsh",
    "dedup_repeated_spans",
    "dsir_importance_weights",
    "event_transition_matrix",
    "fuzzy_blocked_part_pairs",
    "geo_grid_cell_agg",
    "join_mv_incremental_orders",
    "json_extract_props",
    "kmeans_lattice_clusters",
    "mad_outliers_event_values",
    "ols_trend_user_values",
    "pmi_collocations_top20",
    "pq_codes_stats",
    "profile_orders_columns",
    "purge_keys_orders_rollup",
    "quantile_mv_daily_values",
    "range_join_price_bands",
    "rollup_lineitem_qty",
    "scd2_customer_priority_history",
    "sql_shared_text_rollup",
    "text_quality_filter",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_effect",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q17_small_quantity",
    "tpch_q19_discounted_revenue",
    "tpch_q20_heavy_gear_suppliers",
    "tpch_q22_idle_balances",
    "tpch_q4_late_orders",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "udf_pandas_log_score",
    "winsorized_value_sums",
}


def _correctness(round_tag: str) -> set[str]:
    with open(os.path.join(_REPO, f"CORRECTNESS_{round_tag}.json")) as f:
        return set(json.load(f))


def test_rotation_all_inside_driver_window():
    first = list(QUERIES)[:DRIVER_CAP]
    missing = [n for n in _DRIVER_ROTATION if n not in first]
    assert not missing, f"rotated queries fell outside the driver window: {missing}"


def test_stable_core_inside_driver_window():
    first = list(QUERIES)[:DRIVER_CAP]
    missing = [n for n in _STABLE_CORE if n not in first]
    assert not missing, f"stable-core canaries outside the driver window: {missing}"


def test_r11_deferral_promise_kept():
    """Round 11 promised the 45 deferred r8 entries would be
    FRONT-LOADED in round 12 — they must all sit inside this round's
    window, and FIRST (before any other rotated entry), since their
    evidence is the oldest in the registry."""
    first = set(list(QUERIES)[:DRIVER_CAP])
    missing = [n for n in _DEFERRED_TO_R12 if n not in first]
    assert not missing, f"r11-deferred entries not front-loaded: {missing}"
    assert set(_DRIVER_ROTATION[: len(_DEFERRED_TO_R12)]) == _DEFERRED_TO_R12


def test_rotation_targets_were_stale_after_r11():
    """The round-12 rotation should only name queries that did NOT get
    a green round-11 (or round-10) driver row: the r8 deferrals and
    the r9-era refreshes."""
    recent = _correctness("r11") | _correctness("r10")
    overlap = [n for n in _DRIVER_ROTATION if n in recent]
    assert not overlap, f"already driver-checked (green) in r10/r11: {sorted(overlap)}"


def test_no_never_checked_entries():
    """Round 12 debuts nothing: every registry entry must already hold
    a driver row from some prior round."""
    checked = set()
    for r in (
        "r01", "r02", "r03", "r04", "r05", "r06",
        "r07", "r08", "r09", "r10", "r11",
    ):
        checked |= _correctness(r)
    never = [n for n in QUERIES if n not in checked]
    assert not never, f"entries with no driver row anywhere: {never}"


def test_whole_registry_evidence_at_most_three_rounds_old():
    """Union check: every registry entry either sits in this round's
    window (earning an r12 row) or has an r11/r10 driver row — EXCEPT
    the 45 explicitly-deferred r9 entries (the window cannot hold the
    45 r8 deferrals + the 47-entry r9 cohort; the deferral is
    documented and round 13 must front-load them)."""
    r11 = _correctness("r11")
    r10 = _correctness("r10")
    first = set(list(QUERIES)[:DRIVER_CAP])
    stale = [n for n in QUERIES if n not in r11 and n not in r10 and n not in first]
    unexplained = [n for n in stale if n not in _DEFERRED_TO_R13]
    assert not unexplained, (
        "entries with r9-or-older driver evidence left outside the "
        f"window and not in the documented r13 deferral: {unexplained}"
    )
    # the deferral list must not silently grow entries it doesn't
    # need: everything in it is genuinely outside the window
    assert set(stale) == _DEFERRED_TO_R13 - first


def test_window_composition_exact():
    """The 50-slot window is exactly the documented composition:
    45 r8 deferrals + 2 r9 refreshes + 3 stable core."""
    first = set(list(QUERIES)[:DRIVER_CAP])
    assert first == (_DEFERRED_TO_R12 | _R9_REFRESH | set(_STABLE_CORE))
    assert len(_R9_REFRESH) == 2
    # the refreshes really are r9-era: green in r9, untouched since
    r9 = _correctness("r09")
    r10, r11 = _correctness("r10"), _correctness("r11")
    assert _R9_REFRESH <= r9 and not (_R9_REFRESH & (r10 | r11))
    # and the two deferral ledgers partition the r9 cohort exactly
    assert _DEFERRED_TO_R13 | _R9_REFRESH == (r9 - r10 - r11) - set(_STABLE_CORE)
    assert not (_DEFERRED_TO_R13 & _R9_REFRESH)


def test_rotation_prose_counts():
    """Mechanical guard for rotation PROSE (round-9 VERDICT item 5 —
    third occurrence of a drifted count): every "<N> ... deferr* ...
    round <R>" claim in corpus/__init__.py must match the actual
    test-side list for that round. Rotating editors update _KNOWN when
    they add a round; a free-typed count that disagrees fails here."""
    known = {
        9: 23,
        10: 40,
        11: 43,
        12: len(_DEFERRED_TO_R12),
        13: len(_DEFERRED_TO_R13),
    }
    src_path = os.path.join(
        _REPO, "activedatawarehouseprototype_spark", "corpus", "__init__.py"
    )
    with open(src_path) as f:
        src = f.read()
    claims = re.findall(
        r"(\d+)\s+(?:\w+[ -]+){0,3}?deferr\w*\s+to\s+round\s*\n?\s*#?\s*(\d+)",
        src,
    )
    assert claims, "expected at least one deferral claim in the rotation prose"
    for n, rnd in claims:
        rnd = int(rnd)
        assert rnd in known, f"deferral claim for unpinned round {rnd}"
        assert int(n) == known[rnd], (
            f"rotation prose claims {n} deferred to round {rnd}, but the "
            f"test-side list has {known[rnd]} — fix the comment or the list"
        )


def test_no_duplicates_and_oracles_subset():
    names = list(QUERIES)
    assert len(names) == len(set(names))
    assert set(ORACLES) <= set(QUERIES)
    # every key in both dicts iterates in the same relative order
    q_order = [n for n in names if n in ORACLES]
    assert q_order == list(ORACLES)


def test_entrypoint_exposes_rotated_order():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.queries())[:DRIVER_CAP] == list(QUERIES)[:DRIVER_CAP]
