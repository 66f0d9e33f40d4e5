"""Guards the driver-window composition of the query registry.

The CORRECTNESS driver runs exactly the first 50 entries of
``__spark_entry__.queries()`` (round-2 judge-verified).  Rounds 3-5
rotated every never-checked entry through that window; round 6
front-loaded the then-oldest (r3) evidence; round 7 front-loaded the
round-6 debuts plus 31 of the 44-entry r4 cohort, deferring 13; round
8 front-loads exactly those 13, debuts its 10 new operators, and takes
24 of the 47-entry r5 cohort, deferring 23 to round 9 (at 166 entries
/ 50 slots the tightest achievable evidence age is ~3 rounds — the
invariant is "nothing staler than 3 rounds, oldest first, debuts
always in-window").  These tests make sure a refactor can't silently
undo the rotation or drop a query.
"""

from __future__ import annotations

import json
import os

from activedatawarehouseprototype_spark.corpus import (
    _DRIVER_ROTATION,
    _STABLE_CORE,
    ORACLES,
    QUERIES,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_CAP = 50

_NEW_IN_R8 = {
    "scd2_customer_priority_history",
    "bloom_semijoin_hot_customer_orders",
    "compaction_small_files_rollup",
    "cms_event_type_counts",
    "frequent_part_pairs",
    "cusum_user_value_shifts",
    "balanced_downsample_by_lang",
    "bm25_index_search_topk",
    "lag_features_user_values",
    "schema_evolution_orders_union",
}

# The 13 r4-green entries round 7 deferred; round 8 front-loads them.
_DEFERRED_TO_R8 = {
    "scalar_date_fns",
    "scalar_math_fns",
    "scalar_conditional_fns",
    "join_left_order_counts",
    "join_semi_customers_with_open_orders",
    "setop_union_intersect_except",
    "cube_orders_status_priority",
    "distinct_suppliers_per_flag",
    "window_order_price_delta",
    "funnel_view_click_purchase",
    "geo_cell_geometry",
    "emb_quantized_int8_stats",
    "pii_redaction_scrub",
}

# The 23 r5-green entries the round-8 rotation defers to round 9: the
# window holds 13 r4 deferrals + 10 round-8 debuts + 3 stable core,
# leaving 24 slots for the 47-entry r5 cohort. Every deferred entry
# keeps an in-window family representative (13 TPC-H shapes — q1, q2,
# q13, q15, q18, q21 stay in; plus one each of dedup / PQ / join-MV /
# SQL-dialect / embedding / pair-mining / LM-scoring / JSON-scalar / rollup / geo
# whose siblings or family twins stay in) and none changed since its r5 hash-match.
# Round-9 editor: front-load EXACTLY this list first, then the oldest
# r6 entries.
_DEFERRED_TO_R9 = {
    "tpch_q4_late_orders",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_effect",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q17_small_quantity",
    "tpch_q19_discounted_revenue",
    "tpch_q20_heavy_gear_suppliers",
    "tpch_q22_idle_balances",
    "dedup_repeated_spans",
    "pq_codes_stats",
    "join_mv_incremental_orders",
    "sql_shared_text_rollup",
    "cross_decontaminate_embeddings",
    "json_extract_props",
    "rollup_lineitem_qty",
    "geo_grid_cell_agg",
    "contrastive_pairs_mining",
    "dsir_importance_weights",
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


def test_r7_deferral_promise_kept():
    """Round 7 promised the 13 deferred r4 entries would be FRONT-LOADED
    in round 8 — they must all sit inside this round's window."""
    first = set(list(QUERIES)[:DRIVER_CAP])
    missing = [n for n in _DEFERRED_TO_R8 if n not in first]
    assert not missing, f"r7-deferred entries not front-loaded: {missing}"


def test_rotation_targets_were_stale_after_r7():
    """The round-8 rotation should only name queries that did NOT get a
    round-7 driver row: the r4 deferrals, entries new this round (no
    row anywhere by construction), or r5-era refreshes."""
    r7 = _correctness("r07")
    overlap = [n for n in _DRIVER_ROTATION if n in r7]
    assert not overlap, f"already driver-checked in r7: {overlap}"


def test_never_driver_checked_entries_all_in_window():
    """Every entry that has NEVER had a driver row across r1-r7 (the
    round-8 debuts) must sit inside this round's window — nothing
    ships without a driver row in its debut window."""
    checked = set()
    for r in ("r01", "r02", "r03", "r04", "r05", "r06", "r07"):
        checked |= _correctness(r)
    first = set(list(QUERIES)[:DRIVER_CAP])
    never = [n for n in QUERIES if n not in checked]
    assert set(never) == _NEW_IN_R8  # the debuts, exactly
    outside = [n for n in never if n not in first]
    assert not outside, (
        f"never-driver-checked entries left outside the window: {outside}"
    )


def test_whole_registry_evidence_at_most_three_rounds_old():
    """Union check: every registry entry either sits in this round's
    window (earning an r8 row) or has an r7/r6 driver row — EXCEPT the
    23 explicitly-deferred r5 entries (the window cannot hold the 13
    r4 deferrals + 10 debuts + the 47-entry r5 cohort; the deferral is
    documented and round 9 must front-load them)."""
    r7 = _correctness("r07")
    r6 = _correctness("r06")
    first = set(list(QUERIES)[:DRIVER_CAP])
    stale = [n for n in QUERIES if n not in r7 and n not in r6 and n not in first]
    unexplained = [n for n in stale if n not in _DEFERRED_TO_R9]
    assert not unexplained, (
        "entries with r5-or-older driver evidence left outside the "
        f"window and not in the documented r9 deferral: {unexplained}"
    )
    # the deferral list must not silently grow entries it doesn't
    # need: everything in it is genuinely outside the window
    assert set(stale) == _DEFERRED_TO_R9 - first


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
