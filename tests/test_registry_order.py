"""Guards the driver-window composition of the query registry.

The CORRECTNESS driver runs exactly the first 50 entries of
``__spark_entry__.queries()`` (round-2 judge-verified).  Round 3 rotated
the never-driver-checked queries through that window; round 4 rotated
the 29 entries whose freshest evidence was round 2; round 5 rotates the
18 entries that had never earned a driver row plus the oldest (r3)
evidence.  These tests make sure a refactor can't silently undo the
rotation or drop a query.
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


def test_rotation_all_inside_driver_window():
    first = list(QUERIES)[:DRIVER_CAP]
    missing = [n for n in _DRIVER_ROTATION if n not in first]
    assert not missing, f"rotated queries fell outside the driver window: {missing}"


def test_stable_core_inside_driver_window():
    first = list(QUERIES)[:DRIVER_CAP]
    missing = [n for n in _STABLE_CORE if n not in first]
    assert not missing, f"stable-core canaries outside the driver window: {missing}"


def test_rotation_targets_were_stale_after_r4():
    """The round-5 rotation should only name queries that did NOT get a
    round-4 driver row (never-checked, or freshest evidence r3) or that
    are new this round (no row anywhere by construction)."""
    path = os.path.join(_REPO, "CORRECTNESS_r04.json")
    r4 = set(json.load(open(path)))
    overlap = [n for n in _DRIVER_ROTATION if n in r4]
    assert not overlap, f"already driver-checked in r4: {overlap}"


def test_never_driver_checked_entries_all_in_window():
    """The point of the round-5 rotation: every entry that has NEVER
    had a driver row across r1-r4 must sit inside this round's window
    (after which the whole registry's history is driver-checked)."""
    checked = set()
    for r in ("r01", "r02", "r03", "r04"):
        checked |= set(
            json.load(open(os.path.join(_REPO, f"CORRECTNESS_{r}.json")))
        )
    first = set(list(QUERIES)[:DRIVER_CAP])
    never = [n for n in QUERIES if n not in checked]
    outside = [n for n in never if n not in first]
    assert not outside, (
        f"never-driver-checked entries left outside the window: {outside}"
    )


def test_whole_registry_has_driver_evidence_within_two_rounds():
    """Union check: every registry entry either has an r4 driver row or
    sits in this round's first-50 window (earning an r5 row) — i.e.
    after this round no entry's evidence is more than 2 rounds old.
    Round-6 editor: when this trips at the next rotation, front-load
    the named entries."""
    r4 = set(json.load(open(os.path.join(_REPO, "CORRECTNESS_r04.json"))))
    first = set(list(QUERIES)[:DRIVER_CAP])
    stale = [n for n in QUERIES if n not in r4 and n not in first]
    # the 28 r3-green entries parked this round are the KNOWN leftover —
    # they must be exactly the set that rotates in round 6, nothing else
    allowed_r3_parked = {
        "rule_passthrough", "tpch_q6_revenue_delta",
        "tpch_q3_shipping_priority", "percentile_order_prices",
        "pivot_status_by_priority", "grouping_sets_orders",
        "window_running_order_totals", "udf_pandas_log_score",
        "udaf_weighted_avg_price", "udf_sql_registered_brand_code",
        "udtf_token_explode", "stats_price_quantity",
        "bool_aggs_per_segment", "regexp_part_type_tokens",
        "histogram_event_values", "hourly_activity_profile",
        "null_semantics_aggs", "pivot_native_status_by_priority",
        "text_top_bigrams", "sketch_approx_distinct_and_quantiles",
        # displaced by the 8 new TPC-H shapes (these 8 already hold r3
        # driver hash-matches; the new queries had none)
        "scalar_string_fns", "text_repetition", "ann_lsh_bucket_topk",
        "ann_ivf_topk", "ann_lsh_batch_multiprobe_topk",
        "ann_ivf_batch_topk", "array_embedding_stats",
        "range_join_price_bands",
        # displaced by dedup_repeated_spans / dsir_importance_weights
        # (new in r5, no prior rows; these two hold r3 driver
        # hash-matches)
        "dedup_minhash_lsh",
        "multimodal_byte_stats",
        # displaced by the four partsupp-adapted TPC-H shapes
        # (tpch_q2/q11/q16/q20 — new in r5, no prior rows; these four
        # hold r3 driver hash-matches)
        "window_top3_orders_per_customer",
        "dedup_exact_text",
        "ann_topk_cosine",
        "text_quality_filter",
        # displaced by contrastive_pairs_mining (new in r5, no prior
        # row; this entry holds an r3 driver hash-match)
        "asof_click_latest_purchase",
    }
    unexpected = [n for n in stale if n not in allowed_r3_parked]
    assert not unexpected, (
        f"entries with stale driver rows left outside the window: {unexpected}"
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
