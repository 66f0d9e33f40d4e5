"""Guards the driver-window composition of the query registry.

The CORRECTNESS driver runs exactly the first 50 entries of
``__spark_entry__.queries()`` (round-2 judge-verified).  Round 3 rotated
the never-driver-checked queries through that window; round 4 rotated
the 29 entries whose freshest evidence was round 2; round 5 put every
remaining never-checked entry through (after it, the whole registry
history had a driver row); round 6 front-loads the 35 entries whose
evidence is oldest (round 3) plus this round's new entries.  These
tests make sure a refactor can't silently undo the rotation or drop a
query.
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


# The 13 r4-green entries the round-7 rotation defers to round 8: the
# 50-slot window holds 11 round-6 debuts + 4 round-7 debuts + the
# sketch oracle upgrade + 3 stable core, leaving 31 slots for the
# 44-entry r4 cohort. These 13 are unchanged entries whose operator
# families keep an in-window representative (rationale in
# corpus/__init__.py — which also documents that at 156 entries /
# 50 slots the tightest achievable evidence age is now ~3 rounds).
# Round-8 editor: front-load EXACTLY this list first, then the oldest
# r5 entries.
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


def test_rotation_targets_were_stale_after_r6():
    """The round-7 rotation should only name queries that did NOT get a
    round-6 driver row (oldest evidence), that are new this round (no
    row anywhere by construction), or whose r6 row was the weaker
    rows-only check now upgraded to oracle-backed (the sketch entry —
    re-checked deliberately to convert `no_oracle` to a hash-match)."""
    r6 = _correctness("r06")
    overlap = [
        n
        for n in _DRIVER_ROTATION
        if n in r6 and n != "sketch_approx_distinct_and_quantiles"
    ]
    assert not overlap, f"already driver-checked in r6: {overlap}"


def test_never_driver_checked_entries_all_in_window():
    """Every entry that has NEVER had a driver row across r1-r6 (i.e.
    entries NEW in round 7, plus the 11 round-6 operators whose window
    was full) must sit inside this round's window — nothing ships
    without a driver row in its debut window."""
    checked = set()
    for r in ("r01", "r02", "r03", "r04", "r05", "r06"):
        checked |= _correctness(r)
    first = set(list(QUERIES)[:DRIVER_CAP])
    never = [n for n in QUERIES if n not in checked]
    outside = [n for n in never if n not in first]
    assert not outside, (
        f"never-driver-checked entries left outside the window: {outside}"
    )


def test_whole_registry_evidence_at_most_two_rounds_old():
    """Union check: every registry entry either sits in this round's
    window (earning an r7 row) or has an r6/r5 driver row — i.e. after
    this round no entry's evidence is more than 2 rounds old — EXCEPT
    the 13 explicitly-deferred r4 entries (the window cannot hold 15
    debuts + the 44-entry r4 cohort; the deferral is documented and
    round 8 must front-load them)."""
    r6 = _correctness("r06")
    r5 = _correctness("r05")
    first = set(list(QUERIES)[:DRIVER_CAP])
    stale = [n for n in QUERIES if n not in r6 and n not in r5 and n not in first]
    unexplained = [n for n in stale if n not in _DEFERRED_TO_R8]
    assert not unexplained, (
        "entries with r4-or-older driver evidence left outside the "
        f"window and not in the documented r8 deferral: {unexplained}"
    )
    # the deferral list must not silently grow stale entries it
    # doesn't need: everything in it is genuinely outside the window
    assert set(stale) == _DEFERRED_TO_R8 - first


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
