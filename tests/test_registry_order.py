"""Guards the driver-window composition of the query registry.

The CORRECTNESS driver runs exactly the first 50 entries of
``__spark_entry__.queries()`` (round-2 judge-verified).  Round 3 rotated
the never-driver-checked queries through that window; round 4 rotates
the 29 entries whose freshest evidence was round 2.  These tests make
sure a refactor can't silently undo the rotation or drop a query.
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


def test_rotation_targets_were_stale_after_r3():
    """The round-4 rotation should only name queries that did NOT get a
    round-3 driver row (their freshest evidence was r1/r2) or that are
    new this round (no row anywhere by construction)."""
    path = os.path.join(_REPO, "CORRECTNESS_r03.json")
    r3 = set(json.load(open(path)))
    overlap = [n for n in _DRIVER_ROTATION if n in r3]
    assert not overlap, f"already driver-checked in r3: {overlap}"


def test_whole_registry_has_driver_evidence_within_two_rounds():
    """Union check: every registry entry either has a driver row in
    r2/r3 or sits in this round's first-50 window (so it earns one in
    r4) — i.e. after this round no entry's evidence is >2 rounds old."""
    r1 = set(json.load(open(os.path.join(_REPO, "CORRECTNESS_r01.json"))))
    r2 = set(json.load(open(os.path.join(_REPO, "CORRECTNESS_r02.json"))))
    r3 = set(json.load(open(os.path.join(_REPO, "CORRECTNESS_r03.json"))))
    first = set(list(QUERIES)[:DRIVER_CAP])
    # Entries REGISTERED AFTER this round's window filled (never in any
    # CORRECTNESS file and outside the first 50) are fine: they carry
    # full pytest-mirror evidence now and MUST enter round 5's rotation
    # — the window edit at the start of round 5 re-trips this test if
    # they don't, because by then they'll have an r4-absence instead of
    # "brand new" status.
    ever_checked = r1 | r2 | r3
    stale = [
        n for n in QUERIES
        if n not in r3 and n not in first and n in ever_checked
    ]
    # anything with an OLD driver row not refreshed in r3 must be in
    # this round's window
    assert not stale, f"entries with stale driver rows left outside the window: {stale}"
    # and the window itself is fully r2/r3-green history or new queries
    unknown = [n for n in first if n not in r2 | r3]
    # new-this-round queries are allowed (no prior row by construction)
    for n in unknown:
        assert n in QUERIES


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
