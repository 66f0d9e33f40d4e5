"""Guards the driver-window composition of the query registry.

The CORRECTNESS driver runs exactly the first 50 entries of
``__spark_entry__.queries()`` (round-2 judge-verified).  Round 3 rotated
the 27 never-driver-checked queries into that window; these tests make
sure a refactor can't silently undo the rotation or drop a query.
"""

from __future__ import annotations

import json
import os

from activedatawarehouseprototype_spark.corpus import (
    _NEVER_DRIVER_CHECKED,
    _STABLE_CORE,
    ORACLES,
    QUERIES,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_CAP = 50


def test_never_checked_all_inside_driver_window():
    first = list(QUERIES)[:DRIVER_CAP]
    missing = [n for n in _NEVER_DRIVER_CHECKED if n not in first]
    assert not missing, f"rotated queries fell outside the driver window: {missing}"


def test_stable_core_inside_driver_window():
    first = list(QUERIES)[:DRIVER_CAP]
    missing = [n for n in _STABLE_CORE if n not in first]
    assert not missing, f"stable-core canaries outside the driver window: {missing}"


def test_rotation_targets_were_actually_unchecked_in_r2():
    """The rotation list should only name queries without an r2 driver row
    (new r3 queries are exempt — they have no r2 row by construction)."""
    path = os.path.join(_REPO, "CORRECTNESS_r02.json")
    r2 = set(json.load(open(path)))
    overlap = [n for n in _NEVER_DRIVER_CHECKED if n in r2]
    assert not overlap, f"already driver-checked in r2: {overlap}"


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
