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


def test_rotation_targets_were_stale_after_r5():
    """The round-6 rotation should only name queries that did NOT get a
    round-5 driver row (oldest evidence) or that are new this round
    (no row anywhere by construction)."""
    r5 = _correctness("r05")
    overlap = [n for n in _DRIVER_ROTATION if n in r5]
    assert not overlap, f"already driver-checked in r5: {overlap}"


def test_never_driver_checked_entries_all_in_window():
    """Every entry that has NEVER had a driver row across r1-r5 (i.e.
    entries NEW in round 6) must sit inside this round's window — the
    registry invariant since round 5 is that nothing ships without a
    driver row in its debut round."""
    checked = set()
    for r in ("r01", "r02", "r03", "r04", "r05"):
        checked |= _correctness(r)
    first = set(list(QUERIES)[:DRIVER_CAP])
    never = [n for n in QUERIES if n not in checked]
    outside = [n for n in never if n not in first]
    assert not outside, (
        f"never-driver-checked entries left outside the window: {outside}"
    )


def test_whole_registry_evidence_at_most_two_rounds_old():
    """Union check: every registry entry either sits in this round's
    window (earning an r6 row) or has an r5/r4 driver row — i.e. after
    this round no entry's evidence is more than 2 rounds old.  The
    allowed leftovers are exactly the r4-green cohort; round-7 editor:
    when this trips at the next rotation, front-load the named
    entries (they will then hold the registry's oldest evidence)."""
    r5 = _correctness("r05")
    r4 = _correctness("r04")
    first = set(list(QUERIES)[:DRIVER_CAP])
    stale = [n for n in QUERIES if n not in r5 and n not in first]
    older_than_r4 = [n for n in stale if n not in r4]
    assert not older_than_r4, (
        "entries with r3-or-older driver evidence left outside the "
        f"window: {older_than_r4}"
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
