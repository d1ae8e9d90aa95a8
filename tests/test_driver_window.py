"""Pins the driver correctness-window rotation (VERDICT r02 item #1).

The verification driver records hard CORRECTNESS rows for only the first 50
queries in ``all_queries()`` order.  Round 3 rotates that window onto the 50
highest-value queries that previously had only driver-sim evidence; these
assertions keep the rotation from silently regressing (e.g. a new module
import reshuffling registration order, or a window slot landing on a
rows-only query and wasting the hard signal).
"""

from __future__ import annotations

from nomad_event_streamer_spark.plans import (
    DRIVER_WINDOW,
    ORACLES,
    QUERIES,
    all_oracles,
    all_queries,
)


def test_window_is_50_unique_registered_slugs():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    missing = [s for s in DRIVER_WINDOW if s not in QUERIES]
    assert not missing, f"window slugs not registered: {missing}"


def test_window_slots_are_all_hash_oracled():
    # A rows-only query in the window wastes a hard-correctness slot.
    unoracled = [s for s in DRIVER_WINDOW if s not in ORACLES]
    assert not unoracled, f"rows-only slugs in driver window: {unoracled}"


def test_rotation_is_consistent_and_lossless():
    q = list(all_queries())
    o = list(all_oracles())
    assert q[:50] == DRIVER_WINDOW
    assert o[:50] == DRIVER_WINDOW  # driver compares side-by-side: one order
    assert set(q) == set(QUERIES) and len(q) == len(QUERIES)
    assert set(o) == set(ORACLES) and len(o) == len(ORACLES)


def test_window_targets_previously_unverified_queries():
    # Round-2 driver-PASS slugs already have hard rows; re-spending window
    # slots on them would be window-stuffing, not evidence-widening.
    import json
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "CORRECTNESS_r02.json"
    if not path.exists():
        return
    r02 = json.loads(path.read_text())
    already_pass = {k for k, v in r02.items() if v.get("hash_match")}
    overlap = [s for s in DRIVER_WINDOW if s in already_pass]
    assert not overlap, f"window re-verifies already-PASS slugs: {overlap}"
