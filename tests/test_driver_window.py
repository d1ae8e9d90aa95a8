"""Pins the driver correctness-window rotation (VERDICT r02 item #1,
r03 item #3).

The verification driver records hard CORRECTNESS rows for only the first 50
queries in ``all_queries()`` order.  Round 6 rotates that window onto 50 of
the 65 never-driver-verified slugs (VERDICT r05 item #1) — round-5
retrieval/eval/sketch families and the streaming-oracled family first;
these assertions keep the rotation from silently regressing (e.g. a new
module import reshuffling registration order, or a window slot landing on
a rows-only query and wasting the hard signal).
"""

from __future__ import annotations

from nomad_event_streamer_spark.plans import (
    DRIVER_WINDOW,
    ORACLES,
    QUERIES,
    RE_VERIFY_R07,
    all_oracles,
    all_queries,
)


def test_ledger_comment_matches_registry():
    """ADVICE r04 #3: the DRIVER_WINDOW ledger comment undercounted the
    registry and nearly caused a rotation to skip unverified slugs.
    Pin the counts the comment states to the live registry."""
    import inspect

    import nomad_event_streamer_spark.plans as plans_pkg

    src = inspect.getsource(plans_pkg)
    comment = src.split("DRIVER_WINDOW: list[str] = [")[0]
    assert f"{len(QUERIES)} queries" in comment, (
        f"ledger comment stale: registry has {len(QUERIES)} queries"
    )
    assert f"{len(ORACLES)} oracled" in comment, (
        f"ledger comment stale: registry has {len(ORACLES)} oracled"
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
    # Slugs with a cumulative driver-PASS row (any prior round) already have
    # hard evidence; re-spending window slots on them would be
    # window-stuffing, not evidence-widening.  The ONE sanctioned
    # exception is the explicit RE_VERIFY_R07 allowance: slugs whose
    # optimized plans changed this round (rebalance_for_cpu factor
    # change), so the prior evidence describes a plan that no longer
    # exists — VERDICT r06 item #1 asked for exactly this refresh.
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    already_pass: set[str] = set()
    for rnd in ("r01", "r02", "r03", "r04", "r05", "r06"):
        path = root / f"CORRECTNESS_{rnd}.json"
        if not path.exists():
            continue
        rows = json.loads(path.read_text())
        already_pass |= {
            k
            for k, v in rows.items()
            if v.get("hash_match")
            and v.get("schema_match")
            and v.get("rows_match", v.get("count_match", True))
            and not v.get("err")
        }
    overlap = [
        s for s in DRIVER_WINDOW if s in already_pass and s not in RE_VERIFY_R07
    ]
    assert not overlap, f"window re-verifies already-PASS slugs: {overlap}"


def test_sim_artifact_covers_registry():
    """VERDICT r06 item #2 / what's-wrong #1: the committed DRIVER_SIM
    artifact must never trail the registry — a query added after the sim
    refresh would carry no machine evidence.  Pins the LATEST committed
    DRIVER_SIM_r*.json to the exact registry size (regenerate the
    artifact after the last registry-touching commit)."""
    import json
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1]
    sims = sorted(
        root.glob("DRIVER_SIM_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert sims, "no DRIVER_SIM artifact committed"
    latest = sims[-1]
    rows = json.loads(latest.read_text())
    # artifact format: {"queries": {...}} (scripts/driver_sim.py output)
    per_query = rows.get("queries", rows)
    per_query = {k: v for k, v in per_query.items() if k.startswith("q_")}
    assert len(per_query) == len(QUERIES), (
        f"{latest.name} covers {len(per_query)} queries but the registry "
        f"has {len(QUERIES)} — regenerate the sim artifact after the last "
        "registry-touching commit"
    )
