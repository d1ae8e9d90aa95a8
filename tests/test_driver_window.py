"""Pins the driver correctness-window rotation (VERDICT r02 item #1,
r03 item #3, r07 items #1/#6, r08 item #1, r09 item #3, r10 item #1,
r11 item #2).

The verification driver records hard CORRECTNESS rows for only the first
50 queries in ``all_queries()`` order.  Round 12's window = the 5 new
round-12 ops + 8 plan/oracle-changed re-verifies (the ADVICE r11
overflow-guard sweep, the KM risk-table reformulation, and the three
late-r11 plan changes) + a 37-slug OLDEST-EVIDENCE refresh.  These
assertions keep the rotation from silently regressing: a module import
reshuffling registration order, a window slot wasted re-verifying a
fresh slug, a never-driver-verified slug left outside the window, or a
stale-refresh pick that isn't actually the oldest evidence.
"""

from __future__ import annotations

import json
import pathlib

from nomad_event_streamer_spark.plans import (
    DRIVER_WINDOW,
    ORACLES,
    QUERIES,
    R13_QUEUE,
    RE_VERIFY_R12,
    ROWS_ONLY_R12,
    STALE_REFRESH_R12,
    all_oracles,
    all_queries,
)

_ROUNDS = (
    "r01", "r02", "r03", "r04", "r05", "r06", "r07", "r08", "r09", "r10",
    "r11",
)


def _driver_rows_by_round() -> dict[str, str]:
    """Latest round with a clean hash-PASS row per slug."""
    root = pathlib.Path(__file__).resolve().parents[1]
    latest: dict[str, str] = {}
    for rnd in _ROUNDS:
        path = root / f"CORRECTNESS_{rnd}.json"
        if not path.exists():
            continue
        for k, v in json.loads(path.read_text()).items():
            if (
                v.get("hash_match")
                and v.get("schema_match")
                and v.get("rows_match", v.get("count_match", True))
                and not v.get("err")
            ):
                latest[k] = rnd
    return latest


def _driver_rows() -> dict[str, dict]:
    """Union of all committed CORRECTNESS_r*.json rows (latest wins)."""
    root = pathlib.Path(__file__).resolve().parents[1]
    rows: dict[str, dict] = {}
    for rnd in _ROUNDS:
        path = root / f"CORRECTNESS_{rnd}.json"
        if path.exists():
            rows.update(json.loads(path.read_text()))
    return rows


def _hash_passed(rows: dict[str, dict]) -> set[str]:
    return {
        k
        for k, v in rows.items()
        if v.get("hash_match")
        and v.get("schema_match")
        and v.get("rows_match", v.get("count_match", True))
        and not v.get("err")
    }


def test_ledger_comment_matches_registry():
    """ADVICE r04 #3: the DRIVER_WINDOW ledger comment undercounted the
    registry and nearly caused a rotation to skip unverified slugs.
    Pin the counts the comment states to the live registry."""
    import inspect

    import nomad_event_streamer_spark.plans as plans_pkg

    src = inspect.getsource(plans_pkg)
    comment = src.split("RE_VERIFY_R12: frozenset[str]")[0]
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


def test_window_rows_only_slots_are_exactly_the_declared_allowance():
    """A rows-only query in the window wastes a hard-correctness slot;
    the round-8 window already collected the 11 rows-only-by-design
    slugs' driver rows>0 evidence, so the round-12 allowance is EMPTY —
    every window slug must be hash-oracled.  Pin the set exactly."""
    unoracled = {s for s in DRIVER_WINDOW if s not in ORACLES}
    assert unoracled == set(ROWS_ONLY_R12), (
        f"window rows-only set drifted: extra={unoracled - ROWS_ONLY_R12}, "
        f"missing={set(ROWS_ONLY_R12) - unoracled}"
    )


def test_rotation_is_consistent_and_lossless():
    q = list(all_queries())
    o = list(all_oracles())
    assert q[:50] == DRIVER_WINDOW
    # any overflow queue sits contiguously after the window: next
    # round's rotation takes it as the new window head.
    assert q[50 : 50 + len(R13_QUEUE)] == R13_QUEUE
    oracled_head = [s for s in DRIVER_WINDOW + R13_QUEUE if s in ORACLES]
    assert o[: len(oracled_head)] == oracled_head
    assert set(q) == set(QUERIES) and len(q) == len(QUERIES)
    assert set(o) == set(ORACLES) and len(o) == len(ORACLES)


def test_window_overlap_is_only_reverify_or_stale_refresh():
    """Slugs with a cumulative driver hash-PASS row already have hard
    evidence; re-spending window slots on them is sanctioned only via
    (a) RE_VERIFY_R12 — their plan or oracle changed after the PASS —
    or (b) STALE_REFRESH_R12 — the oldest-evidence refresh that fills
    slots unverified work cannot (round 12: 13 unverified+reverify,
    37 refresh)."""
    already_pass = _hash_passed(_driver_rows())
    allowance = set(RE_VERIFY_R12) | set(STALE_REFRESH_R12)
    overlap = [
        s for s in DRIVER_WINDOW if s in already_pass and s not in allowance
    ]
    assert not overlap, f"window re-verifies already-PASS slugs: {overlap}"


def test_stale_refresh_is_exactly_the_oldest_evidence():
    """The refresh fill must be the deterministic oldest-evidence set:
    sort already-PASS slugs by (latest evidence round, registration
    order) and take as many as the window has free slots — no
    cherry-picking."""
    latest = _driver_rows_by_round()
    reg_order = {s: i for i, s in enumerate(QUERIES)}
    candidates = sorted(
        (
            (latest[s], reg_order[s], s)
            for s in latest
            if s in QUERIES and s not in RE_VERIFY_R12
        ),
    )
    expect = [s for _, _, s in candidates[: len(STALE_REFRESH_R12)]]
    assert STALE_REFRESH_R12 == expect, (
        f"stale-refresh drifted from the oldest-evidence rule:\n"
        f"  declared: {STALE_REFRESH_R12}\n  expected: {expect}"
    )
    # and refresh only fills what unverified work cannot: every slot
    # not in the refresh set must be unverified or re-verify
    non_refresh = [s for s in DRIVER_WINDOW if s not in STALE_REFRESH_R12]
    passed = _hash_passed(_driver_rows())
    for s in non_refresh:
        assert s not in passed or s in RE_VERIFY_R12


def test_every_unverified_slug_is_in_the_window():
    """VERDICT r07 item #6 — the rotation discipline as code: every slug
    with NO cumulative driver evidence (no hash-PASS row for oracled
    slugs; no clean rows>0 row for rows-only slugs) must sit in the
    current window head or the overflow queue, so no query can silently
    wait a round without hard evidence."""
    rows = _driver_rows()
    hash_passed = _hash_passed(rows)
    rows_only_seen = {
        k
        for k, v in rows.items()
        if v.get("err") in (None, "no_oracle")
        and (v.get("spark_rows") is None or v.get("spark_rows") > 0)
        and (v.get("rows") is None or v.get("rows") > 0)
    }
    unverified = [
        s
        for s in QUERIES
        if not (
            (s in ORACLES and s in hash_passed)
            or (s not in ORACLES and s in rows_only_seen)
        )
    ]
    assert len(unverified) <= 50 + len(R13_QUEUE), (
        f"{len(unverified)} unverified slugs exceed window + overflow — "
        "rotate a subset and extend the overflow ledger"
    )
    outside = [
        s for s in unverified if s not in DRIVER_WINDOW and s not in R13_QUEUE
    ]
    assert not outside, (
        f"never-driver-verified slugs left outside the window and the "
        f"overflow queue: {outside}"
    )


def test_overflow_queue_has_sim_evidence():
    """Every overflow-queue member must be hash-oracled and carry a
    hash MATCH row in the LATEST committed DRIVER_SIM artifact — the
    arrival-evidence rule that makes the overflow a ledger rather than
    a loophole.  (Round 12: the queue is empty; the rule stands for
    the next overflow.)"""
    import re

    for s in R13_QUEUE:
        assert s in ORACLES, f"overflow slug {s} is not hash-oracled"
    if not R13_QUEUE:
        return
    root = pathlib.Path(__file__).resolve().parents[1]
    sims = sorted(
        root.glob("DRIVER_SIM_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    rows = json.loads(sims[-1].read_text())
    per_query = rows.get("queries", rows)
    for s in R13_QUEUE:
        row = per_query.get(s)
        assert row is not None, f"overflow slug {s} missing from {sims[-1].name}"
        assert row.get("status") == "match", (
            f"overflow slug {s} lacks sim hash MATCH: {row}"
        )


def test_sim_artifact_covers_registry():
    """VERDICT r06 item #2: the committed DRIVER_SIM artifact must never
    trail the registry — a query added after the sim refresh would
    carry no machine evidence.  Pins the LATEST committed
    DRIVER_SIM_r*.json to the exact registry size (regenerate the
    artifact after the last registry-touching commit)."""
    import re

    root = pathlib.Path(__file__).resolve().parents[1]
    sims = sorted(
        root.glob("DRIVER_SIM_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert sims, "no DRIVER_SIM artifact committed"
    latest = sims[-1]
    rows = json.loads(latest.read_text())
    per_query = rows.get("queries", rows)
    per_query = {k: v for k, v in per_query.items() if k.startswith("q_")}
    assert len(per_query) == len(QUERIES), (
        f"{latest.name} covers {len(per_query)} queries but the registry "
        f"has {len(QUERIES)} — regenerate the sim artifact"
    )
    bad = {
        k: v
        for k, v in per_query.items()
        if v.get("status") not in ("match", "rows_only")
    }
    assert not bad, f"sim artifact has non-match rows: {bad}"
