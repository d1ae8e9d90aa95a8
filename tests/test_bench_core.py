"""Pins the frozen cross-round bench core (VERDICT r07 item #2).

`bench.py` emits TWO totals from r08 on: the full growing HEADLINE set
(`value`) and the frozen 37-query r06 core (`core37_wall_sec`).  The
core is only useful if it never drifts — these assertions tie it to the
committed BENCH_r06.json artifact byte-for-byte.
"""

from __future__ import annotations

import json
import pathlib

import bench


def test_core37_matches_bench_r06_artifact_exactly():
    root = pathlib.Path(__file__).resolve().parents[1]
    r06 = json.loads((root / "BENCH_r06.json").read_text())
    r06_queries = r06.get("parsed", r06).get("queries") or r06["queries"]
    assert list(r06_queries) == bench.CORE37, (
        "CORE37 must be exactly the BENCH_r06.json query set, in order — "
        "it is frozen forever"
    )


def test_core37_is_subset_of_headline():
    missing = [q for q in bench.CORE37 if q not in bench.HEADLINE]
    assert not missing, f"core queries missing from HEADLINE: {missing}"


def test_core37_never_grows_or_shrinks():
    assert len(bench.CORE37) == 37
    assert len(set(bench.CORE37)) == 37
