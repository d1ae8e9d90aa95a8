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


def test_plan_fingerprint_is_session_order_insensitive(spark, sf_dir):
    """Round-8b methodology fix, pinned: Spark's lambda-variable names
    carry a session-global counter, so an un-normalized fingerprint
    only matches across runs that build plans in the identical order —
    ad-hoc single-query checks against the sidecar then show false
    drift on every HOF-bearing plan.  Build a HOF-heavy plan cold,
    advance the lambda counter with other plan builds, and require the
    fingerprint to be unchanged."""
    from nomad_event_streamer_spark.plans import all_queries

    q = all_queries()
    cold = bench.plan_fingerprint(q["q_rbo_overlap"](spark, sf_dir))
    for name in ("q_eval_mcc", "q_ngram_jaccard", "q_line_dedup",
                 "q_hashed_ngram_score"):
        q[name](spark, sf_dir)._jdf.queryExecution().optimizedPlan()
    warm = bench.plan_fingerprint(q["q_rbo_overlap"](spark, sf_dir))
    assert cold == warm, (
        "plan_fingerprint drifted with session lambda-counter state — "
        "the lambda-name normalization regressed"
    )
