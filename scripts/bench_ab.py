"""Interleaved same-session A/B of the frozen core37 between two repo
checkouts (VERDICT r11 item #5: kill the epoch ambiguity in cross-round
bench claims).

The cpu_calib counter corrects single-core CPU epoch but not JVM or
parallelism effects; the only clean cross-round signal is BOTH code
versions measured in ONE Spark session, alternating, so every epoch
effect (JIT state, GC heap shape, host contention) hits both arms
equally.  Two versions of the same package cannot coexist in one
interpreter, so each arm swap purges ``nomad_event_streamer_spark*`` /
``__spark_entry__`` / ``bench`` from ``sys.modules`` and re-imports
from the arm's root — the JVM (the expensive, epoch-carrying half)
persists across swaps; the Python re-import is milliseconds.

Usage:
    git worktree add /tmp/nes_ab_prev <prev-close-out-commit>
    python scripts/bench_ab.py /root/repo /tmp/nes_ab_prev [rounds]

Set ``SPARK_GRAFT_AB_LIST=q_a,q_b`` to A/B an ad-hoc query list instead
of the frozen core37 (the optimization-round per-query protocol); the
JSON line then carries per-query medians for both arms.

Prints per-arm medians and the A/B ratio; one JSON line last.
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time

ROUNDS_DEFAULT = 5


def _purge_and_import(root: str):
    for mod in list(sys.modules):
        if mod.split(".")[0] in (
            "nomad_event_streamer_spark",
            "__spark_entry__",
            "bench",
        ):
            del sys.modules[mod]
    while root in sys.path:
        sys.path.remove(root)
    sys.path.insert(0, root)
    entry = importlib.import_module("__spark_entry__")
    bench = importlib.import_module("bench")
    assert entry.__file__.startswith(root), entry.__file__
    assert bench.__file__.startswith(root), bench.__file__
    return entry, bench


def main() -> None:
    root_a, root_b = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else ROUNDS_DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    # Session from arm A's engine (configs are identical across rounds;
    # asserted below by re-running ensure_runtime_confs per swap).
    sys.path.insert(0, root_a)
    from nomad_event_streamer_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]")

    ab_list = [
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_AB_LIST", "").split(",")
        if q.strip()
    ]

    # Warm both arms once (codegen + Python worker pool) before timing.
    totals: dict[str, list[float]] = {root_a: [], root_b: []}
    per_q: dict[str, dict[str, list[float]]] = {root_a: {}, root_b: {}}
    core_lists: dict[str, list] = {}
    for warm in (True, False):
        n = 1 if warm else rounds
        for rnd in range(n):
            # Alternate arm ORDER per round: session throughput drifts
            # monotonically upward for the first few rounds (JIT, page
            # cache), so a fixed A-then-B order systematically favors
            # the later arm — measured at up to +24% apparent ratio on
            # IDENTICAL code in the r12 batch-3 A/B.  Flipping the
            # order each round cancels the drift to first order.
            order = (root_a, root_b) if rnd % 2 == 0 else (root_b, root_a)
            for root in order:
                entry, bench = _purge_and_import(root)
                queries = entry.queries()
                core = ab_list or bench.CORE37
                core_lists[root] = core
                t0 = time.perf_counter()
                for name in core:
                    tq = time.perf_counter()
                    queries[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    if not warm:
                        per_q[root].setdefault(name, []).append(
                            round(time.perf_counter() - tq, 3)
                        )
                wall = time.perf_counter() - t0
                if not warm:
                    totals[root].append(round(wall, 3))
                print(
                    f"# {'warm' if warm else 'run'} {os.path.basename(root)}"
                    f" total={wall:.2f}s",
                    file=sys.stderr,
                    flush=True,
                )
    assert core_lists[root_a] == core_lists[root_b], "query list drifted"
    med_a = statistics.median(totals[root_a])
    med_b = statistics.median(totals[root_b])
    print(
        json.dumps(
            {
                "metric": "ab_list_ratio" if ab_list else "core37_ab_ratio",
                "arm_a": root_a,
                "arm_b": root_b,
                "runs_a": totals[root_a],
                "runs_b": totals[root_b],
                "median_a_sec": med_a,
                "median_b_sec": med_b,
                "ratio_a_over_b": round(med_a / med_b, 4),
                "per_query_median_a": {
                    q: statistics.median(v) for q, v in per_q[root_a].items()
                },
                "per_query_median_b": {
                    q: statistics.median(v) for q, v in per_q[root_b].items()
                },
                "rounds": rounds,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
