"""Job-count audit (VERDICT r12 item #8): count the Spark JOBS each
declared query's single noop action launches, via job-group tagging +
the status tracker — the five inverse-scaling headline paths first.

A query whose plan-build runs driver actions (eager checkpoints,
plan-time collects) shows those jobs too, split out as build_jobs vs
action_jobs.  Many small jobs = per-job scheduling overhead that 8
cores amortize better than 32 at sf0.1 (the inverse-scaling signature).

Usage: python scripts/probe_job_counts.py q_a q_b ... [-o out.json]
Builder-side measurement tooling only; never touches bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nomad_event_streamer_spark.plans import all_queries  # noqa: E402
from nomad_event_streamer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    out_path = "/tmp/job_counts.json"
    if "-o" in args:
        i = args.index("-o")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    spark = get_spark(master=f"local[{CPUS}]")
    sc = spark.sparkContext
    queries = all_queries()
    # warm codegen + worker pool so job counts aren't polluted by the
    # first-run extras
    queries["q_scan_project"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    tracker = sc.statusTracker()
    results = {}
    for name in args:
        fn = queries[name]
        grp_b = f"build_{name}"
        sc.setJobGroup(grp_b, f"{name}: plan build")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = round(time.perf_counter() - t0, 3)
        build_jobs = len(tracker.getJobIdsForGroup(grp_b))
        grp_a = f"action_{name}"
        sc.setJobGroup(grp_a, f"{name}: noop action")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_action = round(time.perf_counter() - t0, 3)
        action_jobs = len(tracker.getJobIdsForGroup(grp_a))
        sc.setJobGroup(None, None)
        results[name] = {
            "build_jobs": build_jobs,
            "build_sec": t_build,
            "action_jobs": action_jobs,
            "action_sec": t_action,
        }
        print(
            f"# {name}: build {build_jobs} jobs/{t_build}s, "
            f"action {action_jobs} jobs/{t_action}s",
            file=sys.stderr,
        )
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"out": out_path, "n": len(results)}))


if __name__ == "__main__":
    main()
