"""Run every seeded fuzz family at its round budget and merge the
per-family JSON outputs into one FUZZ_r{N}.json artifact (the shape the
r10 artifact established: the differential-query base document plus one
key per family, with n_seeds_total / n_fail_total footers).

Usage: python scripts/fuzz_all.py FUZZ_r11.json [--quick]
  --quick cuts every family to a smoke budget (CI/iteration use).

Each family runs as a subprocess so one family's Spark session teardown
cannot leak into the next; a non-zero family exit is recorded AND
propagates to this script's exit code.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))

# (key, script, seeds, quick_seeds)
FAMILIES = [
    ("sql_surface", "fuzz_sql_surface.py", 400, 40),
    ("hof", "fuzz_hof.py", 500, 50),
    ("curation", "fuzz_curation.py", 300, 30),
    ("url", "fuzz_url.py", 200, 20),
    ("asof", "fuzz_asof.py", 100, 10),
    ("stream_late", "fuzz_stream_late.py", 100, 10),
    ("stream_ttl", "fuzz_ttl.py", 100, 10),
    ("dedup_param", "fuzz_dedup.py", 100, 10),
    ("token_bucket", "fuzz_bucket.py", 100, 10),
    ("dtw", "fuzz_dtw.py", 150, 15),
    ("dbscan", "fuzz_dbscan.py", 150, 15),
    ("codec", "fuzz_codec.py", 400, 40),
    ("rankcdf", "fuzz_rankcdf.py", 150, 15),
    ("trend", "fuzz_trend.py", 120, 12),
    ("graph", "fuzz_graph.py", 150, 12),
    ("suffix", "fuzz_suffix.py", 120, 7),
]

BASE_SEEDS, BASE_QUICK = 3000, 100  # fuzz_diff, the differential base


def run_family(script: str, seeds: int, out_path: str) -> int:
    cmd = [sys.executable, os.path.join(HERE, script), str(seeds), out_path]
    print(f">>> {script} {seeds}", flush=True)
    return subprocess.call(cmd)


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "FUZZ_new.json"
    quick = "--quick" in sys.argv
    tmpdir = tempfile.mkdtemp(prefix="fuzz_all_")
    failures = []

    base_path = os.path.join(tmpdir, "diff.json")
    rc = run_family(
        "fuzz_diff.py", BASE_QUICK if quick else BASE_SEEDS, base_path
    )
    if rc != 0:
        failures.append("diff")
    doc = json.load(open(base_path)) if os.path.exists(base_path) else {
        "n_seeds": 0, "n_fail": 1, "error": "fuzz_diff did not emit output"
    }

    total = doc.get("n_seeds", 0)
    fail_total = doc.get("n_fail", 0)
    for key, script, seeds, quick_seeds in FAMILIES:
        p = os.path.join(tmpdir, f"{key}.json")
        rc = run_family(script, quick_seeds if quick else seeds, p)
        if rc != 0:
            failures.append(key)
        if os.path.exists(p):
            fam = json.load(open(p))
        else:
            fam = {"n_seeds": 0, "n_fail": 1, "error": "no output"}
        doc[key] = fam
        total += fam.get("n_seeds", 0)
        fail_total += fam.get("n_fail", fam.get("n_failures", 0))

    doc["n_seeds_total"] = total
    doc["n_fail_total"] = fail_total
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, indent=1, default=str)
    print(
        f"FUZZ ALL: {total} seeds, {fail_total} failures, "
        f"family errors: {failures or 'none'}"
    )
    return 1 if (failures or fail_total) else 0


if __name__ == "__main__":
    sys.exit(main())
