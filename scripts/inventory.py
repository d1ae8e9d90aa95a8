"""Print the declared query inventory: every registered q_* slug with its
defining module, oracle status, and SURVEY.md §2 presence — the
mechanical cross-check for the coverage checklist.

Usage: python scripts/inventory.py
Exits non-zero if any registered query is missing from SURVEY.md §2 or
any SURVEY slug is unregistered (doc drift guard).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nomad_event_streamer_spark.plans import all_oracles, all_queries  # noqa: E402


def main() -> int:
    queries, oracles = all_queries(), all_oracles()
    survey = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
    ).read()
    survey_slugs = {
        s for s in re.findall(r"q_[a-z0-9_]+", survey) if s in queries or s not in (
            "q_filter_", "q_project_")
    }

    rows = []
    for name, fn in sorted(queries.items()):
        rows.append(
            (
                name,
                fn.__module__.split(".")[-1],
                "oracled" if name in oracles else "rows-only",
                "yes" if name in survey_slugs else "MISSING",
            )
        )
    w = max(len(r[0]) for r in rows)
    print(f"{'query':{w}s}  {'module':20s} {'check':9s} survey")
    for r in rows:
        print(f"{r[0]:{w}s}  {r[1]:20s} {r[2]:9s} {r[3]}")
    n_oracled = sum(1 for r in rows if r[2] == "oracled")
    print(
        f"\ntotal: {len(rows)} queries ({n_oracled} oracled, "
        f"{len(rows) - n_oracled} rows-only)"
    )

    missing_in_survey = [r[0] for r in rows if r[3] == "MISSING"]
    ghost = sorted(
        s
        for s in re.findall(r"q_[a-z0-9_]+", survey)
        if s not in queries and not s.endswith("_")
    )
    if missing_in_survey:
        print(f"ERROR: not in SURVEY.md: {missing_in_survey}")
    if ghost:
        print(f"ERROR: in SURVEY.md but unregistered: {ghost}")
    return 1 if (missing_in_survey or ghost) else 0


if __name__ == "__main__":
    raise SystemExit(main())
