"""Differential fuzz for the token-bucket rate-limiter recurrence
(`plans/analytics_queries.q_token_bucket`) across its knob space —
THREE independent implementations per seed:

1. the REAL Spark pipeline (`_tb_replay`: window rank + JVM
   higher-order aggregate recurrence) at randomized (capacity, refill
   divisor, rank cap),
2. the parameterized DuckDB bounded-rank unrolled oracle
   (`_token_bucket_oracle(cap, cost, div, maxk)`),
3. a pure-python referee (no engine code: sort, scan, min/compare).

The registered query pins ONE (3 tokens, 1/day, k<=100) point; this
sweep exercises leases from never-denying (huge capacity / fast refill)
through mixed verdicts to starvation (tiny capacity, slow refill) — the
regimes where an off-by-one in the refill truncation, the capacity
clamp, or the rank cap changes verdicts.

Usage: python scripts/fuzz_bucket.py [n_seeds] [out.json]
Exit 0 iff every seed matches across all three implementations.
"""

from __future__ import annotations

import json
import random
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF = "/root/testdata/sf0.001"

CAPS = [1, 2, 3, 5, 8]  # tokens
DIVS = [900, 3600, 21_600, 86_400, 259_200, 1_000_000_000]
MAXKS = [3, 7, 20, 50, 100]


def py_referee(events, cap, cost, div, maxk):
    per_user = defaultdict(list)
    for uid, ts, eid in sorted(events, key=lambda t: (t[0], t[1], t[2])):
        per_user[uid].append(ts)
    out = {}
    for uid, tss in per_user.items():
        tok, na, nd, prev = cap, 0, 0, None
        for ts in tss[:maxk]:
            if prev is not None:
                tok = min(cap, tok + (ts - prev) // div)
            if tok >= cost:
                tok -= cost
                na += 1
            else:
                nd += 1
            prev = ts
        out[uid] = (na, nd, tok)
    return out


def run(n_seeds: int, out_path: str | None) -> int:
    from nomad_event_streamer_spark.plans.analytics_queries import (
        _tb_replay,
        _token_bucket_oracle,
    )
    from nomad_event_streamer_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    from nomad_event_streamer_spark.tables import events as events_tbl

    raw = [
        (r["user_id"], r["ts_us"], r["event_id"])
        for r in events_tbl(spark, SF)
        .select("user_id", "ts_us", "event_id")
        .collect()
    ]
    rng = random.Random(0xB0C1)
    n_fail = 0
    regimes = {"all_allowed": 0, "mixed": 0, "starved": 0}
    results = {}
    for seed in range(n_seeds):
        cap_tok = rng.choice(CAPS)
        cap = cap_tok * 1_000_000
        cost = 1_000_000
        div = rng.choice(DIVS)
        maxk = rng.choice(MAXKS)

        ref = py_referee(raw, cap, cost, div, maxk)

        srows = {
            r["user_id"]: (r["n_allowed"], r["n_denied"], r["tokens_final"])
            for r in _tb_replay(
                spark, SF, cap=cap, cost=cost, div=div, maxk=maxk
            ).collect()
        }
        sql = _token_bucket_oracle(cap=cap, cost=cost, div=div, maxk=maxk)
        drows = {
            int(u): (int(a), int(d), int(t))
            for u, a, d, t in con.execute(sql).fetchall()
        }
        ok = srows == ref == drows
        if not ok:
            n_fail += 1
            bad = [
                u
                for u in ref
                if srows.get(u) != ref[u] or drows.get(u) != ref[u]
            ][:3]
            print(
                f"  seed {seed}: MISMATCH cap={cap_tok} div={div} "
                f"maxk={maxk} bad={bad} "
                f"spark={[srows.get(u) for u in bad]} "
                f"ref={[ref[u] for u in bad]} "
                f"duck={[drows.get(u) for u in bad]}"
            )
        tot_a = sum(v[0] for v in ref.values())
        tot_d = sum(v[1] for v in ref.values())
        regime = (
            "all_allowed"
            if tot_d == 0
            else ("starved" if tot_a <= len(ref) * 2 else "mixed")
        )
        regimes[regime] += 1
        results[str(seed)] = {
            "status": "match" if ok else "fail",
            "cap_tokens": cap_tok,
            "div": div,
            "maxk": maxk,
            "allowed": tot_a,
            "denied": tot_d,
        }
        if (seed + 1) % 10 == 0:
            print(f"  {seed + 1}/{n_seeds} seeds, {n_fail} fail")
    art = {
        "family": "token_bucket",
        "n_seeds": n_seeds,
        "n_fail": n_fail,
        "regimes": regimes,
        "protocol": (
            "three-way over the REAL recurrence: Spark window-rank + "
            "applyInPandas replay at randomized (cap, refill divisor, "
            "rank cap) vs parameterized DuckDB bounded-rank unrolled "
            "oracle vs pure-python referee"
        ),
        "results": results,
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(art, fh, indent=1)
    print(f"bucket fuzz: {n_seeds} seeds, {n_fail} fail, regimes {regimes}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    out = sys.argv[2] if len(sys.argv) > 2 else None
    sys.exit(run(n, out))
