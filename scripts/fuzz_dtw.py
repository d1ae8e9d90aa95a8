"""Differential fuzz for the banded-DTW dataflow across its knob space
(profile length n, band half-width w) — THREE independent
implementations per seed (the fuzz_ttl pattern):

1. the REAL Spark pipeline (`plans.timeseries_queries._dtw_replay`),
2. the parameterized anti-diagonal DuckDB oracle (`_dtw_oracle(n, w)`),
3. a pure-Python referee: pandas profile build + textbook banded DP
   (shares no engine code).

The registered q_dtw_band pins ONE (n=24, w=3) point; the sweep
exercises tight bands (w=1, near-diagonal alignment), wide bands
(w >= n, effectively unbanded), and short/long profiles — the regimes
where a band-boundary off-by-one or a wrong INF sentinel at the DP
edges changes costs.

Usage: python scripts/fuzz_dtw.py [n_seeds] [out.json]
Exit 0 iff every seed matches across all three implementations.
"""

from __future__ import annotations

import json
import random
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

SF = "/root/testdata/sf0.001"


def py_referee(n: int, w: int) -> dict[int, int]:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    dt = str(ev["ts"].dtype)
    if dt == "datetime64[us]":
        ev["ts_us"] = ev["ts"].astype("int64")
    else:
        ev["ts_us"] = (
            ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
        )
    ev["i"] = (ev["ts_us"] // 3_600_000_000) % n + 1
    prof = {
        int(uid): g.groupby("i").size().to_dict()
        for uid, g in ev.groupby("user_id")
    }
    nu = len(prof)
    tot = ev.groupby("i").size().to_dict()
    b = [0] * (n + 1)
    for j in range(1, n + 1):
        b[j] = int(tot.get(j, 0)) // nu
    inf = 1 << 40
    out = {}
    for uid, hist in prof.items():
        a = [0] * (n + 1)
        for i, c in hist.items():
            a[int(i)] = int(c)
        d = [[inf] * (n + 1) for _ in range(n + 1)]
        for i in range(1, n + 1):
            for j in range(max(1, i - w), min(n, i + w) + 1):
                c = abs(a[i] - b[j])
                if i == 1 and j == 1:
                    d[i][j] = c
                else:
                    d[i][j] = c + min(
                        d[i - 1][j],
                        d[i][j - 1],
                        d[i - 1][j - 1] if i > 1 and j > 1 else inf,
                    )
        out[uid] = d[n][n]
    return out


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession  # noqa: E402

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("fuzz-dtw")
        .getOrCreate()
    )
    from nomad_event_streamer_spark.plans.timeseries_queries import (
        _dtw_oracle,
        _dtw_replay,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    rng = random.Random(0xD7B)
    n_fail = 0
    results = {}
    for seed in range(n_seeds):
        # widened knob space (VERDICT r09 item #7): longer profiles and
        # a uniform band arm so every (boundary, interior) band regime
        # appears, not just the curated set
        n = rng.choice([4, 6, 8, 12, 16, 20, 24, 24, 32, 40])
        w = rng.choice([1, 2, 3, 3, 5, 8, n, rng.randint(1, n + 4)])
        spark_rows = {
            r["user_id"]: r["dtw_cost"]
            for r in _dtw_replay(spark, SF, n=n, w=w).collect()
        }
        duck_rows = {
            r[0]: r[1]
            for r in con.execute(_dtw_oracle(n=n, w=w)).fetchall()
        }
        ref_rows = py_referee(n, w)
        ok = spark_rows == duck_rows == ref_rows
        results[str(seed)] = {
            "n": n,
            "w": w,
            "users": len(spark_rows),
            "status": "match" if ok else "MISMATCH",
        }
        if not ok:
            n_fail += 1
            bad = [
                u
                for u in ref_rows
                if spark_rows.get(u) != ref_rows[u]
                or duck_rows.get(u) != ref_rows[u]
            ][:5]
            results[str(seed)]["bad_users"] = bad
        print(f"seed {seed}: n={n} w={w} -> {results[str(seed)]['status']}")
    summary = {"n_seeds": n_seeds, "n_fail": n_fail, "results": results}
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1)
    print(f"FUZZ DTW: {n_seeds - n_fail}/{n_seeds} match, {n_fail} failures")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
