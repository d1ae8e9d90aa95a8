"""Differential fuzz for the round-11 trend/sequence battery:
q_runs_test + q_mk_trend + q_cochran_armitage over synthesized event
streams — THREE independent implementations per seed (the fuzz_rankcdf
pattern):

1. the REAL registered queries against a synthesized events table,
2. the registered DuckDB oracles over the SAME parquet,
3. a pure-Python referee (collections.Counter + textbook runs/S/CA
   sufficient statistics — shares no engine code).

Input families, cycled per seed:
- clumped: events piled into bursts of consecutive hours (long runs,
  heavy count ties — the regime the runs test and MK tie-correction
  exist for);
- uniform: spread timestamps (many distinct hourly counts);
- constant: every hour the same count (all-tie: the runs test must
  emit the 0-observation row in BOTH engines, MK var18 hits the tie
  ceiling);
- tiny: 0-2 events total (empty series / single-hour edges);
- skewed_conv: purchase fraction trending across day-of-week (the CA
  alternative hypothesis) or all/none converted (the z² NULL guards).

Usage: python scripts/fuzz_trend.py [n_seeds] [out.json]
Exit 0 iff every seed matches Spark == DuckDB (driver normalization)
and both match the referee on the integer statistics.
"""

from __future__ import annotations

import json
import math
import os
import random
import shutil
import sys
import tempfile
from collections import Counter

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

SF = "/root/testdata/sf0.001"
SLUGS = ("q_runs_test", "q_mk_trend", "q_cochran_armitage")
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# referee
# ---------------------------------------------------------------------------


def ref_runs(ts_us: list[int]) -> dict:
    h = Counter(t // HOUR_US for t in ts_us)
    xs = sorted(h.values())
    n_h = len(xs)
    if n_h == 0:
        return {"n_obs": 0, "n_above": 0, "n_below": 0, "n_runs": 0,
                "expected_runs_milli": None}
    med = xs[max((n_h + 1) // 2, 1) - 1]
    series = [h[hr] for hr in sorted(h)]
    sgn = [1 if x > med else 0 for x in series if x != med]
    n = len(sgn)
    if n == 0:
        return {"n_obs": 0, "n_above": 0, "n_below": 0, "n_runs": 0,
                "expected_runs_milli": None}
    runs = 1 + sum(1 for a, b in zip(sgn, sgn[1:]) if a != b)
    n1 = sum(sgn)
    n2 = n - n1
    return {
        "n_obs": n, "n_above": n1, "n_below": n2, "n_runs": runs,
        "expected_runs_milli": (n + 2 * n1 * n2) * 1000 // n,
    }


def ref_mk(ts_us: list[int]) -> dict:
    h = Counter(t // HOUR_US for t in ts_us)
    series = [h[hr] for hr in sorted(h)]
    n = len(series)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (series[j] > series[i]) - (series[j] < series[i])
    ties = Counter(series)
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    # SQL semantics: with no (i < j) pair the engines' join yields zero
    # rows and sum() is NULL — model that, not the vacuous-sum 0
    return {"n": n, "s": s if n >= 2 else None, "var18": var18}


def ref_ca(ts_us: list[int], types: list[str]) -> dict:
    g: dict[int, list[int]] = {}
    for t, ty in zip(ts_us, types):
        dow = (t // DAY_US) % 7
        ni, ri = g.get(dow, [0, 0])
        g[dow] = [ni + 1, ri + (1 if ty == "purchase" else 0)]
    if not g:
        return {"n": None, "r": None, "stn": None, "strr": None,
                "st2n": None}
    n = sum(v[0] for v in g.values())
    r = sum(v[1] for v in g.values())
    stn = sum(t * v[0] for t, v in g.items())
    strr = sum(t * v[1] for t, v in g.items())
    st2n = sum(t * t * v[0] for t, v in g.items())
    return {"n": n, "r": r, "stn": stn, "strr": strr, "st2n": st2n}


# ---------------------------------------------------------------------------
# input synthesis
# ---------------------------------------------------------------------------

TYPES = ["purchase", "signup", "click", "view", "error"]
BASE_US = 1_700_000_000_000_000  # a fixed epoch anchor


def synth(rng: random.Random, family: str) -> tuple[list[int], list[str]]:
    if family == "tiny":
        n = rng.choice([0, 1, 2])
    else:
        n = rng.randint(50, 600)
    ts: list[int] = []
    if family == "clumped":
        hr = 0
        while len(ts) < n:
            burst = rng.randint(1, 30)
            for _ in range(min(burst, n - len(ts))):
                ts.append(BASE_US + hr * HOUR_US + rng.randint(0, HOUR_US - 1))
            hr += rng.randint(1, 5)
    elif family == "constant":
        per = rng.randint(1, 5)
        hrs = max(1, n // per)
        for h in range(hrs):
            for _ in range(per):
                ts.append(BASE_US + h * HOUR_US + rng.randint(0, HOUR_US - 1))
        n = len(ts)
    else:
        span = rng.randint(1, 40) * HOUR_US
        ts = [BASE_US + rng.randint(0, span) for _ in range(n)]
    if family == "skewed_conv":
        mode = rng.choice(["trend", "all", "none"])
        types = []
        for t in ts:
            dow = (t // DAY_US) % 7
            if mode == "all":
                types.append("purchase")
            elif mode == "none":
                types.append("click")
            else:
                types.append(
                    "purchase" if rng.random() < 0.1 + 0.1 * dow else
                    rng.choice(TYPES[1:])
                )
    else:
        types = [rng.choice(TYPES) for _ in ts]
    return ts, types


def make_sf_dir(base: str, ts_us: list[int], types: list[str]) -> str:
    tmpl = pd.read_parquet(f"{SF}/events.parquet")
    n = len(ts_us)
    reps = max(1, -(-n // len(tmpl)))
    ev = pd.concat([tmpl] * reps, ignore_index=True).iloc[:n].copy()
    if n:
        ev["ts"] = pd.to_datetime(pd.array(ts_us, dtype="int64"), unit="us")
        ev["ts"] = ev["ts"].astype(tmpl["ts"].dtype)
        ev["event_type"] = types
        ev["event_id"] = range(1, n + 1)
    d = os.path.join(base, "sf_synth")
    os.makedirs(d, exist_ok=True)
    for name in os.listdir(SF):
        dst = os.path.join(d, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF, name), dst)
    evp = os.path.join(d, "events.parquet")
    if os.path.islink(evp):
        os.unlink(evp)
    ev.to_parquet(evp, index=False)
    return d


def norm_rows(cols, rows):
    import decimal

    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return None
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return v

    return sorted((tuple(cell(r[i]) for i in order) for r in rows), key=repr)


REF = {"q_runs_test": ref_runs, "q_mk_trend": ref_mk}


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession

    from nomad_event_streamer_spark.plans import ORACLES, QUERIES
    from nomad_event_streamer_spark.session import ensure_runtime_confs

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_runtime_confs(spark)

    families = ["clumped", "uniform", "constant", "tiny", "skewed_conv"]
    failures: list[dict] = []
    for seed in range(n_seeds):
        rng = random.Random(9900 + seed)
        family = families[seed % len(families)]
        ts_us, types = synth(rng, family)
        base = tempfile.mkdtemp(prefix="nes_trend_")
        try:
            sf_dir = make_sf_dir(base, ts_us, types)
            con = duckdb.connect()
            for name in (
                "region nation customer supplier part orders lineitem "
                "events documents embeddings"
            ).split():
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{name}.parquet')"
                )
            for slug in SLUGS:
                sdf = QUERIES[slug](spark, sf_dir)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
                tbl = con.execute(ORACLES[slug]).fetch_arrow_table()
                dcols = tbl.column_names
                drows = list(zip(*[c.to_pylist() for c in tbl.columns]))
                ok = (
                    sorted(scols) == sorted(dcols)
                    and len(srows) == len(drows)
                    and norm_rows(scols, srows) == norm_rows(dcols, drows)
                )
                ref = None
                if ok and srows:
                    row = dict(zip(scols, srows[0]))
                    if slug in REF:
                        ref = REF[slug](ts_us)
                    else:
                        ref = ref_ca(ts_us, types)
                    for k, want in ref.items():
                        got = row.get(k)
                        if got != want and not (
                            got is None and want is None
                        ):
                            ok = False
                            break
                if not ok:
                    failures.append(
                        {
                            "seed": seed,
                            "family": family,
                            "slug": slug,
                            "n": len(ts_us),
                            "spark": srows[:3],
                            "duck": drows[:3],
                            "referee": ref,
                        }
                    )
            con.close()
        finally:
            shutil.rmtree(base, ignore_errors=True)
        if (seed + 1) % 10 == 0:
            print(f"  {seed + 1}/{n_seeds} seeds, {len(failures)} failures")

    print(
        f"FUZZ TREND: {n_seeds - len(set(f['seed'] for f in failures))}"
        f"/{n_seeds} match, {len(failures)} failures"
    )
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            json.dump(
                {
                    "n_seeds": n_seeds,
                    "slugs": list(SLUGS),
                    "families": families,
                    "n_failures": len(failures),
                    "failures": failures[:20],
                },
                fh,
                indent=1,
                default=str,
            )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
