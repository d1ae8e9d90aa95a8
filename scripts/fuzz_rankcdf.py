"""Differential fuzz for the rank/CDF battery (VERDICT r10 item #9):
q_mann_whitney_ks + q_wasserstein1 across random TIE STRUCTURES and the
degenerate inputs the fixed sf fixtures never produce — THREE
independent implementations per seed (the fuzz_curation pattern):

1. the REAL registered queries, run against a synthesized events table
   (the bucketed-prefix-sum device, DECIMAL(38,0) accumulators),
2. the registered DuckDB oracles over the SAME parquet,
3. a pure-Python referee (collections.Counter + explicit midrank /
   CDF arithmetic — shares no engine code and no SQL text).

Input families, cycled per seed:
- heavy ties: values drawn from a domain of 1..50 distinct cents, so
  midrank tie groups and the Σ(t³−t) correction dominate;
- spread: wide domains with gaps (exercises the W1 inter-value GAP
  weight and the bucket-seam next-value join at negative/positive
  bucket boundaries — values may be negative);
- one-variant: every user_id even (n1 = 0 — division corner: both
  engines must agree on the 0/0.0 → NaN and x/0.0 → Inf emissions);
- tiny: 0, 1, or 2 rows (empty-domain edge: exactly ONE output row
  with NULL aggregates in BOTH engines — the oracle's aggregate-CTE
  shape, not a GROUP BY that would emit zero rows);
- nulls: a NULL-value fraction (NULL cents group like SQL in both).

Usage: python scripts/fuzz_rankcdf.py [n_seeds] [out.json]
Exit 0 iff every seed matches Spark == DuckDB (driver normalization)
and both match the referee on the defined (non-NULL) statistics.
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
SLUGS = ("q_mann_whitney_ks", "q_wasserstein1")


# ---------------------------------------------------------------------------
# referee: textbook midrank U / KS D / W1 over exact integers
# ---------------------------------------------------------------------------


def _cents(v: float) -> int:
    return math.floor(v * 100.0 + 0.5)


def referee(users: list[int], values: list[float | None]) -> dict:
    pairs = [
        (u % 2, _cents(v)) for u, v in zip(users, values) if v is not None
    ]
    c0 = Counter(c for v, c in pairs if v == 0)
    c1 = Counter(c for v, c in pairs if v == 1)
    n0, n1 = sum(c0.values()), sum(c1.values())
    dom = sorted(set(c0) | set(c1))
    if not dom:
        return {
            "n0": None, "n1": None, "u2_0": None, "u2_1": None,
            "tie_sum": None, "d_num": None, "w1_num": None,
        }
    r2_0 = tie_sum = 0
    cum = cum0 = cum1 = 0
    d_num = 0
    w1_num = 0
    prev_c = None
    prev_cum0 = prev_cum1 = 0
    for c in dom:
        a, b = c0.get(c, 0), c1.get(c, 0)
        cnt = a + b
        # doubled midrank of the tie group = 2*(cum+1) + cnt - 1
        r2_0 += a * (2 * (cum + 1) + cnt - 1)
        tie_sum += cnt**3 - cnt
        if prev_c is not None:
            w1_num += abs(prev_cum0 * n1 - prev_cum1 * n0) * (c - prev_c)
        cum += cnt
        cum0 += a
        cum1 += b
        d_num = max(d_num, abs(cum0 * n1 - cum1 * n0))
        prev_c, prev_cum0, prev_cum1 = c, cum0, cum1
    u2_0 = r2_0 - n0 * (n0 + 1)
    return {
        "n0": n0, "n1": n1, "u2_0": u2_0, "u2_1": 2 * n0 * n1 - u2_0,
        "tie_sum": tie_sum, "d_num": d_num,
        "w1_num": w1_num if len(dom) > 1 else None,
    }


# ---------------------------------------------------------------------------
# input synthesis
# ---------------------------------------------------------------------------


def synth(rng: random.Random, family: str) -> tuple[list[int], list]:
    if family == "tiny":
        n = rng.choice([0, 1, 2])
    else:
        n = rng.randint(20, 400)
    users = [rng.randint(0, 40) for _ in range(n)]
    if family == "one_variant":
        users = [u * 2 for u in users]
    if family == "ties":
        domain = [
            round(rng.uniform(-20.0, 20.0), 2)
            for _ in range(rng.randint(1, 50))
        ]
        values = [rng.choice(domain) for _ in range(n)]
    elif family == "spread":
        values = [round(rng.uniform(-5e4, 5e4), 2) for _ in range(n)]
    else:  # tiny / one_variant / nulls share a modest domain
        values = [round(rng.uniform(-100.0, 100.0), 2) for _ in range(n)]
    if family == "nulls":
        values = [None if rng.random() < 0.3 else v for v in values]
    return users, values


def make_sf_dir(base: str, users: list[int], values: list) -> str:
    tmpl = pd.read_parquet(f"{SF}/events.parquet")
    n = len(users)
    reps = max(1, -(-n // len(tmpl)))
    ev = pd.concat([tmpl] * reps, ignore_index=True).iloc[:n].copy()
    ev["user_id"] = pd.array(users, dtype=ev["user_id"].dtype if n else "int64")
    ev["value"] = pd.array(values, dtype="float64")
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


# ---------------------------------------------------------------------------
# driver-normalized compare (the tests/oracle_compare contract, inlined
# so this script runs without the tests tree)
# ---------------------------------------------------------------------------


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

    families = ["ties", "spread", "one_variant", "tiny", "nulls"]
    failures: list[dict] = []
    for seed in range(n_seeds):
        rng = random.Random(8800 + seed)
        family = families[seed % len(families)]
        users, values = synth(rng, family)
        base = tempfile.mkdtemp(prefix="nes_rankcdf_")
        try:
            sf_dir = make_sf_dir(base, users, values)
            con = duckdb.connect()
            for name in (
                "region nation customer supplier part orders lineitem "
                "events documents embeddings"
            ).split():
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{name}.parquet')"
                )
            ref = referee(users, values)
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
                # referee cross-check on the integer statistics
                if ok and srows:
                    row = dict(zip(scols, srows[0]))
                    keys = (
                        ("n0", "n1", "u2_0", "u2_1", "tie_sum", "d_num")
                        if slug == "q_mann_whitney_ks"
                        else ("n0", "n1", "w1_num")
                    )
                    for k in keys:
                        want = ref[k]
                        got = row.get(k)
                        if family == "one_variant" and k == "w1_num":
                            # defined iff >1 distinct value; referee
                            # computed it the same way — compare as-is
                            pass
                        if got != want and not (got is None and want is None):
                            ok = False
                            break
                if not ok:
                    failures.append(
                        {
                            "seed": seed,
                            "family": family,
                            "slug": slug,
                            "n": len(users),
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
        f"FUZZ RANKCDF: {n_seeds - len(set(f['seed'] for f in failures))}"
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
