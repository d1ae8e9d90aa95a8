"""Differential fuzz for the sliding-TTL streaming dedup state machine
(`streaming/ttl_dedup.py`) across its knob space — THREE independent
implementations per seed:

1. the REAL Structured Streaming pipeline (applyInPandasWithState over
   the 3-file micro-batch replay, `plans.streaming_queries._ttl_pipeline`)
   at a randomized (ttl, arrival spacing),
2. the parameterized DuckDB gaps-and-islands oracle
   (`_ttl_dedup_oracle(ttl, spacing)`),
3. a pure-Python referee: md5-minhash band-0 buckets + a per-bucket
   sliding-lease scan (shares no engine code and uses plain integer
   comparison — no division at all).

The registered q_stream_dedup_ttl pins ONE (ttl=100 min, spacing=60 s)
point; this sweep exercises leases from shorter-than-every-gap (all
keepers) through mid-range (mixed verdicts, bursts straddling batch
cuts) to longer-than-every-gap (one burst per bucket) — the regimes
where an off-by-one in the lease comparison or a state-carry bug at a
batch boundary changes verdicts.

Each seed costs one bounded streaming run (~3-6 s); default 15 seeds.

Usage: python scripts/fuzz_ttl.py [n_seeds] [out.json]
Exit code 0 iff every seed matches across all three implementations.
"""

from __future__ import annotations

import hashlib
import json
import random
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF = "/root/testdata/sf0.001"


def py_referee(texts: dict, ttl_us: int, spacing_us: int) -> dict:
    from nomad_event_streamer_spark.operators.dedup import (
        MINHASH_P,
        minhash_params,
    )

    params = minhash_params(16)[:2]
    buckets: dict[int, str] = {}
    for doc_id, t in texts.items():
        toks = t.split(" ")
        sh = {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}
        hbs = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
            for s in sh
        ]
        mins = [min((a * h + b) % MINHASH_P for h in hbs) for a, b in params]
        buckets[doc_id] = hashlib.md5(
            "|".join(str(m) for m in mins).encode()
        ).hexdigest()
    by_bucket: dict[str, list[int]] = {}
    for doc_id in sorted(texts):
        by_bucket.setdefault(buckets[doc_id], []).append(doc_id)
    out = {}
    for bucket, ids in by_bucket.items():
        last_ts, keeper = None, None
        for doc_id in ids:
            ts = doc_id * spacing_us
            if keeper is not None and ts - last_ts <= ttl_us:
                is_dup = 1
            else:
                is_dup = 0
                keeper = doc_id
            last_ts = ts
            out[doc_id] = (bucket, is_dup, keeper)
    return out


def run(n_seeds: int, out_path: str | None, stop: bool = True) -> int:
    import duckdb

    from nomad_event_streamer_spark.plans.streaming_queries import (
        _ttl_dedup_oracle,
        _ttl_pipeline,
    )
    from tests.oracle_compare import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("fuzz-ttl")
        .getOrCreate()
    )
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )

    n_fail = 0
    detail: list[dict] = []
    regimes = {"all_keepers": 0, "mixed": 0, "one_burst": 0}
    for seed in range(n_seeds):
        rng = random.Random(seed)
        spacing_us = rng.choice(
            [1_000_000, 30_000_000, 60_000_000, 300_000_000]
        )
        # lease from 2 spacings (shorter than the min same-bucket gap,
        # all keepers) up to the full stream span (one burst per bucket)
        ttl_us = spacing_us * rng.choice([2, 10, 30, 80, 200, 600, 2000])
        sdf = _ttl_pipeline(spark, SF, ttl_us, spacing_us)
        try:
            compare(sdf, con, _ttl_dedup_oracle(ttl_us, spacing_us))
        except AssertionError as exc:
            n_fail += 1
            detail.append(
                {
                    "seed": seed,
                    "ttl_us": ttl_us,
                    "spacing_us": spacing_us,
                    "stage": "spark_vs_duckdb",
                    "err": str(exc)[:300],
                }
            )
            print(f"seed {seed} spark-vs-duckdb FAIL ttl={ttl_us}")
            continue
        expect = py_referee(texts, ttl_us, spacing_us)
        got = {r["doc_id"]: r for r in sdf.collect()}
        mism = [
            (d, tuple(expect[d]), (got[d]["bucket"], got[d]["is_dup"], got[d]["keeper_doc"]))
            for d in expect
            if (got[d]["bucket"], got[d]["is_dup"], got[d]["keeper_doc"])
            != expect[d]
        ]
        if mism:
            n_fail += 1
            detail.append(
                {
                    "seed": seed,
                    "ttl_us": ttl_us,
                    "spacing_us": spacing_us,
                    "stage": "python_referee",
                    "mismatch": [list(map(str, m)) for m in mism[:5]],
                }
            )
            print(f"seed {seed} referee FAIL: {mism[:2]}")
            continue
        n_dups = sum(v[1] for v in expect.values())
        if n_dups == 0:
            regimes["all_keepers"] += 1
        elif n_dups >= len(expect) - len({v[0] for v in expect.values()}):
            regimes["one_burst"] += 1
        else:
            regimes["mixed"] += 1

    summary = {
        "n_seeds": n_seeds,
        "n_fail": n_fail,
        "regimes": regimes,
        "protocol": (
            "three-way over the REAL streaming state machine: "
            "applyInPandasWithState 3-batch replay at randomized "
            "(ttl, spacing) vs parameterized DuckDB gaps-and-islands "
            "vs pure-Python sliding-lease referee"
        ),
        "detail": detail,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    print(f"ttl fuzz: {n_seeds} seeds, {n_fail} fail, regimes {regimes}")
    if stop:
        spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    out = sys.argv[2] if len(sys.argv) > 2 else None
    raise SystemExit(run(n, out))
