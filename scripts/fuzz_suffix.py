"""Differential fuzz for the suffix-order family (round 12 follow-up to
the graph family): q_suffix_rank, q_maximal_repeat, q_repeat_profile
across corpus SHAPES the fixed sf fixtures never produce — THREE
independent implementations per seed (the fuzz_graph pattern):

1. the REAL registered queries (prefix-doubling rank rounds + the
   binary LCP walk, operators/suffix.py) over a synthesized documents
   table,
2. the registered DuckDB oracles (unrolled dense_rank CTE chains) over
   the SAME parquet,
3. a pure-Python referee: materialize every suffix tail, sort, dense
   rank, and take TRUE common-prefix lengths of adjacent pairs —
   shares no engine code, no doubling, no SQL.

Input families, cycled per seed — each aims at a known failure class:
- all_same: k identical documents (every suffix k-duplicated; the
  maximal repeat is a full document — the padded-equality overshoot
  the min-tail cap exists for);
- runs: single-token runs ('a a a ... a') — the classic adjacent-LCP
  chain where lcp = tail length - 1 all the way down;
- periodic: period-p repetition inside one document (self-similar
  suffixes, rank ties resolved only deep in the doubling);
- shared_prefix: documents diverging only at the tail (cross-document
  LCP approx doc length; exercises the doc-boundary cap on BOTH
  sides);
- single: 1-token documents plus one EMPTY text (split(' ') yields
  one '' token in Spark, DuckDB, and Python alike — the degenerate
  token the corpus fixtures never contain);
- boundary: one document at exactly 2^rounds = 128 tokens (the loud
  guard's pass side) among normal docs;
- random: small-vocabulary random documents (generic tie mix).

Usage: python scripts/fuzz_suffix.py [n_seeds] [out.json]
Exit 0 iff every seed matches Spark == DuckDB (driver normalization)
and both match the referee row-for-row.
"""

from __future__ import annotations

import json
import math
import os
import random
import shutil
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

SF = "/root/testdata/sf0.001"
REPEAT_L = 8  # q_repeat_profile's duplicated-position threshold
CAP = 128  # 2^_SUFFIX_ROUNDS


# ---------------------------------------------------------------------------
# referee: materialized suffix tails, sorted; true LCPs of neighbors
# ---------------------------------------------------------------------------


def _lcp(a: tuple, b: tuple) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            return n
        n += 1
    return n


def referee(docs: list[tuple[int, str]]) -> dict:
    toks = {d: text.split(" ") for d, text in docs}
    sufs = sorted(
        (tuple(ts[p - 1 :]), d, p)
        for d, ts in toks.items()
        for p in range(1, len(ts) + 1)
    )
    out: dict = {}

    # q_suffix_rank: top-10 duplicate-tail classes
    ranks: dict = {}
    for tail, _, _ in sufs:
        if tail not in ranks:
            ranks[tail] = len(ranks) + 1
    cls: dict = defaultdict(lambda: [0, None])
    for tail, d, p in sufs:
        c = cls[tail]
        c[0] += 1
        gid = d * 1000 + p
        c[1] = gid if c[1] is None else min(c[1], gid)
    rows = sorted(
        ((ranks[t], n, gid) for t, (n, gid) in cls.items()),
        key=lambda r: (-r[1], r[0]),
    )[:10]
    n_total, n_classes = len(sufs), len(ranks)
    out["q_suffix_rank"] = [
        (r, n, gid, i + 1, n_total, n_classes)
        for i, (r, n, gid) in enumerate(rows)
    ]

    # adjacent-pair LCPs (true common prefixes of the tails)
    pairs = [
        (_lcp(sufs[i][0], sufs[i + 1][0]), sufs[i][1], sufs[i][2],
         sufs[i + 1][1], sufs[i + 1][2])
        for i in range(len(sufs) - 1)
    ]

    # q_maximal_repeat: top-10 by (lcp desc, doc_a, pos_a, doc_b, pos_b)
    top = sorted(pairs, key=lambda r: (-r[0], r[1], r[2], r[3], r[4]))[:10]
    out["q_maximal_repeat"] = [r + (i + 1,) for i, r in enumerate(top)]

    # q_repeat_profile: per-position neighbor max, per-doc rollup
    nlcp: dict = defaultdict(int)
    for lcp, da, pa, db, pb in pairs:
        nlcp[(da, pa)] = max(nlcp[(da, pa)], lcp)
        nlcp[(db, pb)] = max(nlcp[(db, pb)], lcp)
    prof = []
    for d, ts in toks.items():
        vals = [nlcp[(d, p)] for p in range(1, len(ts) + 1)]
        prof.append(
            (
                d,
                len(ts),
                sum(1 for v in vals if v >= REPEAT_L),
                max(vals) if vals else 0,
                sum(vals),
            )
        )
    out["q_repeat_profile"] = sorted(prof)
    return out


REFEREE_COLS = {
    "q_suffix_rank": ("r", "n_suffixes", "min_gid", "rnk", "n_total",
                      "n_classes"),
    "q_maximal_repeat": ("lcp", "doc_a", "pos_a", "doc_b", "pos_b", "rnk"),
    "q_repeat_profile": ("doc_id", "n_pos", "n_dup_pos", "max_lcp",
                         "lcp_mass"),
}


# ---------------------------------------------------------------------------
# input synthesis
# ---------------------------------------------------------------------------

_VOCAB = ["a", "b", "c", "ab", "ba", "x"]


def synth(rng: random.Random, family: str) -> list[tuple[int, str]]:
    def rand_doc(n: int) -> str:
        return " ".join(rng.choice(_VOCAB) for _ in range(n))

    docs: list[tuple[int, str]] = []
    if family == "all_same":
        text = rand_doc(rng.randint(4, 20))
        docs = [(i, text) for i in range(rng.randint(2, 5))]
    elif family == "runs":
        for i in range(rng.randint(1, 3)):
            tok = rng.choice(_VOCAB)
            docs.append((i, " ".join([tok] * rng.randint(5, 40))))
    elif family == "periodic":
        p = rng.randint(1, 3)
        period = [rng.choice(_VOCAB) for _ in range(p)]
        n = rng.randint(10, 60)
        body = (period * ((n // p) + 1))[:n]
        docs = [(0, " ".join(body))]
        if rng.random() < 0.5:
            docs.append((1, rand_doc(rng.randint(3, 10))))
    elif family == "shared_prefix":
        pre = [rng.choice(_VOCAB) for _ in range(rng.randint(8, 30))]
        for i in range(rng.randint(2, 4)):
            tail = [rng.choice(_VOCAB) for _ in range(rng.randint(0, 4))]
            docs.append((i, " ".join(pre + tail)))
    elif family == "single":
        for i in range(rng.randint(2, 8)):
            docs.append((i, rng.choice(_VOCAB)))
        docs.append((len(docs), ""))  # one empty text: a '' token
    elif family == "boundary":
        docs = [(0, rand_doc(CAP))]  # exactly 2^rounds tokens: guard passes
        docs.append((1, rand_doc(rng.randint(2, 10))))
    else:  # random
        for i in range(rng.randint(2, 6)):
            docs.append((i, rand_doc(rng.randint(1, 25))))
    return docs


def make_sf_dir(base: str, docs: list[tuple[int, str]]) -> str:
    d = os.path.join(base, "sf_synth")
    os.makedirs(d, exist_ok=True)
    for name in os.listdir(SF):
        dst = os.path.join(d, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF, name), dst)
    dp = os.path.join(d, "documents.parquet")
    if os.path.islink(dp):
        os.unlink(dp)
    pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["fuzz"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).to_parquet(dp, index=False)
    return d


# ---------------------------------------------------------------------------
# driver-normalized compare (the fuzz_graph inlined contract)
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


SLUGS = ("q_suffix_rank", "q_maximal_repeat", "q_repeat_profile")


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession

    from nomad_event_streamer_spark.plans import ORACLES, QUERIES
    from nomad_event_streamer_spark.session import ensure_runtime_confs

    def fresh_session():
        # The suffix operators localCheckpoint all 8 doubling levels per
        # query; over many seeds the checkpoint blocks outlive their
        # Python references faster than the ContextCleaner drains them
        # and the driver heap OOMs (observed at ~70 seeds on the default
        # 1g).  A bigger heap plus a session recycle every RECYCLE seeds
        # bounds the block population deterministically.
        s = (
            SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "6g")
            .getOrCreate()
        )
        ensure_runtime_confs(s)
        return s

    RECYCLE = 25
    spark = fresh_session()

    families = [
        "all_same",
        "runs",
        "periodic",
        "shared_prefix",
        "single",
        "boundary",
        "random",
    ]
    failures: list[dict] = []
    for seed in range(n_seeds):
        if seed and seed % RECYCLE == 0:
            spark.stop()
            spark = fresh_session()
        rng = random.Random(12700 + seed)
        family = families[seed % len(families)]
        docs = synth(rng, family)
        ref = referee(docs)
        base = tempfile.mkdtemp(prefix="nes_suffix_")
        try:
            sf_dir = make_sf_dir(base, docs)
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
                rcols = list(REFEREE_COLS[slug])
                rrows = ref[slug]
                ok = (
                    sorted(scols) == sorted(dcols)
                    and len(srows) == len(drows) == len(rrows)
                    and norm_rows(scols, srows)
                    == norm_rows(dcols, drows)
                    == norm_rows(rcols, rrows)
                )
                if not ok:
                    failures.append(
                        {
                            "seed": seed,
                            "family": family,
                            "slug": slug,
                            "n_docs": len(docs),
                            "spark": srows[:5],
                            "duck": drows[:5],
                            "referee": rrows[:5],
                        }
                    )
            con.close()
        finally:
            shutil.rmtree(base, ignore_errors=True)
        if (seed + 1) % 10 == 0:
            print(f"  {seed + 1}/{n_seeds} seeds, {len(failures)} failures")

    print(
        f"FUZZ SUFFIX: {n_seeds - len(set(f['seed'] for f in failures))}"
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
