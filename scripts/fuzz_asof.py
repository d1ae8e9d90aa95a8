"""As-of join differential fuzzer — the engine's tagged-union +
running-window device vs DuckDB's NATIVE ``ASOF JOIN``.

The three registered as-of queries carry hand-written oracle SQL that
restates the semantics (range join + arg_min); this fuzzer instead pits
``operators/asof.asof_join`` against a genuinely INDEPENDENT
implementation — DuckDB's built-in ASOF JOIN operator — across seeded
random directions (backward / forward via the negated-timestamp trick),
tolerances (none, or 1 min..2 h as a row-local null-out), and left/right
subset predicates over the events table.  A mismatch is a real
semantics bug in the device (tie handling, null carry, direction
negation), not an oracle-authoring blind spot — the same shared-mental-
model risk the main fuzz_diff exists to cover, applied to the one
operator family with a native reference available.

Both sides dedupe the right input to one row per (key, ts) with the
greatest-id-wins rule the operator documents, so matches are
deterministic.

Usage: python scripts/fuzz_asof.py [n_seeds] [out.json]
Exit 0 iff every seed matches.
"""

from __future__ import annotations

import json
import random
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF = "/root/testdata/sf0.01"
TYPES = ["click", "purchase", "error", "signup"]


def _sides(rng: random.Random):
    """Random left/right subset predicates (SQL string, Column)."""
    lt = rng.choice(TYPES)
    rt = rng.choice(TYPES)  # may equal lt: self-as-of is legal
    l_sql = f"event_type = '{lt}'"
    l_col = F.col("event_type") == lt
    if rng.random() < 0.5:
        m = rng.choice([2, 3, 5])
        k = rng.randrange(m)
        l_sql += f" AND user_id % {m} = {k}"
        l_col = l_col & (F.col("user_id") % m == k)
    r_sql = f"event_type = '{rt}'"
    r_col = F.col("event_type") == rt
    if rng.random() < 0.5:
        c = rng.randint(1000, 90000)
        r_sql += (
            f" AND CAST(floor(value * 100.0 + 0.5) AS BIGINT) >= {c}"
        )
        r_col = r_col & (
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
            >= c
        )
    return l_sql, l_col, r_sql, r_col


def run_seed(spark: SparkSession, con, rows_hash, seed: int) -> dict:
    from nomad_event_streamer_spark.operators.asof import asof_join
    from nomad_event_streamer_spark.tables import events

    rng = random.Random(seed)
    direction = rng.choice(["backward", "forward"])
    tol_us = (
        None
        if rng.random() < 0.4
        else rng.randint(60, 7200) * 1_000_000
    )
    l_sql, l_col, r_sql, r_col = _sides(rng)

    ev = events(spark, SF)
    left = ev.where(l_col).select("event_id", "user_id", "ts_us")
    right = ev.where(r_col).select(
        "user_id",
        "ts_us",
        F.col("event_id").alias("rid"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("rv"),
    )
    if direction == "forward":
        left = left.withColumn("jts", -F.col("ts_us"))
        right = right.withColumn("jts", -F.col("ts_us")).drop("ts_us")
    else:
        left = left.withColumn("jts", F.col("ts_us"))
        right = right.withColumnRenamed("ts_us", "jts")
    joined = asof_join(
        left, right, key="user_id", ts="jts", right_value="rv", right_id="rid"
    )
    if tol_us is not None:
        # row-local null-out: |left.ts - right.ts| <= tol in real time.
        # jts is negated in forward mode, so the distance is |l.jts - r-ts|
        # expressed via the carried right id's ts — recover right ts from
        # the join timestamp sign convention instead: the carried pair has
        # no ts column, so re-derive from jts ordering: backward distance
        # = l.ts - r.ts >= 0; forward = r.ts - l.ts >= 0.  The operator
        # carries only (rid, rv); tolerance needs the right ts, so carry
        # it as the value of a SECOND asof over the same inputs keyed on
        # jts itself.
        with_rts = asof_join(
            left,
            right.withColumn("rts", -F.col("jts") if direction == "forward" else F.col("jts")),
            key="user_id",
            ts="jts",
            right_value="rts",
            right_id="rid",
        ).select("event_id", F.col("asof_rts").alias("rts"))
        joined = joined.join(with_rts, "event_id")
        dist = (
            F.col("rts") - F.col("ts_us")
            if direction == "forward"
            else F.col("ts_us") - F.col("rts")
        )
        in_tol = dist <= F.lit(tol_us)
        joined = joined.select(
            "event_id",
            "user_id",
            "ts_us",
            F.when(in_tol, F.col("asof_rid")).alias("asof_rid"),
            F.when(in_tol, F.col("asof_rv")).alias("asof_rv"),
        )
    else:
        joined = joined.select(
            "event_id", "user_id", "ts_us", "asof_rid", "asof_rv"
        )
    spark_rows = [
        (r["event_id"], r["user_id"], r["ts_us"], r["asof_rid"], r["asof_rv"])
        for r in joined.collect()
    ]

    # DuckDB native ASOF JOIN
    cmp_op = ">=" if direction == "backward" else "<="
    if tol_us is not None:
        dist_sql = (
            "(l.ts_us - r.ts_us)" if direction == "backward" else "(r.ts_us - l.ts_us)"
        )
        tol_sel = (
            f"CASE WHEN r.ts_us IS NOT NULL AND {dist_sql} <= {tol_us} "
            "THEN r.rid END AS asof_rid, "
            f"CASE WHEN r.ts_us IS NOT NULL AND {dist_sql} <= {tol_us} "
            "THEN r.rv END AS asof_rv"
        )
    else:
        tol_sel = "r.rid AS asof_rid, r.rv AS asof_rv"
    sql = f"""
    WITH l AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE {l_sql}
    ),
    r0 AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
        FROM events WHERE {r_sql}
    ),
    r AS (
        SELECT user_id, ts_us, arg_max(v, event_id) AS rv,
               max(event_id) AS rid
        FROM r0 GROUP BY 1, 2
    )
    SELECT l.event_id, l.user_id, l.ts_us, {tol_sel}
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts_us {cmp_op} r.ts_us
    """
    duck_rows = [tuple(r) for r in con.execute(sql).fetchall()]
    ok = rows_hash(spark_rows) == rows_hash(duck_rows)
    return {
        "status": "match" if ok else "mismatch",
        "direction": direction,
        "tolerance_us": tol_us,
        "n_left": len(spark_rows),
    }


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    from nomad_event_streamer_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )

    def rows_hash(rows):
        return sorted(
            "|".join("NULL" if v is None else repr(int(v)) for v in r)
            for r in rows
        )

    results = {}
    n_fail = 0
    for seed in range(n_seeds):
        r = run_seed(spark, con, rows_hash, seed)
        results[str(seed)] = r
        if r["status"] != "match":
            n_fail += 1
            print(f"seed {seed}: MISMATCH {r}")
        if (seed + 1) % 20 == 0:
            print(f"  {seed + 1}/{n_seeds} seeds, {n_fail} failures")
    summary = {
        "family": "asof",
        "n_seeds": n_seeds,
        "n_fail": n_fail,
        "sf_dir": SF,
        "reference": "DuckDB native ASOF JOIN (independent implementation)",
        "results": results,
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1)
    print(f"ASOF FUZZ: {n_seeds - n_fail}/{n_seeds} match, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
