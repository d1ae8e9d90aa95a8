"""Differential fuzz for the higher-order-function surface
(q_hof_reduce's family): seeded random lambda-expression chains over
the quantized embedding arrays, DUAL-RENDERED — Spark's transform /
filter / reverse / slice / array_sort / aggregate / exists against
DuckDB's independent list-function engine (list_transform /
list_filter / list_reverse / slicing / list_sort / list_aggregate) —
and hash-compared with the driver's normalization.

Everything is integer: vectors quantize to milli ints up front, affine
map coefficients are small, and every reduction lands in BIGINT, so a
mismatch is a lambda-semantics bug (ordering, clamping, empty-array,
null-fold), never float noise.  Slice clamping, empty-after-filter
reductions, and sort-then-head are exactly the edges the fixed
q_hof_reduce oracle cannot sweep.

Usage: python scripts/fuzz_hof.py [n_seeds] [out.json]
Exit code 0 iff every seed matches.
"""

from __future__ import annotations

import json
import random
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF = "/root/testdata/sf0.01"

_QV_SPARK = (
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5)"
    " AS BIGINT))"
)
_QV_DUCK = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0"
    " + 0.5) AS BIGINT))"
)


def gen_chain(seed: int) -> tuple[str, str, str]:
    """Return (shape_label, spark_expr, duck_expr) over alias V."""
    rng = random.Random(seed)
    sp, dk = _QV_SPARK, _QV_DUCK
    labels = []
    for _ in range(rng.randint(1, 3)):
        op = rng.choice(["affine", "filt_mod", "filt_thresh", "rev", "slice", "sort"])
        labels.append(op)
        if op == "affine":
            a = rng.choice([-3, -2, 2, 3, 5, 7])
            b = rng.randint(-2000, 2000)
            sp = f"transform({sp}, x -> x * {a}L + {b}L)"
            dk = f"list_transform({dk}, x -> x * {a} + {b})"
        elif op == "filt_mod":
            m = rng.choice([2, 3, 5, 7])
            r = rng.randint(0, m - 1)
            sp = f"filter({sp}, x -> abs(x) % {m}L = {r}L)"
            dk = f"list_filter({dk}, x -> abs(x) % {m} = {r})"
        elif op == "filt_thresh":
            t = rng.randint(-1500, 1500)
            cmp_ = rng.choice([">", "<", ">=", "<="])
            sp = f"filter({sp}, x -> x {cmp_} {t}L)"
            dk = f"list_filter({dk}, x -> x {cmp_} {t})"
        elif op == "rev":
            sp = f"reverse({sp})"
            dk = f"list_reverse({dk})"
        elif op == "slice":
            k = rng.randint(1, 80)  # > 64 exercises clamping
            sp = f"slice({sp}, 1, {k})"
            dk = f"({dk})[1:{k}]"
        else:  # sort
            sp = f"array_sort({sp})"
            dk = f"list_sort({dk})"
    red = rng.choice(["sum", "size", "maxg", "ming", "exists", "head"])
    labels.append(red)
    if red == "sum":
        sp = f"aggregate({sp}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        dk = f"coalesce(list_aggregate({dk}, 'sum'), 0)"
    elif red == "size":
        sp = f"CAST(size({sp}) AS BIGINT)"
        dk = f"CAST(len({dk}) AS BIGINT)"
    elif red in ("maxg", "ming"):
        f = "max" if red == "maxg" else "min"
        sp = (
            f"CASE WHEN size({sp}) = 0 THEN -999999 "
            f"ELSE array_{f}({sp}) END"
        )
        dk = (
            f"CASE WHEN len({dk}) = 0 THEN -999999 "
            f"ELSE list_aggregate({dk}, '{f}') END"
        )
    elif red == "exists":
        t = rng.randint(-500, 500)
        sp = f"CASE WHEN exists({sp}, x -> x > {t}L) THEN 1 ELSE 0 END"
        dk = (
            f"CASE WHEN len(list_filter({dk}, x -> x > {t})) > 0 "
            "THEN 1 ELSE 0 END"
        )
    else:  # head: first element after the chain (clamp-safe)
        sp = (
            f"CASE WHEN size({sp}) = 0 THEN -999999 "
            f"ELSE element_at({sp}, 1) END"
        )
        dk = f"coalesce(({dk})[1], -999999)"
    return "+".join(labels), sp, dk


def run(n_seeds: int, out_path: str | None, sf_dir: str = SF) -> int:
    from tests.oracle_compare import compare, duckdb_connection

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("fuzz-hof")
        .getOrCreate()
    )
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    con = duckdb_connection(sf_dir)

    results: dict[int, dict] = {}
    by_red: dict[str, int] = {}
    n_fail = 0
    for seed in range(n_seeds):
        label, sp, dk = gen_chain(seed)
        red = label.rsplit("+", 1)[-1]
        by_red[red] = by_red.get(red, 0) + 1
        sq = (
            f"SELECT vec_id, CAST({sp} AS BIGINT) AS r "
            "FROM embeddings WHERE vec_id < 300"
        )
        dq = (
            f"SELECT vec_id, CAST({dk} AS BIGINT) AS r "
            "FROM embeddings WHERE vec_id < 300"
        )
        try:
            compare(spark.sql(sq), con, dq)
            results[seed] = {"status": "match", "chain": label}
        except AssertionError as exc:
            n_fail += 1
            results[seed] = {
                "status": "FAIL",
                "chain": label,
                "detail": str(exc)[:400],
                "spark_sql": sq,
                "duck_sql": dq,
            }
            print(f"seed {seed} ({label}) FAIL: {str(exc)[:200]}")
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            results[seed] = {
                "status": "ERROR",
                "chain": label,
                "detail": str(exc)[:400],
                "spark_sql": sq,
                "duck_sql": dq,
            }
            print(f"seed {seed} ({label}) ERROR: {str(exc)[:200]}")
        if (seed + 1) % 50 == 0:
            print(f"  {seed + 1}/{n_seeds} done, {n_fail} fail")
    summary = {
        "n_seeds": n_seeds,
        "n_fail": n_fail,
        "sf_dir": sf_dir,
        "protocol": (
            "dual-rendered HOF chains (1-3 lambda ops + 1 reduction) "
            "over milli-quantized embedding arrays: Spark transform/"
            "filter/reverse/slice/array_sort/aggregate/exists vs DuckDB "
            "list_transform/list_filter/list_reverse/[1:k]/list_sort/"
            "list_aggregate; integer-exact end to end"
        ),
        "by_reduction": by_red,
        "results": results,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    print(f"hof fuzz: {n_seeds} seeds, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out = sys.argv[2] if len(sys.argv) > 2 else None
    raise SystemExit(run(n, out))
