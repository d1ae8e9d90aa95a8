"""Property tests for the round-2 operators: distributed ranking vs the
naive single-window ground truth, compact-forward triangles vs brute
force, and deletion-neighborhood fuzzy join vs the quadratic scan."""

from __future__ import annotations

import itertools
import random

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.operators import ranking
from nomad_event_streamer_spark.operators.dedup import edit_distance_pairs
from nomad_event_streamer_spark.operators.graph import triangles


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_global_row_number_matches_naive_window(spark, seed):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    bounds = ranking.quantile_boundaries(df, "v", 8)
    got = ranking.global_row_number(
        df,
        [F.col("v").asc(), F.col("id").asc()],
        ranking.range_bucket(F.col("v"), bounds),
        "rn",
    )
    want = {
        (r_id): pos + 1
        for pos, (v, r_id) in enumerate(
            sorted((v, i) for i, v in rows)
        )
    }
    for r in got.collect():
        assert r["rn"] == want[r["id"]], (r, want[r["id"]])


@pytest.mark.parametrize("seed", [0, 7])
def test_global_row_number_descending(spark, seed):
    rng = random.Random(seed)
    rows = [(i, rng.randint(-20, 20)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long")
    bounds = ranking.quantile_boundaries(df, "v", 8)
    got = ranking.global_row_number(
        df,
        [F.col("v").desc(), F.col("id").asc()],
        ranking.range_bucket(F.col("v"), bounds),
        "rn",
        bucket_desc=True,
    )
    want = {
        r_id: pos + 1
        for pos, (negv, r_id) in enumerate(
            sorted((-v, i) for i, v in rows)
        )
    }
    for r in got.collect():
        assert r["rn"] == want[r["id"]]


@pytest.mark.parametrize("seed,n,p", [(0, 12, 0.4), (3, 20, 0.25)])
def test_triangles_match_bruteforce(spark, seed, n, p):
    rng = random.Random(seed)
    names = [f"n{i:02d}" for i in range(n)]
    edges = [
        (a, b)
        for a, b in itertools.combinations(names, 2)
        if rng.random() < p
    ]
    adj = set(edges)
    want = {
        (a, b, c)
        for a, b, c in itertools.combinations(names, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    }
    und = spark.createDataFrame(edges, "u string, v string")
    got = {
        (r["a"], r["b"], r["c"]) for r in triangles(und).collect()
    }
    assert got == want


def test_edit_distance_pairs_matches_quadratic(spark):
    rng = random.Random(42)
    alphabet = "abc"
    words = list(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
            for _ in range(60)
        }
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(words), 2)
        if lev(a, b) <= 1
    }
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {
        (r["s_a"], r["s_b"])
        for r in edit_distance_pairs(df, "s", max_dist=1).collect()
    }
    assert got == want
