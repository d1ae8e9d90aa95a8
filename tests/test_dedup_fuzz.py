"""Smoke for scripts/fuzz_dedup.py: the minhash-LSH pipeline must match
its parameterized DuckDB twin on pinned configurations away from the
registered (n=3, K=16, r=2) literals — different shingle sizes, hash
counts, band groupings, and the skew cap.  The full 40-config sweep
runs via the script (FUZZ_r07 dedup_param family).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def harness():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "fuzz_dedup.py"
    spec = importlib.util.spec_from_file_location("fuzz_dedup", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def duck(harness):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{harness.SF}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize(
    "n,num_hashes,rpb,max_bucket",
    [
        (2, 8, 1, None),   # bigram shingles, 8 bands of 1 row
        (4, 24, 3, None),  # 4-gram shingles, 8 bands of 3 rows
        (3, 12, 4, 8),     # 3 bands of 4 rows + tight skew cap
    ],
)
def test_config_matches_duckdb(harness, duck, spark, n, num_hashes, rpb, max_bucket):
    s, d = harness.run_config(spark, duck, n, num_hashes, rpb, max_bucket)
    assert s == d, (
        f"n={n} K={num_hashes} r={rpb} cap={max_bucket}: "
        f"spark_only={sorted(s - d)[:5]} duck_only={sorted(d - s)[:5]}"
    )
