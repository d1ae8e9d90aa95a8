"""Smoke coverage for the differential fuzzer (scripts/fuzz_diff.py):
a handful of seeds of every shape must hash-match DuckDB at sf0.001.
The full 200-seed sweep runs via the verify gate (FUZZ_r{N}.json)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import fuzz_diff  # noqa: E402

from .oracle_compare import compare, duckdb_connection  # noqa: E402


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def pool(con):
    return fuzz_diff.str_value_pool(con)


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_seed_matches(seed, spark, sf_dir, con, pool):
    gen = fuzz_diff.Gen(seed, pool)
    df, sql = gen.build(spark, sf_dir)
    compare(df, con, sql)


def test_grammar_emits_every_shape(pool):
    shapes = {fuzz_diff.Gen(s, pool).shape for s in range(60)}
    assert shapes == {
        "project",
        "agg",
        "window",
        "setop",
        "rollup",
        "aggwindow",
        "subquery",
        "outeragg",
    }


def test_grammar_emits_every_table(pool):
    tables = {fuzz_diff.Gen(s, pool).table for s in range(60)}
    assert tables == {"events", "lineitem", "join", "join3", "fulljoin"}
