"""Every declared query with an oracle must hash-match DuckDB at
sf0.001 — the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from nomad_event_streamer_spark.plans import all_oracles, all_queries

from .oracle_compare import compare, duckdb_connection

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    compare(df, con, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
