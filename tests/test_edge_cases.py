"""Operator edge cases: empty and single-row inputs.

The oracle-parity suite only sees the driver's populated tables; these
pin the degenerate shapes — empty corpora, single documents, empty join
sides — where array/window/stateful operators habitually break (negative
slice lengths, empty collect_lists, windows over nothing).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.operators import dedup, similarity
from nomad_event_streamer_spark.operators.asof import asof_join

DOCS_SCHEMA = "doc_id long, text string"


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], DOCS_SCHEMA)


def test_shingles_empty_and_short(spark, empty_docs):
    assert dedup.shingles(empty_docs, n=3).count() == 0
    short = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two")], DOCS_SCHEMA
    )
    # fewer than n tokens -> no shingles, but no error either
    assert dedup.shingles(short, n=3).count() == 0


def test_minhash_pipeline_empty(spark, empty_docs):
    sh = dedup.shingles(empty_docs, n=3)
    sig = dedup.minhash_signatures(sh, num_hashes=16)
    bands = dedup.lsh_bands(sig, num_hashes=16, rows_per_band=2)
    assert dedup.lsh_candidate_pairs(bands).count() == 0


def test_jaccard_single_doc(spark):
    one = spark.createDataFrame([(1, "a b c d e")], DOCS_SCHEMA)
    # no pair can exist with a single document
    assert dedup.jaccard_pairs(one, n=3).count() == 0


def test_simhash_single_token_doc(spark):
    one = spark.createDataFrame([(1, "solo")], DOCS_SCHEMA)
    rows = dedup.simhash(one, num_bits=32).collect()
    assert len(rows) == 1 and rows[0]["simhash"] >= 0


def test_connected_components_empty_edges(spark):
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup.connected_components(edges).count() == 0


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 200)], "event_id long, user_id long, ts_us long"
    )
    right = spark.createDataFrame(
        [], "user_id long, ts_us long, v long, rid long"
    )
    out = asof_join(
        left, right, key="user_id", ts="ts_us", right_value="v", right_id="rid"
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert all(r["asof_rid"] is None for r in rows.values())


def test_asof_join_tie_at_equal_ts(spark):
    left = spark.createDataFrame(
        [(1, 10, 100)], "event_id long, user_id long, ts_us long"
    )
    right = spark.createDataFrame(
        [(10, 100, 7, 70), (10, 100, 8, 80), (10, 101, 9, 90)],
        "user_id long, ts_us long, v long, rid long",
    )
    # equal-ts right rows DO match (<=); greatest rid among the tie wins;
    # the later (ts=101) row must not match
    row = asof_join(
        left, right, key="user_id", ts="ts_us", right_value="v", right_id="rid"
    ).collect()[0]
    assert row["asof_rid"] == 80 and row["asof_v"] == 8


def test_near_dup_pairs_empty(spark):
    vecs = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert similarity.near_dup_pairs(vecs).count() == 0
