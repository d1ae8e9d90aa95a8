"""Round-7i operator tests: MRR retrieval scorecard and the language-ID
confusion audit."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.plans import QUERIES
from nomad_event_streamer_spark.tables import load


class TestEvalMrr:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_eval_mrr"](spark, sf_dir).collect()

    def test_one_row_per_labeled_query(self, rows, spark, sf_dir):
        n = (
            load(spark, sf_dir, "embeddings")
            .where(F.col("label").isNotNull() & (F.col("vec_id") < 50))
            .count()
        )
        assert len(rows) == n

    def test_reciprocal_ladder(self, rows):
        for r in rows:
            assert 0 <= r["first_rel_rank"] <= 10
            if r["first_rel_rank"] == 0:
                assert r["rr_micro"] == 0
            else:
                assert r["rr_micro"] == 1_000_000 // r["first_rel_rank"]

    def test_consistent_with_ndcg_hits(self, rows, spark, sf_dir):
        # a query with ndcg n_rel_ret > 0 must have a first relevant
        # rank, and vice versa
        ndcg = {
            r["query_id"]: r["n_rel_ret"]
            for r in QUERIES["q_ndcg_int"](spark, sf_dir).collect()
        }
        for r in rows:
            if r["query_id"] in ndcg:
                assert (ndcg[r["query_id"]] > 0) == (
                    r["first_rel_rank"] > 0
                )


class TestLangidConfusion:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_langid_confusion"](spark, sf_dir).collect()

    def test_cells_partition_corpus(self, rows, spark, sf_dir):
        total = load(spark, sf_dir, "documents").count()
        assert sum(r["n"] for r in rows) == total

    def test_support_is_row_marginal(self, rows):
        from collections import defaultdict

        by_true = defaultdict(int)
        for r in rows:
            by_true[r["true_lang"]] += r["n"]
        for r in rows:
            assert r["support"] == by_true[r["true_lang"]]
            if r["true_lang"] == r["predicted_lang"]:
                assert r["recall_milli"] == r["n"] * 1000 // r["support"]
            else:
                assert r["recall_milli"] == 0

    def test_matches_langid_accuracy(self, rows, spark, sf_dir):
        # the diagonal mass must equal q_lang_id's is_match sum
        match = (
            QUERIES["q_lang_id"](spark, sf_dir)
            .agg(F.sum("is_match"))
            .collect()[0][0]
        )
        diag = sum(
            r["n"] for r in rows if r["true_lang"] == r["predicted_lang"]
        )
        assert diag == match
