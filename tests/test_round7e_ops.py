"""Round-7e operator tests: the statistics/verify quartet — LSH
candidate + exact-Levenshtein dedup verification, Mann-Whitney U drift,
Cramér's V association, Spearman source-metric correlation — each with
invariants tying it to the family it extends (q_dedup_minhash /
q_ks_test+q_drift_chi2 / q_drift_tri / q_corr)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.plans import QUERIES
from nomad_event_streamer_spark.tables import load


class TestDedupVerifyEditdist:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_dedup_verify_editdist"](spark, sf_dir).collect()

    def test_pairs_are_ordered_and_unique(self, rows):
        assert rows
        seen = set()
        for r in rows:
            assert r["doc_a"] < r["doc_b"]
            assert (r["doc_a"], r["doc_b"]) not in seen
            seen.add((r["doc_a"], r["doc_b"]))

    def test_verified_iff_distance_within_threshold(self, rows):
        for r in rows:
            assert r["dist"] >= 0
            assert r["verified"] == (1 if r["dist"] <= 40 else 0)

    def test_distance_matches_python_replay(self, rows, spark, sf_dir):
        # exact Wagner-Fischer replay on a sample of pairs
        texts = {
            r["doc_id"]: r["text"][:160]
            for r in load(spark, sf_dir, "documents").collect()
        }

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

        for r in rows[:25]:
            assert r["dist"] == lev(texts[r["doc_a"]], texts[r["doc_b"]])

    def test_supersets_tight_banding_candidates(self, rows, spark, sf_dir):
        # 16x1 OR-amplification candidates must cover every 8x2 pair
        tight = {
            (r["doc_a"], r["doc_b"])
            for r in QUERIES["q_dedup_minhash"](spark, sf_dir).collect()
        }
        loose = {(r["doc_a"], r["doc_b"]) for r in rows}
        assert tight <= loose


class TestMannWhitney:
    @pytest.fixture(scope="class")
    def row(self, spark, sf_dir):
        rows = QUERIES["q_mann_whitney"](spark, sf_dir).collect()
        assert len(rows) == 1
        return rows[0]

    def test_partitions_corpus(self, row, spark, sf_dir):
        total = load(spark, sf_dir, "documents").count()
        assert row["n1"] + row["n2"] == total

    def test_u_bounds_and_effect(self, row):
        assert 0 <= row["u2"] <= 2 * row["n1"] * row["n2"]
        assert row["cles_milli"] == row["u2"] * 1000 // (2 * row["n1"] * row["n2"])
        assert 0 <= row["cles_milli"] <= 1000

    def test_matches_scipy_free_python_replay(self, row, spark, sf_dir):
        vals = [
            (r["v"], r["doc_id"] % 2 == 0)
            for r in load(spark, sf_dir, "documents")
            .select(
                F.size(F.split("text", " ")).alias("v"), "doc_id"
            )
            .collect()
        ]
        ordered = sorted(v for v, _ in vals)
        # midrank x2 per value
        first = {}
        for i, v in enumerate(ordered, 1):
            first.setdefault(v, i)
        from collections import Counter

        cnt = Counter(ordered)
        dr = {v: 2 * first[v] + cnt[v] - 1 for v in cnt}
        r1_double = sum(dr[v] for v, in_a in vals if in_a)
        n1 = sum(1 for _, in_a in vals if in_a)
        n2 = len(vals) - n1
        assert row["u2"] == 2 * n1 * n2 + n1 * (n1 + 1) - r1_double


class TestCramersV:
    @pytest.fixture(scope="class")
    def row(self, spark, sf_dir):
        rows = QUERIES["q_cramers_v"](spark, sf_dir).collect()
        assert len(rows) == 1
        return rows[0]

    def test_counts_whole_stream(self, row, spark, sf_dir):
        assert row["n"] == load(spark, sf_dir, "events").count()

    def test_bounded_by_min_dim(self, row):
        # chi2 <= n * (min(r,c) - 1)  =>  V^2 <= 1
        assert 0 <= row["chi2_ppm"] <= row["n"] * 4 * 1_000_000
        assert 0 <= row["v2_ppb"] <= 1_000_000_000
        assert row["v2_ppb"] == row["chi2_ppm"] * 1000 // (row["n"] * 4)


class TestSpearmanSources:
    @pytest.fixture(scope="class")
    def row(self, spark, sf_dir):
        rows = QUERIES["q_spearman_sources"](spark, sf_dir).collect()
        assert len(rows) == 1
        return rows[0]

    def test_rho_bounds(self, row, spark, sf_dir):
        n = (
            load(spark, sf_dir, "documents")
            .select("source")
            .distinct()
            .count()
        )
        assert row["n_sources"] == n
        max_d2 = (n * (n * n - 1)) // 3  # reversed permutation
        assert 0 <= row["sum_d2"] <= max_d2
        assert -1001 <= row["rho_milli"] <= 1000

    def test_matches_python_replay(self, row, spark, sf_dir):
        m = (
            load(spark, sf_dir, "documents")
            .select("source", F.explode(F.split("text", " ")).alias("tok"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("w"),
                F.countDistinct("tok").alias("vocab"),
            )
            .collect()
        )
        rw = {
            r["source"]: i
            for i, r in enumerate(
                sorted(m, key=lambda r: (r["w"], r["source"])), 1
            )
        }
        rv = {
            r["source"]: i
            for i, r in enumerate(
                sorted(m, key=lambda r: (r["vocab"], r["source"])), 1
            )
        }
        d2 = sum((rw[s] - rv[s]) ** 2 for s in rw)
        assert row["sum_d2"] == d2
        n = len(m)
        assert row["rho_milli"] == 1000 - 6000 * d2 // (n * (n * n - 1))
