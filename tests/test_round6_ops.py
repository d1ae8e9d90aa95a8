"""Round-6 operator tests.

VERDICT r05 item #3: scale-aware ``num_planes`` derivation is the default
for the embedding-LSH operators; item #5: plan pins for the round-5 eval
ops live in test_plan_properties.py.
"""

from __future__ import annotations

import pytest

from nomad_event_streamer_spark.operators import similarity


class TestPlanesForCorpus:
    def test_rule_is_log2_over_target_bucket(self):
        # ceil(log2(n / 32)) clamped to [6, 24]
        assert similarity.planes_for_corpus(2_048) == 6  # log2(64) = 6
        assert similarity.planes_for_corpus(4_096) == 7
        assert similarity.planes_for_corpus(60_000) == 11  # the ×30 probe size
        assert similarity.planes_for_corpus(1_000_000) == 15
        assert similarity.planes_for_corpus(10**12) == 24  # ceiling clamp

    def test_floor_keeps_sf_scale_at_oracle_setting(self):
        # sf0.001 (500 vecs) .. sf0.1 (~2k vecs): derived == literal 6, so
        # the derived default and the oracle-pinned literal agree at every
        # scale the driver tests.
        for n in (0, 1, 32, 500, 2_000):
            assert similarity.planes_for_corpus(n) == 6

    def test_mean_bucket_occupancy_stays_near_target(self):
        # The invariant the rule exists for: n / 2^planes ≈ target ⇒
        # candidate pairs per bucket stay O(target²) at every corpus size.
        for n in (10**4, 10**6, 10**9, 10**11):
            planes = similarity.planes_for_corpus(n, max_planes=64)
            occupancy = n / 2**planes
            assert 16 <= occupancy <= 32.0001, (n, planes, occupancy)


class TestDerivedPlanesPath:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        sf = "/root/testdata/sf0.001"
        return spark.read.parquet(f"{sf}/embeddings.parquet")

    def test_near_dup_pairs_int_default_matches_literal_at_sf_scale(self, vecs):
        # At 500 vectors the derivation lands on the clamp floor (6), so
        # the derived-default plan must produce bit-identical pairs to the
        # oracle-pinned literal call.
        derived = similarity.near_dup_pairs_int(vecs).collect()
        literal = similarity.near_dup_pairs_int(vecs, num_planes=6).collect()
        assert sorted(map(tuple, derived)) == sorted(map(tuple, literal))
        assert len(derived) > 0
