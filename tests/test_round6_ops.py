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


class TestThetaIntersect:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        return QUERIES["q_theta_intersect"](spark, sf_dir).collect()

    def test_full_pair_grid(self, rows, spark, sf_dir):
        n_sources = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("source")
            .distinct()
            .count()
        )
        assert len(rows) == n_sources * (n_sources - 1) // 2

    def test_sample_bounded_by_k(self, rows):
        from nomad_event_streamer_spark.plans.sketch_queries import _THETA_K

        assert all(r["n_common"] <= _THETA_K for r in rows)

    def test_small_set_estimate_is_exact_count(self, rows):
        # theta_ab == 2^60 means BOTH sketches retained everything: the
        # estimate must equal the retained-common count exactly (scale
        # factor 2^60/2^60 == 1).
        from nomad_event_streamer_spark.plans.sketch_queries import _THETA_ONE

        small = [r for r in rows if r["theta_ab"] == _THETA_ONE]
        for r in small:
            assert r["est_inter"] == float(r["n_common"])

    def test_estimate_nonnegative_and_sane(self, rows):
        for r in rows:
            assert r["est_inter"] >= 0.0
            assert r["n_inter"] >= 0


class TestThetaAnotb:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        return QUERIES["q_theta_anotb"](spark, sf_dir).collect()

    def test_directed_pair_grid(self, rows, spark, sf_dir):
        n_sources = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("source")
            .distinct()
            .count()
        )
        assert len(rows) == n_sources * (n_sources - 1)

    def test_small_set_estimate_is_exact_retained_count(self, rows):
        from nomad_event_streamer_spark.plans.sketch_queries import _THETA_ONE

        for r in rows:
            if r["theta_ab"] == _THETA_ONE:
                assert r["est_anotb"] == float(r["n_only"])

    def test_triad_consistency_with_intersect(self, spark, sf_dir):
        # |A| retained below theta_ab = |A∩B| retained + |A\B| retained:
        # the intersection and difference sketches partition A's retained
        # sample, so their retained counts must be reconstructable from
        # one another on the shared (a, b) pairs.
        from nomad_event_streamer_spark.plans import QUERIES

        inter = {
            (r["source_a"], r["source_b"]): r
            for r in QUERIES["q_theta_intersect"](spark, sf_dir).collect()
        }
        anotb = {
            (r["source_a"], r["source_b"]): r
            for r in QUERIES["q_theta_anotb"](spark, sf_dir).collect()
        }
        for (a, b), ri in inter.items():
            ra = anotb[(a, b)]
            assert ra["theta_ab"] == ri["theta_ab"]
            # n_common and n_only PARTITION A's retained sample below
            # theta_ab, which holds at most k entries
            assert ra["n_only"] + ri["n_common"] <= 32


class TestDedupBloom:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        return QUERIES["q_dedup_bloom"](spark, sf_dir).collect()

    def test_no_false_negatives(self, rows):
        # THE Bloom contract: an indexed digest can never be missed.
        assert all(not r["missed"] for r in rows)

    def test_every_exact_dup_is_a_bloom_hit(self, rows):
        for r in rows:
            if r["exact_dup"]:
                assert r["bloom_hit"]

    def test_false_positive_consistency(self, rows):
        for r in rows:
            assert r["false_positive"] == (r["bloom_hit"] and not r["exact_dup"])

    def test_probe_covers_all_new_docs(self, rows, spark, sf_dir):
        import pyspark.sql.functions as F

        n_new = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id") % 2 == 1)
            .count()
        )
        assert len(rows) == n_new


class TestStreamSessionDedup:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        return QUERIES["q_stream_session_dedup"](spark, sf_dir).collect()

    def test_sessions_conserve_documents(self, rows, spark, sf_dir):
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert sum(r["n_docs"] for r in rows) == n_docs

    def test_drop_count_is_session_size_minus_keeper(self, rows):
        assert all(r["n_dropped"] == r["n_docs"] - 1 for r in rows)

    def test_keeper_is_earliest_arrival(self, rows):
        # arrival time is doc_id-monotonic, so the session keeper (min
        # doc_id) must be the session-start document
        from nomad_event_streamer_spark.plans.streaming_queries import (
            _SESSION_DEDUP_BASE_US,
        )

        for r in rows:
            assert (
                _SESSION_DEDUP_BASE_US + r["keeper_doc"] * 60_000_000
                == r["session_start_us"]
            )


class TestImageResize:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        return {
            r["doc_id"]: r
            for r in QUERIES["q_image_resize"](spark, sf_dir).collect()
        }

    def test_resized_dims_are_ceil_half(self, rows):
        for doc_id, r in rows.items():
            w, h = 9 + doc_id % 8, 6 + doc_id % 5
            assert r["width"] == (w + 1) // 2
            assert r["height"] == (h + 1) // 2

    def test_bmp_out_bytes_honor_row_padding(self, rows):
        for doc_id, r in rows.items():
            if r["fmt"] != "bmp":
                continue
            wr, hr = r["width"], r["height"]
            pad = (4 - (wr * 3) % 4) % 4
            assert r["out_bytes"] == 54 + hr * (wr * 3 + pad)

    def test_pgm_channels_are_null(self, rows):
        for r in rows.values():
            if r["fmt"] == "pgm":
                assert r["sum_c1"] is None and r["sum_c2"] is None
            else:
                assert r["sum_c1"] is not None and r["sum_c2"] is not None

    def test_operator_roundtrip_on_handcrafted_image(self, spark):
        # independent of the closed form: a hand-built 5x3 BMP resizes to
        # the exact pixels numpy slicing predicts
        import numpy as np

        from nomad_event_streamer_spark.operators import multimodal

        px = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
        payload = multimodal.encode_bmp(px)
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, payload binary"
        )
        row = multimodal.resize_media_nn(df, factor=2).collect()[0]
        small = px[::2, ::2]
        assert (row["width"], row["height"]) == (3, 2)
        assert row["sum_c0"] == int(small[:, :, 0].astype(int).sum())
        assert row["sum_c1"] == int(small[:, :, 1].astype(int).sum())
        assert row["sum_c2"] == int(small[:, :, 2].astype(int).sum())


class TestHashtextClassify:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        return QUERIES["q_hashtext_classify"](spark, sf_dir).collect()

    def test_margin_and_pred_consistent(self, rows):
        for r in rows:
            assert r["margin"] == r["score_0"] - r["score_1"]
            assert r["pred_class"] == (1 if r["score_1"] > r["score_0"] else 0)

    def test_feature_count_is_unigrams_plus_bigrams(self, rows, spark, sf_dir):
        import pyspark.sql.functions as F

        toks = {
            r["doc_id"]: r["n"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(
                "doc_id",
                F.size(
                    F.filter(F.split("text", " "), lambda x: x != "")
                ).alias("n"),
            )
            .collect()
        }
        for r in rows:
            n = toks[r["doc_id"]]
            assert r["n_features"] == (n + max(n - 1, 0) if n > 0 else 0)


class TestIvfAppend:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        return QUERIES["q_ivf_append"](spark, sf_dir).collect()

    def test_ledger_conserves_corpus(self, rows, spark, sf_dir):
        n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        assert sum(r["n_total"] for r in rows) == n_vecs
        for r in rows:
            assert r["n_index"] + r["n_new"] == r["n_total"]

    def test_every_cell_holds_its_own_centroid(self, rows):
        # each centroid is an index vector assigned to itself at d=0, so
        # no cell's index side can be empty
        assert len(rows) == 16
        assert all(r["n_index"] >= 1 for r in rows)

    def test_append_distances_nonnegative(self, rows):
        assert all(r["sum_d_new"] >= 0 for r in rows)


class TestStreamLateMetrics:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        return QUERIES["q_stream_late_metrics"](spark, sf_dir).collect()

    def test_late_drops_and_open_windows_reduce_the_count(
        self, rows, spark, sf_dir
    ):
        # the finalized-window total must be strictly below the corpus
        # size: the trailing unemitted windows (end > max - delay) alone
        # guarantee it, and batch-2 late drops reduce it further
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        total = sum(r["n"] for r in rows)
        assert 0 < total < n_events

    def test_windows_are_hour_aligned_and_unique(self, rows):
        starts = [r["window_start_us"] for r in rows]
        assert len(starts) == len(set(starts))
        assert all(s % 3_600_000_000 == 0 for s in starts)

    def test_no_window_past_the_final_watermark(self, rows, spark, sf_dir):
        import pyspark.sql.functions as F

        from nomad_event_streamer_spark.tables import canonicalize_events_ts

        ev = canonicalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        )
        max_us = ev.select(
            F.max(F.expr("ts div 1000")).alias("m")
        ).collect()[0]["m"]
        wm = max_us - 600_000_000
        for r in rows:
            assert r["window_start_us"] + 3_600_000_000 <= wm


class TestStupidBackoff:
    def test_seen_bigram_scores_dominate_backoff(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        rows = QUERIES["q_stupid_backoff"](spark, sf_dir).collect()
        assert all(r["score_micro"] >= 0 for r in rows)
        # every in-corpus bigram was seen at least once (counts come from
        # the same corpus), so no position can score 0 and every doc with
        # bigrams has a positive score
        for r in rows:
            if r["n_bigrams"] > 0:
                assert r["score_micro"] > 0


class TestChunkSliding:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        return QUERIES["q_chunk_sliding"](spark, sf_dir).collect()

    def test_chunk_count_is_ceil_len_over_stride(self, rows, spark, sf_dir):
        import collections

        import pyspark.sql.functions as F

        per_doc = collections.Counter(r["doc_id"] for r in rows)
        lens = {
            r["doc_id"]: r["n"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(
                "doc_id",
                F.size(
                    F.filter(F.split("text", " "), lambda x: x != "")
                ).alias("n"),
            )
            .collect()
        }
        for doc_id, n in lens.items():
            assert per_doc[doc_id] == -(-n // 32) if n > 0 else doc_id not in per_doc

    def test_interior_chunks_are_full_window(self, rows):
        import collections

        last = collections.defaultdict(int)
        for r in rows:
            last[r["doc_id"]] = max(last[r["doc_id"]], r["chunk_id"])
        for r in rows:
            if r["chunk_id"] < last[r["doc_id"]] - 1:
                assert r["n_tokens"] == 64
                if r["chunk_id"] > 0:
                    assert r["overlap_milli"] == 500


class TestLshTuning:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        return {
            r["rows_per_band"]: r
            for r in QUERIES["q_lsh_tuning"](spark, sf_dir).collect()
        }

    def test_s_curve_monotonicity(self, rows):
        # more rows per band = fewer, higher-precision candidates: the
        # candidate count must be non-increasing in rows_per_band and
        # recall non-increasing too (the S-curve trade)
        assert rows[2]["n_cand"] >= rows[4]["n_cand"] >= rows[8]["n_cand"]
        assert (
            rows[2]["recall_milli"]
            >= rows[4]["recall_milli"]
            >= rows[8]["recall_milli"]
        )

    def test_hits_bounded_by_both_sides(self, rows):
        for r in rows.values():
            assert r["n_hits"] <= r["n_cand"]
            assert r["n_hits"] <= r["n_exact"]

    def test_production_config_matches_dedup_eval(self, rows, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        ev = QUERIES["q_dedup_eval"](spark, sf_dir).collect()[0]
        r2 = rows[2]
        assert (r2["n_exact"], r2["n_cand"], r2["n_hits"]) == (
            ev["n_exact"],
            ev["n_lsh"],
            ev["n_hits"],
        )


class TestKsTest:
    def test_statistic_bounds_and_exactness(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        r = QUERIES["q_ks_test"](spark, sf_dir).collect()[0]
        assert r["d_den"] == r["n1"] * r["n2"]
        assert 0 <= r["d_num"] <= r["d_den"]
        assert r["d_milli"] == (r["d_num"] * 1000) // r["d_den"]

    def test_identical_samples_give_zero(self, spark):
        # same distribution in both groups -> every threshold has
        # n2*cum1 == n1*cum2 -> D == 0
        import pyspark.sql.functions as F

        from nomad_event_streamer_spark.operators import ranking  # noqa: F401

        df = spark.createDataFrame(
            [(float(v), t) for v in (1, 2, 3, 4) for t in ("purchase", "click")],
            "value double, event_type string",
        )
        g = (
            df.select(
                F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("v"),
                "event_type",
            )
            .groupBy("v")
            .agg(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).alias("c1"),
                F.sum(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                ).alias("c2"),
            )
        )
        rows = g.collect()
        n1 = sum(r["c1"] for r in rows)
        n2 = sum(r["c2"] for r in rows)
        cum1 = cum2 = 0
        worst = 0
        for r in sorted(rows, key=lambda r: r["v"]):
            cum1 += r["c1"]
            cum2 += r["c2"]
            worst = max(worst, abs(n2 * cum1 - n1 * cum2))
        assert worst == 0


class TestQuantileNormalize:
    def test_normalized_scale_properties(self, spark, sf_dir):
        import collections

        from nomad_event_streamer_spark.plans import QUERIES

        rows = QUERIES["q_quantile_normalize"](spark, sf_dir).collect()
        by_src = collections.defaultdict(list)
        for r in rows:
            by_src[r["source"]].append(r)
        for src, rs in by_src.items():
            n = len(rs)
            ranks = sorted(r["rk"] for r in rs)
            assert ranks == list(range(1, n + 1))
            for r in rs:
                assert r["norm_milli"] == (r["rk"] * 1000) // (n + 1)
                assert 0 < r["norm_milli"] < 1000


class TestBpeFertility:
    def test_fertility_bounds(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        rows = QUERIES["q_bpe_fertility"](spark, sf_dir).collect()
        assert len(rows) > 0
        for r in rows:
            # every word encodes to at least 1 token and at most
            # len(word)+1 symbols; fertility >= 1000 milli always
            assert r["n_bpe"] >= r["n_words"]
            assert r["fertility_milli"] >= 1000
            assert r["fertility_milli"] == (r["n_bpe"] * 1000) // r["n_words"]


class TestEmbedDrift:
    def test_delta_consistency_and_shape(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        rows = QUERIES["q_embed_drift"](spark, sf_dir).collect()
        assert len(rows) == 64
        assert sorted(r["dim"] for r in rows) == list(range(1, 65))
        for r in rows:
            assert r["abs_delta_micro"] == abs(
                r["mean_a_micro"] - r["mean_b_micro"]
            )


class TestDatasetCard:
    def test_card_figures_reconcile(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        rows = QUERIES["q_dataset_card"](spark, sf_dir).collect()
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert sum(r["n_docs"] for r in rows) == n_docs
        for r in rows:
            assert r["toks_per_doc_milli"] == (r["n_tokens"] * 1000) // r["n_docs"]
            assert r["ttr_milli"] == (r["n_vocab"] * 1000) // r["n_tokens"]
            assert r["dup_milli"] == (r["n_dup_docs"] * 1000) // r["n_docs"]
            assert 0 <= r["n_dup_docs"] < r["n_docs"]
            assert 0 < r["n_vocab"] <= r["n_tokens"]


class TestCdcTimeTravel:
    def test_asof_snapshot_is_prefix_of_history(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        asof = {
            r["key"]: r
            for r in QUERIES["q_cdc_time_travel"](spark, sf_dir).collect()
        }
        latest = {
            r["key"]: r
            for r in QUERIES["q_cdc_snapshot"](spark, sf_dir).collect()
        }
        assert asof  # cutoff keeps a meaningful prefix
        import pyspark.sql.functions as F

        from nomad_event_streamer_spark.tables import events

        max_seq = (
            events(spark, sf_dir).agg(F.max("event_id").alias("m")).collect()
        )[0]["m"]
        cutoff = (max_seq * 6) // 10
        for key, r in asof.items():
            # every as-of row is from the prefix
            assert r["last_seq"] <= cutoff
            # a key whose state did not change after S agrees with latest
            if key in latest and latest[key]["last_seq"] <= cutoff:
                assert latest[key]["val"] == r["val"]


class TestAudioResample:
    def test_resample_figures(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        rows = QUERIES["q_audio_resample"](spark, sf_dir).collect()
        for r in rows:
            n_in = 64 + r["doc_id"] % 97
            assert r["n_out"] == (n_in + 1) // 2
            assert r["out_rate"] == 4000
            assert r["out_bytes"] == 44 + 2 * r["n_out"]
            assert r["sum_abs"] >= 0

    def test_operator_roundtrip_on_handcrafted_wave(self, spark):
        import numpy as np

        from nomad_event_streamer_spark.operators import multimodal

        samples = np.array([100, -200, 300, -400, 500], dtype=np.int16)
        payload = multimodal.encode_wav(samples)
        df = spark.createDataFrame(
            [(7, bytearray(payload))], "doc_id long, payload binary"
        )
        r = multimodal.resample_audio_decimate(df, factor=2).collect()[0]
        assert r["n_out"] == 3  # samples 100, 300, 500
        assert r["sum_abs"] == 900
        assert r["out_bytes"] == 44 + 6


class TestAsofForward:
    def test_forward_match_semantics(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        rows = QUERIES["q_asof_forward"](spark, sf_dir).collect()
        matched = [r for r in rows if r["next_click_ts"] is not None]
        assert matched  # the events stream has follow-up clicks
        for r in matched:
            assert r["ts_us"] <= r["next_click_ts"] <= r["ts_us"] + 3_600_000_000
        unmatched = [r for r in rows if r["next_click_ts"] is None]
        for r in unmatched:
            assert r["next_click_id"] is None

    def test_no_join_node_in_plan(self, spark, sf_dir):
        from nomad_event_streamer_spark.plans import QUERIES

        plan = (
            QUERIES["q_asof_forward"](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
            assert node not in plan
        assert "Window" in plan


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
