"""Round-7 operator tests: the MCC / kappa scorecard rows and the
dataset-card × dedup-yield drill-down (VERDICT r06 item #7), the CCNet
perplexity buckets, the embedding-LSH OR-amplification tuning table,
and the k-core peel — each with invariants tying it to the existing
surface it extends (q_knn_eval / q_dataset_card / q_dedup_stats /
q_stupid_backoff / q_dedup_embed_int / q_dedup_clusters).
"""

from __future__ import annotations

import pytest

from nomad_event_streamer_spark.plans import QUERIES


@pytest.fixture(scope="module")
def mcc_rows(spark, sf_dir):
    return QUERIES["q_eval_mcc"](spark, sf_dir).collect()


@pytest.fixture(scope="module")
def kappa_row(spark, sf_dir):
    rows = QUERIES["q_eval_kappa"](spark, sf_dir).collect()
    assert len(rows) == 1
    return rows[0]


@pytest.fixture(scope="module")
def knn_rows(spark, sf_dir):
    return QUERIES["q_knn_eval"](spark, sf_dir).collect()


class TestEvalMcc:
    def test_one_row_per_class_matching_knn_eval(self, mcc_rows, knn_rows):
        assert {r["class"] for r in mcc_rows} == {r["class"] for r in knn_rows}

    def test_confusion_rows_sum_to_eval_set(self, mcc_rows):
        # Every class's binary confusion partitions the same prediction
        # set: tp+fp+fn+tn is constant across classes.
        totals = {r["tp"] + r["fp"] + r["fn"] + r["tn"] for r in mcc_rows}
        assert len(totals) == 1
        assert totals.pop() > 0

    def test_mcc_num_den_consistent(self, mcc_rows):
        for r in mcc_rows:
            assert r["mcc_num"] == r["tp"] * r["tn"] - r["fp"] * r["fn"]
            assert r["mcc_den_sq"] == (
                (r["tp"] + r["fp"])
                * (r["tp"] + r["fn"])
                * (r["tn"] + r["fp"])
                * (r["tn"] + r["fn"])
            )
            # Cauchy-Schwarz: mcc_num² <= mcc_den_sq (|MCC| <= 1)
            if r["mcc_den_sq"] > 0:
                assert r["mcc_num"] ** 2 <= r["mcc_den_sq"]

    def test_tp_fn_agree_with_knn_eval(self, mcc_rows, knn_rows):
        # Shared prediction scaffold: the binary confusion's tp/fn must be
        # the same numbers q_knn_eval reports per class.
        by_class = {r["class"]: r for r in knn_rows}
        for r in mcc_rows:
            k = by_class[r["class"]]
            assert (r["tp"], r["fn"], r["fp"]) == (k["tp"], k["fn"], k["fp"])

    def test_bal_acc_in_milli_range(self, mcc_rows):
        for r in mcc_rows:
            assert 0 <= r["bal_acc_milli"] <= 1000


class TestEvalKappa:
    def test_identities(self, kappa_row):
        r = kappa_row
        assert r["kappa_num"] == r["correct"] * r["total"] - r["sum_pt"]
        assert r["kappa_den"] == r["total"] * r["total"] - r["sum_pt"]
        assert 0 < r["total"]
        assert 0 <= r["correct"] <= r["total"]

    def test_kappa_bounded(self, kappa_row):
        # kappa <= 1 always; milli respects the bound and the sign of num.
        r = kappa_row
        assert r["kappa_milli"] <= 1000
        if r["kappa_num"] >= 0:
            assert r["kappa_milli"] >= 0

    def test_correct_matches_knn_diag(self, kappa_row, knn_rows):
        # Σ per-class tp over the shared scaffold = overall correct.
        assert kappa_row["correct"] == sum(r["tp"] for r in knn_rows)
        assert kappa_row["total"] == sum(r["tp"] + r["fn"] for r in knn_rows)


class TestCardDedupYield:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_card_dedup_yield"](spark, sf_dir).collect()

    def test_one_row_per_source_matching_card(self, rows, spark, sf_dir):
        card = {r["source"] for r in QUERIES["q_dataset_card"](spark, sf_dir).collect()}
        assert {r["source"] for r in rows} == card

    def test_counts_consistent(self, rows):
        for r in rows:
            assert r["n_kept"] == r["n_docs"] - r["n_dropped"]
            assert 0 <= r["n_dropped"] < r["n_docs"]
            assert 0 <= r["n_exact_dup"] <= r["n_dropped"], (
                "exact dups fold into near-dup components (identical text "
                "=> identical signature), so drops must cover them"
            )
            assert 0 < r["kept_milli"] <= 1000
            assert 0 < r["kept_tokens_milli"] <= 1000

    def test_total_drops_match_dedup_stats(self, rows, spark, sf_dir):
        # Corpus-wide: Σ per-source near-dup drops == q_dedup_stats'
        # Σ n_dup_docs over size bands (same components, same min-id rule).
        stats = QUERIES["q_dedup_stats"](spark, sf_dir).collect()
        assert sum(r["n_dropped"] for r in rows) == sum(
            s["n_dup_docs"] for s in stats
        )

    def test_card_figures_match_dataset_card(self, rows, spark, sf_dir):
        card = {
            r["source"]: r
            for r in QUERIES["q_dataset_card"](spark, sf_dir).collect()
        }
        for r in rows:
            c = card[r["source"]]
            assert r["n_docs"] == c["n_docs"]
            assert r["n_tokens"] == c["n_tokens"]
            assert r["n_exact_dup"] == c["n_dup_docs"]


class TestPerplexityBuckets:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_perplexity_buckets"](spark, sf_dir).collect()

    def test_four_buckets_per_lang(self, rows, spark, sf_dir):
        langs = {
            r["lang"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("lang")
            .distinct()
            .collect()
        }
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r["lang"], set()).add(r["bucket"])
        assert set(by_lang) == langs
        for lang, buckets in by_lang.items():
            assert buckets == {1, 2, 3, 4}, (lang, buckets)

    def test_bucket_scores_descend(self, rows):
        # bucket 1 = head (highest normalized LM score): each bucket's
        # min must be >= the next bucket's max within a language.
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
        for lang, bs in by_lang.items():
            for b in (1, 2, 3):
                assert bs[b]["min_avg_micro"] >= bs[b + 1]["max_avg_micro"], (
                    lang,
                    b,
                )

    def test_counts_cover_corpus(self, rows, spark, sf_dir):
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert sum(r["n_docs"] for r in rows) == n_docs

    def test_quartiles_balanced(self, rows):
        # ntile: bucket sizes within a lang differ by at most 1
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(r["n_docs"])
        for lang, sizes in by_lang.items():
            assert max(sizes) - min(sizes) <= 1, (lang, sizes)


class TestEmbedLshTuning:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["num_tables"]: r
            for r in QUERIES["q_embed_lsh_tuning"](spark, sf_dir).collect()
        }

    def test_three_configs(self, rows):
        assert set(rows) == {1, 2, 3}

    def test_nested_prefix_monotone(self, rows):
        # T tables' candidates/confirmed are supersets of T-1's.
        for t in (2, 3):
            assert rows[t]["n_candidates"] >= rows[t - 1]["n_candidates"]
            assert rows[t]["n_confirmed"] >= rows[t - 1]["n_confirmed"]
        assert (
            rows[1]["recall_vs_full_milli"]
            <= rows[2]["recall_vs_full_milli"]
            <= rows[3]["recall_vs_full_milli"]
        )

    def test_full_config_recall_is_1000(self, rows):
        assert rows[3]["recall_vs_full_milli"] == 1000

    def test_full_confirmed_matches_dedup_embed_int(self, rows, spark, sf_dir):
        # The T=3 confirmed count must equal the registered pair
        # operator's output — same planes, same threshold, same corpus.
        n_pairs = QUERIES["q_dedup_embed_int"](spark, sf_dir).count()
        assert rows[3]["n_confirmed"] == n_pairs


class TestKcore:
    @pytest.fixture(scope="class")
    def core(self, spark, sf_dir):
        return {
            r["doc_id"]: r["core_degree"]
            for r in QUERIES["q_kcore"](spark, sf_dir).collect()
        }

    def test_every_core_degree_at_least_k(self, core):
        assert core, "expected a non-empty 2-core at test SF"
        assert all(d >= 2 for d in core.values())

    def test_core_is_subset_of_components(self, core, spark, sf_dir):
        # every 2-core member is in some near-dup cluster (the core is a
        # pruning of the component graph, never an extension)
        clustered = {
            r["doc_id"]
            for r in QUERIES["q_dedup_clusters"](spark, sf_dir).collect()
        }
        assert set(core) <= clustered

    def test_peel_is_idempotent(self, spark, sf_dir):
        # running the peel on the core's own edge set changes nothing:
        # recompute edges restricted to core members and re-peel.
        from nomad_event_streamer_spark.operators import dedup
        from nomad_event_streamer_spark.operators.graph import kcore
        from nomad_event_streamer_spark.tables import load

        import pyspark.sql.functions as F

        docs = load(spark, sf_dir, "documents")
        sh = dedup.shingles(docs, n=3)
        sig = dedup.minhash_signatures(sh, num_hashes=16)
        bands = dedup.lsh_bands(sig, num_hashes=16, rows_per_band=2)
        edges = dedup.lsh_candidate_pairs(bands)
        core1 = kcore(edges, k=2)
        members = core1.select(F.col("doc_id").alias("m"))
        core_edges = edges.join(
            members, edges["doc_a"] == F.col("m"), "left_semi"
        ).join(members, edges["doc_b"] == F.col("m"), "left_semi")
        core2 = kcore(core_edges, k=2)
        r1 = {(r["doc_id"], r["core_degree"]) for r in core1.collect()}
        r2 = {(r["doc_id"], r["core_degree"]) for r in core2.collect()}
        assert r1 == r2

    def test_peel_depth_within_oracle_unroll(self, spark, sf_dir):
        # ADVICE r07: the DuckDB oracle unrolls a FIXED 8 peel rounds
        # while the operator iterates to a verified fixpoint; a graph
        # with peel depth > 8 would silently yield a partially-peeled
        # oracle result and a latent parity mismatch.  ADVICE r08 #3:
        # capture the depth from THIS specific run via return_rounds
        # (the old function-attribute device reflected whatever kcore
        # call happened to run last in the process) — rebuild exactly
        # q_kcore's edge set and pin its measured depth.
        from nomad_event_streamer_spark.operators import dedup
        from nomad_event_streamer_spark.operators.graph import kcore
        from nomad_event_streamer_spark.tables import load

        docs = load(spark, sf_dir, "documents")
        sh = dedup.shingles(docs, n=3)
        sig = dedup.minhash_signatures(sh, num_hashes=16)
        bands = dedup.lsh_bands(sig, num_hashes=16, rows_per_band=2)
        edges = dedup.lsh_candidate_pairs(bands)
        result, depth = kcore(edges, k=2, return_rounds=True)
        assert result.count() > 0
        assert depth <= 8, (
            f"measured peel depth {depth} exceeds the oracle's 8 "
            "unrolled rounds — raise kcore_oracle_sql(rounds=...)"
        )
