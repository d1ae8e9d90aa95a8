"""Empirical scale check: replicate the sf0.1 tables ~10x into /tmp and
time the heavy operators at both sizes.  A healthy operator scales
~linearly in rows (shuffles on keys, no all-pairs blowup); anything
super-linear here would be catastrophic at 100 TB.

Replica texts get a per-replica token-suffix rewrite so replica
vocabularies are DISJOINT: shingle buckets keep their original sizes and
candidate sets grow linearly.  (Verbatim or lightly-perturbed copies
would inflate every shared-shingle bucket 8-10x and the exact-Jaccard
pair count ~64-100x — that measures the corpus's duplicate pathology,
which is real but is what the minhash-LSH prefilter and the max_bucket
skew guard exist for, not the operator's row scaling.  Measured: with
lightly-perturbed replicas q_ngram_jaccard ran 17x at 10x rows; with
disjoint vocabularies it is linear.)

Usage: python scripts/scale_probe.py [--reps 10] [--only q_a,q_b]
Writes /tmp/nes_scale_x{reps}/ once per replication factor and reuses it
(--reps 30 gives the second decade for the ops whose ×10 ratio is above
linear-in-rows, confirming the trend is output/round growth, not
quadratic creep).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from nomad_event_streamer_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def dst_for(reps: int) -> str:
    # reps=10 keeps the historical r01/r02 directory so the synthesized
    # replica set (and its _done3 marker) is reused across rounds.
    return "/tmp/nes_scale_sf1" if reps == 10 else f"/tmp/nes_scale_x{reps}"

PROBES = [
    "q_agg_groupby",
    "q_join_inner",
    "q_sessionize",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_ngram_jaccard",
    "q_simhash",
    "q_tfidf_top3",
    "q_minhash_est",
    "q_dedup_embed",
    "q_sim_ann",
    "q_asof_join",
    "q_dedup_clusters",
    "q_vocab_topk",
    "q_chunk_docs",
    "q_stratified_sample",
    "q_dedup_clusters_star",
    "q_repetition_signals",
    "q_bpe_train",
    "q_tpch_q10_returns",
    "q_tpch_q19_disjunctive",
    "q_tpch_q2_mincost",
    "q_tpch_q13_custdist",
    "q_tpch_q21_waiting",
    "q_sim_pq",
    "q_heavy_hitters",
    "q_pagerank",
    "q_sim_ivfpq",
    "q_bloom_prune_join",
    "q_incremental_agg",
    "q_pandas_udaf",
    "q_hll_rollup",
    # round-2 additions
    "q_dataset_shuffle",
    "q_window_global",
    "q_sim_topk_int",
    "q_gram_int",
    "q_hll_registers",
    "q_hll_estimate",
    "q_triangles",
    "q_bfs_reach",
    "q_fuzzy_join",
    "q_inverted_index",
    "q_unigram_surprisal",
    "q_mix_budget",
    "q_quantile_hist",
    "q_quality_checks",
    "q_interpolate",
    "q_funnel",
    "q_retention",
    "q_transitions",
    # round-3 additions
    "q_containment",
    "q_simhash_pairs",
    "q_chunk_cdc",
    "q_drift_chi2",
    "q_packing_efficiency",
    "q_dup_spans",
    "q_dedup_embed_int",
    # round-4 additions
    "q_containment_minhash",
    "q_dup_span_lengths",
    "q_chunk_gear",
    "q_sim_recall",
    "q_dedup_incremental",
    # round-4 corpus-hygiene additions
    "q_chunk_dedup",
    "q_winnow_fingerprint",
    "q_bigram_surprisal",
    "q_zipf_slope",
    "q_ngram_novelty",
    "q_quality_wilson",
    "q_t_closeness",
    "q_mix_temperature",
    "q_systematic_sample",
    "q_interval_join",
    "q_audio_pcm_stats",
    "q_class_balance",
    "q_orc_roundtrip",
    "q_bucketed_join",
    "q_exactsubstr_cut",
    "q_countmin",
    "q_benford_audit",
    "q_trigram_join",
    "q_skyline",
    "q_knn_classify",
    "q_seasonal_index",
    "q_weighted_median",
    "q_autocorr",
    "q_search_topk",
    "q_bootstrap_ci",
    "q_stickiness",
    "q_time_to_convert",
    "q_mad_outliers",
    "q_gini",
    "q_abandonment",
    "q_path_topk",
    "q_burstiness",
    "q_lorenz",
    "q_heaps_law",
    # round-5 additions (q_bpe_train already probed above)
    "q_sim_ivf_int",
    "q_sim_pq_int",
    "q_sim_ivfpq_int",
    "q_exactsubstr_cluster",
    "q_tdigest_int",
    "q_stream_dedup_lsh",
    "q_semdedup",
    "q_label_prop",
    "q_knn_eval",
    "q_eval_auc",
    "q_calibration",
    "q_sim_recall_ivf",
    "q_dedup_eval",
    "q_pca_power_int",
    "q_tdigest_merge",
    # round-7g/7h/7i additions (VERDICT r07 item #4)
    "q_phrase_search",
    "q_changepoint_binseg",
    "q_rake_keyphrases",
    "q_sax_symbols",
    "q_kendall_tau",
    "q_eval_mrr",
    "q_langid_confusion",
    "q_embed_quantize_int8",
    # round-8 curation additions
    "q_url_canon",
    "q_domain_rollup",
    "q_mojibake",
    "q_pii_scorecard",
    "q_license_detect",
    "q_kneser_ney",
    "q_hhi_concentration",
    "q_shard_plan",
    # round-8b additions (R09_QUEUE)
    "q_line_dedup",
    "q_quality_classifier",
    "q_robots_gate",
    "q_contamination_matrix",
    "q_tokenizer_compare",
    "q_pq_recall_sweep",
    "q_warc_parse",
    "q_stream_dedup_ttl",
    "q_url_dedup",
    "q_soft_dedup_weight",
    "q_lm_interp",
    "q_vocab_prune",
    "q_temporal_split",
    "q_hashed_ngram_score",
    "q_jaccard_threshold_sweep",
    "q_langid_margin",
    "q_group_by_all",
    "q_link_predict",
    "q_bloom_fpr",
    "q_mcnemar",
    "q_rfm_segments",
    "q_vwap",
    "q_prec_at_k",
    "q_holt_linear",
    "q_rolling_corr",
    "q_idf_drift",
    "q_degree_hist",
    "q_boilerplate_prefix",
    "q_holt_forecast",
    "q_stream_vwap",
    "q_shard_dedup_cross",
    "q_er_blocking",
    "q_kanon_generalize",
    "q_bm25_k1_sweep",
    "q_centroid_dist",
    "q_daily_anomaly",
    "q_kfold_balance",
    "q_skew_audit",
    "q_dup_inflation",
    "q_brier_decomp",
    "q_audit_sample",
    "q_activity_lapse",
    "q_chain_contamination",
    "q_bbit_minhash",
    "q_stratified_kfold",
    "q_join_size_estimate",
    "q_bloom_size_sweep",
    "q_hapax_bigrams",
    "q_stream_quality_gate",
    # round-10 additions (q_cuped was the one un-probed round-9c slug;
    # the rest are the new round-10 ops)
    "q_cuped",
    "q_image_dhash_pairs",
    "q_audio_goertzel",
    "q_kmeans_lloyd",
    "q_readability_fk",
    "q_log_parse",
    "q_diff_in_diff",
    "q_sprt_boundary",
    # round-12 additions (the 18 round-11 ops were probed via --only;
    # their rows live in SCALE.md's r11 campaign table)
    "q_adamic_adar_capped",
    "q_suffix_rank",
    "q_maximal_repeat",
    "q_unigram_lm_fit",
    "q_unigram_lm_em",
    "q_dsir_weights",
    "q_pack_assign",
    "q_repeat_profile",
    "q_unigram_token_count",
    "q_rendezvous_hash",
    "q_ppjoin",
]


def synthesize(spark, reps: int) -> None:
    # _done4: v4 layout (v3 + replica EMBEDDINGS are component-rotated
    # by rep, so replica directions decorrelate; verbatim copies made
    # every vector a 30-way exact near-dup and the embedding PAIR ops
    # measured duplicate pathology — q_label_prop read 47.7x at x30 on
    # v3 replicas purely because true pairs grow quadratically in copy
    # count, the same effect the text-suffix rewrite already prevents
    # for shingle ops.  Rotation preserves norms and per-component
    # distributions; rep 0 keeps the originals bit-exact.)
    # _done3: v3 layout (customer replicated; names get a doubled-digit
    # suffix so cross-replica names sit at levenshtein 2, keeping the
    # distance-1 fuzzy join free of synthesizer-injected pairs)
    DST = dst_for(reps)
    if os.path.exists(f"{DST}/_done4"):
        return
    os.makedirs(DST, exist_ok=True)
    r = spark.range(reps).select(F.col("id").alias("rep"))

    def replicate(
        name,
        id_cols,
        text_col=None,
        name_col=None,
        rotate_col=None,
        id_offset=10_000_000,
    ):
        df = spark.read.parquet(f"{SRC}/{name}.parquet").crossJoin(r)
        for c in id_cols:
            df = df.withColumn(c, F.col(c) + F.col("rep") * id_offset)
        if rotate_col:
            k = f"(rep % {min(reps, 63)})"
            df = df.withColumn(
                rotate_col,
                F.expr(
                    f"concat(slice({rotate_col}, {k} + 1,"
                    f" size({rotate_col}) - {k}),"
                    f" slice({rotate_col}, 1, {k}))"
                ),
            )
        if text_col:
            df = df.withColumn(
                text_col,
                F.array_join(
                    F.transform(
                        F.split(F.col(text_col), " "),
                        lambda t: F.concat(
                            t, F.lit("_"), F.col("rep").cast("string")
                        ),
                    ),
                    " ",
                ),
            )
        if name_col:
            # doubled rep digit: cross-replica names differ in TWO
            # characters (levenshtein 2), so the distance-1 fuzzy join
            # gains no synthesizer-injected cross-rep pairs — a single
            # "_<rep>" suffix would sit at distance 1 and inflate the
            # ×10 measurement quadratically.
            df = df.withColumn(
                name_col,
                F.concat(
                    F.col(name_col),
                    F.lit("_"),
                    F.col("rep").cast("string"),
                    F.col("rep").cast("string"),
                ),
            )
        df.drop("rep").write.mode("overwrite").parquet(f"{DST}/{name}.parquet")

    replicate("events", ["event_id"])  # user_id kept: keys stay 15, rows x10
    replicate("documents", ["doc_id"], text_col="text")
    replicate("embeddings", ["vec_id"], rotate_col="embedding")
    replicate("lineitem", ["l_orderkey"])
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("customer", ["c_custkey"], name_col="c_name")
    for small in ["region", "nation", "supplier", "part"]:
        spark.read.parquet(f"{SRC}/{small}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{small}.parquet")
    open(f"{DST}/_done4", "w").write("ok")


# Queries whose semantics hinge on a FIXED function-word list
# (q_rake_keyphrases' stopword delimiters): the disjoint-vocabulary
# text rewrite suffixes every token, so 'the' -> 'the_3' stops being a
# stopword and the candidate set collapses to zero at x10 (caught by
# the silent-empty guard on this family's first probe).  These probe
# against a replica set whose rewrite PRESERVES the five RAKE
# stopwords: cross-replica shingle collisions then require three
# consecutive stopwords (rare, bounded), so the linear-scaling property
# the disjoint rewrite exists for still holds while the delimiter
# structure survives.
# name -> the word tuple its semantics hinge on (preserved verbatim in
# the replica rewrite).  q_bm25_k1_sweep joined in round 8b: its fixed
# query terms vanish under the suffix rewrite and the probe returned
# ZERO rows (the silent-empty guard fired on its first ×10 run).
STOPSAFE_PROBES = {
    "q_rake_keyphrases": ("the", "a", "of", "and", "to"),  # _RAKE_STOPS
    "q_bm25_k1_sweep": ("spark", "query", "join"),  # the BM25 query
}


def synthesize_stopsafe(spark, reps: int, words: tuple) -> str:
    dst = dst_for(reps) + "_keep_" + "_".join(words)
    if os.path.exists(f"{dst}/_done1"):
        return dst
    os.makedirs(dst, exist_ok=True)
    r = spark.range(reps).select(F.col("id").alias("rep"))
    keep = ", ".join(f"'{w}'" for w in words)
    df = (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .crossJoin(r)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .withColumn(
            "text",
            F.expr(
                f"array_join(transform(split(text, ' '), t -> "
                f"CASE WHEN t IN ({keep}) THEN t "
                f"ELSE concat(t, '_', CAST(rep AS STRING)) END), ' ')"
            ),
        )
        .drop("rep")
    )
    df.write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    open(f"{dst}/_done1", "w").write("ok")
    return dst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names: probe just these",
    )
    args = ap.parse_args()

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    synthesize(spark, args.reps)

    import __spark_entry__ as em

    queries = em.queries()
    # warm
    queries["q_scan_project"](spark, SRC).write.format("noop").mode(
        "overwrite"
    ).save()

    probes = (
        args.only.split(",") if args.only else PROBES
    )
    print(f"{'query':24s} {'sf0.1':>8s} {'x{:d}'.format(args.reps):>8s} {'ratio':>7s}")
    for name in probes:
        # q_bucketed_join is layout-stateful: run 1 pays the one-time
        # bucketed rewrite (COLD), run 2 reuses the tables and times the
        # Exchange-free join itself (WARM) — both rows matter, the claim
        # "the rewrite amortizes" needs the warm number measured, not
        # only plan-pinned (VERDICT r04 item #6).
        runs = ("cold", "warm") if name == "q_bucketed_join" else ("",)
        for run_label in runs:
            times = {}
            empty = []
            big_dir = (
                synthesize_stopsafe(spark, args.reps, STOPSAFE_PROBES[name])
                if name in STOPSAFE_PROBES
                else dst_for(args.reps)
            )
            for label, sf in [("small", SRC), ("big", big_dir)]:
                t0 = time.perf_counter()
                queries[name](spark, sf).write.format("noop").mode("overwrite").save()
                times[label] = time.perf_counter() - t0
                # Silent-empty guard: a replica-set path bug can make a
                # query "run" over zero rows and report a flattering
                # ratio (q_stream_dedup_lsh streamed NOTHING at ×10
                # through a symlinked directory before this check
                # existed).  limit(1) is cheap; a timed run over an
                # empty input is a lie, not a measurement.
                if queries[name](spark, sf).limit(1).count() == 0:
                    empty.append(label)
            ratio = times["big"] / max(times["small"], 1e-9)
            shown = f"{name}({run_label})" if run_label else name
            flag = f"  !! EMPTY: {','.join(empty)}" if empty else ""
            print(
                f"{shown:24s} {times['small']:8.2f} {times['big']:8.2f} "
                f"{ratio:6.1f}x{flag}"
            )


if __name__ == "__main__":
    main()
