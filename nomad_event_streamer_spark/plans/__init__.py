"""Declared query surface: every ``q_*`` slug from SURVEY.md section 2.

Importing this package registers all queries; ``__spark_entry__`` exposes
the registry to the verification driver.
"""

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import for side effect: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import extras  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import cdc  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import sketch_queries  # noqa: E402,F401
from . import graph_queries  # noqa: E402,F401
from . import storage_queries  # noqa: E402,F401
from . import timeseries_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401
from . import corpus_queries  # noqa: E402,F401
from . import retrieval_queries  # noqa: E402,F401
from . import sql_features  # noqa: E402,F401
from . import curation_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401


# The verification driver records hard CORRECTNESS rows for only the FIRST
# 50 queries in the order ``all_queries()`` yields them.  Rounds 1-2 covered
# the early relational/LLM slugs; round 3 covered TPC-H / graph / analytics /
# time-series / sketches / hard LLM ops; round 4 covered storage/CDC, set
# ops, scalar-function and agg/window families; round 5 covered the round-4
# corpus/analytics families plus the promoted IVF/PQ/BPE oracles; round 6
# covered the round-5 retrieval/eval/sketch + streaming families; round 7
# covered the 37 previously never-driver-seen slugs + the 6 new round-7 ops
# + a 7-slug plan-change re-verify; round 8 completed the r07 ledger (the 31
# r07 additions + 8 new curation ops + the 11 rows-only-by-design slugs) —
# eight consecutive 50/50-green windows, cumulative driver-seen after r08:
# 339 slugs (328 hash-PASS + 11 rows-only).
# Round 9 (VERDICT r08 item #1) rotates the window onto the documented
# round-8b overflow: the 49 R09-queue slugs (each sim-hash-verified on
# arrival, DRIVER_SIM_r08, and judge-oracle-verified in the r08 verdict
# session) plus ONE sanctioned re-verify slot for q_embed_lsh_tuning —
# the only previously driver-PASSed slug whose optimized plan changed in
# round 8 (configs-side LEFT join, ADVICE r07) — so its refreshed evidence
# is hard driver evidence rather than sim-only.  A green r09 window makes
# the cumulative hard driver hash-PASS ledger cover all 377 oracled slugs.
# Registry at HEAD: 436 queries / 425 oracled.
# Round-9 additions past window capacity follow the same overflow ledger
# discipline in R10_QUEUE below: ordered immediately AFTER the window in
# all_queries(), each sim-hash-verified on arrival, first in line for the
# r10 window rotation.
# tests/test_driver_window.py pins: the counts in this comment, the
# 50-slug shape, the rows-only allowance (exactly ROWS_ONLY_R09 — empty,
# all 11 rows-only slugs collected their driver rows>0 evidence in r08),
# the no-re-verify rule (exception: RE_VERIFY_R09), and the
# rotation-completeness rule (every slug without cumulative driver
# evidence must sit in the window head or the overflow queue).
DRIVER_WINDOW: list[str] = [
    # round-8b overflow queue, sim-verified r08, never driver-seen - 49
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
    # sanctioned re-verify: optimized plan changed in round 8 - 1
    "q_embed_lsh_tuning",
]

# Round-9 additions past window capacity: the documented overflow queue.
# Every member must carry committed sim hash evidence (DRIVER_SIM) and is
# rotated into the NEXT round's driver window ahead of newer work.
R10_QUEUE: list[str] = [
    "q_image_qoi",
    "q_louvain_l0",
    "q_stream_dedup_watermark",
    "q_dedup_oph",
    "q_unicode_nfc",
    "q_fm_sketch",
    "q_kcenter_seed",
    "q_path_prefix_rollup",
    "q_schema_evolution",
    "q_assoc_rules",
    "q_gini_stump",
    "q_holt_winters",
    "q_content_address",
    "q_partition_overwrite_dynamic",
    "q_csv_permissive",
    "q_delta_varint",
    "q_rle_runs",
    "q_jl_project",
    "q_stream_update_mode",
    "q_bitmap_dau",
    "q_window_funnel",
    "q_token_bucket",
    "q_ip_lpm_join",
    "q_lttb_downsample",
    "q_mutual_best_match",
    "q_dtw_band",
    "q_perm_entropy",
    "q_anova_f",
    "q_weighted_jaccard",
    "q_lcp_adjacent",
    "q_adamic_adar",
    "q_hilbert_cluster",
    "q_video_shot_detect",
    "q_stream_outer_join",
    "q_path_3gram",
    "q_naive_bayes_bits",
    "q_dbscan_grid",
    "q_stream_dedup_then_window",
    "q_greedy_set_cover",
    "q_cluster_by",
    "q_ffd_binpack",
    "q_survival_km",
    "q_slope_one",
    "q_twap",
    "q_spatial_nn_join",
    "q_bellman_ford",
    "q_image_histeq",
    "q_cuped",
]

# Round-9 re-verification allowance: q_embed_lsh_tuning's optimized plan
# changed in round 8 (ADVICE r07 fix: configs-side LEFT join) after its
# r07 driver PASS; the r08 window was fully spent on never-verified slugs,
# so VERDICT r08 prescribed rotating it into a hard-evidence slot here.
RE_VERIFY_R09: frozenset[str] = frozenset({"q_embed_lsh_tuning"})

# Rows-only window allowance: EMPTY this round — all 11 rows-only-by-design
# slugs collected their driver rows>0 evidence in the round-8 window, and
# every round-9 window slug is hash-oracled.
ROWS_ONLY_R09: frozenset[str] = frozenset()


def _rotated(mapping):
    """Window slugs first (in DRIVER_WINDOW order), then the R10_QUEUE
    overflow (next round's window head), rest in registration order.
    Applied identically to queries and oracles so the driver's
    side-by-side compare sees one consistent ordering."""
    head = {s: mapping[s] for s in DRIVER_WINDOW + R10_QUEUE if s in mapping}
    tail = {s: fn for s, fn in mapping.items() if s not in head}
    return {**head, **tail}


def all_queries():
    return _rotated(dict(QUERIES))


def all_oracles():
    return _rotated(dict(ORACLES))
