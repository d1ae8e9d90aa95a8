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


# The verification driver records hard CORRECTNESS rows for only the FIRST
# 50 queries in the order ``all_queries()`` yields them.  Rounds 1-2 covered
# the early relational/LLM slugs; round 3 covered TPC-H / graph / analytics /
# time-series / sketches / hard LLM ops; round 4 covered storage/CDC, set
# ops, scalar-function and agg/window families; round 5 covered the round-4
# corpus/analytics families plus the promoted IVF/PQ/BPE oracles — 50/50
# PASS, cumulative hard driver-PASS after r05: 196 distinct slugs.
# Round 6 rotates onto 50 of the 65 never-driver-verified hash-oracled
# slugs (VERDICT r05 item #1), leading with the round-5 retrieval/eval +
# sketch families and the streaming-oracled family (all sim-matched under
# the driver's own canonicalization gate, never seen by the real driver).
# The 17 deferred slugs — the extras.py scalar/window/setop family
# (q_window_ntile, q_first_last, q_window_range, q_window_misc,
# q_stack_inline, q_ratio_to_report, q_unpivot, q_cross_join_grid,
# q_subquery_scalar, q_subquery_correlated, q_skew_join_salted,
# q_webhook_payload, q_zscore, q_winsorize, q_corr) plus the two queries
# promoted from rows-only THIS round (q_bpe_token_count,
# q_stream_nomad_pipeline — VERDICT r05 item #4) — are round 7's
# remainder, after which every oracled slug has a hard driver row.
# Every slug below is hash-oracled — no window slot is spent on a
# rows-only check.  Registry at HEAD: 294 queries / 283 oracled.
# (Round-6 additions q_theta_intersect / q_theta_anotb / q_dedup_bloom /
# q_stream_session_dedup / q_image_resize / q_hashtext_classify /
# q_ivf_append / q_stream_late_metrics / q_stupid_backoff /
# q_chunk_sliding / q_lsh_tuning / q_ks_test / q_quantile_normalize /
# q_bpe_fertility / q_embed_drift / q_dataset_card / q_cdc_time_travel /
# q_audio_resample / q_asof_forward / q_csv_roundtrip join the
# never-verified pool for round 7.)
# Cumulative driver-PASS target after this window: 246.
# tests/test_driver_window.py::test_ledger_comment_matches_registry
# pins these counts so this comment can never go stale again.
DRIVER_WINDOW: list[str] = [
    # round-5 retrieval / eval serving family (retrieval_queries.py,
    # corpus_queries.py) — 8
    "q_rrf_fusion",
    "q_ndcg_int",
    "q_mmr_rerank",
    "q_knn_eval",
    "q_eval_auc",
    "q_calibration",
    "q_token_entropy",
    "q_priority_sample",
    # round-5 sketch family (sketch_queries.py, analytics_queries.py) — 4
    "q_sketch_jaccard",
    "q_kmv_distinct",
    "q_tdigest_int",
    "q_tdigest_merge",
    # round-5 dedup / similarity additions — 10
    "q_semdedup",
    "q_label_prop",
    "q_split_leakage",
    "q_dedup_stats",
    "q_dedup_eval",
    "q_sim_ivfpq_int",
    "q_sim_recall_ivf",
    "q_exactsubstr_cluster",
    "q_interval_union",
    "q_pca_power_int",
    # streaming-oracled family (streaming_queries.py) — never driver-seen,
    # sim-matched since r04 — 12
    "q_stream_agg",
    "q_stream_window",
    "q_stream_sliding",
    "q_stream_session_window",
    "q_stream_static_join",
    "q_stream_dedup_state",
    "q_stream_stream_join",
    "q_stream_cdc_snapshot",
    "q_stream_replay_throttled",
    "q_statestore_read",
    "q_stream_topk",
    "q_stream_dedup_lsh",
    # LLM-pipeline / corpus ops never driver-seen (llm_ops.py,
    # advanced.py) — 11
    "q_multimodal_frames",
    "q_bpe_pretokenize",
    "q_ngram_freq",
    "q_cooccurrence_pmi",
    "q_quality_funnel",
    "q_repetition_signals",
    "q_dedup_clusters_star",
    "q_embed_dim_stats",
    "q_udtf_bigrams",
    "q_tfidf_top3",
    "q_minhash_est",
    # extras profiling family never driver-seen — 5
    "q_data_profile",
    "q_outlier_iqr",
    "q_pandas_udaf",
    "q_quantile_hist",
    "q_quality_checks",
]


def _rotated(mapping):
    """Window slugs first (in DRIVER_WINDOW order), rest in registration
    order.  Applied identically to queries and oracles so the driver's
    side-by-side compare sees one consistent ordering."""
    head = {s: mapping[s] for s in DRIVER_WINDOW if s in mapping}
    tail = {s: fn for s, fn in mapping.items() if s not in head}
    return {**head, **tail}


def all_queries():
    return _rotated(dict(QUERIES))


def all_oracles():
    return _rotated(dict(ORACLES))
