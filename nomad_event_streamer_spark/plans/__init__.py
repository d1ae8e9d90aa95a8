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
# ops, scalar-function and agg/window families plus the two re-proven r03
# FAILs — cumulative hard driver-PASS after r04: 146 distinct slugs.
# Round-4 ledger correction (ADVICE r04): the registry reached 249 (not
# 239) during round 4 — 34 new operators, not 29; all 34 are in the
# never-verified pool this rotation draws from, so none were skipped.
# Round 5 rotates onto the next 50 never-driver-verified slugs (VERDICT
# r04 item #1), prioritizing the round-4 corpus/analytics families that
# have never seen the real driver, plus the three queries that gained
# full hash oracles THIS round (q_sim_ivf_int / q_sim_pq_int — VERDICT
# item #4 reserved their slots — and q_bpe_train, upgraded from
# rows-only by item #5).  Every slug below is hash-oracled — no window
# slot is spent on a rows-only check.  Registry at HEAD: 274 queries /
# 261 oracled (the round-5 additions after the rotation was drafted —
# q_exactsubstr_cluster, q_tdigest_int, q_stream_dedup_lsh,
# q_sim_ivfpq_int, q_semdedup, q_label_prop, q_knn_eval, q_eval_auc,
# q_calibration, q_sim_recall_ivf, q_dedup_eval, q_pca_power_int,
# q_tdigest_merge, q_rrf_fusion, q_ndcg_int, q_interval_union,
# q_token_entropy, q_sketch_jaccard, q_mmr_rerank, q_priority_sample,
# q_split_leakage, q_kmv_distinct, q_dedup_stats — join the
# never-verified pool); cumulative driver-PASS target after this
# window: 196.  Round 6's rotation then covers the remaining 65
# never-driver-verified hash-oracled slugs.
# tests/test_driver_window.py::test_ledger_comment_matches_registry
# pins these counts so this comment can never go stale again.
DRIVER_WINDOW: list[str] = [
    # new full-hash oracles this round — 3
    "q_sim_ivf_int",
    "q_sim_pq_int",
    "q_bpe_train",
    # round-4 corpus-hygiene family (plans/corpus_queries.py) — 15
    "q_exactsubstr_cut",
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
    "q_benford_audit",
    "q_trigram_join",
    # corpus search / sketch / sampling (corpus_queries.py, extras.py) — 8
    "q_search_topk",
    "q_knn_classify",
    "q_countmin",
    "q_bootstrap_ci",
    "q_skyline",
    "q_weighted_median",
    "q_orc_roundtrip",
    "q_bucketed_join",
    # analytics family (plans/analytics_queries.py) — 11
    "q_gini",
    "q_lorenz",
    "q_stickiness",
    "q_path_topk",
    "q_burstiness",
    "q_abandonment",
    "q_time_to_convert",
    "q_mad_outliers",
    "q_heaps_law",
    "q_autocorr",
    "q_seasonal_index",
    # round-4 dedup/chunking/similarity additions — 9
    "q_chunk_gear",
    "q_dup_spans",
    "q_dup_span_lengths",
    "q_containment_minhash",
    "q_packing_efficiency",
    "q_dedup_incremental",
    "q_gram_int",
    "q_sim_recall",
    "q_k_anonymity",
    # LLM-pipeline ops never driver-seen (plans/llm_ops.py) — 4
    "q_vocab_topk",
    "q_mix_budget",
    "q_stratified_sample",
    "q_dedup_decision",
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
