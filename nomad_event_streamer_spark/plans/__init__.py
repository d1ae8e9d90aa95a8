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
# the early relational/LLM slugs; rounds 3-8 swept the registry family by
# family; round 9 took cumulative hard hash-PASS to 377; round 10 rotated
# onto the 48 round-9 judge-only slugs + 2 new ops (427 cumulative); round
# 11 cleared the overflow queue + 18 new ops + the DECIMAL sweep re-verify
# + an 18-slug stale refresh — with its green window, EVERY oracled slug
# has hard driver evidence (454/454 at the r11 registry).
# Round 12 (VERDICT r11 item #2) rotates onto:
#   1. the 5 NEW round-12 ops, each sim-hash-verified on arrival
#      (capped Adamic-Adar; suffix ranking + maximal repeats by prefix
#      doubling; unigram-LM fit + EM round);
#   2. RE_VERIFY_R12 — 8 slugs whose plan or oracle changed after their
#      PASS: the ADVICE r11 overflow-guard sweep (q_cochran_armitage,
#      q_clustering_coeff, q_mann_whitney_ks, q_wasserstein1), the KM
#      risk-table reformulation (q_survival_km, VERDICT r11 item #3),
#      and the three late-r11 plan changes whose only post-change
#      evidence is the judge's in-session re-run (q_consistent_hash_ring,
#      q_l_moments, q_runs_test — VERDICT r11 item #2);
#   3. STALE_REFRESH_R12 — the remaining 37 slots refresh the slugs
#      with the OLDEST driver evidence (latest hash-PASS row r02/r03) —
#      selection is deterministic: sort by (latest evidence round,
#      registration order), take 37 (test-recomputed in
#      tests/test_driver_window.py).
# A green r12 window retires every r02 row.  Six late round-12 ops
# landed after the window filled (the unigram encode rollup, the
# suffix repeat profile, the DSIR importance weights, the no-straddle
# packing assignment, the rendezvous-hash sharding audit, and the
# PPJoin prefix-filtered similarity join): they queue in R13_QUEUE for
# the r13 window head, each with a hash MATCH row in the committed
# DRIVER_SIM_r12 artifact (the overflow arrival-evidence rule).
# Registry at HEAD: 476 queries / 465 oracled.
# tests/test_driver_window.py pins: the counts in this comment, the
# 50-slug shape, the rows-only allowance (exactly ROWS_ONLY_R12 — empty,
# every window slug is hash-oracled), the overlap rule (already-PASS
# slugs only via RE_VERIFY_R12 or STALE_REFRESH_R12, and stale-refresh
# only fills slots unverified work cannot), and the rotation-
# completeness rule (every slug without cumulative driver evidence must
# sit in the window head or the overflow queue).

# Plan/oracle-changed-after-PASS slugs (round 12; see ledger above).
RE_VERIFY_R12: frozenset[str] = frozenset(
    {
        "q_cochran_armitage",
        "q_clustering_coeff",
        "q_mann_whitney_ks",
        "q_wasserstein1",
        "q_survival_km",
        "q_consistent_hash_ring",
        "q_l_moments",
        "q_runs_test",
    }
)

# Oldest-evidence refresh fill (latest hash-PASS row r02/r03; see rule
# above).  Order matches (evidence round, registration order).
STALE_REFRESH_R12: list[str] = [
    "q_count_distinct",
    "q_agg_rollup",
    "q_window_rank",
    "q_window_lag",
    "q_window_runsum",
    "q_window_runmax",
    "q_join_inner",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_range",
    "q_topk",
    "q_union",
    "q_intersect",
    "q_except",
    "q_dedup_exact",
    "q_simhash",
    "q_text_stats",
    "q_lang_id",
    "q_quality_score",
    "q_token_count",
    "q_fingerprint",
    "q_sim_topk_int",
    "q_embed_norm",
    "q_chunk_docs",
    "q_hash_split",
    "q_dataset_shuffle",
    "q_fuzzy_join",
    "q_pack_sequences",
    "q_contamination",
    "q_unigram_surprisal",
    "q_sim_ann_int",
    "q_bm25_lite",
    "q_sessionize",
    "q_asof_join",
    "q_sql_tpch_q1",
    "q_window_global",
]

DRIVER_WINDOW: list[str] = [
    # 1. new round-12 ops, sim-hash-verified on arrival - 5
    "q_adamic_adar_capped",
    "q_suffix_rank",
    "q_maximal_repeat",
    "q_unigram_lm_fit",
    "q_unigram_lm_em",
    # 2. plan/oracle-changed re-verify (RE_VERIFY_R12) - 8
    "q_cochran_armitage",
    "q_clustering_coeff",
    "q_mann_whitney_ks",
    "q_wasserstein1",
    "q_survival_km",
    "q_consistent_hash_ring",
    "q_l_moments",
    "q_runs_test",
    # 3. oldest-evidence refresh (STALE_REFRESH_R12) - 37
    *STALE_REFRESH_R12,
]

# Round-12 additions past window capacity (see ledger above): next
# round's window head, sim-hash-verified on arrival.
R13_QUEUE: list[str] = [
    "q_unigram_token_count",
    "q_repeat_profile",
    "q_dsir_weights",
    "q_pack_assign",
    "q_rendezvous_hash",
    "q_ppjoin",
]

# Rows-only window allowance: EMPTY — every window slug is hash-oracled.
ROWS_ONLY_R12: frozenset[str] = frozenset()


def _rotated(mapping):
    """Window slugs first (in DRIVER_WINDOW order), then any overflow
    queue (next round's window head), rest in registration order.
    Applied identically to queries and oracles so the driver's
    side-by-side compare sees one consistent ordering."""
    head = {s: mapping[s] for s in DRIVER_WINDOW + R13_QUEUE if s in mapping}
    tail = {s: fn for s, fn in mapping.items() if s not in head}
    return {**head, **tail}


def all_queries():
    return _rotated(dict(QUERIES))


def all_oracles():
    return _rotated(dict(ORACLES))
