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
# Round 9's window went 50/50 hash-green (CORRECTNESS_r09.json), taking
# cumulative hard driver hash-PASS to 377.  Round 10 (VERDICT r09 item
# #3) rotates the window onto the 48 round-9/9b/9c slugs whose only hash
# evidence so far is the judge's r09 oracle session (the R10 overflow
# queue, below renamed into the window) plus the TWO new round-10 ops
# (q_image_dhash_pairs, q_audio_goertzel — hash-oracled on arrival,
# DRIVER_SIM_r10) — a green r10 window makes the cumulative hard driver
# hash-PASS ledger cover all 427 oracled slugs.
# Registry at HEAD: 447 queries / 436 oracled.
# Round-10 additions past window capacity follow the same overflow ledger
# discipline in R11_QUEUE below: ordered immediately AFTER the window in
# all_queries(), each sim-hash-verified on arrival, first in line for the
# r11 window rotation.
# tests/test_driver_window.py pins: the counts in this comment, the
# 50-slug shape, the rows-only allowance (exactly ROWS_ONLY_R10 — empty,
# every window slug is hash-oracled), the no-re-verify rule (exception:
# RE_VERIFY_R10 — empty this round), and the rotation-completeness rule
# (every slug without cumulative driver evidence must sit in the window
# head or the overflow queue).
DRIVER_WINDOW: list[str] = [
    # round-9/9b/9c overflow queue, sim- and judge-verified r09,
    # never driver-seen - 48
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
    # new round-10 ops, sim-hash-verified on arrival (DRIVER_SIM_r10) - 2
    "q_image_dhash_pairs",
    "q_audio_goertzel",
]

# Round-10 additions past window capacity: the documented overflow queue.
# Every member must carry committed sim hash evidence (DRIVER_SIM) and is
# rotated into the NEXT round's driver window ahead of newer work.
R11_QUEUE: list[str] = [
    "q_kmeans_lloyd",
    "q_readability_fk",
    "q_log_parse",
    "q_diff_in_diff",
    "q_sprt_boundary",
    "q_viterbi_2state",
    "q_isotonic_pav",
    "q_mann_whitney_ks",
    "q_wasserstein1",
]

# Round-10 re-verification allowance: EMPTY — no previously driver-PASSed
# slug changed its optimized plan this round (the ADVICE r09 guard fixes
# touch q_anova_f / q_hilbert_cluster / grid_components, all of which sit
# IN this window for their first driver pass, so their refreshed oracles
# get hard evidence directly).
RE_VERIFY_R10: frozenset[str] = frozenset()

# Rows-only window allowance: EMPTY this round — every window slug is
# hash-oracled (the 11 rows-only-by-design slugs keep their r08 driver
# rows>0 evidence; the set stays closed).
ROWS_ONLY_R10: frozenset[str] = frozenset()


def _rotated(mapping):
    """Window slugs first (in DRIVER_WINDOW order), then the R11_QUEUE
    overflow (next round's window head), rest in registration order.
    Applied identically to queries and oracles so the driver's
    side-by-side compare sees one consistent ordering."""
    head = {s: mapping[s] for s in DRIVER_WINDOW + R11_QUEUE if s in mapping}
    tail = {s: fn for s, fn in mapping.items() if s not in head}
    return {**head, **tail}


def all_queries():
    return _rotated(dict(QUERIES))


def all_oracles():
    return _rotated(dict(ORACLES))
