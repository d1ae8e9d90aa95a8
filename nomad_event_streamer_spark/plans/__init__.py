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


# The verification driver records hard CORRECTNESS rows for only the FIRST
# 50 queries in the order ``all_queries()`` yields them.  Rounds 1-2 covered
# the early relational/LLM slugs; round 3 covered TPC-H / graph / analytics /
# time-series / sketches / hard LLM ops (48 PASS + the 2 array-output FAILs).
# Round 4 rotates onto the next 50 never-driver-verified slugs (VERDICT r03
# item #3) and KEEPS the two r03 FAILs in the window — a FAIL must be
# re-proven at the real driver after the fix, not just in driver_sim.
# Every slug below is fully hash-oracled (present in ORACLES) — no window
# slot is spent on a rows-only check.  Cumulative driver-PASS target after
# this window: >= 144 distinct slugs.  (The registry grew to 239 during
# round 4 — the 29 new operators have never been driver-verified and are
# next in line when the window rotates in round 5.)
DRIVER_WINDOW: list[str] = [
    # r03 FAILs, fixed this round (array outputs stringified) — 2
    "q_dedup_survivorship",
    "q_inverted_index",
    # storage / CDC / sink family (plans/cdc.py, storage_queries.py) — 11
    "q_cdc_snapshot",
    "q_partitioned_sink_prune",
    "q_scd2_merge",
    "q_dpp_prune",
    "q_custom_sink_roundtrip",
    "q_range_sorted_sink",
    "q_zorder_sink",
    "q_bloom_prune_join",
    "q_incremental_agg",
    "q_compact_small_files",
    "q_variant_extract",
    # round-3 additions, never driver-seen (plans/llm_ops.py, advanced.py) — 6
    "q_containment",
    "q_simhash_pairs",
    "q_chunk_cdc",
    "q_drift_chi2",
    "q_l_diversity",
    "q_dedup_embed_int",
    # set operations (plans/extras.py) — 3
    "q_intersect_all",
    "q_except_all",
    "q_join_full",
    # join shapes (plans/extras.py, advanced.py) — 3
    "q_join_hint_smj",
    "q_star_join",
    "q_join_agg_topk",
    # scalar-function families (plans/extras.py) — 16
    "q_map_funcs",
    "q_regex_extract",
    "q_null_funcs",
    "q_bitwise",
    "q_stats_moments",
    "q_string_pad",
    "q_array_funcs",
    "q_date_breadth",
    "q_like_family",
    "q_try_funcs",
    "q_struct_json",
    "q_explode_outer",
    "q_map_transform",
    "q_argmax",
    "q_count_distinct_multi",
    "q_percentile_cont",
    # aggregation / window shapes (plans/advanced.py, extras.py) — 9
    "q_grouping_sets",
    "q_percentile_disc",
    "q_string_agg",
    "q_gapfill_hours",
    "q_histogram",
    "q_pivot_counts",
    "q_cube",
    "q_conditional_agg",
    "q_collect_set",
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
