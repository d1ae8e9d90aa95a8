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


# The verification driver records hard CORRECTNESS rows for only the FIRST
# 50 queries in the order ``all_queries()`` yields them.  Rounds 1-2 left the
# window on the early relational/LLM slugs (all driver-PASS in
# CORRECTNESS_r02.json); round 3 rotates it onto the 50 highest-value oracled
# queries that have only driver-sim evidence so far (VERDICT r02 item #1):
# the TPC-H shapes, graph, event analytics, time-series, sketches, and the
# hardest LLM-pipeline operators.  Every slug below is fully hash-oracled
# (present in ORACLES) — no window slot is spent on a rows-only check.
DRIVER_WINDOW: list[str] = [
    # TPC-H shapes (plans/tpch.py, tpch2.py, extras.py) — 20
    "q_sql_tpch_q1",
    "q_sql_tpch_q6",
    "q_sql_tpch_q18",
    "q_tpch_q2_mincost",
    "q_tpch_q4_exists",
    "q_tpch_q7_volume",
    "q_tpch_q8_share",
    "q_tpch_q9_profit",
    "q_tpch_q10_returns",
    "q_tpch_q11_stock",
    "q_tpch_q12_latemode",
    "q_tpch_q13_custdist",
    "q_tpch_q14_promo",
    "q_tpch_q15_topsupp",
    "q_tpch_q16_partsupp",
    "q_tpch_q17_smallqty",
    "q_tpch_q19_disjunctive",
    "q_tpch_q20_promo_supp",
    "q_tpch_q21_waiting",
    "q_tpch_q22_balance",
    # graph (plans/graph_queries.py) — 3
    "q_pagerank",
    "q_triangles",
    "q_bfs_reach",
    # event analytics (plans/analytics_queries.py) — 5
    "q_funnel",
    "q_retention",
    "q_transitions",
    "q_cohort_ltv",
    "q_attribution",
    # time-series (plans/timeseries_queries.py) — 6
    "q_ewma",
    "q_cogroup_asof",
    "q_interpolate",
    "q_rolling_median",
    "q_cusum",
    "q_theil_sen",
    # sketches (plans/sketch_queries.py) — 3
    "q_heavy_hitters",
    "q_hll_registers",
    "q_hll_estimate",
    # LLM-pipeline hard cases (plans/llm_ops.py) — 8
    "q_curation_pipeline",
    "q_pack_sequences",
    "q_dedup_survivorship",
    "q_fuzzy_join",
    "q_inverted_index",
    "q_bm25_lite",
    "q_unigram_surprisal",
    "q_contamination",
    # round-1 scale-killer rewrites + remaining window/join shapes — 4
    "q_dataset_shuffle",
    "q_window_global",
    "q_sessionize",
    "q_asof_join",
    # ANN bucketed path, integer-exact twin (plans/llm_ops.py) — 1
    "q_sim_ann_int",
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
