"""Round-5 retrieval/serving additions: RRF hybrid fusion, integer
NDCG@10, interval-union coverage, and token-entropy quality signal.

Value correctness is carried by the DuckDB hash oracles (driver_sim /
driver); these tests pin cross-query RELATIONSHIPS and metric-domain
invariants the per-query oracles cannot see.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from nomad_event_streamer_spark.plans import QUERIES
from nomad_event_streamer_spark.plans.retrieval_queries import (
    _IDCG_PREFIX,
    _NDCG_K,
    _NDCG_N_QUERIES,
    _RRF_K,
    _RRF_SCALE,
)
from nomad_event_streamer_spark.plans.analytics_queries import _SESSION_US


# ---------------------------------------------------------------------------
# q_rrf_fusion
# ---------------------------------------------------------------------------


def test_rrf_scores_reconstruct_from_input_lists(spark, sf_dir):
    """Every fused score must equal the sum of the per-list RRF masses
    implied by the lexical list (q_search_topk's exact ranks) — i.e.
    fusion adds no mass of its own: a doc in the lexical list only at
    rank r contributes exactly 1e6 div (60+r)."""
    fused = {
        (r["query_id"], r["doc_id"]): r
        for r in QUERIES["q_rrf_fusion"](spark, sf_dir).collect()
    }
    lex = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in QUERIES["q_search_topk"](spark, sf_dir).collect()
    }
    assert set(lex) <= set(fused)  # lexical hits all survive fusion
    for key, r in fused.items():
        assert r["n_lists"] in (1, 2)
        lex_mass = _RRF_SCALE // (_RRF_K + lex[key]) if key in lex else 0
        sem_mass = r["rrf_micro"] - lex_mass
        if key in lex and r["n_lists"] == 1:
            assert sem_mass == 0
        else:
            # the residual must be a legal rank-1..5 semantic mass
            legal = {_RRF_SCALE // (_RRF_K + i) for i in range(1, 6)}
            assert sem_mass in legal


def test_rrf_ranks_dense_per_query(spark, sf_dir):
    rows = QUERIES["q_rrf_fusion"](spark, sf_dir).collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["fused_rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        # two top-5 lists can fuse to at most 10 distinct docs
        assert 5 <= len(ranks) <= 10


# ---------------------------------------------------------------------------
# q_ndcg_int
# ---------------------------------------------------------------------------


def test_ndcg_domain_and_bounds(spark, sf_dir):
    rows = QUERIES["q_ndcg_int"](spark, sf_dir).collect()
    assert len(rows) == _NDCG_N_QUERIES
    for r in rows:
        assert 0 <= r["n_rel_ret"] <= _NDCG_K
        assert r["n_rel_ret"] <= r["n_rel_total"]
        # DCG cannot exceed the ideal prefix for the available pool
        ideal = _IDCG_PREFIX[min(r["n_rel_total"], _NDCG_K)]
        assert 0 <= r["dcg_micro"] <= ideal
        assert 0 <= r["ndcg_micro"] <= 1_000_000
        if r["n_rel_total"] == 0:
            assert r["ndcg_micro"] == 0 and r["dcg_micro"] == 0


def test_ndcg_perfect_when_all_hits_lead(spark, sf_dir):
    """A query whose top-min(pool,10) retrieved items are ALL relevant
    and contiguous from rank 1 has dcg == idcg -> ndcg == 1e6; verify
    the implication holds on real output (vacuous only if no query
    achieves it, which the scorecard's own n_rel_ret column exposes)."""
    rows = QUERIES["q_ndcg_int"](spark, sf_dir).collect()
    for r in rows:
        m = min(r["n_rel_total"], _NDCG_K)
        if m > 0 and r["dcg_micro"] == _IDCG_PREFIX[m]:
            assert r["ndcg_micro"] == 1_000_000


# ---------------------------------------------------------------------------
# q_interval_union
# ---------------------------------------------------------------------------


def test_interval_union_coverage_bounds(spark, sf_dir):
    from nomad_event_streamer_spark.tables import load

    rows = QUERIES["q_interval_union"](spark, sf_dir).collect()
    # every event lands in exactly one island of exactly one user
    total_events = sum(r["n_events"] for r in rows)
    assert total_events == load(spark, sf_dir, "events").count()
    for r in rows:
        # each island covers at least one padded interval, at most all
        assert r["n_islands"] >= 1
        assert r["n_islands"] <= r["n_events"]
        assert r["covered_us"] >= _SESSION_US
        assert r["covered_us"] <= r["n_events"] * _SESSION_US
        assert _SESSION_US <= r["max_island_us"] <= r["covered_us"]


def test_interval_union_merging_actually_merges(spark, sf_dir):
    """If padding never overlapped, covered == n_events * SESSION_US for
    every user; real clickstreams overlap, so total coverage must be
    strictly below the unmerged sum (else the merge is a no-op)."""
    rows = QUERIES["q_interval_union"](spark, sf_dir).collect()
    unmerged = sum(r["n_events"] for r in rows) * _SESSION_US
    merged = sum(r["covered_us"] for r in rows)
    assert merged < unmerged


# ---------------------------------------------------------------------------
# q_token_entropy
# ---------------------------------------------------------------------------


def test_token_entropy_domain(spark, sf_dir):
    rows = QUERIES["q_token_entropy"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_tokens"]
        assert 0 < r["ttr_milli"] <= 1000
        assert r["bit_entropy"] >= 0
        if r["n_distinct"] == 1:
            assert r["bit_entropy"] == 0
        if r["n_distinct"] == r["n_tokens"]:
            assert r["ttr_milli"] == 1000


def test_token_entropy_counts_match_text_stats(spark, sf_dir):
    """n_tokens must agree with the whitespace tokenization every other
    corpus query uses (via a direct recount, not another q_*)."""
    from nomad_event_streamer_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    expected = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in QUERIES["q_token_entropy"](spark, sf_dir).collect()
    }
    assert got == expected
