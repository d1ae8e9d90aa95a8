"""Round-5 retrieval/serving/sketch additions: RRF hybrid fusion,
integer NDCG@10, MMR diversification, interval-union coverage,
token-entropy, HLL sketch Jaccard, priority sampling, cross-split
leakage, KMV distinct, and the dedup yield report.

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
        # ttr_milli = 0 is legal: a doc with n_tokens > 1000*n_distinct
        # (extreme repetition) floors to 0 — the shape the metric flags
        assert 0 <= r["ttr_milli"] <= 1000
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


# ---------------------------------------------------------------------------
# q_sketch_jaccard
# ---------------------------------------------------------------------------


def test_sketch_jaccard_pairs_and_domains(spark, sf_dir):
    from nomad_event_streamer_spark.tables import load

    rows = QUERIES["q_sketch_jaccard"](spark, sf_dir).collect()
    n_sources = (
        load(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 <= r["n_inter"] <= r["n_union"]
        assert 0 <= r["jaccard_milli"] <= 1000
        # union registers are element-wise max -> union estimate can
        # never fall below either side's estimate
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-9
        assert r["n_filled_union"] >= 1


def test_sketch_jaccard_tracks_exact(spark, sf_dir):
    """The m=256 sketch estimate must stay within a coarse error band
    of the exact Jaccard (each HLL estimate carries ~1.04/sqrt(256)
    ~ 6.5% relative error; inclusion-exclusion of three estimates
    amplifies it, so the band is wide but must NOT be vacuous)."""
    rows = QUERIES["q_sketch_jaccard"](spark, sf_dir).collect()
    worst = max(
        abs(r["jaccard_est"] * 1000 - r["jaccard_milli"]) for r in rows
    )
    assert worst < 400, worst


# ---------------------------------------------------------------------------
# q_mmr_rerank
# ---------------------------------------------------------------------------


def test_mmr_trajectory_shape_and_monotonicity(spark, sf_dir):
    from nomad_event_streamer_spark.plans.retrieval_queries import (
        _MMR_PICKS,
        _SEM_QUERY_IDS,
    )

    rows = QUERIES["q_mmr_rerank"](spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(_SEM_QUERY_IDS)
    for q, picks in by_q.items():
        picks.sort(key=lambda r: r["pick_rank"])
        assert [p["pick_rank"] for p in picks] == list(
            range(1, _MMR_PICKS + 1)
        )
        # picks are distinct documents
        assert len({p["doc_id"] for p in picks}) == _MMR_PICKS
        # from pick 2 on, the pool shrinks and each candidate's
        # maxsim-to-selected only grows, so greedy scores are
        # non-increasing.  (Pick 1 is excluded: it pays no diversity
        # term, and cosine maxsim can be NEGATIVE, so pick 2's
        # 7*rel - 3*maxsim may legitimately exceed 7*rel_top1.)
        scores = [p["mmr10_micro"] for p in picks[1:]]
        assert scores == sorted(scores, reverse=True), (q, scores)
        # first pick pays no diversity penalty (maxsim can also be 0
        # for later picks when the max cosine to the selected set
        # quantizes to 0 — the arithmetic identity below is the real
        # invariant)
        assert picks[0]["maxsim_micro"] == 0
        # arithmetic consistency of every emitted margin
        for p in picks:
            assert (
                p["mmr10_micro"]
                == 7 * p["rel_micro"] - 3 * p["maxsim_micro"]
            )


def test_mmr_first_pick_is_semantic_top1(spark, sf_dir):
    """Pick 1 must be the plain relevance argmax — MMR only reshuffles
    subsequent picks."""
    from nomad_event_streamer_spark.plans.retrieval_queries import (
        _SEM_ANCHOR_OFFSET,
        _SEM_QUERY_IDS,
    )
    from nomad_event_streamer_spark.operators import similarity
    from nomad_event_streamer_spark.tables import load, rebalance_for_cpu

    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    anchors = vecs.where(
        F.col("vec_id").isin(
            [q + _SEM_ANCHOR_OFFSET for q in _SEM_QUERY_IDS]
        )
    )
    top1 = {
        r["query_id"] - _SEM_ANCHOR_OFFSET: r["neighbor_id"]
        for r in similarity.cosine_topk_quantized(
            vecs, anchors, k=1
        ).collect()
    }
    got = {
        r["query_id"]: r["doc_id"]
        for r in QUERIES["q_mmr_rerank"](spark, sf_dir).collect()
        if r["pick_rank"] == 1
    }
    assert got == top1


def test_interval_union_matches_bruteforce_on_adversarial_grid(
    spark, tmp_path
):
    """Seeded randomized cross-check of the merge semantics against a
    Python brute force, on a grid designed to hit the boundary cases
    the real corpus rarely produces: duplicate timestamps, and starts
    landing EXACTLY on a previous interval's half-open end (touching
    intervals must merge — [0,300) U [300,600) is contiguous)."""
    import random

    from nomad_event_streamer_spark.plans.analytics_queries import (
        _SESSION_US,
    )

    rng = random.Random(20260814)
    rows = []
    eid = 0
    for user in range(12):
        for _ in range(rng.randint(1, 40)):
            # steps of exactly half / one / two session lengths force
            # overlap, exact-touch, and gap cases; duplicates included
            ts_us = rng.randint(0, 8) * (_SESSION_US // 2)
            rows.append(
                (eid, ts_us * 1000, user, "view", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    df.coalesce(1).write.parquet(str(tmp_path / "sf" / "events.parquet"))

    got = {
        r["user_id"]: r
        for r in QUERIES["q_interval_union"](spark, sf).collect()
    }

    by_user: dict[int, list[int]] = {}
    for _, ts_ns, user, *_ in rows:
        by_user.setdefault(user, []).append(ts_ns // 1000)
    for user, starts in by_user.items():
        islands = []
        for s in sorted(starts):
            e = s + _SESSION_US
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        r = got[user]
        assert r["n_islands"] == len(islands), user
        assert r["covered_us"] == sum(e - s for s, e in islands)
        assert r["max_island_us"] == max(e - s for s, e in islands)
        assert r["n_events"] == len(starts)


def test_quantized_cosine_oracle_fragments_in_lockstep():
    """The quantized-cosine scoring expression exists in more than one
    oracle string (q_sim_topk_int's driver-proven original, and the
    retrieval family's _sem_topk_cte reuse).  A rounding / tiebreak /
    zero-norm policy edit that misses one copy would silently break a
    hash oracle — pin that the canonical fragments are textually
    identical (modulo whitespace) across every oracle that embeds
    them (code-review r05 finding)."""
    import re

    from nomad_event_streamer_spark.plans import ORACLES

    def norm(s: str) -> str:
        return re.sub(r"\s+", " ", s)

    score_core = norm(
        """CASE WHEN sqrt(list_dot_product(qv, qv))
                 * sqrt(list_dot_product(cv, cv)) > 0
            THEN list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(cv, cv)))
            ELSE 0.0 END"""
    )
    quant_core = norm(
        "floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)"
    )
    for slug in ("q_sim_topk_int", "q_rrf_fusion", "q_ndcg_int",
                 "q_mmr_rerank"):
        o = norm(ORACLES[slug])
        assert score_core in o, f"{slug}: scoring fragment drifted"
        assert quant_core in o, f"{slug}: quantization fragment drifted"


# ---------------------------------------------------------------------------
# q_priority_sample
# ---------------------------------------------------------------------------


def test_priority_sample_estimator_and_shape(spark, sf_dir):
    """Duffield-Lund-Thorup invariants: exactly k rows; every sampled
    priority strictly above tau is impossible to check without tau, but
    est = max(w*1e6, tau) implies est_q >= w*1e6 for every row; and the
    estimator's sample-sum must land near the true corpus weight total
    (unbiased; k=32 keeps variance moderate on 500 docs)."""
    from nomad_event_streamer_spark.plans.corpus_queries import (
        _PRIO_K,
        _PRIO_U_MOD,
    )
    from nomad_event_streamer_spark.tables import load

    rows = QUERIES["q_priority_sample"](spark, sf_dir).collect()
    assert len(rows) == _PRIO_K
    assert len({r["doc_id"] for r in rows}) == _PRIO_K
    for r in rows:
        assert 1 <= r["u_micro"] <= _PRIO_U_MOD
        assert r["priority_q"] == (r["w"] * _PRIO_U_MOD) // r["u_micro"]
        assert r["est_w"] >= r["w"]
    true_total = (
        load(spark, sf_dir, "documents")
        .agg(F.sum("n_chars"))
        .collect()[0][0]
    )
    est_total = sum(r["est_w"] for r in rows)
    assert 0.5 * true_total <= est_total <= 2.0 * true_total, (
        est_total,
        true_total,
    )


# ---------------------------------------------------------------------------
# q_split_leakage
# ---------------------------------------------------------------------------


def test_split_leakage_consistent_with_split_and_dedup(spark, sf_dir):
    """Every reported leak must name a genuine test doc and a genuine
    train doc under q_hash_split's exact rule, with a verified
    similarity at or above the 1/2 gate; and its oracle must embed the
    SAME minhash chain as q_dedup_minhash (drift pin, the lockstep
    device)."""
    import re

    from nomad_event_streamer_spark.plans import ORACLES

    split = {
        r["doc_id"]: r["split"]
        for r in QUERIES["q_hash_split"](spark, sf_dir).collect()
    }
    rows = QUERIES["q_split_leakage"](spark, sf_dir).collect()
    assert rows, "synthetic corpus contains near-dups; leakage expected"
    for r in rows:
        assert split[r["test_doc"]] == "test"
        assert split[r["min_train_doc"]] == "train"
        assert 500 <= r["max_jacc_milli"] <= 1000
        assert r["n_train_dups"] >= 1

    def norm(s: str) -> str:
        return re.sub(r"\s+", " ", s)

    # the based/sig/bands chain must be identical (mod whitespace) to
    # the q_dedup_minhash oracle's — seeds, modulus, banding in lockstep
    leak = norm(ORACLES["q_split_leakage"])
    chain = leak[
        leak.index(", based AS") : leak.index("GROUP BY doc_id, seed // 2")
    ]
    assert chain in norm(ORACLES["q_dedup_minhash"]), (
        "minhash chain drifted between q_split_leakage and q_dedup_minhash"
    )


# ---------------------------------------------------------------------------
# q_kmv_distinct
# ---------------------------------------------------------------------------


def test_kmv_estimator_tracks_exact(spark, sf_dir):
    """KMV invariants: n_seen equals the exact distinct count of hash
    values (md5 of distinct users is collision-free at this scale, so
    n_seen == exact_users); for keys with >= k distinct users the
    order-statistic estimate must land within the +-1/sqrt(k-1) ~ 18%
    band scaled to a loose 2-sided factor; below k the estimate is
    exactly the count."""
    from nomad_event_streamer_spark.plans.sketch_queries import _KMV_K

    rows = QUERIES["q_kmv_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_seen"] == r["exact_users"]
        if r["n_seen"] < _KMV_K:
            assert r["h_k"] == 0
            assert r["est_users"] == float(r["n_seen"])
        else:
            assert r["h_k"] > 0
            # 3-sigma-ish band for k=32 order statistics
            assert 0.4 * r["exact_users"] <= r["est_users"] <= 2.5 * (
                r["exact_users"]
            ), (r["event_type"], r["est_users"], r["exact_users"])


# ---------------------------------------------------------------------------
# q_dedup_stats
# ---------------------------------------------------------------------------


def test_dedup_stats_accounts_for_every_document(spark, sf_dir):
    """The yield report must partition the corpus exactly: sum of
    n_docs over bands = corpus size; every band's drop count is
    n_docs - n_clusters; band 1 (singletons) drops nothing; and the
    total cluster count equals distinct components + singletons as
    reported by q_dedup_clusters."""
    from nomad_event_streamer_spark.tables import load

    rows = {
        r["size_bitlen"]: r
        for r in QUERIES["q_dedup_stats"](spark, sf_dir).collect()
    }
    n_corpus = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows.values()) == n_corpus
    for r in rows.values():
        assert r["n_dup_docs"] == r["n_docs"] - r["n_clusters"]
        assert r["size_bitlen"] >= 1
    if 1 in rows:
        # bitlen 1 == size exactly 1: singletons drop nothing
        assert rows[1]["n_dup_docs"] == 0
        assert rows[1]["n_docs"] == rows[1]["n_clusters"]
    comp = QUERIES["q_dedup_clusters"](spark, sf_dir).collect()
    clustered_docs = {r["doc_id"] for r in comp}
    n_components = len({r["cluster_id"] for r in comp})
    singletons = n_corpus - len(clustered_docs)
    assert (
        sum(r["n_clusters"] for r in rows.values())
        == n_components + singletons
    )
