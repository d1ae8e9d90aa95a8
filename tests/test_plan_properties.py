"""Physical-plan regression tests: the SCALE.md plan-audit claims, pinned.

A refactor that silently drops a pushdown, un-broadcasts a dimension, or
de-pins the jaccard join strategy would pass every value-correctness test
while regressing 100 TB behavior — these assertions catch that class.
"""

from __future__ import annotations

import pytest

from nomad_event_streamer_spark.plans import all_queries

QUERIES = all_queries()


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_scan_project")
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)" in plan
    # projection pruned to exactly the 5 selected columns
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,"
        "l_linenumber:int,l_quantity:double,l_extendedprice:double>" in plan
    )
    assert "l_comment" not in plan


def test_dim_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_star_join")
    assert plan.count("BroadcastHashJoin") >= 2  # region + nation at minimum
    assert "CartesianProduct" not in plan


def test_aggregates_are_partial(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_agg_groupby")
    # partial (map-side) + final aggregation around one exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_topk_never_global_sorts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_jaccard_join_strategy_pinned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_ngram_jaccard")
    assert "ShuffledHashJoin" in plan
    # the fact-sized shingle side must never route through the driver
    assert "BroadcastHashJoin [shash" not in plan


def _partitionless_window_specs(df) -> list[str]:
    """Window nodes whose partition spec is empty — the single-task,
    all-rows-to-one-executor shape that dies at scale.  Detected on the
    OPTIMIZED logical plan, where `windowspecdefinition(<sort>, ...)`
    with no leading partition columns is textually identifiable."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    out = []
    for line in plan.splitlines():
        if "windowspecdefinition(" not in line:
            continue
        spec = line.split("windowspecdefinition(", 1)[1]
        # partition cols precede the first "ASC NULLS"/"DESC NULLS" sort
        # token; an empty partition list starts straight at a sort item.
        head = spec.split(",", 1)[0]
        if " ASC" in head or " DESC" in head:
            out.append(line.strip())
    return out


@pytest.mark.parametrize(
    "name",
    [
        "q_dataset_shuffle",
        "q_window_global",
        "q_pack_sequences",
        "q_zipf_slope",
        "q_skyline",
    ],
)
def test_no_partitionless_window(spark, sf_dir, name):
    """The global-order queries must use the bucketed prefix-sum — any
    partitionless window over the driver-size (<=64-row) offset table is
    fine, but none may touch the full-size input.  We assert the offset
    window is the ONLY one: its frame is the distinctive
    `unboundedpreceding$(), -1` offset-accumulation frame."""
    df = QUERIES[name](spark, sf_dir)
    # The bucket-offset accumulation frame is exactly
    # `specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)` — match
    # the full signature, not a bare "-1" substring (a sort expression
    # containing a -1 literal must NOT be exempted).
    offset_frame = "specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)"
    bad = [w for w in _partitionless_window_specs(df) if offset_frame not in w]
    assert not bad, f"full-input partitionless window in {name}: {bad}"


def test_path_topk_window_is_bounded(spark, sf_dir):
    """q_path_topk's rank window IS partitionless, but its input is the
    10 survivors of ``orderBy(...).limit(10)`` — physically a
    TakeOrderedAndProject (per-partition heap, driver merge of 10 rows),
    never a global sort.  Pin both: the limit sits BELOW the window in
    the optimized plan (bounded input) and the physical top-k is the
    heap-based operator."""
    df = QUERIES["q_path_topk"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit 10" in opt
    assert opt.index("Window") < opt.index("GlobalLimit"), (
        "limit must bound the window input"
    )
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    assert "Exchange rangepartitioning" not in phys


@pytest.mark.parametrize(
    "name",
    [
        "q_triangles",
        "q_fuzzy_join",
        "q_funnel",
        "q_bfs_reach",
        # round-3/4 pair-generating ops
        "q_containment",
        "q_simhash_pairs",
        "q_containment_minhash",
        "q_dup_span_lengths",
        "q_chunk_gear",
        # round-4 corpus-hygiene ops (digest / bigram / shingle-keyed joins)
        "q_chunk_dedup",
        "q_bigram_surprisal",
        "q_ngram_novelty",
        # banded interval join: bucket equi-join, never the θ-join
        "q_interval_join",
        # ExactSubstr rewrite: span-digest join + doc-local region mask
        "q_exactsubstr_cut",
        # trigram similarity join: shared-trigram equi-join candidates
        "q_trigram_join",
    ],
)
def test_round2_ops_no_cartesian(spark, sf_dir, name):
    """The pair-generating operators must stay equi-join shaped:
    triangle wedges join on the middle vertex, fuzzy candidates on the
    deletion variant, funnel stages on user_id, BFS frontiers on the
    vertex, containment/simhash candidates on shingle/block keys,
    sketch-containment candidates on LSH buckets — a CartesianProduct/
    BroadcastNestedLoop anywhere means the bucketing degenerated to
    all-pairs."""
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_no_exchange(spark, sf_dir):
    """The bucketed co-located join must read ``Bucketed: true`` scans
    and run the join with ZERO Exchange below the aggregation — the
    storage-layout shuffle elimination q_bucketed_join exists to prove.
    Broadcast/AQE are disabled for the assertion so the plan cannot
    sidestep the bucketing (a broadcast join would also be
    exchange-free, but for the wrong reason)."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = QUERIES["q_bucketed_join"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert plan.count("Bucketed: true") == 2, plan
    join_subtree = plan[plan.index("SortMergeJoin"):]
    # one Exchange is legal ABOVE the join (the groupBy re-partition);
    # below the join there must be none — the scans arrive co-located.
    assert "Exchange" not in join_subtree, join_subtree[:2000]


def test_funnel_aggregates_partial(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_funnel")
    # every stage min() is map-side combined before its exchange
    assert plan.count("HashAggregate") >= 2


def test_asof_join_is_windowed_not_joined(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_asof_join")
    assert "Window" in plan
    for join_node in ["SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"]:
        assert join_node not in plan


@pytest.mark.parametrize(
    "name",
    [
        # round-5 retrieval/serving + coverage ops: every window must be
        # key-partitioned (query_id / user_id) — none of these uses the
        # bucketed-prefix-sum offset device, so the partitionless-window
        # list must be EMPTY outright.
        "q_rrf_fusion",
        "q_ndcg_int",
        "q_mmr_rerank",
        "q_interval_union",
    ],
)
def test_round5_windows_all_partitioned(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    bad = _partitionless_window_specs(df)
    assert not bad, f"partitionless window in {name}: {bad}"


def test_sketch_jaccard_value_joins_stay_equi(spark, sf_dir):
    """q_sketch_jaccard's only value-sized join (the exact-Jaccard
    distinct-token intersection) must be a token equi-join; the
    source-pair grid is a broadcast of a source-cardinality relation
    (the accepted crossJoin(broadcast) scalar-grid pattern), but a
    CartesianProduct anywhere means a value-sized side degenerated."""
    plan = plan_of(spark, sf_dir, "q_sketch_jaccard")
    assert "CartesianProduct" not in plan


def test_token_entropy_aggregates_partial(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_token_entropy")
    # (doc_id, tok) count then per-doc fold: both map-side combined
    assert plan.count("HashAggregate") >= 4


@pytest.mark.parametrize(
    "name",
    [
        # round-5 eval / dedup / sketch family (VERDICT r05 item #5):
        # every value-sized join must stay key-shaped.  Several of these
        # use the accepted crossJoin(F.broadcast(<1-row scalar>)) device,
        # which plans as BroadcastNestedLoopJoin — so the pin here is
        # no CartesianProduct (an unmarked all-pairs join).
        "q_knn_eval",
        "q_eval_auc",
        "q_calibration",
        "q_semdedup",
        "q_label_prop",
        "q_tdigest_int",
        "q_tdigest_merge",
        "q_kmv_distinct",
        "q_split_leakage",
        "q_dedup_stats",
        "q_dedup_eval",
        "q_exactsubstr_cluster",
        "q_rrf_fusion",
        "q_ndcg_int",
        "q_mmr_rerank",
        "q_priority_sample",
        "q_token_entropy",
        "q_interval_union",
        "q_sim_ivfpq_int",
        "q_sim_recall_ivf",
        # round-6 additions: sketch-pair grid and Bloom bit lookups must
        # stay broadcast-shaped
        "q_theta_intersect",
        "q_theta_anotb",
        "q_dedup_bloom",
        "q_hashtext_classify",
        "q_ivf_append",
        "q_image_resize",
        "q_stupid_backoff",
        "q_chunk_sliding",
        "q_lsh_tuning",
        "q_ks_test",
        "q_embed_drift",
        "q_dataset_card",
        "q_quantile_normalize",
        "q_bpe_fertility",
    ],
)
def test_round5_ops_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_knn_eval_confusion_grid_is_broadcast(spark, sf_dir):
    """q_knn_eval's confusion-matrix grid is pred × distinct-classes —
    bounded (labels × 100 eval queries) but previously an unmarked
    crossJoin (VERDICT r05 item #3 'what's wrong').  Pin the fix: the
    grid is a BroadcastNestedLoopJoin building the classes side, and
    nothing in the plan is a CartesianProduct."""
    plan = plan_of(spark, sf_dir, "q_knn_eval")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin BuildRight" in plan


def test_priority_sample_topk_is_heap_bounded(spark, sf_dir):
    """q_priority_sample's global top-(k+1) must be the heap-based
    TakeOrderedAndProject (per-partition heaps, driver merge of 33
    rows) — never a range-partitioned global sort; the follow-up rank
    window is partitionless but runs over the 33 bounded survivors
    (the q_path_topk pattern)."""
    df = QUERIES["q_priority_sample"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit 33" in opt
    assert opt.index("Window") < opt.index("GlobalLimit"), (
        "limit must bound the window input"
    )
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    assert "Exchange rangepartitioning" not in phys


ROUND7_OPS = [
    "q_eval_mcc",
    "q_eval_kappa",
    "q_card_dedup_yield",
    "q_perplexity_buckets",
    "q_embed_lsh_tuning",
    "q_kcore",
]


@pytest.mark.parametrize("name", ROUND7_OPS)
def test_round7_ops_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_eval_mcc_confusion_grid_is_broadcast(spark, sf_dir):
    """q_eval_mcc inherits q_knn_eval's pinned posture: the per-class
    confusion grid is a BroadcastNestedLoopJoin building the ~10-class
    side, never a CartesianProduct."""
    plan = plan_of(spark, sf_dir, "q_eval_mcc")
    assert "BroadcastNestedLoopJoin BuildRight" in plan


def test_eval_kappa_crosses_are_broadcast(spark, sf_dir):
    """q_eval_kappa's 1x1 overall-by-sum_pt combination must be a
    broadcast nested loop (both sides single-row aggregates), and the
    label-keyed pc x tc join stays an equi hash join."""
    plan = plan_of(spark, sf_dir, "q_eval_kappa")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_perplexity_buckets_window_is_lang_partitioned(spark, sf_dir):
    """The ntile quartile window must be partitioned by lang — a
    partitionless global rank here would single-task the corpus at
    scale (the class of shape test_no_partitionless_window exists
    for)."""
    df = QUERIES["q_perplexity_buckets"](spark, sf_dir)
    specs = _partitionless_window_specs(df)
    assert not specs, f"partitionless window in q_perplexity_buckets: {specs}"


def test_embed_lsh_tuning_planes_are_broadcast(spark, sf_dir):
    """The plane table (tables x planes x dims literals) and the 3-row
    config relation must both ride broadcast joins; the candidate
    bucket join stays an equi join on (t, bucket)."""
    plan = plan_of(spark, sf_dir, "q_embed_lsh_tuning")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kcore_peel_joins_are_semi(spark, sf_dir):
    """Each peel round thins the edge list with LEFT SEMI joins on the
    node key — an inner-join materialization of neighborhoods would
    change the complexity class on dense graphs.  The full loop's
    checkpoints hide round internals from the final executed plan, so
    the pin targets one round via the _peel_once seam."""
    import pyspark.sql.functions as F

    from nomad_event_streamer_spark.operators.graph import _peel_once

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "s long, d long"
    )
    plan = (
        _peel_once(e, 2)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("LeftSemi") == 2
    assert "CartesianProduct" not in plan
    # and the degree aggregation is map-side partial
    assert plan.count("HashAggregate") >= 2


ROUND7B_OPS = [
    "q_recursive_cte",
    "q_lateral_topk",
    "q_null_safe_join",
    "q_sql_udf",
    "q_pipe_syntax",
    "q_collation_filter",
    "q_pr_curve",
]


@pytest.mark.parametrize("name", ROUND7B_OPS)
def test_round7b_ops_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_lateral_topk_is_decorrelated_to_window(spark, sf_dir):
    """The correlated LATERAL + LIMIT must decorrelate into a ranked
    window over the orders side joined hash-wise to the customer keys —
    NEVER a per-row nested-loop re-execution of the subquery (the
    difference between one shuffle and |customers| scans at 100 TB)."""
    plan = plan_of(spark, sf_dir, "q_lateral_topk")
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_recursive_cte_runs_in_unionloop(spark, sf_dir):
    """q_recursive_cte must execute through Spark 4's recursion
    operator (UnionLoop), and the recursive step's frontier-edge join
    must stay an equi join — recursion is bounded by the hop guard, not
    by an exploding cross product."""
    plan = plan_of(spark, sf_dir, "q_recursive_cte")
    assert "UnionLoop" in plan
    assert "CartesianProduct" not in plan


def test_pr_curve_grids_are_broadcast(spark, sf_dir):
    """Both pocket-sized sides of q_pr_curve — the 1-row quantized
    probe vector and the 4-row threshold grid — must ride broadcast
    nested-loop joins (the q_eval_mcc confusion-grid posture); the
    scored pass itself stays scan-shaped."""
    plan = plan_of(spark, sf_dir, "q_pr_curve")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_null_safe_join_is_hash_join_on_aggregates(spark, sf_dir):
    """eqNullSafe must plan as a hash join (null-safe equality is
    hashable via key coalescing) between two ALREADY-AGGREGATED 5-row
    inputs — the pre-aggregation is what keeps the NULL group 1-to-1
    instead of |null-rows|^2."""
    plan = plan_of(spark, sf_dir, "q_null_safe_join")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # both inputs aggregate BEFORE the join: partial+final pairs x 2
    assert plan.count("HashAggregate") >= 4


ROUND7C_OPS = [
    "q_gopher_rules",
    "q_vocab_coverage",
    "q_eval_prf_macro",
    "q_asof_nearest",
    "q_xml_parse",
    "q_hof_reduce",
    "q_tumbling_ohlc",
    "q_scc",
    "q_drift_tri",
    "q_rbo_overlap",
]


@pytest.mark.parametrize("name", ROUND7C_OPS)
def test_round7c_ops_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_gopher_rules_is_scan_plus_one_agg(spark, sf_dir):
    """Every Gopher rule is a per-row array expression — the plan must
    be one scan and one partial+final aggregate pair, with no join, no
    window, no explode (generator)."""
    plan = plan_of(spark, sf_dir, "q_gopher_rules")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "Generate" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_vocab_coverage_vocab_is_broadcast_topk(spark, sf_dir):
    """The top-K vocabulary must come from TakeOrderedAndProject (a
    partial per-partition top-K, never a global sort of the token
    stream) and must re-join the stream as a broadcast."""
    plan = plan_of(spark, sf_dir, "q_vocab_coverage")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_eval_prf_macro_confusion_grid_is_broadcast(spark, sf_dir):
    """The classes × predictions grid inherits q_knn_eval's broadcast
    posture; the final rollup is a single-row aggregate."""
    plan = plan_of(spark, sf_dir, "q_eval_prf_macro")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_nearest_is_windowed_not_range_joined(spark, sf_dir):
    """Both directional passes must run the tagged-union running-window
    device (two key-partitioned windows), and the only joins are equi
    joins (the purchase-id recombination) — never a range join."""
    plan = plan_of(spark, sf_dir, "q_asof_nearest")
    assert plan.count("Window") >= 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_xml_parse_is_scan_shaped(spark, sf_dir):
    """Render + from_xml + extract are row expressions: no join, no
    window; one aggregate pair for the 5-group rollup."""
    plan = plan_of(spark, sf_dir, "q_xml_parse")
    assert "Join" not in plan
    assert "Window" not in plan


def test_hof_reduce_is_pure_projection(spark, sf_dir):
    """The HOF breadth query is a projection over one pushed-filter
    scan: no shuffle at all (no aggregate, no join, no window)."""
    plan = plan_of(spark, sf_dir, "q_hof_reduce")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "PushedFilters" in plan


def test_tumbling_ohlc_is_one_aggregate_no_window(spark, sf_dir):
    """OHLC candles are min_by/max_by aggregates — ONE partial+final
    pair on (type, bucket), never the sort+full-frame-window
    formulation that shuffles the raw stream."""
    plan = plan_of(spark, sf_dir, "q_tumbling_ohlc")
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2  # agg shuffle (+AQE read)
    # min_by/max_by are TypedImperative -> sort-based aggregate; what
    # matters is the map-side partial pair, not the hash strategy
    assert "partial_min_by" in plan and "partial_max_by" in plan


def test_scc_closure_joins_stay_equi(spark, sf_dir):
    """The path-doubling closure and the mutual-pair intersection must
    be equi joins on the contracted node keys; the nation-name attach
    is broadcast.  No cartesian anywhere despite the self-joins."""
    plan = plan_of(spark, sf_dir, "q_scc")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_drift_tri_grid_restores_zeros_without_cartesian(spark, sf_dir):
    """The sources x vocabulary grid comes from broadcast crossJoins of
    the two TINY rollups (vocab counts, corpus total) onto the per-source
    totals — BroadcastNestedLoopJoin, never CartesianProduct — and the
    per-(source,tok) counts attach by equi join.  No window anywhere."""
    plan = plan_of(spark, sf_dir, "q_drift_tri")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_rbo_overlap_inherits_ranker_postures(spark, sf_dir):
    """Both rankers keep their pinned shape (broadcast query side, window
    top-k); the agreement join and zero-restore join are equi joins."""
    plan = plan_of(spark, sf_dir, "q_rbo_overlap")
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # the broadcast query sides


ROUND7E_OPS = [
    "q_dedup_verify_editdist",
    "q_mann_whitney",
    "q_cramers_v",
    "q_spearman_sources",
]


@pytest.mark.parametrize("name", ROUND7E_OPS)
def test_round7e_ops_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_editdist_candidates_are_bucket_expanded(spark, sf_dir):
    """Candidates come from the group-and-expand (collect_list bucket
    aggregate), never a bands self-join or an all-pairs nested loop;
    the Levenshtein verify joins are equi joins on pair ids."""
    plan = plan_of(spark, sf_dir, "q_dedup_verify_editdist")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ObjectHashAggregate" in plan  # the collect_list bucket agg
    assert "Window" not in plan


def test_mann_whitney_window_is_domain_table_only(spark, sf_dir):
    """The rank cumsum runs on the bounded word-count domain table —
    exactly ONE window, fed by an aggregate (never the raw corpus)."""
    plan = plan_of(spark, sf_dir, "q_mann_whitney")
    assert plan.count("Window") == 1
    # the window's input is the post-aggregate value table: an
    # aggregate must appear below the window in the plan tree
    assert "HashAggregate" in plan


def test_cramers_v_grid_is_broadcast(spark, sf_dir):
    """Marginals and the n scalar re-attach as broadcasts onto the
    40-cell table; no window, no sort-merge join anywhere."""
    plan = plan_of(spark, sf_dir, "q_cramers_v")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_spearman_ranks_join_free(spark, sf_dir):
    """Both rank windows run on the source-cardinality aggregate; the
    whole query has no join node at all."""
    plan = plan_of(spark, sf_dir, "q_spearman_sources")
    assert "Join" not in plan
    assert plan.count("Window") == 2


ROUND7G_OPS = [
    "q_phrase_search",
    "q_changepoint_binseg",
    "q_rake_keyphrases",
]


@pytest.mark.parametrize("name", ROUND7G_OPS)
def test_round7g_ops_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phrase_search_phrases_broadcast_topk(spark, sf_dir):
    """The top-3 phrase table comes from TakeOrderedAndProject (never a
    global sort of the bigram aggregate) and re-joins the bigram stream
    as a broadcast; adjacency is a doc-partitioned lead window, not the
    oracle's pos+1 self-join."""
    plan = plan_of(spark, sf_dir, "q_phrase_search")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_changepoint_is_pure_windows(spark, sf_dir):
    """One pass: type-partitioned prefix sums + the argmax rank — no
    join node anywhere, no partitionless window (every spec carries the
    event_type partition key)."""
    df = QUERIES["q_changepoint_binseg"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert not _partitionless_window_specs(df)


def test_rake_topk_is_heap_not_sort(spark, sf_dir):
    """The final top-10 must be TakeOrderedAndProject over the phrase
    table (per-partition heaps); the only partitionless window runs on
    the 10 survivors (the q_path_topk device)."""
    df = QUERIES["q_rake_keyphrases"](spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit 10" in opt
    assert opt.index("Window") < opt.index("GlobalLimit"), (
        "the rank window must sit above the 10-row limit"
    )


def test_embed_quantize_scales_broadcast(spark, sf_dir):
    """The 64-row per-dim scale table re-attaches to the cell stream as
    a broadcast; both aggregates are map-side-combined hash aggregates;
    no window, no cartesian."""
    plan = plan_of(spark, sf_dir, "q_embed_quantize_int8")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 aggs


def test_kendall_pair_join_is_domain_sized(spark, sf_dir):
    """The theta pair join (sa < sb) is a BroadcastNestedLoopJoin over
    the SOURCE-cardinality aggregate — legal here because both sides
    are domain tables (the eval-grid precedent), never the corpus."""
    plan = plan_of(spark, sf_dir, "q_kendall_tau")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # the pair join's inputs are aggregates, not scans: two partial+
    # final pairs (metric agg) must sit below it
    assert plan.count("HashAggregate") >= 4


def test_sax_post_candle_stages_are_domain_sized(spark, sf_dir):
    """The candle agg is the only fact-scale term; PAA/breakpoint/word
    stages join on broadcast type-keyed tables — no cartesian, no
    sort-merge join, and every window spec carries the event_type
    partition key."""
    df = QUERIES["q_sax_symbols"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert not _partitionless_window_specs(df)


def test_eval_mrr_inherits_retrieval_posture(spark, sf_dir):
    """Same scaffold as q_ndcg_int: broadcast query side (the
    crossJoin-broadcast BroadcastNestedLoopJoin), label joins keyed by
    vec_id, no cartesian."""
    plan = plan_of(spark, sf_dir, "q_eval_mrr")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the broadcast query side
    assert "Window" in plan  # the per-query rank


def test_langid_confusion_is_scan_plus_cell_aggs(spark, sf_dir):
    """The classifier is array expressions (no Generate); the confusion
    rollup is two cell-table aggregates and one broadcast marginal
    join."""
    plan = plan_of(spark, sf_dir, "q_langid_confusion")
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


ROUND8_OPS = [
    "q_url_canon",
    "q_domain_rollup",
    "q_mojibake",
    "q_pii_scorecard",
    "q_license_detect",
    "q_kneser_ney",
    "q_hhi_concentration",
    "q_shard_plan",
]


@pytest.mark.parametrize("name", ROUND8_OPS)
def test_round8_ops_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_url_canon_is_pure_map(spark, sf_dir):
    """The canonicalizer is regexp/array-HOF Column work only: no join,
    no aggregate, no Generate (the HOFs stay scalar), and the only
    Exchange is rebalance_for_cpu's round-robin — nothing hash-shuffles
    a per-row pipeline."""
    plan = plan_of(spark, sf_dir, "q_url_canon")
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "Generate" not in plan
    assert "Exchange hashpartitioning" not in plan


@pytest.mark.parametrize(
    "name", ["q_mojibake", "q_pii_scorecard", "q_license_detect"]
)
def test_scan_rollups_are_partial_single_exchange(spark, sf_dir, name):
    """The regex-scan rollups are one partial+final aggregate pair
    around a single hash exchange on the rollup key — the scan-bound
    shape that holds at any corpus size."""
    plan = plan_of(spark, sf_dir, name)
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_domain_rollup_share_join_is_broadcast(spark, sf_dir):
    """Domain aggregate is map-side partial; the 1-row total rides a
    broadcast nested loop — the fact scan never re-shuffles for the
    share computation."""
    plan = plan_of(spark, sf_dir, "q_domain_rollup")
    assert plan.count("HashAggregate") >= 2
    assert "BroadcastNestedLoopJoin" in plan


def test_kneser_ney_topk_is_heap_bounded(spark, sf_dir):
    """The model top-40 must be the heap-based TakeOrderedAndProject
    (never a range-partitioned global sort), with the rank window
    running over the 40 bounded survivors (q_path_topk device); the
    type-total is a broadcast 1-row cross."""
    df = QUERIES["q_kneser_ney"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit 40" in opt
    assert opt.index("Window") < opt.index("GlobalLimit"), (
        "limit must bound the window input"
    )
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    assert "Exchange rangepartitioning" not in phys
    assert "BroadcastNestedLoopJoin" in phys
    assert "CartesianProduct" not in phys


def test_hhi_totals_are_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_hhi_concentration")
    assert plan.count("HashAggregate") >= 2
    assert "BroadcastNestedLoopJoin" in plan


def test_shard_plan_prefix_sum_is_bucketed(spark, sf_dir):
    """q_shard_plan inherits the q_systematic_sample posture: the only
    partitionless window is the 16-row bucket-offset accumulation
    (its distinctive `unboundedpreceding$(), -1` frame); the per-group
    cumsum windows are grp-partitioned and the totals ride broadcast
    joins."""
    df = QUERIES["q_shard_plan"](spark, sf_dir)
    offset_frame = "specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)"
    bad = [w for w in _partitionless_window_specs(df) if offset_frame not in w]
    assert not bad, f"full-input partitionless window in q_shard_plan: {bad}"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Round-8b pipeline-curation ops (the R09_QUEUE overflow batch)
# ---------------------------------------------------------------------------

ROUND8B_OPS = [
    "q_line_dedup",
    "q_quality_classifier",
    "q_robots_gate",
    "q_contamination_matrix",
]


@pytest.mark.parametrize("name", ROUND8B_OPS)
def test_round8b_ops_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_quality_classifier_is_pure_map(spark, sf_dir):
    """The classifier is per-row Column arithmetic only: no join, no
    aggregate, no Generate, no window — the only Exchange is
    rebalance_for_cpu's round-robin.  A shuffle appearing here means
    someone broke the cheapest pass in the pipeline."""
    plan = plan_of(spark, sf_dir, "q_quality_classifier")
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "Generate" not in plan
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_line_dedup_no_window_aggregation_shaped(spark, sf_dir):
    """Line dedup is aggregation-shaped: the frequency pass and the
    reassembly are partial+final aggregates and reassembly order comes
    from array_sort inside the agg — no Window operator anywhere (a
    partitionless window here would serialize the corpus).  Joins stay
    equi-joins on (line) and (doc_id); whether the aggregated frequency
    table rides an AQE broadcast is a runtime SIZE decision we leave to
    AQE (at 100 TB it exceeds the threshold and falls back to shuffle),
    so only the join TYPE is pinned."""
    df = QUERIES["q_line_dedup"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 4
    assert "partial_count" in plan  # map-side combine on the line key
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert not _partitionless_window_specs(df)


def test_robots_gate_rules_ride_broadcast(spark, sf_dir):
    """The 8-row rule table joins via BroadcastNestedLoopJoin (the
    right plan for a KB-sized non-equi predicate), and the winner pick
    is a doc_id-partitioned window — never partitionless."""
    df = QUERIES["q_robots_gate"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert not _partitionless_window_specs(df)


def test_contamination_matrix_fact_joins_are_keyed(spark, sf_dir):
    """The shingle-presence join is an equi-join on the shingle key
    (shuffle or broadcast-by-AQE at test scale — but never a nested
    loop), the 6-row pair grid rides BroadcastNestedLoopJoin, and the
    presence aggregation is partial+final."""
    plan = plan_of(spark, sf_dir, "q_contamination_matrix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 6-row pairs grid
    assert plan.count("HashAggregate") >= 4


ROUND8B_OPS_2 = [
    "q_tokenizer_compare",
    "q_pq_recall_sweep",
    "q_warc_parse",
]


@pytest.mark.parametrize("name", ROUND8B_OPS_2)
def test_round8b_batch2_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_warc_parse_is_pure_arrow_map(spark, sf_dir):
    """Encode + parse are one Arrow-batched map over the scan: no join,
    no aggregate, no window, no hash exchange — record bytes move once."""
    plan = plan_of(spark, sf_dir, "q_warc_parse")
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_tokenizer_compare_is_two_arrow_encodes(spark, sf_dir):
    """Both vocab arms are Arrow-batched encode passes (merge tables in
    the closure — broadcast-dim pattern, never a shuffle of the corpus
    against the merge table); the rollup is partial+final per source."""
    plan = plan_of(spark, sf_dir, "q_tokenizer_compare")
    assert plan.count("ArrowEvalPython") >= 2  # the two pandas_udf encodes
    assert "BatchEvalPython" not in plan  # never a row-at-a-time UDF
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_pq_recall_sweep_configs_are_independent_arrow_scans(spark, sf_dir):
    """Each swept configuration is its own encode+ADC Arrow pass with
    tables in the closure; the exact arm reuses the broadcast-queries
    posture; hits are equi-joins — never a corpus x corpus product."""
    plan = plan_of(spark, sf_dir, "q_pq_recall_sweep")
    assert plan.count("MapInPandas") >= 2
    assert "CartesianProduct" not in plan


ROUND8B_OPS_3 = [
    "q_url_dedup",
    "q_soft_dedup_weight",
    "q_lm_interp",
    "q_vocab_prune",
    "q_temporal_split",
    "q_hashed_ngram_score",
    "q_jaccard_threshold_sweep",
    "q_langid_margin",
]


@pytest.mark.parametrize("name", ROUND8B_OPS_3)
def test_round8b_batch3_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_hashed_ngram_score_is_pure_hof_map(spark, sf_dir):
    """Bigram build, hash, weight lookup, and sum are ONE per-row HOF
    chain: no explode, no join, no aggregate operator, no Python."""
    plan = plan_of(spark, sf_dir, "q_hashed_ngram_score")
    assert "Generate" not in plan
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "EvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_langid_margin_is_scan_plus_one_rollup(spark, sf_dir):
    """Scores, sort, margin, and band are per-row array ops; the only
    shuffle is the (lang, band) rollup's single hash exchange."""
    plan = plan_of(spark, sf_dir, "q_langid_margin")
    assert "Generate" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_lm_interp_topk_is_heap_bounded(spark, sf_dir):
    """The q_kneser_ney posture: rank attaches to the 40 limit
    survivors (bounded window input), physical top-k is the heap
    operator, totals ride broadcast."""
    df = QUERIES["q_lm_interp"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit 40" in opt
    assert opt.index("Window") < opt.index("GlobalLimit"), (
        "limit must bound the window input"
    )
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    assert "Exchange rangepartitioning" not in phys
    assert "CartesianProduct" not in phys


def test_soft_dedup_weight_joins_on_digest(spark, sf_dir):
    """The join back is an equi-join on the 32-byte fingerprint (never
    a nested loop) and there is no window operator."""
    plan = plan_of(spark, sf_dir, "q_soft_dedup_weight")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Window" not in plan


def test_temporal_split_is_agg_plus_one_row_broadcast(spark, sf_dir):
    """The cut is a 1-row broadcast (BroadcastNestedLoopJoin over one
    row is the cheapest possible plan); the per-user rollup is
    partial+final; no window, no fact-table equi-join."""
    plan = plan_of(spark, sf_dir, "q_temporal_split")
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "Window" not in plan


ROUND8B_OPS_4 = [
    "q_group_by_all",
    "q_link_predict",
    "q_bloom_fpr",
    "q_mcnemar",
    "q_rfm_segments",
    "q_vwap",
    "q_prec_at_k",
]


@pytest.mark.parametrize("name", ROUND8B_OPS_4)
def test_round8b_batch4_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_vwap_is_single_partial_agg(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_vwap")
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Window" not in plan


def test_mcnemar_is_scan_plus_global_agg(spark, sf_dir):
    """Both classifiers are per-row array ops; the whole test collapses
    in ONE partial+final global aggregate — no join, no explode."""
    plan = plan_of(spark, sf_dir, "q_mcnemar")
    assert "Generate" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_rfm_threshold_is_broadcast_not_window(spark, sf_dir):
    """The median thresholds are a 1-row broadcast (percentile_disc
    aggregate), never a partitionless ntile window over the user
    table."""
    df = QUERIES["q_rfm_segments"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row threshold join
    assert not _partitionless_window_specs(df)


def test_link_predict_stays_equi_join_shaped(spark, sf_dir):
    """Edge building is the cell equi-join group-and-expand, wedges join
    on the middle vertex, adjacency removal is an anti equi-join — no
    nested loop anywhere (the top-20 heap needs no broadcast grid)."""
    df = QUERIES["q_link_predict"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert "TakeOrderedAndProject" in plan


def test_bloom_fpr_bit_table_is_bounded_broadcastable(spark, sf_dir):
    """The verdict joins are equi-joins on the bit index; the m-bounded
    bit table may ride an AQE broadcast (it is KB-sized by design) but
    the probe side must never nest-loop."""
    plan = plan_of(spark, sf_dir, "q_bloom_fpr")
    assert "CartesianProduct" not in plan


ROUND8B_OPS_5 = [
    "q_holt_linear",
    "q_rolling_corr",
    "q_idf_drift",
    "q_degree_hist",
    "q_boilerplate_prefix",
]


@pytest.mark.parametrize("name", ROUND8B_OPS_5)
def test_round8b_batch5_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_holt_state_is_per_series_arrow(spark, sf_dir):
    """The sequential recurrence runs inside ONE FlatMapGroupsInPandas
    over series keys (O(1) state per series); the corpus reduces to the
    30 x series grid via a partial aggregate first."""
    plan = plan_of(spark, sf_dir, "q_holt_linear")
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_rolling_corr_window_is_day_partitioned(spark, sf_dir):
    """The cumulative window partitions by day — never the partitionless
    global-series shape."""
    df = QUERIES["q_rolling_corr"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert not _partitionless_window_specs(df)


def test_boilerplate_prefix_is_single_digest_agg(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_boilerplate_prefix")
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1


ROUND8B_OPS_6 = [
    "q_holt_forecast",
    "q_shard_dedup_cross",
    "q_er_blocking",
    "q_kanon_generalize",
]


@pytest.mark.parametrize("name", ROUND8B_OPS_6)
def test_round8b_batch6_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_er_blocking_never_materializes_pairs(spark, sf_dir):
    """Candidate counts are arithmetic on block sizes: per strategy one
    groupBy + one 1-row aggregate — no join of the customer table with
    itself anywhere."""
    plan = plan_of(spark, sf_dir, "q_er_blocking")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("HashAggregate") >= 6  # 3 strategies x partial+final


def test_shard_dedup_cross_offset_window_only(spark, sf_dir):
    """Shard assignment inherits q_shard_plan's bucketed prefix sum: the
    only partitionless windows are the 16-row bucket-offset accumulation
    and (optimization round 13) the n_total sum over the <=2-row
    same_shard GROUP table — both driver-scale inputs, never the fact
    table.  The r13 window replaced a second full LSH-chain subtree
    (28 scans / 94 Exchanges) that existed only to count total pairs."""
    df = QUERIES["q_shard_dedup_cross"](spark, sf_dir)
    offset_frame = "specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)"
    total_frame = (
        "specifiedwindowframe(RowFrame, unboundedpreceding$(),"
        " unboundedfollowing$())"
    )
    bad = [
        w
        for w in _partitionless_window_specs(df)
        if offset_frame not in w and total_frame not in w
    ]
    assert not bad, f"full-input partitionless window: {bad}"
    # the fact-scale subtree (LSH chain) must appear ONCE: the total is
    # derived from the grouped output, not a duplicated plan branch
    phys = plan_of(spark, sf_dir, "q_shard_dedup_cross")
    assert phys.count("Scan parquet") <= 14, (
        "n_total branch re-grew a duplicated LSH subtree"
    )


def test_kanon_generalize_is_union_of_aggs(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_kanon_generalize")
    assert "Union" in plan
    assert plan.count("HashAggregate") >= 4
    assert "Window" not in plan


ROUND8B_OPS_7 = [
    "q_bm25_k1_sweep",
    "q_centroid_dist",
    "q_daily_anomaly",
    "q_kfold_balance",
    "q_skew_audit",
    "q_dup_inflation",
]


@pytest.mark.parametrize("name", ROUND8B_OPS_7)
def test_round8b_batch7_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_bm25_sweep_shares_one_token_scan_per_arm_family(spark, sf_dir):
    """The tf/df/stats tables are query-term-bounded or broadcast-sized;
    no arm adds a window or a global sort."""
    plan = plan_of(spark, sf_dir, "q_bm25_k1_sweep")
    assert "Window" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Union" in plan


def test_centroid_dist_join_is_dimension_sized(spark, sf_dir):
    """The pairwise join runs on the labels x dims centroid table, an
    equi-join on dim — never vectors x vectors."""
    plan = plan_of(spark, sf_dir, "q_centroid_dist")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4


def test_daily_anomaly_is_agg_join_no_window(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_daily_anomaly")
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 4


def test_skew_audit_never_shuffles_twice_per_key(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_skew_audit")
    assert "Join" not in plan
    assert "Window" not in plan


ROUND8B_OPS_8 = [
    "q_brier_decomp",
    "q_audit_sample",
    "q_activity_lapse",
    "q_chain_contamination",
]


@pytest.mark.parametrize("name", ROUND8B_OPS_8)
def test_round8b_batch8_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_brier_is_scan_broadcast_bin_agg(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_brier_decomp")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row min/max
    assert plan.count("HashAggregate") >= 4


def test_audit_sample_is_heap_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_audit_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_activity_lapse_window_is_user_partitioned(spark, sf_dir):
    df = QUERIES["q_activity_lapse"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert not _partitionless_window_specs(df)


ROUND8B_OPS_9 = [
    "q_bbit_minhash",
    "q_stratified_kfold",
    "q_join_size_estimate",
    "q_bloom_size_sweep",
    "q_hapax_bigrams",
]


@pytest.mark.parametrize("name", ROUND8B_OPS_9)
def test_round8b_batch9_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_join_size_estimate_never_joins(spark, sf_dir):
    """Both the estimate and the actual come from keyed aggregates —
    the audited join itself must never appear in the plan."""
    plan = plan_of(spark, sf_dir, "q_join_size_estimate")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_stratified_kfold_window_is_lang_partitioned(spark, sf_dir):
    df = QUERIES["q_stratified_kfold"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert not _partitionless_window_specs(df)


def test_hapax_is_single_rollup_chain(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_hapax_bigrams")
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("HashAggregate") >= 4


# ---------------------------------------------------------------------------
# Round-9 ops (batch queries only; streaming q_stream_dedup_watermark is
# covered by its replay-parity tests in test_round9_ops.py)
# ---------------------------------------------------------------------------

ROUND9_OPS = [
    "q_image_qoi",
    "q_louvain_l0",
    "q_dedup_oph",
    "q_unicode_nfc",
    "q_fm_sketch",
    "q_kcenter_seed",
    "q_path_prefix_rollup",
    "q_schema_evolution",
]


@pytest.mark.parametrize("name", ROUND9_OPS)
def test_round9_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_image_qoi_is_pure_scan_map(spark, sf_dir):
    """Codec roundtrip must be shuffle-free: one scan, one Arrow-batched
    python map, nothing else."""
    plan = plan_of(spark, sf_dir, "q_image_qoi")
    assert "MapInPandas" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_unicode_nfc_is_pure_scan_map(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_unicode_nfc")
    assert "MapInPandas" in plan
    assert "Exchange hashpartitioning" not in plan


def test_dedup_oph_single_bin_shuffle(spark, sf_dir):
    """OPH's point is ONE (doc, bin) partial-agg shuffle + a 32-row
    window per doc — no per-seed fan-out, no self-join."""
    plan = plan_of(spark, sf_dir, "q_dedup_oph")
    assert plan.count("SortMergeJoin") <= 1  # spine left-join only
    assert "Window" in plan
    # partial + final agg for the (doc, bin) minima
    assert plan.count("HashAggregate") >= 2


def test_fm_sketch_is_one_agg_chain(spark, sf_dir):
    """distinct + bit_or rollup: aggregate exchanges only, no joins, no
    windows."""
    plan = plan_of(spark, sf_dir, "q_fm_sketch")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final


def test_kcenter_assignment_has_no_joins(spark, sf_dir):
    """Centers ride as literals: the assignment pass must contain NO
    join operator at all (the driver-holds-KB pattern)."""
    plan = plan_of(spark, sf_dir, "q_kcenter_seed")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_path_prefix_rollup_single_groupby(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_path_prefix_rollup")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "Generate explode" in plan


def test_schema_evolution_read_is_columnar(spark, sf_dir):
    """The merged read must still be a columnar parquet scan (schema
    reconciliation happens at planning, not via a row-level union of
    casts through some non-columnar path)."""
    plan = plan_of(spark, sf_dir, "q_schema_evolution")
    assert "Scan parquet" in plan
    assert "Join" not in plan


def test_louvain_shuffles_are_key_partitioned(spark, sf_dir):
    """Every exchange in the final louvain round must be hash
    partitioning on node/comm keys (or AQE coalesced reads of one) —
    no single-partition exchange anywhere."""
    df = QUERIES["q_louvain_l0"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


ROUND9_OPS_B = ["q_assoc_rules", "q_gini_stump"]


@pytest.mark.parametrize("name", ROUND9_OPS_B)
def test_round9b_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_assoc_rules_item_tables_broadcast(spark, sf_dir):
    """The Apriori shape: frequent-item prune joins and the metric
    joins ride broadcasts; only the doc-key pair join shuffles."""
    plan = plan_of(spark, sf_dir, "q_assoc_rules")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_gini_stump_grid_is_broadcast(spark, sf_dir):
    """The token x label zero-fill grid is vocab-sized: its join must
    broadcast, and the only row-scale shuffles are count aggregates."""
    plan = plan_of(spark, sf_dir, "q_gini_stump")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


ROUND9_OPS_C = [
    "q_content_address",
    "q_partition_overwrite_dynamic",
    "q_csv_permissive",
    "q_holt_winters",
]


@pytest.mark.parametrize("name", ROUND9_OPS_C)
def test_round9c_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_content_address_single_agg_no_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_content_address")
    assert "Join" not in plan
    # distinct-over-string plans as Sort/ObjectHashAggregate; accept any
    # partial+final aggregate pair
    n_aggs = sum(
        plan.count(k)
        for k in ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
    )
    assert n_aggs >= 2


ROUND9_OPS_D = ["q_delta_varint", "q_rle_runs"]


@pytest.mark.parametrize("name", ROUND9_OPS_D)
def test_round9d_no_cartesian_no_partitionless_window(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    df = QUERIES[name](spark, sf_dir)
    assert not _partitionless_window_specs(df), (
        f"partitionless window in {name}"
    )


def test_jl_project_is_map_plus_broadcast(spark, sf_dir):
    """Projection must be shuffle-free map work; the only join is the
    20-query broadcast."""
    plan = plan_of(spark, sf_dir, "q_jl_project")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


ROUND9_OPS_E = ["q_bitmap_dau", "q_window_funnel", "q_token_bucket"]


@pytest.mark.parametrize("name", ROUND9_OPS_E)
def test_round9e_no_cartesian_no_partitionless_window(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    df = QUERIES[name](spark, sf_dir)
    assert not _partitionless_window_specs(df), (
        f"partitionless window in {name}"
    )


def test_bitmap_dau_window_is_word_partitioned(spark, sf_dir):
    """The 7-day union must ride a per-word bounded frame — never a
    global window, never a distinct shuffle."""
    plan = plan_of(spark, sf_dir, "q_bitmap_dau")
    assert "Window" in plan
    assert "Join" not in plan


def test_window_funnel_joins_share_user_key(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_window_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ip_lpm_routes_broadcast_no_theta_join(spark, sf_dir):
    """The LPM must be 3x broadcast-hash lookups, never a range
    theta-join (BroadcastNestedLoop/Cartesian)."""
    plan = plan_of(spark, sf_dir, "q_ip_lpm_join")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lttb_no_partitionless_window(spark, sf_dir):
    df = QUERIES["q_lttb_downsample"](spark, sf_dir)
    assert not _partitionless_window_specs(df)
    plan = plan_of(spark, sf_dir, "q_lttb_downsample")
    assert "CartesianProduct" not in plan


def test_mutual_best_match_is_candidate_bounded(spark, sf_dir):
    """The linkage must ride the bucketed LSH candidate front — the
    all-pairs draft (BroadcastNestedLoop cross of A x B) measured 14x
    wall at x10 rows and is banned here."""
    plan = plan_of(spark, sf_dir, "q_mutual_best_match")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
