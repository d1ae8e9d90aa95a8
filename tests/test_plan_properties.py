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


def test_asof_join_is_windowed_not_joined(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_asof_join")
    assert "Window" in plan
    for join_node in ["SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"]:
        assert join_node not in plan
