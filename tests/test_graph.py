"""Fixed-point PageRank operator tests on graphs with known structure."""

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.operators import graph


def _pr(spark, nodes, edges, **kw):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node string")
    edf = spark.createDataFrame(edges, "src string, dst string, w long")
    out = graph.pagerank(ndf, edf, **kw)
    return {r["node"]: r["units"] for r in out.collect()}


def test_cycle_is_uniform(spark):
    # symmetric 4-cycle: every node keeps exactly 1/4 of the mass
    nodes = ["a", "b", "c", "d"]
    edges = [(s, d, 1) for s, d in zip(nodes, nodes[1:] + nodes[:1])]
    ranks = _pr(spark, nodes, edges, iters=10)
    assert len(set(ranks.values())) == 1
    assert abs(ranks["a"] - graph.TOTAL_UNITS // 4) <= 10


def test_star_center_dominates(spark):
    # spokes -> center: center accumulates, spokes hold only base mass
    nodes = ["hub", "s1", "s2", "s3"]
    edges = [(s, "hub", 1) for s in nodes[1:]] + [("hub", "s1", 1)]
    ranks = _pr(spark, nodes, edges, iters=10)
    assert ranks["hub"] > ranks["s2"] == ranks["s3"]
    assert ranks["s1"] > ranks["s2"]  # hub's single out-edge feeds s1


def test_mass_conserved_up_to_truncation(spark):
    nodes = ["a", "b", "c"]
    edges = [("a", "b", 2), ("b", "c", 1), ("c", "a", 3)]
    ranks = _pr(spark, nodes, edges, iters=5)
    total = sum(ranks.values())
    # each round loses < |V| + |E| units to integer floors, never gains
    assert graph.TOTAL_UNITS * 0.999 < total <= graph.TOTAL_UNITS


def test_empty_nodes_rejected(spark):
    with pytest.raises(ValueError):
        graph.pagerank(
            spark.createDataFrame([], "node string"),
            spark.createDataFrame([], "src string, dst string, w long"),
        )


def test_weights_bias_flow(spark):
    # b gets 3x the weight of c from a; with no other edges b ends higher
    nodes = ["a", "b", "c"]
    edges = [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]
    ranks = _pr(spark, nodes, edges, iters=10)
    assert ranks["b"] > ranks["c"]
