"""Skew guards on the shared co-activity graph builders (VERDICT r08
item #2): ``coactivity_edges(max_cell=)`` must drop degenerate hot
cells BEFORE the pair equi-join (the quadratic stage), and
``common_neighbor_candidates(max_degree=)`` must exclude hub middles
from wedge enumeration while keeping Jaccard-denominator degrees exact.
Both flags default OFF; the registered q_link_predict / q_degree_hist
plans and oracles are the uncapped path (pinned by the driver hash
gate, not here).
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401
import pytest
from pyspark.sql import Row

from nomad_event_streamer_spark.operators.graph import (
    coactivity_edges,
    common_neighbor_candidates,
)


@pytest.fixture(scope="module")
def skewed_cells(spark):
    """One hot cell shared by 10 users + three normal cells shared by
    users 1 and 2 only."""
    rows = [Row(user_id=u, event_type="hot", h=0) for u in range(10)]
    for h in (1, 2, 3):
        rows.append(Row(user_id=1, event_type="a", h=h))
        rows.append(Row(user_id=2, event_type="a", h=h))
    return spark.createDataFrame(rows)


class TestCoactivityCellCap:
    def test_uncapped_expands_the_hot_cell(self, skewed_cells):
        pairs = {
            (r["a"], r["b"])
            for r in coactivity_edges(skewed_cells, min_cells=1).collect()
        }
        assert len(pairs) == 45  # C(10,2) from the hot cell; (1,2) within

    def test_cap_drops_hot_cells_not_edges(self, skewed_cells):
        pairs = {
            (r["a"], r["b"])
            for r in coactivity_edges(
                skewed_cells, min_cells=1, max_cell=5
            ).collect()
        }
        # the 45 hot-cell pairs are gone; (1,2)'s 3-cell evidence from
        # the normal cells survives intact
        assert pairs == {(1, 2)}

    def test_capped_result_counts_remaining_cells_exactly(self, skewed_cells):
        [(a, b)] = [
            (r["a"], r["b"])
            for r in coactivity_edges(
                skewed_cells, min_cells=3, max_cell=5
            ).collect()
        ]
        assert (a, b) == (1, 2)

    def test_cap_filter_runs_before_the_pair_join(self, skewed_cells):
        """Plan pin: the hot-cell Filter(_cell_n <= cap) must sit INSIDE
        the pair join's subtree — i.e. the quadratic u<v equi-join never
        sees a hot cell's rows.  In Spark's plan dump children print
        AFTER their parent, so the filter line must appear after the
        pair-join line, and must exist at all."""
        df = coactivity_edges(skewed_cells, min_cells=1, max_cell=5)
        df.collect()  # finalize AQE so the dump is the executed plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "_cell_n" in plan, "hot-cell size filter missing from plan"
        join_lines = [
            i
            for i, ln in enumerate(plan.splitlines())
            if "Join" in ln and "< v#" in ln
        ]
        filter_lines = [
            i
            for i, ln in enumerate(plan.splitlines())
            if "Filter" in ln and "_cell_n" in ln
        ]
        assert join_lines and filter_lines
        assert min(filter_lines) > min(join_lines), (
            "hot-cell filter is not inside the pair join's input subtree"
        )

    def test_uncapped_plan_has_no_cell_size_aggregate(self, skewed_cells):
        df = coactivity_edges(skewed_cells, min_cells=1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "_cell_n" not in plan  # cap off == today's exact plan


class TestWedgeDegreeCap:
    @pytest.fixture(scope="class")
    def hub_edges(self, spark):
        """Star: hub 0 joined to 1..8 (degree 8); plus a 4-cycle
        10-11-12-13 whose wedge middles all have degree 2."""
        rows = [Row(a=0, b=i) for i in range(1, 9)]
        rows += [Row(a=10, b=11), Row(a=11, b=12), Row(a=12, b=13), Row(a=10, b=13)]
        return spark.createDataFrame(rows)

    def test_uncapped_enumerates_hub_wedges(self, hub_edges):
        cand = {
            (r["a"], r["b"])
            for r in common_neighbor_candidates(hub_edges).collect()
        }
        # hub middles: C(8,2) = 28 leaf pairs; cycle diagonals: 2
        assert len(cand) == 30

    def test_degree_cap_excludes_hub_middles_only(self, hub_edges):
        out = common_neighbor_candidates(hub_edges, max_degree=2).collect()
        cand = {(r["a"], r["b"]): (r["da"], r["db"]) for r in out}
        # only the cycle diagonals survive (their middles have degree 2)
        assert set(cand) == {(10, 12), (11, 13)}
        # degrees in the output stay EXACT (hub leaves keep degree from
        # the full graph, not the capped wedge set)
        assert cand[(10, 12)] == (2, 2)

    def test_degree_cap_keeps_true_degrees_for_hub_leaves(self, hub_edges):
        """A leaf pair mediated by the hub disappears under the cap, but
        any surviving row's endpoint degree must come from the uncapped
        degree table — add an extra wedge touching a hub leaf to check."""
        extra = hub_edges.sparkSession.createDataFrame(
            [Row(a=1, b=20), Row(a=2, b=20)]
        )
        edges = hub_edges.unionByName(extra)
        out = {
            (r["a"], r["b"]): (r["da"], r["db"])
            for r in common_neighbor_candidates(edges, max_degree=2).collect()
        }
        # middle 20 (degree 2) is enumerable: candidate (1, 2) — its
        # endpoints' degrees include the hub edges (degree 2 each: hub +
        # node 20)
        assert (1, 2) in out
        assert out[(1, 2)] == (2, 2)
