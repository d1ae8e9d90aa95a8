"""Large-star/small-star connected components (Kiveris et al. SoCC 2014)
vs a pure-Python union-find oracle, plus depth behavior on path graphs
where O(diameter) label propagation would not converge in its round
budget."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nomad_event_streamer_spark.operators import dedup


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: every node -> component min
    return {n: find(n) for n in parent}


def _run_star(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = dedup.connected_components_star(df, **kw).collect()
    return {r["doc_id"]: r["cluster_id"] for r in got}


def test_star_two_triangles_and_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (20, 21)]
    assert _run_star(spark, edges) == _union_find(edges)


def test_star_path_graph_depth(spark):
    # 120-node path: diameter 119 — min-label propagation needs ~119
    # rounds; star must finish inside its default 20-round budget.
    edges = [(i, i + 1) for i in range(120)]
    got = _run_star(spark, edges)
    assert got == {n: 0 for n in range(121)}


def test_star_empty_edges(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup.connected_components_star(df).count() == 0


def test_star_self_loops_ignored(spark):
    edges = [(5, 5), (1, 2)]
    assert _run_star(spark, edges) == {1: 1, 2: 1}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_star_matches_union_find_random(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    assert _run_star(spark, edges) == _union_find(edges)


def test_star_agrees_with_label_propagation(spark):
    edges = [(1, 2), (2, 3), (7, 8), (8, 9), (9, 7), (3, 7), (100, 101)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    a = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(df).collect()
    }
    b = _run_star(spark, edges)
    assert a == b
