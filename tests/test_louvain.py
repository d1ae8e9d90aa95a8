"""Louvain level-0 invariants (round 9, VERDICT r08 item #5): the
deterministic synchronous variant must converge on the shapes the
naive sync update breaks on (singleton pairs), split bridged cliques
at the sparse cut, be partitioning-invariant, and REFINE the connected
components q_dedup_clusters_star produces (the granularity-audit
relationship that makes the two comparable)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from nomad_event_streamer_spark.operators.graph import louvain_level0
from nomad_event_streamer_spark.plans import QUERIES


def _assign(spark, edges, rounds=3):
    df = spark.createDataFrame([Row(doc_a=a, doc_b=b) for a, b in edges])
    return {
        r["node"]: r["comm"]
        for r in louvain_level0(df, rounds=rounds).collect()
    }


class TestSyncMoveSemantics:
    def test_singleton_pair_merges_not_oscillates(self, spark):
        """The swap pathology: naive sync updates leave an isolated edge
        as two size-1 communities forever (u and v trade ids each
        round).  The swap-breaking rule must land both nodes in comm
        min(u, v) within 3 rounds."""
        comm = _assign(spark, [(7, 3)])
        assert comm == {3: 3, 7: 3}

    def test_many_disjoint_pairs(self, spark):
        edges = [(2 * i, 2 * i + 1) for i in range(20)]
        comm = _assign(spark, edges)
        for i in range(20):
            assert comm[2 * i] == comm[2 * i + 1] == 2 * i

    def test_triangle_collapses_to_min_id(self, spark):
        comm = _assign(spark, [(1, 2), (2, 3), (1, 3)])
        assert set(comm.values()) == {1}

    def test_bridged_triangles_split_at_the_bridge(self, spark):
        """Two triangles joined by one bridge edge: connected components
        merge them into one cluster; modularity communities must keep
        them apart — the exact over-merge signal the audit exists for."""
        edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
        comm = _assign(spark, edges)
        left = {comm[1], comm[2], comm[3]}
        right = {comm[4], comm[5], comm[6]}
        assert len(left) == 1 and len(right) == 1
        assert left != right

    def test_partitioning_invariant(self, spark):
        edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4),
                 (10, 11), (12, 13), (11, 12)]
        df = spark.createDataFrame([Row(doc_a=a, doc_b=b) for a, b in edges])
        a = {(r["node"], r["comm"]) for r in louvain_level0(df).collect()}
        b = {
            (r["node"], r["comm"])
            for r in louvain_level0(df.repartition(7)).collect()
        }
        assert a == b


class TestGranularityAudit:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_louvain_l0"](spark, sf_dir).collect()

    def test_output_shape(self, rows):
        assert rows
        for r in rows:
            assert r["n_members"] >= 1
            assert r["total_degree"] >= r["n_members"]  # degree >= 1 each
            # a community of size s can hold at most C(s,2) internal edges
            s = r["n_members"]
            assert 0 <= r["internal_edges"] <= s * (s - 1) // 2

    def test_no_singleton_flood(self, rows):
        """The oscillation regression guard: the sf0.01 candidate graph
        is dominated by genuine near-dup pairs, so singleton
        communities (a node whose every neighbor left it behind) must
        be the exception, not the rule."""
        sizes = [r["n_members"] for r in rows]
        assert sum(1 for s in sizes if s == 1) <= len(sizes) // 4

    def test_communities_refine_components(self, spark, sf_dir, rows):
        """Every Louvain community must sit inside ONE connected
        component of the same candidate graph (gain moves only travel
        along edges, so a community can never span components) — the
        property that makes the size profiles directly comparable as a
        granularity audit."""
        from nomad_event_streamer_spark.operators import dedup
        from nomad_event_streamer_spark.operators.graph import louvain_level0
        from nomad_event_streamer_spark.tables import load

        docs = load(spark, sf_dir, "documents")
        sh = dedup.shingles(docs, n=3)
        sig = dedup.minhash_signatures(sh, num_hashes=16)
        bands = dedup.lsh_bands(sig, num_hashes=16, rows_per_band=2)
        edges = dedup.lsh_candidate_pairs(bands).localCheckpoint(eager=True)
        comm = louvain_level0(edges, rounds=3)
        # min-label connected components over the same edges
        cc = {r["node"]: r["comm"] for r in comm.collect()}
        und = [
            (r["doc_a"], r["doc_b"]) for r in edges.collect()
        ]
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in und:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp_of_comm: dict[int, int] = {}
        for node, c in cc.items():
            comp = find(node)
            assert comp_of_comm.setdefault(c, comp) == comp, (
                f"community {c} spans components"
            )
