"""Declared iterative-graph queries (SURVEY.md 2.12): PageRank over the
nation-level trade graph.

Fixed-point integer arithmetic (operators/graph.py) makes the iterative
result bit-exact across engines, so this ships with a full value-hash
oracle — the DuckDB side unrolls the same ten rounds as chained CTEs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import graph
from ..tables import load
from .registry import query

_NODES_SQL = "SELECT n_name AS node FROM nation"
_EDGES_SQL = """
    SELECT sn.n_name AS src, cn.n_name AS dst, count(*) AS w
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    GROUP BY 1, 2
"""


@query(
    "q_pagerank",
    oracle=graph.pagerank_oracle_sql(_NODES_SQL, _EDGES_SQL, iters=10),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 synchronous rounds, damping 0.85) over the directed
    supplier-nation → customer-nation trade graph, edge weight = lineitem
    count.  Rank arithmetic is fixed-point BIGINT (units of 1e-9), so the
    oracle's unrolled CTE chain hash-matches exactly — an iterative
    algorithm under the full value-hash gate, not rows-only.  Scale: the
    per-round shuffle is rank-vector-sized (|V|), the edge table
    hash-partitions once and is reused; rounds are lineage-cut via
    localCheckpoint (Pregel practice)."""
    nation = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")

    nodes = nation.select(F.col("n_name").alias("node"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("src")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return graph.pagerank(nodes, edges, iters=10)


@query(
    "q_triangles",
    oracle=f"""
    WITH raw AS ({_EDGES_SQL}),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM raw WHERE src <> dst
    )
    SELECT e1.a AS a, e1.b AS b, e2.b AS c
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the undirected trade graph via the
    compact-forward algorithm: orient every edge from its lower-(degree,
    name) endpoint to the higher one, join wedges on the middle vertex,
    and close them against the oriented edge set.  Orientation bounds
    each vertex's out-degree by O(sqrt(|E|)) on any graph, so the wedge
    join never explodes on hubs — the property that makes triangle
    counting feasible at 1e11 edges (naive a<b<c ordering puts every
    hub's full neighborhood on one side).  Output is the canonical
    (a, b, c) name-sorted triple set, so the oracle can use the naive
    ordering: same set, different join order.  Integer/string-only
    arithmetic — full value-hash oracle."""
    nation = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("src")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("dst")
    )
    # Carry only INTEGER nationkeys through the fact-table joins and
    # attach names to the <=625-row distinct pair set at the end — the
    # r02 plan shuffled name strings through every hop.  (An early
    # per-hop distinct was measured and rejected: (l_orderkey,
    # s_nationkey) is ~92% unique here, so the extra exchange cost more
    # than the 8% row reduction saved; one distinct after the last join
    # map-side-combines to the 625-pair ceiling anyway.)
    nation_pair = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("l_orderkey", "s_nationkey")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_custkey", "s_nationkey")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("s_nationkey", "c_nationkey")
        .distinct()
    )
    directed = (
        nation_pair.join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .select("src", "dst")
    )
    und = (
        directed.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    return graph.triangles(und)


@query(
    "q_bfs_reach",
    oracle=graph.bfs_oracle_sql(
        _NODES_SQL, _EDGES_SQL, seeds=["NATION_3", "NATION_17"], rounds=3
    ),
)
def q_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round BFS reachability (3 hops from {NATION_3, NATION_17}) over
    the directed trade graph — the recursive-CTE workload expressed as
    Spark's iterative frontier join with per-round lineage cuts.
    Integer hop distances ⇒ the unrolled-CTE oracle is a full value
    hash, like q_pagerank.  Scale: each round shuffles a
    frontier-vertex-sized join + min-combine; the edge table
    hash-partitions once and is reused."""
    nation = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nodes = nation.select(F.col("n_name").alias("node"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("src")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .select("src", "dst")
    )
    return graph.bfs_hops(nodes, edges, seeds=["NATION_3", "NATION_17"], rounds=3)
