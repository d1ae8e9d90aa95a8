"""Declared iterative-graph queries (SURVEY.md 2.12): PageRank over the
nation-level trade graph.

Fixed-point integer arithmetic (operators/graph.py) makes the iterative
result bit-exact across engines, so this ships with a full value-hash
oracle — the DuckDB side unrolls the same ten rounds as chained CTEs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

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


_SCC_THRESHOLD = 170
_SCC_EDGES_SQL = f"""
    SELECT sn.n_nationkey AS src, cn.n_nationkey AS dst
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer cu ON cu.c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = cu.c_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
    GROUP BY 1, 2 HAVING count(*) >= {_SCC_THRESHOLD}
"""


@query(
    "q_scc",
    oracle=f"""
    WITH RECURSIVE w AS ({_SCC_EDGES_SQL}),
    closure(src, dst) AS (
        SELECT src, dst FROM w
        UNION
        SELECT c.src, e.dst FROM closure c JOIN w e ON e.src = c.dst
    ),
    nodes AS (
        SELECT DISTINCT src AS v FROM w
        UNION SELECT DISTINCT dst FROM w
    ),
    scc AS (
        SELECT n.v,
               least(n.v, coalesce(min(CASE WHEN c2.src IS NOT NULL
                                            THEN c1.dst END), n.v))
                   AS scc_id
        FROM nodes n
        LEFT JOIN closure c1 ON c1.src = n.v
        LEFT JOIN closure c2 ON c2.src = c1.dst AND c2.dst = n.v
        GROUP BY n.v
    )
    SELECT CAST(s.v AS BIGINT) AS nationkey,
           nat.n_name AS n_name,
           CAST(s.scc_id AS BIGINT) AS scc_id,
           CAST(count(*) OVER (PARTITION BY s.scc_id) AS BIGINT)
               AS scc_size
    FROM scc s JOIN nation nat ON nat.n_nationkey = s.v
    """,
)
def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the directed heavy-trade graph
    (edges = nation pairs shipping >= 170 lineitems): each node's
    SCC id (min nationkey among mutually reachable nodes) and SCC
    size — the cycle-structure analysis (circular trade dependencies)
    the undirected component operators (q_dedup_clusters min-label,
    large-star/small-star) cannot answer, because direction matters.

    Spark-first shape: CONTRACT FIRST — the fact-scale work is the
    edge projection (five joins + one (src,dst) count-threshold
    aggregate, identical posture to q_recursive_cte's edge build);
    the transitive closure then runs on the contracted nation graph
    (<= 25 nodes, <= 625 closure pairs) via O(log diameter) path-
    doubling rounds (5 rounds cover diameter 32 > any 25-node path),
    each a self-join + distinct with per-round localCheckpoint lineage
    cuts — the same bounded-iteration discipline as q_dedup_clusters /
    q_label_prop, never a per-node driver loop.  Mutual-reachability
    pairs (closure ∩ reversed closure) then give scc_id = min partner.
    The oracle replays the SAME edges with DuckDB's independent
    recursive-CTE fixpoint engine, so the doubling device is checked
    against true reachability semantics, not a twin of itself.

    At 100 TB the contracted-graph posture is the point: closure cost
    depends on the DOMAIN graph (nations), not the fact table; a
    billion-node graph would swap in the large-star/small-star device —
    documented, not needed for the declared domain."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    edges = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("s_nationkey").cast("long").alias("src"),
            F.col("c_nationkey").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= _SCC_THRESHOLD)
        # EAGER cut (optimization round 12): the contracted edge set
        # (<= 625 rows) feeds the closure loop AND the node spine —
        # concurrent consumers under the final action, and uncut the
        # node branch replayed the five-join fact-scale edge build from
        # parquet (18 scans in this plan).  The closure rounds below
        # keep their LAZY per-round cuts (shuffle-chained loop, the
        # lazy-correct class).
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    # lazy lineage cuts (optimization round 12): fixed 5 rounds, no
    # driver decisions — the final action materializes every round with
    # each closure level persisted, instead of 6 blocking jobs
    closure = edges
    for _ in range(5):
        step = (
            closure.alias("a")
            .join(
                closure.alias("b"), F.col("a.dst") == F.col("b.src")
            )
            .select(
                F.col("a.src").alias("src"), F.col("b.dst").alias("dst")
            )
        )
        closure = (
            closure.unionByName(step).distinct().localCheckpoint(eager=False)
        )
    nodes = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    rev = closure.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    mutual = closure.intersect(rev)
    scc = (
        nodes.join(mutual, nodes.v == mutual.src, "left")
        .groupBy("v")
        .agg(
            F.least(
                F.col("v"), F.coalesce(F.min("dst"), F.col("v"))
            ).alias("scc_id")
        )
    )
    wsz = Window.partitionBy("scc_id")
    return (
        scc.join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").cast("long").alias("v"), "n_name"
                )
            ),
            "v",
        )
        .select(
            F.col("v").alias("nationkey"),
            "n_name",
            "scc_id",
            F.count(F.lit(1)).over(wsz).alias("scc_size"),
        )
    )


_LP_TOPK = 20
_LP_MIN_CELLS = 3  # co-activity cells for an edge (scale-free: cells, not counts)


@query(
    "q_link_predict",
    oracle=f"""
    WITH cell AS (
        SELECT DISTINCT user_id, event_type,
               epoch_us(ts) // 3600000000 AS h
        FROM events
    ),
    pair AS (
        SELECT ca.user_id AS u, cb.user_id AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM cell ca
        JOIN cell cb ON ca.event_type = cb.event_type AND ca.h = cb.h
                    AND ca.user_id < cb.user_id
        GROUP BY 1, 2
    ),
    e AS (SELECT u AS a, v AS b FROM pair WHERE c >= {_LP_MIN_CELLS}),
    nb AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY x),
    wedge AS (
        SELECT j1.y AS a, j2.y AS b, CAST(count(*) AS BIGINT) AS n_common
        FROM nb j1 JOIN nb j2 ON j1.x = j2.x AND j1.y < j2.y
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT w.a, w.b, w.n_common
        FROM wedge w LEFT JOIN e ON e.a = w.a AND e.b = w.b
        WHERE e.a IS NULL
    ),
    scored AS (
        SELECT c.a, c.b, c.n_common,
               CAST(c.n_common * 1000 // (da.d + db.d - c.n_common)
                    AS BIGINT) AS jacc_milli
        FROM cand c JOIN deg da ON da.x = c.a JOIN deg db ON db.x = c.b
    )
    SELECT a, b, n_common, jacc_milli,
           CAST(row_number() OVER (ORDER BY n_common DESC, jacc_milli DESC,
                                   a, b) AS BIGINT) AS rnk
    FROM (
        SELECT * FROM scored
        ORDER BY n_common DESC, jacc_milli DESC, a, b LIMIT {_LP_TOPK}
    )
    """,
)
def q_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION by common-neighbor count + neighborhood Jaccard
    (Liben-Nowell & Kleinberg 2003) over the user CO-ACTIVITY graph —
    an edge joins users sharing >= 3 distinct (event_type, hour)
    activity cells (a cell-count rule, so the edge definition is
    scale-free; the nation trade graph is complete and predicts
    nothing): for every NON-adjacent pair reachable through a shared
    neighbor, the common-neighbor count and neighborhood Jaccard in
    milli units — top-20 predicted links, fully integer, hash-gated.

    Scale: the edge builder is the LSH-bucket shape (cell equi-join
    group-and-expand, never user x user), candidates come from the
    wedge equi-join on the middle vertex (the q_triangles posture),
    adjacency is removed with one anti join, degrees ride vertex-keyed
    joins, and top-k is the heap operator.  Both stages are the shared
    builders in ``operators/graph.py``, which carry the skew guards for
    a skewed production graph (``coactivity_edges(max_cell=)`` drops
    degenerate hot cells before the pair join;
    ``common_neighbor_candidates(max_degree=)`` excludes hub middles
    from wedge enumeration) — both OFF here so the oracle is exact
    (VERDICT r08 item #2)."""
    from ..operators.graph import coactivity_edges, common_neighbor_candidates
    from ..tables import events

    cell = (
        events(spark, sf_dir)
        .select(
            "user_id",
            "event_type",
            F.expr("ts_us div 3600000000").alias("h"),
        )
        .distinct()
    )
    # one lazy localCheckpoint: the edge list is consumed by FIVE plan
    # branches (wedge j1/j2, the anti join, both degree joins); without
    # the lineage cut each branch replans the cell pair-join subtree
    # into its own physical copy (8 parquet scans in the r11 plan —
    # plans/r12/q_link_predict_before.txt), and only runtime exchange
    # reuse sometimes dedups them.  The RDD boundary makes all branches
    # share ONE edge build (guide §2.4); results are unchanged — the
    # capped twin has used the same device since round 11.  EAGER: the
    # five branches are CONCURRENT stages of one job — a lazy cut lets
    # them race and recompute the edge build before the cache fills
    # (measured +16% in the r12 interleaved A/B); eager guarantees one
    # build for one extra scheduling barrier.
    e = coactivity_edges(cell, min_cells=_LP_MIN_CELLS).localCheckpoint(
        eager=True
    )
    scored = common_neighbor_candidates(e).select(
        "a",
        "b",
        "n_common",
        F.expr("(n_common * 1000) div (da + db - n_common)")
        .cast("long")
        .alias("jacc_milli"),
    )
    top = scored.orderBy(
        F.col("n_common").desc(),
        F.col("jacc_milli").desc(),
        F.col("a").asc(),
        F.col("b").asc(),
    ).limit(_LP_TOPK)
    w = Window.orderBy(
        F.col("n_common").desc(),
        F.col("jacc_milli").desc(),
        F.col("a").asc(),
        F.col("b").asc(),
    )
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


@query(
    "q_degree_hist",
    oracle=f"""
    WITH cell AS (
        SELECT DISTINCT user_id, event_type,
               epoch_us(ts) // 3600000000 AS h
        FROM events
    ),
    pair AS (
        SELECT ca.user_id AS u, cb.user_id AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM cell ca
        JOIN cell cb ON ca.event_type = cb.event_type AND ca.h = cb.h
                    AND ca.user_id < cb.user_id
        GROUP BY 1, 2
    ),
    e AS (SELECT u AS a, v AS b FROM pair WHERE c >= {_LP_MIN_CELLS}),
    nb AS (SELECT a AS x FROM e UNION ALL SELECT b FROM e),
    deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY x)
    SELECT CAST(length(bin(d)) AS BIGINT) AS degree_bitlen,
           CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree,
           CAST(sum(d) AS BIGINT) AS degree_mass
    FROM deg GROUP BY 1
    """,
)
def q_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE DISTRIBUTION of the user co-activity graph in log2
    buckets (the q_dedup_stats size_bitlen device): per power-of-two
    degree band the vertex count, degree range, and degree mass — the
    skew profile that tells a graph pipeline whether hub mitigation
    (orientation, salting) is needed BEFORE running wedge-shaped
    operators like q_link_predict and q_triangles over it.

    Scale: edge build is the shared cell equi-join builder
    (``operators/graph.py coactivity_edges``, hot-cell guard available
    via ``max_cell`` — off here so the oracle is exact); degrees are one
    vertex-keyed aggregate; the histogram is a ~32-row rollup."""
    from ..operators.graph import coactivity_edges
    from ..tables import events

    cell = (
        events(spark, sf_dir)
        .select(
            "user_id",
            "event_type",
            F.expr("ts_us div 3600000000").alias("h"),
        )
        .distinct()
    )
    # eager lineage cut: nb's two union branches are concurrent stages
    # of the same job, so a lazy cut can compute the edge build twice
    # before the cache fills (guide §2.4; r12 A/B)
    e = coactivity_edges(cell, min_cells=_LP_MIN_CELLS).localCheckpoint(
        eager=True
    )
    nb = e.select(F.col("a").alias("x")).unionAll(
        e.select(F.col("b").alias("x"))
    )
    deg = nb.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
    return deg.groupBy(
        F.length(F.bin("d")).cast("long").alias("degree_bitlen")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.min("d").cast("long").alias("min_degree"),
        F.max("d").cast("long").alias("max_degree"),
        F.sum("d").cast("long").alias("degree_mass"),
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link scoring, bit-length variant (round 9b)
# ---------------------------------------------------------------------------


@query(
    "q_adamic_adar",
    oracle=f"""
    WITH cell AS (
        SELECT DISTINCT user_id, event_type,
               epoch_us(ts) // 3600000000 AS h
        FROM events
    ),
    pair AS (
        SELECT ca.user_id AS u, cb.user_id AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM cell ca
        JOIN cell cb ON ca.event_type = cb.event_type AND ca.h = cb.h
                    AND ca.user_id < cb.user_id
        GROUP BY 1, 2
    ),
    e AS (SELECT u AS a, v AS b FROM pair WHERE c >= {_LP_MIN_CELLS}),
    nb AS (
        SELECT a AS x, b AS y FROM e
        UNION ALL SELECT b, a FROM e
    ),
    deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY x),
    wedge AS (
        SELECT j1.y AS a, j2.y AS b,
               CAST(count(*) AS BIGINT) AS n_common,
               CAST(sum(1000 // length(bin(dm.d))) AS BIGINT) AS aa_milli
        FROM nb j1
        JOIN nb j2 ON j1.x = j2.x AND j1.y < j2.y
        JOIN deg dm ON dm.x = j1.x
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT w.* FROM wedge w
        WHERE NOT EXISTS (
            SELECT 1 FROM e WHERE e.a = w.a AND e.b = w.b
        )
    ),
    top AS (
        SELECT a, b, n_common, aa_milli,
               row_number() OVER (
                   ORDER BY aa_milli DESC, n_common DESC, a, b
               ) AS rnk
        FROM cand
    )
    SELECT a, b, n_common, aa_milli, CAST(rnk AS BIGINT) AS rnk
    FROM top WHERE rnk <= {_LP_TOPK}
    """,
)
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAMIC-ADAR link scoring (Adamic & Adar 2003), bit-length
    variant: common neighbors weighted by 1/log2(degree) so evidence
    through a selective mutual contact outweighs evidence through a
    hub — the weighting q_link_predict's raw common-neighbor count is
    blind to.  The libm-free house device (q_bigram_surprisal): weight
    = 1000 div bit_length(degree), within one bit of the true log and
    integer-exact under the full hash gate.

    Scale: identical wedge posture to q_link_predict (cell equi-join
    edge builder, middle-vertex wedge join, one anti join for
    adjacency) with ONE extra vertex-keyed broadcast-sized join
    attaching the middle's degree BEFORE aggregation; the same
    max_cell/max_degree skew guards apply via the shared builders.
    Top-k is the heap operator."""
    from ..operators.graph import coactivity_edges
    from ..tables import events

    cell = (
        events(spark, sf_dir)
        .select(
            "user_id",
            "event_type",
            F.expr("ts_us div 3600000000").alias("h"),
        )
        .distinct()
    )
    # one EAGER localCheckpoint for the four consuming branches (wedge
    # j1/j2 via nb, the degree join, the anti join) — same device and
    # rationale as q_link_predict (guide §2.4): the branches are
    # concurrent, a lazy cut lets them recompute the edge build
    e = coactivity_edges(cell, min_cells=_LP_MIN_CELLS).localCheckpoint(
        eager=True
    )
    nb = e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
        e.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    deg = nb.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
    # CPU repartition before the Σd² wedge self-join (optimization
    # round 13, the q_dedup_verify_editdist device): AQE coalesces the
    # byte-small edge-list shuffle to 1-2 tasks while the join output
    # explodes ~100x (measured 15.6 s → 3.2 s on the shared builder)
    mid = nb.repartition(
        int(spark.sparkContext.defaultParallelism), "x"
    )
    j1 = mid.select(F.col("x").alias("m"), F.col("y").alias("a"))
    j2 = mid.select(F.col("x").alias("m"), F.col("y").alias("b"))
    wedge = (
        j1.join(j2, "m")
        .where(F.col("a") < F.col("b"))
        .join(deg.select(F.col("x").alias("m"), "d"), "m")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum(F.expr("1000 div length(bin(d))"))
            .cast("long")
            .alias("aa_milli"),
        )
    )
    cand = wedge.join(e, ["a", "b"], "left_anti")
    order = [
        F.col("aa_milli").desc(),
        F.col("n_common").desc(),
        F.col("a").asc(),
        F.col("b").asc(),
    ]
    top = cand.orderBy(*order).limit(_LP_TOPK)
    w = Window.orderBy(*order)
    return top.select(
        "a",
        "b",
        "n_common",
        "aa_milli",
        F.row_number().over(w).cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# Bellman-Ford weighted shortest paths (round 9b)
# ---------------------------------------------------------------------------

_BF_INF = 1 << 40
_BF_ROUNDS = 24  # |V| - 1 on the <= 25-nation contracted graph

_BF_EDGES_SQL = f"""
    SELECT sn.n_nationkey AS src, cn.n_nationkey AS dst,
           CAST(sum(abs(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)))) AS BIGINT)
               // CAST(count(*) AS BIGINT) AS w
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer cu ON cu.c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = cu.c_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
    GROUP BY 1, 2 HAVING count(*) >= {_SCC_THRESHOLD}
"""


def _bf_oracle() -> str:
    inf = _BF_INF
    parts = [
        f"""WITH e AS ({_BF_EDGES_SQL}),
    nodes AS (
        SELECT DISTINCT src AS v FROM e UNION SELECT DISTINCT dst FROM e
    ),
    src0 AS (SELECT min(v) AS s FROM nodes),
    d_0 AS (
        SELECT v, CASE WHEN v = (SELECT s FROM src0)
                       THEN CAST(0 AS BIGINT)
                       ELSE CAST({inf} AS BIGINT) END AS dist
        FROM nodes
    )"""
    ]
    for k in range(1, _BF_ROUNDS + 1):
        parts.append(
            f"""d_{k} AS MATERIALIZED (
        SELECT n.v,
               least(min(p0.dist),
                     coalesce(min(p.dist + e.w), {inf})) AS dist
        FROM nodes n
        JOIN d_{k - 1} p0 ON p0.v = n.v
        LEFT JOIN e ON e.dst = n.v
        LEFT JOIN d_{k - 1} p ON p.v = e.src
        GROUP BY n.v
    )"""
        )
    parts.append(
        f"""SELECT CAST(d.v AS BIGINT) AS nationkey, nat.n_name AS n_name,
           CAST(CASE WHEN d.dist >= {inf} THEN -1 ELSE d.dist END
                AS BIGINT) AS latency_days
    FROM d_{_BF_ROUNDS} d JOIN nation nat ON nat.n_nationkey = d.v"""
    )
    return ",\n    ".join(parts[:-1]) + "\n    " + parts[-1]


@query("q_bellman_ford", oracle=_bf_oracle())
def q_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BELLMAN-FORD single-source shortest paths over the WEIGHTED
    heavy-trade digraph — edge weight = mean order-to-ship latency in
    integer days per (supplier nation → customer nation) lane, source =
    the smallest nation in the graph; answers "cheapest multi-hop
    routing latency to every market", the weighted question q_bfs_reach
    (hop counts) and q_scc (cycle structure) cannot.  Unreachable
    nations report -1.

    Spark-first shape: CONTRACT FIRST (the q_scc posture) — fact-scale
    work is the five-join edge projection with its integer mean-latency
    aggregate; relaxation then runs on the <= 25-node contracted graph,
    one edges⨝dist join + per-node min per round, localCheckpoint
    lineage cuts, fixpoint-with-cap (|V|-1 = 24 rounds covers any
    negative-cycle-free graph; weights are nonneg by construction).
    The oracle unrolls the same 24 relaxation rounds — idempotent after
    the fixpoint, the q_label_prop device."""
    from ..tables import load as load_tbl

    li = load_tbl(spark, sf_dir, "lineitem")
    supp = load_tbl(spark, sf_dir, "supplier")
    nat = load_tbl(spark, sf_dir, "nation")
    orders = load_tbl(spark, sf_dir, "orders")
    cust = load_tbl(spark, sf_dir, "customer")
    e = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("s_nationkey").cast("long").alias("src"),
            F.col("c_nationkey").cast("long").alias("dst"),
            F.abs(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            ).alias("days"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(
            F.expr(
                "CAST(CAST(sum(days) AS BIGINT) div count(*) AS BIGINT)"
            ).alias("w"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("n") >= _SCC_THRESHOLD)
        .select("src", "dst", "w")
        # lazy: the s0 min-collect below materializes it (round 12)
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    s0 = nodes.agg(F.min("v")).collect()[0][0]
    inf = _BF_INF
    if s0 is None:
        # sub-threshold graph (can happen below the declared sf):
        # empty result with the declared schema, mirroring the oracle.
        return spark.createDataFrame(
            [], "nationkey long, n_name string, latency_days long"
        )
    dist = nodes.select(
        "v",
        F.when(F.col("v") == s0, F.lit(0))
        .otherwise(F.lit(inf))
        .cast("long")
        .alias("dist"),
    ).localCheckpoint(eager=False)  # lazy: round 1's count materializes it
    for _ in range(_BF_ROUNDS):
        relaxed = (
            dist.alias("p")
            .join(e.alias("e"), F.col("p.v") == F.col("e.src"))
            .select(
                F.col("e.dst").alias("v"),
                (F.col("p.dist") + F.col("e.w")).alias("dist"),
            )
        )
        # lazy: the convergence count below is the action that
        # materializes this round (one job, not two — optimization
        # round 12)
        new = (
            dist.union(relaxed)
            .groupBy("v")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new.alias("n")
            .join(dist.alias("o"), "v")
            .where(F.col("n.dist") != F.col("o.dist"))
            .count()
        )
        dist = new
        if changed == 0:
            break
    nat_s = nat.select(
        F.col("n_nationkey").cast("long").alias("v"), "n_name"
    )
    return dist.join(F.broadcast(nat_s), "v").select(
        F.col("v").alias("nationkey"),
        "n_name",
        F.when(F.col("dist") >= inf, F.lit(-1))
        .otherwise(F.col("dist"))
        .cast("long")
        .alias("latency_days"),
    )


# ---------------------------------------------------------------------------
# Capped link prediction: the 100 TB hub-mitigation path, hash-gated
# (round 11, VERDICT r10 item #4)
# ---------------------------------------------------------------------------


def _p90(df: DataFrame, val: str, tiebreak: list) -> int:
    """Exact-rank p90 of a distribution column — the self-calibrating
    skew cap shared by the guarded wedge queries (q_link_predict_capped,
    q_adamic_adar_capped).  Uses the bucketed global-rank device (no
    partitionless window over the data-scale table) and collects ONE
    scalar (the documented bounded-collect class)."""
    from ..operators import ranking

    ranked = ranking.global_row_number(
        df,
        [F.col(val).asc()] + [c.asc() for c in tiebreak],
        bucket=F.length(F.bin(val)),
        out_col="rn",
    )
    k = df.count()
    pos = max((k * 9) // 10, 1)
    row = ranked.where(F.col("rn") == pos).select(val).collect()
    return int(row[0][0]) if row else 0


@query(
    "q_link_predict_capped",
    oracle=f"""
    WITH cell AS (
        SELECT DISTINCT user_id, event_type,
               epoch_us(ts) // 3600000000 AS h
        FROM events
    ),
    cs AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n
           FROM cell GROUP BY 1, 2),
    capc AS (
        SELECT n AS cap FROM (
            SELECT n, row_number() OVER (ORDER BY n, event_type, h) AS rn,
                   count(*) OVER () AS m
            FROM cs
        ) WHERE rn = greatest((m * 9) // 10, 1)
    ),
    kept AS (
        SELECT c.user_id, c.event_type, c.h
        FROM cell c JOIN cs USING (event_type, h) CROSS JOIN capc
        WHERE cs.n <= capc.cap
    ),
    pair AS (
        SELECT ca.user_id AS u, cb.user_id AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM kept ca
        JOIN kept cb ON ca.event_type = cb.event_type AND ca.h = cb.h
                    AND ca.user_id < cb.user_id
        GROUP BY 1, 2
    ),
    e AS (SELECT u AS a, v AS b FROM pair WHERE c >= {_LP_MIN_CELLS}),
    nb AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY x),
    capd AS (
        SELECT d AS cap FROM (
            SELECT d, row_number() OVER (ORDER BY d, x) AS rn,
                   count(*) OVER () AS k
            FROM deg
        ) WHERE rn = greatest((k * 9) // 10, 1)
    ),
    mid AS (SELECT nb.x, nb.y FROM nb JOIN deg USING (x) CROSS JOIN capd
            WHERE deg.d <= capd.cap),
    wedge AS (
        SELECT j1.y AS a, j2.y AS b, CAST(count(*) AS BIGINT) AS n_common
        FROM mid j1 JOIN mid j2 ON j1.x = j2.x AND j1.y < j2.y
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT w.a, w.b, w.n_common
        FROM wedge w LEFT JOIN e ON e.a = w.a AND e.b = w.b
        WHERE e.a IS NULL
    ),
    scored AS (
        SELECT c.a, c.b, c.n_common,
               CAST(c.n_common * 1000 // (da.d + db.d - c.n_common)
                    AS BIGINT) AS jacc_milli
        FROM cand c JOIN deg da ON da.x = c.a JOIN deg db ON db.x = c.b
    )
    SELECT a, b, n_common, jacc_milli,
           CAST(row_number() OVER (ORDER BY n_common DESC, jacc_milli DESC,
                                   a, b) AS BIGINT) AS rnk
    FROM (
        SELECT * FROM scored
        ORDER BY n_common DESC, jacc_milli DESC, a, b LIMIT {_LP_TOPK}
    )
    """,
)
def q_link_predict_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_link_predict with BOTH skew guards ON — the plan you actually
    run on a skewed production graph at 100 TB, now hash-gated (VERDICT
    r10 item #4: the guarded path was tested but never oracle-gated).

    The caps are SELF-CALIBRATING rather than constants, because a
    fixed cap cannot prune at every scale (sf0.01 cell sizes max out at
    10 while sf0.1's median is 27): cap = the exact-rank p90 of the
    cell-size / degree distribution (value at 1-based rank
    greatest(9m div 10, 1) under a total order), computed with the
    bucketed global-rank device (operators/ranking.py — no
    partitionless window over the user-scale degree table) and
    collected as a 1-ROW SCALAR (the documented bounded-collect class)
    that parameterizes the REAL guarded builders:
    ``coactivity_edges(max_cell=cap)`` drops hot cells before the pair
    join; ``common_neighbor_candidates(max_degree=cap)`` excludes hub
    middles from wedge enumeration while Jaccard degrees stay exact.
    The oracle CTE replicates both caps exactly (the q_containment
    max_bucket device).

    Scale: identical shapes to q_link_predict plus two rank-select
    jobs; the caps bound the pair join at max_cell·Σ|cell| and the
    wedge join at Σ_{{d≤cap}} d² — the two quadratic blowups hubs cause."""
    from ..operators.graph import coactivity_edges, common_neighbor_candidates
    from ..tables import events

    # lazy lineage cuts (optimization round 12): `cell` feeds the cap
    # distribution AND the edge build (was recomputed per job — the p90
    # count job, the p90 rank job, and the edge materialization each
    # replayed the events distinct); `cs` feeds both p90 jobs AND the
    # hot-cell guard join inside coactivity_edges (passed via sizes=).
    # Each now computes once and persists (guide §2.4).
    cell = (
        events(spark, sf_dir)
        .select(
            "user_id",
            "event_type",
            F.expr("ts_us div 3600000000").alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    cs = (
        cell.groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    cap_cell = _p90(cs, "n", [F.col("event_type"), F.col("h")])
    e = coactivity_edges(
        cell,
        min_cells=_LP_MIN_CELLS,
        max_cell=cap_cell,
        sizes=cs.select(
            "event_type", "h", F.col("n").alias("_cell_n")
        ),
    )
    # reused by deg, wedge, anti join — EAGER: the consumers are
    # concurrent stages (deg's p90 count is the first and would race
    # nothing, but the wedge/anti branches race each other on a lazy
    # cut); one blocking job buys a guaranteed single edge build
    e = e.localCheckpoint(eager=True)
    nb = e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
        e.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    deg = nb.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
    cap_deg = _p90(deg, "d", [F.col("x")])
    scored = common_neighbor_candidates(e, max_degree=cap_deg).select(
        "a",
        "b",
        "n_common",
        F.expr("(n_common * 1000) div (da + db - n_common)")
        .cast("long")
        .alias("jacc_milli"),
    )
    order = [
        F.col("n_common").desc(),
        F.col("jacc_milli").desc(),
        F.col("a").asc(),
        F.col("b").asc(),
    ]
    top = scored.orderBy(*order).limit(_LP_TOPK)
    w = Window.orderBy(*order)
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


@query(
    "q_adamic_adar_capped",
    oracle=f"""
    WITH cell AS (
        SELECT DISTINCT user_id, event_type,
               epoch_us(ts) // 3600000000 AS h
        FROM events
    ),
    cs AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n
           FROM cell GROUP BY 1, 2),
    capc AS (
        SELECT n AS cap FROM (
            SELECT n, row_number() OVER (ORDER BY n, event_type, h) AS rn,
                   count(*) OVER () AS m
            FROM cs
        ) WHERE rn = greatest((m * 9) // 10, 1)
    ),
    kept AS (
        SELECT c.user_id, c.event_type, c.h
        FROM cell c JOIN cs USING (event_type, h) CROSS JOIN capc
        WHERE cs.n <= capc.cap
    ),
    pair AS (
        SELECT ca.user_id AS u, cb.user_id AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM kept ca
        JOIN kept cb ON ca.event_type = cb.event_type AND ca.h = cb.h
                    AND ca.user_id < cb.user_id
        GROUP BY 1, 2
    ),
    e AS (SELECT u AS a, v AS b FROM pair WHERE c >= {_LP_MIN_CELLS}),
    nb AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY x),
    capd AS (
        SELECT d AS cap FROM (
            SELECT d, row_number() OVER (ORDER BY d, x) AS rn,
                   count(*) OVER () AS k
            FROM deg
        ) WHERE rn = greatest((k * 9) // 10, 1)
    ),
    mid AS (SELECT nb.x, nb.y FROM nb JOIN deg USING (x) CROSS JOIN capd
            WHERE deg.d <= capd.cap),
    wedge AS (
        SELECT j1.y AS a, j2.y AS b,
               CAST(count(*) AS BIGINT) AS n_common,
               CAST(sum(1000 // length(bin(dm.d))) AS BIGINT) AS aa_milli
        FROM mid j1
        JOIN mid j2 ON j1.x = j2.x AND j1.y < j2.y
        JOIN deg dm ON dm.x = j1.x
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT w.a, w.b, w.n_common, w.aa_milli
        FROM wedge w LEFT JOIN e ON e.a = w.a AND e.b = w.b
        WHERE e.a IS NULL
    )
    SELECT a, b, n_common, aa_milli,
           CAST(row_number() OVER (ORDER BY aa_milli DESC, n_common DESC,
                                   a, b) AS BIGINT) AS rnk
    FROM (
        SELECT * FROM cand
        ORDER BY aa_milli DESC, n_common DESC, a, b LIMIT {_LP_TOPK}
    )
    """,
)
def q_adamic_adar_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_adamic_adar with BOTH skew guards ON (VERDICT r11 item #1 —
    closing the registry's last unguarded quadratic-in-degree plan):
    the Adamic-Adar scoring you actually run on a hub-skewed production
    graph at 100 TB.  Same self-calibrating exact-rank p90 caps as
    q_link_predict_capped (the shared ``_p90`` device): hot cells are
    dropped before the pair join (``coactivity_edges(max_cell=cap)``)
    and hub middles are excluded from wedge enumeration, while the
    1/log2-degree weights stay EXACT per surviving middle (the deg
    table is built from the capped edge set BEFORE the degree cap, so
    weights are graph degrees, not post-filter artifacts).  The oracle
    CTE replicates both caps exactly.

    Scale: the pair join is bounded at max_cell·Σ|cell| and the wedge
    join at Σ_{{d≤cap}} d² — linear-ish in edges with a p90 constant —
    vs the uncapped baseline's unbounded Σd².  One extra vertex-keyed
    join attaches the middle's degree before aggregation; the uncapped
    q_adamic_adar stays registered as the oracle-exactness diagnostic."""
    from ..operators.graph import coactivity_edges
    from ..tables import events

    # lazy lineage cuts, same rationale as q_link_predict_capped
    # (optimization round 12): cell/cs each compute once across the p90
    # jobs and the edge build; cs doubles as the hot-cell guard table
    cell = (
        events(spark, sf_dir)
        .select(
            "user_id",
            "event_type",
            F.expr("ts_us div 3600000000").alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    cs = (
        cell.groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    cap_cell = _p90(cs, "n", [F.col("event_type"), F.col("h")])
    e = coactivity_edges(
        cell,
        min_cells=_LP_MIN_CELLS,
        max_cell=cap_cell,
        sizes=cs.select(
            "event_type", "h", F.col("n").alias("_cell_n")
        ),
    )
    # reused: deg, mid, weight, anti join — eager (concurrent stages
    # would race a lazy cut and recompute the edge build)
    e = e.localCheckpoint(eager=True)
    nb = e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
        e.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    deg = nb.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
    deg = deg.localCheckpoint(eager=False)  # reused: cap rank, filter, weight
    cap_deg = _p90(deg, "d", [F.col("x")])
    mid = nb.join(
        deg.where(F.col("d") <= cap_deg).select("x"), "x", "left_semi"
    )
    # CPU repartition before the wedge self-join (optimization round
    # 13) — same AQE-coalesce-vs-exploding-output rationale as the
    # shared builder (measured 15.6 s → 3.2 s there)
    mid = mid.repartition(
        int(spark.sparkContext.defaultParallelism), "x"
    )
    j1 = mid.select(F.col("x").alias("m"), F.col("y").alias("a"))
    j2 = mid.select(F.col("x").alias("m"), F.col("y").alias("b"))
    wedge = (
        j1.join(j2, "m")
        .where(F.col("a") < F.col("b"))
        .join(deg.select(F.col("x").alias("m"), "d"), "m")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum(F.expr("1000 div length(bin(d))"))
            .cast("long")
            .alias("aa_milli"),
        )
    )
    cand = wedge.join(e, ["a", "b"], "left_anti")
    order = [
        F.col("aa_milli").desc(),
        F.col("n_common").desc(),
        F.col("a").asc(),
        F.col("b").asc(),
    ]
    top = cand.orderBy(*order).limit(_LP_TOPK)
    w = Window.orderBy(*order)
    return top.select(
        "a",
        "b",
        "n_common",
        "aa_milli",
        F.row_number().over(w).cast("long").alias("rnk"),
    )


@query(
    "q_clustering_coeff",
    oracle=f"""
    WITH cell AS (
        SELECT DISTINCT user_id, event_type,
               epoch_us(ts) // 3600000000 AS h
        FROM events
    ),
    pair AS (
        SELECT ca.user_id AS u, cb.user_id AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM cell ca
        JOIN cell cb ON ca.event_type = cb.event_type AND ca.h = cb.h
                    AND ca.user_id < cb.user_id
        GROUP BY 1, 2
    ),
    e AS (SELECT u AS a, v AS b FROM pair WHERE c >= {_LP_MIN_CELLS}),
    nb AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY x),
    wedge AS (
        SELECT j1.x AS v, j1.y AS p, j2.y AS q
        FROM nb j1 JOIN nb j2 ON j1.x = j2.x AND j1.y < j2.y
    ),
    tri AS (
        SELECT w.v, CAST(count(*) AS BIGINT) AS t
        FROM wedge w JOIN e ON e.a = w.p AND e.b = w.q
        GROUP BY w.v
    ),
    cc AS (
        -- the ppm numerator rides HUGEINT (ADVICE r11 #2): t <= d^2/2
        -- makes 2000000*t ~ 10^6*d^2, past BIGINT at hub degree ~3e6;
        -- HUGEINT here / DECIMAL(38,0) on the Spark side keep both
        -- engines exact (and agreeing) to d ~ 10^16
        SELECT deg.x AS v, deg.d, coalesce(tri.t, 0) AS t,
               CAST(2000000 * CAST(coalesce(tri.t, 0) AS HUGEINT)
                    // (CAST(deg.d AS HUGEINT) * (deg.d - 1))
                    AS BIGINT) AS cc_ppm
        FROM deg LEFT JOIN tri ON tri.v = deg.x
        WHERE deg.d >= 2
    )
    SELECT v, d, t, cc_ppm,
           CAST(row_number() OVER (ORDER BY cc_ppm DESC, d DESC, v)
                AS BIGINT) AS rnk
    FROM (
        SELECT * FROM cc ORDER BY cc_ppm DESC, d DESC, v LIMIT 20
    )
    """,
)
def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL CLUSTERING COEFFICIENT (Watts & Strogatz 1998) per vertex
    of the user co-activity graph — how interlinked each user's
    neighborhood is (cc = closed wedges / possible wedges), the
    community-tightness read that complements q_triangles' global
    count and q_link_predict's open-wedge candidates: top-20 vertices
    by cc among degree ≥ 2, in exact integer PPM.

    Plan shape: the same cell equi-join edge builder (shared
    coactivity_edges), wedges enumerated at the MIDDLE vertex
    (q_triangles posture) and closed by ONE equi-join against the edge
    list (each triangle counts once per middle — exactly what the
    local coefficient wants, no /3 correction), degrees vertex-keyed,
    top-k the heap operator.

    Scale: wedge volume is Σd(x)² — the hub-guarded builders'
    max_cell/max_degree caps apply verbatim when a production graph
    needs them (q_link_predict_capped's p90 device); here they stay
    OFF so the oracle is exact."""
    from ..operators.graph import coactivity_edges
    from ..tables import events

    cell = (
        events(spark, sf_dir)
        .select(
            "user_id",
            "event_type",
            F.expr("ts_us div 3600000000").alias("h"),
        )
        .distinct()
    )
    # EAGER lineage cut: the wedge/degree/close branches are concurrent
    # stages of one job — lazy let them race and rebuild the edge list
    # (r12 A/B); the blocking materialization is the cheaper trade
    e = coactivity_edges(cell, min_cells=_LP_MIN_CELLS).localCheckpoint(
        eager=True
    )
    nb = e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
        e.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    deg = nb.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
    # CPU repartition before the wedge self-join (optimization round
    # 13) — same AQE-coalesce-vs-exploding-output rationale as the
    # shared builder (measured 15.6 s → 3.2 s there)
    mid = nb.repartition(
        int(spark.sparkContext.defaultParallelism), "x"
    )
    j1 = mid.select(F.col("x").alias("v"), F.col("y").alias("p"))
    j2 = mid.select(F.col("x").alias("v"), F.col("y").alias("q"))
    wedge = j1.join(j2, "v").where(F.col("p") < F.col("q"))
    tri = (
        wedge.join(
            e,
            (F.col("p") == F.col("a")) & (F.col("q") == F.col("b")),
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    cc = (
        deg.where(F.col("d") >= 2)
        .join(tri, deg.x == tri.v, "left")
        .select(
            F.col("x").alias("v"),
            "d",
            F.coalesce(F.col("t"), F.lit(0)).alias("t"),
            # the ppm numerator rides DECIMAL(38,0) (ADVICE r11 #2):
            # t <= d²/2 makes 2000000·t ~ 10⁶·d², past int64 at hub
            # degree ~3e6 — Spark would wrap silently (non-ANSI) where
            # the HUGEINT oracle answers; decimal keeps both exact
            F.expr(
                "CAST((CAST(2000000 AS DECIMAL(38,0)) * coalesce(t, 0))"
                " div (CAST(d AS DECIMAL(38,0)) * (d - 1)) AS BIGINT)"
            ).alias("cc_ppm"),
        )
    )
    order = [F.col("cc_ppm").desc(), F.col("d").desc(), F.col("v").asc()]
    top = cc.orderBy(*order).limit(20)
    w = Window.orderBy(*order)
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))
