"""Iterative graph algorithms: fixed-point PageRank.

PageRank is the canonical iterative-join workload: each round is
``ranks ⨝ edges → groupBy(dst) → sum``, repeated until convergence.  Two
Spark-specific design points:

* **Lineage must be cut per round.**  Ten rounds of join+agg stacked
  into one lazy plan re-executes the whole prefix on every action and
  blows the optimizer up; we ``localCheckpoint`` the rank vector each
  round (the Pregel/GraphX practice) so round i+1 reads a persisted
  O(|V|) RDD, not a 10-deep plan.  The cuts are LAZY (round 12): loops
  with no driver-side decisions materialize every round inside the
  consumer's one action instead of one blocking job per round.  The static
  ``edges ⨝ out-weight`` table is checkpointed once and reused — at
  100 TB the edge table is the big thing and it never re-shuffles after
  the first hash-partition on ``src``.
* **Arithmetic is fixed-point integer**, not float: ranks are BIGINT
  units of 1e-9 (1.0 == 1_000_000_000 units), per-edge contributions
  are ``(units * w) div ow`` and damping is ``(85 * s) div 100`` — all
  exact integer ops, so the result is bit-identical regardless of
  partitioning, summation order, or engine.  That makes an ITERATIVE
  algorithm value-hash oracle-able in DuckDB (the oracle unrolls the
  same 10 rounds as chained CTEs), where float PageRank would drift.
  Magnitudes: units ≤ 1e9, weights ≤ ~1e5 ⇒ products ≤ 1e14 ≪ 2^63.

Dangling mass (nodes with no out-edges) is dropped, not redistributed —
the common simplification; documented so the oracle matches by
construction.  No reference analog; EXT coverage (graph centrality over
relationship graphs is a standard corpus-curation signal, e.g. harmonic
/ PageRank filters in web-crawl pipelines like C4/RefinedWeb).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

TOTAL_UNITS = 1_000_000_000


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 10,
    damp_pct: int = 85,
) -> DataFrame:
    """Fixed-point PageRank over ``nodes(node)`` and weighted directed
    ``edges(src, dst, w)``; returns ``(node, units, rank)`` after
    ``iters`` synchronous rounds.

    ``units`` is the exact BIGINT fixed-point rank; ``rank`` is the
    single-division double view (units / 1e9).
    """
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank needs a non-empty node set")
    init = TOTAL_UNITS // n
    base = ((100 - damp_pct) * TOTAL_UNITS) // (100 * n)

    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # LAZY lineage cuts (optimization round 12): the loop has no
    # driver-side decisions (fixed iteration count), so nothing needs a
    # blocking materialization — the consumer's single action computes
    # all rounds back-to-back with each round's rank vector persisted at
    # its RDD boundary.  Eager cost 1 blocking job per round + 2 upfront
    # (guide §2.4/§5); values are exact integers, unchanged.
    e = (
        edges.join(outw, "src")
        .select("src", "dst", "w", "ow")
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select(
        "node", F.lit(init).cast("long").alias("units")
    ).localCheckpoint(eager=False)

    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                F.col("dst"), F.expr("units * w div ow").alias("c")
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"{damp_pct} * coalesce(s, 0L) div 100"
                    )
                ).cast("long").alias("units"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "node",
        "units",
        (F.col("units").cast("double") / F.lit(float(TOTAL_UNITS))).alias(
            "rank"
        ),
    )


def pagerank_oracle_sql(
    nodes_sql: str,
    edges_sql: str,
    iters: int = 10,
    damp_pct: int = 85,
) -> str:
    """Unroll the identical fixed-point rounds as chained DuckDB CTEs —
    the oracle half of the bit-exactness claim."""
    base = (
        f"(({100 - damp_pct}::BIGINT * {TOTAL_UNITS}) "
        f"// (100 * (SELECT count(*) FROM nodes)))"
    )
    parts = [
        f"WITH nodes AS ({nodes_sql})",
        f"edges AS ({edges_sql})",
        "e AS (SELECT src, dst, w, ow FROM edges JOIN "
        "(SELECT src, sum(w) AS ow FROM edges GROUP BY src) USING (src))",
        f"pr0 AS (SELECT node, {TOTAL_UNITS}::BIGINT // "
        "(SELECT count(*) FROM nodes) AS units FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"pr{i} AS (SELECT n.node, {base} + "
            f"({damp_pct} * COALESCE(c.s, 0)) // 100 AS units "
            "FROM nodes n LEFT JOIN ("
            "SELECT e.dst, sum((p.units * e.w) // e.ow) AS s "
            f"FROM e JOIN pr{i - 1} p ON p.node = e.src GROUP BY e.dst"
            ") c ON c.dst = n.node)"
        )
    return (
        ",\n".join(parts)
        + "\nSELECT node, CAST(units AS BIGINT) AS units, "
        f"CAST(units AS DOUBLE) / {TOTAL_UNITS}.0 "
        f"AS rank FROM pr{iters}"
    )


def triangles(und: DataFrame) -> DataFrame:
    """Enumerate triangles of an undirected simple graph given as
    canonical distinct edges ``(u, v)`` with ``u < v``.

    Compact-forward / degree orientation (Latapy 2008): each edge points
    from its lower-(degree, name) endpoint to the higher one — a total
    order, so every triangle is produced exactly once as a wedge at its
    lowest vertex closed by an oriented edge.  Out-degrees under this
    orientation are O(sqrt(|E|)) on ANY graph, which bounds the wedge
    join's fan-out on hub vertices — the difference between feasible and
    quadratic at 1e11 edges.  All joins are equi-joins on vertex ids
    (shuffle-partitioned by the join key); no floats anywhere, so the
    triple set is engine-exact.

    The edge list is cut EAGERLY before the degree/orientation plumbing:
    ``und`` feeds the degree union (2x), the orientation join and the
    closure side — five-plus concurrent consumers in one wedge job, the
    exact shape where a lazy cut races and recomputes (optimization
    round 12 classification), and without any cut the caller's upstream
    build is replayed once per consumer (q_triangles' fact joins
    appeared 15x / 180 parquet scans in the uncut plan).  ``oriented``
    gets the same eager cut: it is edge-sized and feeds both wedge sides
    plus the closing semi-join concurrently."""
    und = und.localCheckpoint(eager=True)
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = und.join(
        deg.select(F.col("n").alias("u"), F.col("deg").alias("du")), "u"
    ).join(deg.select(F.col("n").alias("v"), F.col("deg").alias("dv")), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    ).localCheckpoint(eager=True)
    o1 = oriented.select(
        "s", F.col("t").alias("t1"), F.col("dt").alias("d1")
    )
    o2 = oriented.select(
        "s", F.col("t").alias("t2"), F.col("dt").alias("d2")
    )
    wedges = o1.join(o2, "s").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("t1") < F.col("t2")))
    )
    closing = oriented.select(
        F.col("s").alias("t1"), F.col("t").alias("t2")
    )
    tri = wedges.join(closing, ["t1", "t2"], "left_semi")
    arr = F.sort_array(F.array("s", "t1", "t2"))
    return tri.select(
        arr[0].alias("a"), arr[1].alias("b"), arr[2].alias("c")
    )


def bfs_hops(
    nodes: DataFrame, edges: DataFrame, seeds: list[str], rounds: int
) -> DataFrame:
    """Bounded synchronous BFS: minimum hop distance (≤ ``rounds``) from
    the seed set over directed ``edges(src, dst)``.  Returns
    ``(node, hops)`` for reached nodes only.

    The SQL surface for this workload is Spark 4's recursive CTE
    (``q_recursive_cte`` runs the same seeds/rounds/graph through
    ``WITH RECURSIVE`` and the two are cross-checked in tests); this
    iterative-join loop with per-round ``localCheckpoint`` lineage cuts
    (same discipline as ``pagerank``) is the DataFrame-API twin, and
    adds the delta-frontier cut recursion cannot express.  DELTA frontier: each
    round joins edges against only the vertices discovered in the
    PREVIOUS round (in unweighted BFS a settled vertex can never
    improve), so total join work is O(|reached| × avg-degree) across
    all rounds — not rounds × that, as a full-dist-set join would be.
    Distances are integers, so the unrolled DuckDB oracle matches
    bit-for-bit."""
    # LAZY lineage cuts (optimization round 12): fixed round count, no
    # driver decisions — the consumer's one action materializes all
    # rounds with each frontier persisted; eager cost 2 blocking jobs
    # per round (guide §2.4/§5)
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    dist = (
        nodes.where(F.col("node").isin(seeds))
        .select("node", F.lit(0).cast("long").alias("hops"))
        .localCheckpoint(eager=False)
    )
    frontier = dist.select("node")
    for i in range(1, rounds + 1):
        reached = (
            e.join(frontier, e["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = reached.join(dist, "node", "left_anti").select(
            "node", F.lit(i).cast("long").alias("hops")
        ).localCheckpoint(eager=False)
        dist = dist.unionAll(new).localCheckpoint(eager=False)
        frontier = new.select("node")
    return dist


def bfs_oracle_sql(
    nodes_sql: str, edges_sql: str, seeds: list[str], rounds: int
) -> str:
    """Unroll the identical BFS rounds as chained DuckDB CTEs."""
    seed_list = ", ".join(f"'{s}'" for s in seeds)
    parts = [
        f"WITH nodes AS ({nodes_sql})",
        f"edges AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "d0 AS (SELECT node, CAST(0 AS BIGINT) AS hops FROM nodes "
        f"WHERE node IN ({seed_list}))",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} AS (SELECT node, CAST(min(hops) AS BIGINT) AS hops "
            f"FROM (SELECT node, hops FROM d{i - 1} "
            f"UNION ALL SELECT e.dst AS node, p.hops + 1 AS hops "
            f"FROM edges e JOIN d{i - 1} p ON p.node = e.src) GROUP BY node)"
        )
    return ",\n".join(parts) + f"\nSELECT node, hops FROM d{rounds}"


def kcore(
    edges: DataFrame,
    k: int = 2,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 30,
    return_rounds: bool = False,
):
    """k-core decomposition by iterative peeling (Seidman 1983, "Network
    structure and minimum degree" — public): repeatedly delete nodes
    with degree < k (and their edges) until every remaining node has
    degree >= k.  On a near-dup candidate graph the 2-core separates
    REAL duplicate clusters (mutually supported by >= 2 co-bucket
    edges) from incidental single-edge LSH collisions — the pruning a
    curation pipeline applies before trusting cluster membership.

    Output: (doc_id, core_degree) for every node in the k-core, with
    its degree counted inside the core.  With ``return_rounds=True``
    returns ``(result, peel_rounds)`` so callers/tests can pin the
    measured peel depth under an oracle's fixed unroll count without
    process-global state (ADVICE r08 #3 replaced the old
    ``kcore.last_peel_rounds`` function attribute, which raced across
    invocations).

    Scale shape: each peel round is one degree aggregation (map-side
    combinable on the node key) + two left-semi joins thinning the
    edge list — no step materializes a neighborhood list, so a
    billion-edge round is key-partial shuffles only; ``localCheckpoint``
    truncates lineage per round.  Converges in O(peel depth) rounds —
    near-dup graphs are shallow (measured 2-4).  Raises past
    ``max_iter`` (a silent partial peel would be a wrong answer)."""
    # lazy: the count below is the materializing action (one job, not
    # two — optimization round 12)
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .localCheckpoint(eager=False)
    )
    # Carry the previous round's edge count forward — re-counting the
    # prior edge list each round doubled the count jobs (ADVICE r07).
    n_before = e.count()
    for rounds in range(1, max_iter + 1):
        e2 = _peel_once(e, k).localCheckpoint(eager=False)
        n_after = e2.count()
        e = e2
        if n_after == n_before:
            # Convergence round, observable via return_rounds so the
            # oracle's fixed unroll count can be asserted >= the
            # measured peel depth (ADVICE r07: a graph deeper than the
            # unroll would silently yield a partially-peeled oracle).
            und = e.select("s", "d").union(
                e.select(F.col("d").alias("s"), F.col("s").alias("d"))
            )
            result = (
                und.groupBy("s")
                .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
                .select(F.col("s").alias("doc_id"), "core_degree")
            )
            return (result, rounds) if return_rounds else result
        n_before = n_after
    raise RuntimeError(f"kcore did not converge in {max_iter} peels")


def _peel_once(e: DataFrame, k: int) -> DataFrame:
    """One peel round on an (s, d) edge list: drop edges touching any
    node of degree < k.  A named seam so the plan shape (degree agg +
    two LEFT SEMI joins on the node key — never an inner-join
    neighborhood materialization) is pin-testable per round, which the
    checkpointed full loop hides from its final executed plan."""
    und = e.select("s", "d").union(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    keep = deg.where(F.col("deg") >= k).select("s")
    return (
        e.join(keep, "s", "left_semi")
        .join(keep.select(F.col("s").alias("d")), "d", "left_semi")
        .select("s", "d")
    )


def kcore_oracle_sql(k: int = 2, rounds: int = 8) -> str:
    """Unrolled peel rounds (the label-prop / pagerank unrolling device
    — recursive CTEs can only ADD rows, peeling DELETES, so rounds are
    materialized e_0..e_R; extra rounds past the fixpoint are no-ops).
    The caller's WITH chain must already define ``edges(doc_a, doc_b)``
    and end with a comma; this returns the e_0..e_R parts plus the
    final core-degree SELECT."""
    parts = [f"""
    e_0 AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM edges)"""]
    for i in range(1, rounds + 1):
        parts.append(f"""
    deg_{i - 1} AS MATERIALIZED (
        SELECT s, count(*) AS deg FROM (
            SELECT s, d FROM e_{i - 1}
            UNION ALL SELECT d, s FROM e_{i - 1}
        ) GROUP BY s
    ),
    keep_{i - 1} AS (SELECT s FROM deg_{i - 1} WHERE deg >= {k}),
    e_{i} AS MATERIALIZED (
        SELECT e.s, e.d FROM e_{i - 1} e
        JOIN keep_{i - 1} ka ON ka.s = e.s
        JOIN keep_{i - 1} kb ON kb.s = e.d
    )""")
    return (
        ",\n".join(parts)
        + f"""
    SELECT s AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
    FROM (SELECT s, d FROM e_{rounds} UNION ALL SELECT d, s FROM e_{rounds})
    GROUP BY s
    """
    )


def coactivity_edges(
    cells: DataFrame,
    min_cells: int = 3,
    max_cell: int | None = None,
    user_col: str = "user_id",
    cell_cols: tuple[str, ...] = ("event_type", "h"),
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Co-activity edge builder (shared by q_link_predict /
    q_degree_hist): users sharing >= ``min_cells`` distinct activity
    cells get an edge (a, b) with a < b.

    The pair build is the LSH-bucket shape — a cell equi-join on the
    cell key, never user x user.  ``max_cell`` is the hub/skew guard
    mirroring ``dedup.lsh_candidate_pairs(max_bucket=)`` (VERDICT r08
    item #2): a degenerate cell (an event type every user fires within
    the same hour — think "heartbeat at the top of the hour" on a
    production graph) expands quadratically in the pair join; capping
    drops whole hot cells BEFORE the join, so the Σ|cell|² pair volume
    is bounded by max_cell · Σ|cell| and the surviving edges keep their
    exact evidence count from the remaining cells.  Off by default —
    the registered queries and their oracles run uncapped.

    ``sizes`` (optimization round 12): callers that already computed
    the per-cell count table — the capped queries build it anyway for
    the p90 cap — pass it here (columns ``cell_cols`` + ``_cell_n``) so
    the guard join reuses that table instead of re-aggregating
    ``cells``.  Pure execution reuse; the kept set is identical.
    """
    keyed = cells.select(F.col(user_col).alias("u"), *cell_cols)
    if max_cell is not None:
        if sizes is None:
            sizes = keyed.groupBy(*cell_cols).agg(
                F.count(F.lit(1)).alias("_cell_n")
            )
        keyed = (
            keyed.join(sizes, list(cell_cols))
            .where(F.col("_cell_n") <= max_cell)
            .drop("_cell_n")
        )
    # Explicit CPU repartition before the exploding pair join
    # (optimization round 13, the q_dedup_verify_editdist device): AQE
    # coalesces the byte-small cell shuffle (~MBs) to one or two
    # partitions, serializing the Σ|cell|² pair generation + partial
    # aggregation on a single core — measured 2.3 s → 1.5 s here and
    # 15.6 s → 3.2 s on the downstream wedge join at sf0.1/local[32].
    # Explicit numPartitions is exempt from AQE coalescing;
    # defaultParallelism keeps it scale-adaptive, not a local constant.
    keyed = keyed.repartition(
        int(cells.sparkSession.sparkContext.defaultParallelism),
        *cell_cols,
    )
    other = keyed.select(F.col("u").alias("v"), *cell_cols)
    return (
        keyed.join(other, list(cell_cols))
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.col("c") >= min_cells)
        .select(F.col("u").alias("a"), F.col("v").alias("b"))
    )


def common_neighbor_candidates(
    e: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """Non-adjacent candidate pairs with common-neighbor counts and
    endpoint degrees, from an undirected edge list (a < b): the wedge
    equi-join at the middle vertex (the q_triangles posture), adjacency
    removed with one anti join, degrees via vertex-keyed joins.

    ``max_degree`` is the degree-oriented wedge cap behind the same
    flag as ``coactivity_edges(max_cell=)`` (VERDICT r08 item #2): the
    wedge join's volume is Σ d(x)² over middle vertices, so one hub of
    degree 10⁶ alone contributes 10¹² wedges; capping excludes
    middle vertices with degree > max_degree from wedge ENUMERATION
    only (hub-mediated evidence is the least informative — everyone is
    "similar" through a hub), while degrees in the Jaccard denominator
    stay exact.  Off by default.

    Output columns: a, b, n_common, da, db.
    """
    nb = e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
        e.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    deg = nb.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
    mid = nb
    if max_degree is not None:
        mid = nb.join(
            deg.where(F.col("d") <= max_degree).select("x"), "x", "left_semi"
        )
    # CPU repartition before the Σd² wedge self-join (optimization
    # round 13): the edge-list input is byte-small, so AQE coalesces
    # the join to 1-2 tasks while its OUTPUT explodes ~100x — measured
    # 15.6 s single-task vs 3.2 s spread at sf0.1/local[32].  Both join
    # sides derive from this one repartitioned table, so they are
    # co-partitioned and the join adds no further exchange.
    mid = mid.repartition(
        int(e.sparkSession.sparkContext.defaultParallelism), "x"
    )
    j1 = mid.select(F.col("x").alias("m"), F.col("y").alias("a"))
    j2 = mid.select(F.col("x").alias("m"), F.col("y").alias("b"))
    wedge = (
        j1.join(j2, "m")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    cand = wedge.join(e, ["a", "b"], "left_anti")
    return cand.join(
        deg.select(F.col("x").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("x").alias("b"), F.col("d").alias("db")), "b")


def louvain_level0(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Louvain level-0 community assignment (Blondel et al. 2008, "Fast
    unfolding of communities in large networks"), SYNCHRONOUS variant
    (Staudt & Meyerhenke 2016's parallel formulation): every node starts
    as its own community and in each round ALL nodes simultaneously move
    to the neighboring community with the best modularity gain, computed
    against the PREVIOUS round's assignment.  The classic sequential
    sweep is visit-order-dependent (unreproducible across partitionings);
    the synchronous variant with a total-order tie-break (highest gain,
    then smallest community id) is deterministic — which is what lets an
    iterative community detector pass a full value-hash oracle
    (`louvain_oracle_sql` unrolls the same rounds as DuckDB CTEs).

    Naive synchronous updates oscillate: singleton pairs trade ids
    forever (measured on the sf0.01 candidate graph as 52/54
    communities stuck at size 1), and the partial swap-breaking rule
    from parallel Louvain implementations (Grappolo: singleton->
    singleton moves only downward in id) still chases moving targets
    in 3-chains (measured: a bridged-triangle pair never settled).
    The rule here is fully MONOTONE: a node may move only to a
    community with a SMALLER id than its current one (gain-gated as
    usual, staying always a candidate).  Community labels are then
    non-increasing per node, so the process cannot oscillate and
    reaches a fixpoint — the min-label-propagation convergence
    argument (q_dedup_clusters) applied to gain-gated moves.  The cost
    is a label-flow bias toward small ids (labels are arbitrary
    anyway); the gain gate is what blocks low-gain bridge edges, which
    is the audit semantics that matters.

    Integer-exact gain comparison: argmax_C of the modularity gain for
    node u equals argmax_C of ``2m * k_uC - k_u * (tot(C) - k_u if C ==
    own else tot(C))`` — all BIGINT (2m <= 2|E|, products < 2^63 at any
    realistic candidate-graph size).  Staying put is always a candidate
    (k_u,own counted from real neighbors, 0 if none), so a round never
    forces a bad move.

    Returns (node, comm) for every node with degree >= 1.

    Scale shape: per round ONE edge-keyed join (neighbor communities) +
    one (node, comm) partial-agg vote + one comm-keyed degree sum + an
    argmax window partitioned by node — all shuffles on node/comm keys,
    lineage checkpointed per round; rounds is a small constant, never
    data-sized.  Hub nodes cost their degree in vote rows, not degree²."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.select(F.col("a").alias("s"), F.col("b").alias("d")).union(
        e.select(F.col("b").alias("s"), F.col("a").alias("d"))
    ).localCheckpoint(eager=False)  # lazy: the m2 count materializes it
    deg = und.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("k"))
    m2 = und.count()  # sum of degrees == 2m (driver holds ONE integer)
    comm = deg.select(F.col("s").alias("node"), F.col("s").alias("comm"))
    from pyspark.sql import Window as W

    for _ in range(rounds):
        nbr = und.join(
            comm.select(F.col("node").alias("d"), "comm"), "d"
        ).select(F.col("s").alias("u"), "comm")
        votes = nbr.groupBy("u", "comm").agg(
            F.count(F.lit(1)).cast("long").alias("kuc")
        )
        own = comm.select(
            F.col("node").alias("u"), "comm", F.lit(0).cast("long").alias("kuc")
        )
        cand = (
            votes.unionByName(own)
            .groupBy("u", "comm")
            .agg(F.max("kuc").alias("kuc"))
        )
        tot = (
            comm.join(deg, comm["node"] == deg["s"])
            .groupBy("comm")
            .agg(F.sum("k").cast("long").alias("tot"))
        )
        scored = (
            cand.join(tot, "comm")
            .join(
                comm.select(
                    F.col("node").alias("u"), F.col("comm").alias("own_c")
                ),
                "u",
            )
            .join(deg.select(F.col("s").alias("u"), "k"), "u")
            # monotone move rule: only downward in community id
            # (staying is never filtered — own rows have comm == own_c)
            .where(F.col("comm") <= F.col("own_c"))
            .withColumn(
                "score",
                F.lit(m2) * F.col("kuc")
                - F.col("k")
                * (
                    F.col("tot")
                    - F.when(F.col("comm") == F.col("own_c"), F.col("k"))
                    .otherwise(F.lit(0))
                ),
            )
        )
        w = W.partitionBy("u").orderBy(F.col("score").desc(), F.col("comm").asc())
        # lazy per-round cut (optimization round 12): fixed round count,
        # so all rounds materialize inside the consumer's one action
        comm = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("u").alias("node"), "comm")
            .localCheckpoint(eager=False)
        )
    return comm


def louvain_oracle_sql(rounds: int = 3) -> str:
    """Unrolled DuckDB twin of ``louvain_level0`` — expects CTEs
    ``edges(doc_a, doc_b)`` already defined; emits ``node, comm`` as
    CTE ``c_{rounds}`` plus the shared prologue.  Caller appends its
    own SELECT over ``c_{rounds}``."""
    parts = [
        "und AS (SELECT doc_a AS s, doc_b AS d FROM edges "
        "UNION ALL SELECT doc_b, doc_a FROM edges)",
        "deg AS (SELECT s, CAST(count(*) AS BIGINT) AS k FROM und GROUP BY s)",
        "m2 AS (SELECT CAST(sum(k) AS BIGINT) AS v FROM deg)",
        "c_0 AS (SELECT s AS node, s AS comm FROM deg)",
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        parts.append(
            f"""votes_{t} AS (
        SELECT und.s AS u, c.comm AS c, CAST(count(*) AS BIGINT) AS kuc
        FROM und JOIN c_{p} c ON c.node = und.d GROUP BY 1, 2
    ),
    cand_{t} AS (
        SELECT u, c, max(kuc) AS kuc FROM (
            SELECT u, c, kuc FROM votes_{t}
            UNION ALL SELECT node, comm, 0 FROM c_{p}
        ) GROUP BY u, c
    ),
    tot_{t} AS (
        SELECT comm AS c, CAST(sum(k) AS BIGINT) AS tot
        FROM c_{p} JOIN deg ON deg.s = c_{p}.node GROUP BY comm
    ),
    c_{t} AS MATERIALIZED (
        SELECT u AS node, c AS comm FROM (
            SELECT cand.u, cand.c,
                   row_number() OVER (
                       PARTITION BY cand.u
                       ORDER BY (SELECT v FROM m2) * cand.kuc
                             - deg.k * (tot_{t}.tot
                                 - CASE WHEN cand.c = own.comm
                                        THEN deg.k ELSE 0 END) DESC,
                             cand.c ASC
                   ) AS rn
            FROM cand_{t} cand
            JOIN tot_{t} ON tot_{t}.c = cand.c
            JOIN c_{p} own ON own.node = cand.u
            JOIN deg ON deg.s = cand.u
            WHERE cand.c <= own.comm
        ) WHERE rn = 1
    )"""
        )
    return ",\n    ".join(parts)


def grid_components(
    core: DataFrame, max_rounds: int = 16
) -> tuple[DataFrame, int]:
    """Connected components of occupied grid cells under 8-neighborhood
    adjacency, by synchronous min-label propagation WITH SHORTCUTTING:
    each round a cell takes the min over (a) its 9-neighborhood's
    labels and (b) the label OF its current label's cell (labels are
    linearized cell ids, so a label decodes back to joinable
    coordinates).  Plain neighbor-prop needs graph-DIAMETER rounds —
    measured non-convergent at 16 rounds on the ×10 replica grid, the
    q_dedup_clusters_star lesson replayed.  HONEST COMPLEXITY (round 10
    — the widened dbscan knob fuzz falsified round 9's "O(log d), 16
    rounds covers 2^16" claim): the shortcut jumps to the ball-MINIMUM
    cell, which doubles reach only TOWARD the component minimum;
    propagation of the minimum back outward is pointer-assisted but not
    doubling, so depth is between log(d) and d (measured: g=15, mp=1 →
    401 cells / 70 components needed 19 rounds at component diameter
    ~40 — the 16-round cap raised loudly, exactly as designed).  A
    second shortcut per round was tried and rejected: it compounds
    Catalyst's per-round size-estimate product until stats estimation
    itself OOMs (BigInteger blowup), for only a constant-factor round
    saving.  Callers in deep-component regimes pass a larger
    ``max_rounds`` (the fuzz sweep uses 40 with a matching 40-round
    oracle unroll); graphs whose DIAMETER grows with data size should
    route to ``dedup.connected_components_star`` (O(log²) rounds,
    shape-independent) — the registered q_dbscan_grid grid is
    embedding-domain-bounded (≤66×66 cells at g=40), so its 16-round
    cap + loud raise is the right valve.  Deterministic (a pure
    function of the previous round), so a fixed oracle unroll replays
    it exactly; localCheckpoint cuts lineage per round (the kcore
    posture).  Returns ``(labels, rounds)``
    so callers/tests can pin the measured depth against the oracle's
    unroll (ADVICE r08: no function-attribute state).

    ``core`` must have BIGINT columns cx, cy, each in [-32768, 32767] —
    the label linearization (cx+32768)*65536 + (cy+32768) is only
    bijective on that domain, and an out-of-range cell would ALIAS into
    another cell's label (silently wrong components).  A per-row
    raise_error guard inside the label expression enforces it loudly
    (ADVICE r09) at zero extra jobs: the branch only evaluates on a
    violating row.  Raises past ``max_rounds`` — a silent partial
    propagation would be a wrong answer (the q_kcore rule)."""
    spark = core.sparkSession
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long",
    )
    lab = core.select(
        "cx",
        "cy",
        F.expr(
            "CASE WHEN cx < -32768 OR cx > 32767"
            "       OR cy < -32768 OR cy > 32767"
            " THEN CAST(raise_error(concat('grid_components: cell (',"
            " cx, ',', cy, ') outside the [-32768,32767] label domain"
            " — labels would alias')) AS BIGINT)"
            " ELSE (cx + 32768) * 65536 + (cy + 32768) END"
        ).alias("lab"),
    ).localCheckpoint(eager=False)  # lazy: round 1's agg materializes it
    rounds = 0
    while True:
        via_nbr = (
            lab.crossJoin(F.broadcast(offsets))
            .select(
                (F.col("cx") + F.col("dx")).alias("cx"),
                (F.col("cy") + F.col("dy")).alias("cy"),
                "lab",
            )
            .join(core, ["cx", "cy"])
            .groupBy("cx", "cy")
            .agg(F.min("lab").alias("nl"))
        )
        # via_ptr carries the cell's OWN label through (``ol``), so the
        # convergence check below is a sum over the round output — the
        # prior shape re-joined new vs old labels (an extra cell-keyed
        # shuffle) and ran the eager checkpoint + count as two jobs
        # (optimization round 12, guide §2.4)
        via_ptr = (
            lab.select(
                "cx",
                "cy",
                F.col("lab").alias("ol"),
                F.expr("lab div 65536 - 32768").alias("lx"),
                F.expr("lab % 65536 - 32768").alias("ly"),
            )
            .join(
                lab.select(
                    F.col("cx").alias("lx"),
                    F.col("cy").alias("ly"),
                    F.col("lab").alias("pl"),
                ),
                ["lx", "ly"],
            )
            .select("cx", "cy", "ol", "pl")
        )
        new = (
            via_nbr.join(via_ptr, ["cx", "cy"])
            .select(
                "cx",
                "cy",
                F.least(F.col("nl"), F.col("pl")).alias("lab"),
                (F.least(F.col("nl"), F.col("pl")) < F.col("ol"))
                .cast("long")
                .alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        rounds += 1
        # sum over an EMPTY table is NULL, not 0 — coalesce so an empty
        # cell grid converges on round 1 instead of spinning to max_rounds
        changed = new.agg(F.coalesce(F.sum("_chg"), F.lit(0))).collect()[0][0]
        lab = new.drop("_chg")
        if changed == 0:
            return lab, rounds
        if rounds >= max_rounds:
            raise RuntimeError(
                f"grid components not converged in {max_rounds} rounds"
            )
