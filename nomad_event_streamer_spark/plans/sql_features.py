"""Spark 4 SQL-surface features as declared queries: recursive CTEs,
lateral correlated subqueries, null-safe join semantics, SQL-defined
scalar functions, pipe-syntax queries, and collation-aware comparison
(SURVEY.md §2.13, round-7 additions).

The reference relay has no SQL surface at all (`app.rb:1-278` is a
single hard-wired stream pipeline); these queries prove the engine's
FRONT END breadth — the same declared semantics reachable through every
entry point Spark 4 offers, each one cross-checked against DuckDB's
independent implementation of the same ANSI feature (recursion,
LATERAL, IS NOT DISTINCT FROM) or against a plain-SQL rewrite where the
surface is Spark-specific (pipe syntax, SQL UDFs, collation).

Float policy: all emitted values are BIGINT counts/cents or strings, so
every query here carries a full value-hash oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from .registry import query

# Shared edge-projection SQL: distinct nation->nation trade edges
# (supplier nation ships to customer nation).  Interpolated into both
# the Spark text (suffixed views) and the DuckDB oracle (driver views)
# so the two recursions walk the SAME graph by construction.
_TRADE_EDGES_SQL = """
    SELECT DISTINCT sn.n_name AS src, cn.n_name AS dst
    FROM lineitem{sfx} l
    JOIN supplier{sfx} s ON s.s_suppkey = l.l_suppkey
    JOIN nation{sfx} sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders{sfx} o ON o.o_orderkey = l.l_orderkey
    JOIN customer{sfx} c ON c.c_custkey = o.o_custkey
    JOIN nation{sfx} cn ON cn.n_nationkey = c.c_nationkey
"""

_RECURSIVE_SQL = """
    WITH RECURSIVE
    edges AS ({edges}),
    reach(node, hop) AS (
        SELECT n_name, 0 FROM nation{sfx}
        WHERE n_name IN ('NATION_3', 'NATION_17')
        UNION ALL
        SELECT e.dst, r.hop + 1
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.hop < 3
    )
    SELECT node, CAST(min(hop) AS BIGINT) AS hops,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM reach GROUP BY node
"""


@query(
    "q_recursive_cte",
    oracle=_RECURSIVE_SQL.format(
        edges=_TRADE_EDGES_SQL.format(sfx=""), sfx=""
    ),
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine ``WITH RECURSIVE`` through Spark 4's SQL front end:
    bounded 3-round reachability (min hop + path count) from two seed
    nations over the nation-level trade graph — the same workload
    q_bfs_reach expresses as an iterative frontier join, here handled
    by the engine's own recursion operator (UnionLoop) and
    cross-checked against DuckDB's independent recursive-CTE
    implementation running the IDENTICAL SQL text.

    Scale: recursion runs on the CONTRACTED nation-level graph — the
    25^2-bounded edge list is the output of a one-pass distinct
    aggregation over the (100 TB) fact joins, so per-iteration state is
    seeds x nations^depth rows, independent of fact cardinality.  The
    hop bound (r.hop < 3) caps the loop; Spark additionally guards with
    spark.sql.cteRecursionLevelLimit."""
    for t in ("nation", "customer", "supplier", "orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"{t}_rcte")
    return spark.sql(
        _RECURSIVE_SQL.format(
            edges=_TRADE_EDGES_SQL.format(sfx="_rcte"), sfx="_rcte"
        )
    )


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.price_cents
    FROM (SELECT c_custkey FROM customer{sfx}
          WHERE c_mktsegment = 'BUILDING') c,
    LATERAL (SELECT o_orderkey,
                    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                        AS price_cents
             FROM orders{sfx} o WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


@query("q_lateral_topk", oracle=_LATERAL_SQL.format(sfx=""))
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 orders
    by price per BUILDING-segment customer — the per-group top-k
    workload (q_topk's window device) reached through the ANSI LATERAL
    surface instead.  Same SQL text runs on DuckDB's independent
    LATERAL implementation.  The unique (o_totalprice DESC, o_orderkey)
    sort key makes the LIMIT deterministic.

    Scale: Catalyst decorrelates the lateral into a ranked window over
    the orders side (one hash partition by o_custkey; no per-row
    re-execution), so the plan is the same shuffle-once top-k as
    q_topk — no nested-loop, no cartesian (pinned in
    test_plan_properties)."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"{t}_lat")
    return spark.sql(_LATERAL_SQL.format(sfx="_lat"))


@query(
    "q_null_safe_join",
    oracle="""
    WITH ca AS (SELECT nullif(c_nationkey % 5, 2) AS bucket,
                       count(*) AS c_cnt
                FROM customer GROUP BY 1),
         sa AS (SELECT nullif(s_nationkey % 5, 2) AS sbucket,
                       count(*) AS s_cnt
                FROM supplier GROUP BY 1)
    SELECT CAST(ca.bucket AS BIGINT) AS bucket, c_cnt, s_cnt
    FROM ca JOIN sa ON ca.bucket IS NOT DISTINCT FROM sa.sbucket
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / ``Column.eqNullSafe``): both
    sides aggregate to 5 nullable buckets (one bucket folded to NULL
    via nullif) BEFORE the join, so the NULL group joins 1-to-1 instead
    of exploding — then the null-safe condition matches NULL with NULL,
    which a plain equi-join would drop.  Oracle is DuckDB's
    IS NOT DISTINCT FROM, the ANSI spelling of the same semantics.

    Scale: pre-aggregation bounds both join inputs at the bucket
    cardinality (5 rows), so the null-safe join — which Spark executes
    as a hash join on the coalesced key — is a broadcast of two
    pocket-sized aggregates regardless of fact size."""
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    ca = cust.groupBy(
        F.nullif(F.col("c_nationkey") % 5, F.lit(2)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c_cnt"))
    sa = supp.groupBy(
        F.nullif(F.col("s_nationkey") % 5, F.lit(2)).alias("sbucket")
    ).agg(F.count(F.lit(1)).alias("s_cnt"))
    return (
        ca.join(F.broadcast(sa), ca["bucket"].eqNullSafe(sa["sbucket"]))
        .select(
            F.col("bucket").cast("long").alias("bucket"), "c_cnt", "s_cnt"
        )
    )


@query(
    "q_sql_udf",
    oracle="""
    SELECT l_returnflag,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'large' END AS band,
           count(*) AS n,
           CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                               + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_disc_cents
    FROM lineitem GROUP BY l_returnflag, band
    """,
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4 ``CREATE FUNCTION ...
    RETURN``): a cents-exact discount expression and a CASE banding
    function declared as named SQL UDFs, then used inside a grouped
    aggregate.  SQL UDFs are inlined by Catalyst at analysis time —
    the optimized plan is IDENTICAL to writing the expressions in
    place (whole-stage codegen, no Python boundary), which is exactly
    what the oracle does: DuckDB runs the inlined form, so a hash
    match proves the UDF layer is a zero-cost naming device.

    Scale: one partial+final aggregate pair over the fact scan; the
    UDF bodies are pure Column expressions, so 100 TB behavior equals
    the hand-inlined query's."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_udf")
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(
               p DOUBLE, d DOUBLE) RETURNS BIGINT
           RETURN CAST(floor(p * (1.0 - d) * 100.0 + 0.5) AS BIGINT)"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE)
           RETURNS STRING
           RETURN CASE WHEN q < 10 THEN 'small'
                       WHEN q < 30 THEN 'mid'
                       ELSE 'large' END"""
    )
    return spark.sql(
        """
        SELECT l_returnflag, qty_band(l_quantity) AS band,
               count(*) AS n,
               sum(disc_cents(l_extendedprice, l_discount))
                   AS sum_disc_cents
        FROM lineitem_udf GROUP BY l_returnflag, band
        """
    )


@query(
    "q_pipe_syntax",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>`` operators): filter -> EXTEND a
    cents projection -> AGGREGATE ... GROUP BY, the linear-dataflow
    spelling of a plain grouped aggregate.  Pipe operators are pure
    parser surface — Catalyst receives the same logical plan — so the
    oracle is the plain-SQL rewrite and a hash match proves the
    surfaces are semantically identical.

    Scale: identical plan to the plain form — pushed filter, partial
    aggregation, one shuffle on the 5-value priority key."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe")
    return spark.sql(
        """
        FROM orders_pipe
        |> WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |> EXTEND CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
               AS cents
        |> AGGREGATE count(*) AS n_orders, sum(cents) AS sum_cents
               GROUP BY o_orderpriority
        """
    )


@query(
    "q_collation_filter",
    oracle="""
    SELECT c_nationkey, count(*) AS n
    FROM (SELECT c_nationkey,
                 CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                      ELSE c_mktsegment END AS seg
          FROM customer)
    WHERE lower(seg) = 'building'
    GROUP BY c_nationkey
    """,
)
def q_collation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 ``UTF8_LCASE``): a
    deterministically case-mangled segment column filtered by equality
    under a case-insensitive collation, counted per nation.  DuckDB has
    no collation expression surface registered here, so the oracle is
    the semantic rewrite lower(seg) = 'building' — a hash match proves
    the collation comparator implements exactly case-fold equality.

    Scale: the collated predicate stays a scan-level filter (no join,
    no UDF); per-nation counts are one partial+final aggregate."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_coll")
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS n
        FROM (SELECT c_nationkey,
                     CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                          ELSE c_mktsegment END AS seg
              FROM customer_coll)
        WHERE seg = collate('BuIlDiNg', 'UTF8_LCASE')
        GROUP BY c_nationkey
        """
    )


_GBA_SQL = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders{sfx}
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY ALL
"""


@query("q_group_by_all", oracle=_GBA_SQL.format(sfx=""))
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (the infer-the-keys grouping shorthand both
    Spark and DuckDB ship): every non-aggregate select item becomes a
    grouping key.  The IDENTICAL SQL text runs on both engines — no
    per-engine rendering step to share a bug with (the
    fuzz_sql_surface discipline) — so a hash match proves the two
    front ends resolve the shorthand to the same grouping set.

    Scale: resolves to a plain two-key grouped aggregate — pushed
    filter, partial aggregation, one shuffle on the (priority, status)
    pair."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(_GBA_SQL.format(sfx="_gba"))


@query(
    "q_cluster_by",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER BY / DISTRIBUTE BY + SORT BY — the Spark SQL physical-
    layout clauses (Hive heritage) that request a repartition-by-key
    plus within-partition sort WITHOUT a global order: the idiom for
    preparing co-located, locally-sorted data for a downstream
    bucketed write or merge join.  Result contents are layout-
    invariant (what the oracle checks — the aggregate over the
    clustered relation equals the plain aggregate); the layout request
    itself is plan-pinned in tests/test_round9e_ops.py (exactly one
    hash Exchange on the cluster keys, a partition-local Sort, and NO
    global-order Exchange — the rangepartitioning a naive ORDER BY
    would insert).

    Scale: CLUSTER BY is the explicit form of the shuffle every
    groupBy implies — used standalone it gives the layout without an
    aggregate; the point at 100 TB is that SORT BY costs a local sort
    only, never the global range exchange of ORDER BY."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_cb_v"
    )
    clustered = spark.sql(
        "SELECT l_returnflag, l_linestatus, l_quantity "
        "FROM lineitem_cb_v CLUSTER BY l_returnflag, l_linestatus"
    )
    return clustered.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )
