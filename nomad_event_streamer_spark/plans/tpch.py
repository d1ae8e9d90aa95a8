"""TPC-H-shaped relational queries beyond the Q1/Q6/Q18 SQL surface and the
Q3/Q5 shapes in ``advanced.py`` — adapted to the driver's star schema
(FIXTURES.md §B: no partsupp, no l_shipmode/l_commitdate/o_shippriority, so
each query keeps its reference shape on the columns that exist).

Reference parity note: the reference stream processor (``app.rb:106-278``)
has no relational surface at all; these rows are EXT coverage proving the
Spark engine handles the classic decision-support join/subquery patterns a
user migrating analytics onto this repo would run.  Scale notes per query:
every dimension side is broadcast-eligible, every predicate is
parquet-pushable, and aggregates are map-side-combinable decimal sums.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import ORACLE_ROUND2, ORACLE_ROUND4, load, round2, round4
from .registry import query

_REV_DEC = (
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)


def _revenue():
    """Decimal-exact revenue sum, order-insensitive across partitions."""
    return F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("double")


@query(
    "q_tpch_q4_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS decorrelated to a
    LEFT SEMI join with a non-equi residual (l_shipdate > o_orderdate).
    Catalyst keeps the equi key l_orderkey=o_orderkey as the shuffle key and
    evaluates the residual post-match, so the semi join stays hash-based —
    at 100 TB this is one shuffle on orderkey with the date filter pushed
    into the orders scan."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_tpch_q10_returns",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {ORACLE_ROUND2.format(x=_REV_DEC)} AS revenue
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item revenue per customer): fact chain
    orders⨝lineitem with the 'R' returnflag + date-quarter filters pushed to
    the scans, nation broadcast onto customer, decimal-exact revenue, and a
    top-20 that compiles to TakeOrderedAndProject (per-partition heap + one
    driver merge — no global sort at any scale).  LIMIT tiebreak c_custkey
    is unique, so membership is deterministic cross-engine."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        cust.join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round2(_revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q14_promo",
    oracle=f"""
    SELECT {ORACLE_ROUND4.format(
        x="100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN "
          "CAST(l_extendedprice AS DECIMAL(18,2)) "
          "* (1 - CAST(l_discount AS DECIMAL(18,2))) "
          "ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) "
          "/ " + _REV_DEC
    )} AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): one month of lineitem joined to
    part (broadcast — part is the small dim), a conditional decimal sum for
    the PROMO share, one global ratio.  Both sums ride the same partial
    aggregation pass; the month predicate prunes the lineitem scan.  The
    final single-row agg is a 1-partition exchange of two decimals."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev_dec = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev_dec).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).cast("double")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            round4(F.lit(100.0) * promo / _revenue()).alias("promo_revenue_pct")
        )
    )


@query(
    "q_tpch_q19_disjunctive",
    oracle=f"""
    SELECT count(*) AS n_matched,
           {ORACLE_ROUND2.format(x=_REV_DEC)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    classic OR-of-ANDs across both join sides.  Catalyst extracts the
    common join key and pushes the per-side disjunction components down
    (p_brand/p_size unions to the part scan, l_quantity range to lineitem)
    before evaluating the full residual — the pattern that separates a
    predicate-pushdown optimizer from a naive one.  part broadcasts."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem")
    b = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(b)
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            round2(_revenue()).alias("revenue"),
        )
    )


@query(
    "q_tpch_q22_balance",
    oracle="""
    WITH thresh AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS cutoff
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS totacctbal
    FROM customer, thresh
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) > CAST(cutoff AS DECIMAL(18,2))
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar-subquery
    threshold (avg positive balance) broadcast as a 1-row cross join, NOT
    EXISTS decorrelated to a LEFT ANTI join on o_custkey, grouped by nation
    key.  The threshold compare happens in DECIMAL on both engines so the
    cutoff boundary is exact.  At scale: the 1-row aggregate broadcasts for
    free; the anti join is the only shuffle."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    cutoff = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cutoff")
        )
    )
    return (
        cust.join(F.broadcast(cutoff))
        .where(
            F.col("c_acctbal").cast("decimal(18,2)")
            > F.col("cutoff").cast("decimal(18,2)")
        )
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q7_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {ORACLE_ROUND2.format(x=_REV_DEC)} AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
    """,
)
def q_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between nation pair, testdata nation names): the nation
    dim plays TWO roles (supplier side, customer side) — each broadcast
    independently, with the pair disjunction evaluated after both are
    attached.  Fact chain lineitem→orders shuffles on orderkey once; all
    dims broadcast.  Revenue decimal-exact, grouped by role-played names
    + ship year."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(round2(_revenue()).alias("revenue"))
    )


@query(
    "q_tpch_q8_share",
    oracle=f"""
    SELECT l_year,
           {ORACLE_ROUND4.format(
               x="CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev "
                 "ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) "
                 "/ CAST(sum(rev) AS DOUBLE)"
           )} AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS l_year,
               n2.n_name AS supp_nation,
               CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY l_year
    """,
)
def q_tpch_q8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): customer nation restricted
    to a region, supplier nation labels each sale, share = conditional
    decimal sum / total per order year.  Nation again plays two roles;
    region/nation/customer/supplier all broadcast; the only big shuffle
    is lineitem⨝orders on orderkey.  Both sums ride one partial-agg
    pass."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    base = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(
            F.broadcast(region), F.col("n1_reg") == F.col("r_regionkey")
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("l_year"),
            F.col("supp_nation"),
            rev.alias("rev"),
        )
    )
    brazil = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("rev")).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).cast("double")
    return base.groupBy("l_year").agg(
        round4(brazil / F.sum("rev").cast("double")).alias("mkt_share")
    )
