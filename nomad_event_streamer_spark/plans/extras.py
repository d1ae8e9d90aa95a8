"""Window-function breadth, subqueries, unpivot, map/regex functions,
and cross-join grids — the long tail of SURVEY.md section 2.4-2.8.

All pure-Column plans (whole-stage codegen, no UDFs).  Window ORDER BY
keys are always non-null and unique (ts_us, event_id) so Spark's
nulls-first vs DuckDB's nulls-last defaults can never diverge; every
float emitted either passes through unchanged or goes through the
decimal-exact / portable-round patterns from tables.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import (
    ORACLE_ROUND2,
    events,
    load,
    round2,
)
from .registry import query

HOUR_US = 3600 * 1_000_000


@query(
    "q_window_ntile",
    oracle="""
    SELECT user_id, event_id,
           ntile(4) OVER w AS quartile,
           dense_rank() OVER (PARTITION BY user_id ORDER BY event_type)
               AS type_rank,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-family windows: ntile / dense_rank / percent_rank /
    cume_dist.  percent_rank and cume_dist are single exact-integer
    divisions — bit-identical doubles in both engines.  All four share
    one user_id partitioning (one shuffle, one sort)."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wt = Window.partitionBy("user_id").orderBy("event_type")
    return ev.select(
        "user_id",
        "event_id",
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(wt).alias("type_rank"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "q_first_last",
    oracle="""
    SELECT user_id, event_id,
           first_value(event_id) OVER w AS first_ev,
           last_value(event_id) OVER w AS last_ev,
           nth_value(event_id, 2) OVER w AS second_ev,
           lead(event_id, 1, -1) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id)
               AS next_ev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic value windows: first/last/nth over the full partition
    frame + lead with default.  The explicit unbounded frame makes
    last_value/nth_value well-defined identically in both engines."""
    ev = events(spark, sf_dir)
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wl = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_id").over(wf).alias("first_ev"),
        F.last("event_id").over(wf).alias("last_ev"),
        F.nth_value("event_id", 2).over(wf).alias("second_ev"),
        F.lead("event_id", 1, -1).over(wl).alias("next_ev"),
    )


@query(
    "q_window_range",
    oracle=f"""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           count(*) OVER w AS n_1h,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2)
               AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {HOUR_US} PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per-event trailing-1-hour count and sum per user
    (value-based frame bounds, not row counts — ties in ts all enter the
    frame, so the frame SET is deterministic even with duplicate
    timestamps).  The sum is decimal-exact, order-insensitive."""
    ev = events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-HOUR_US, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"),
            2,
        ).alias("sum_1h"),
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / count(o_totalprice)
        FROM orders
    )
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price.  The
    average is the decimal-exact sum / count (identical double in both
    engines, so the > comparison can never flip).  Plan: single-row
    aggregate broadcast into the filter — no second scan of orders at
    scale beyond the aggregate's own."""
    orders = load(spark, sf_dir, "orders")
    avg_df = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("o_totalprice")
        ).alias("avg_price")
    )
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_subquery_correlated",
    oracle=f"""
    SELECT c.c_custkey, c.c_acctbal,
           {ORACLE_ROUND2.format(x="n.nation_avg")} AS nation_avg
    FROM customer c
    JOIN (
        SELECT c_nationkey,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(c_acctbal) AS nation_avg
        FROM customer GROUP BY c_nationkey
    ) n ON c.c_nationkey = n.c_nationkey
    WHERE c.c_acctbal > n.nation_avg
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery (customers richer than their nation's
    average), decorrelated to a grouped aggregate + join — the rewrite
    Catalyst itself applies to correlated scalar subqueries.  The
    filter compares the unrounded exact average; rounding happens only
    on emit."""
    cust = load(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("c_acctbal")
        ).alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select(
            "c_custkey",
            "c_acctbal",
            round2(F.col("nation_avg")).alias("nation_avg"),
        )
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long): three measure columns into (measure, val)
    rows.  Spark's unpivot is a single-pass Expand — the scan is read
    once, not once per measure (the UNION ALL oracle reads it three
    times; at 100 TB the Expand shape is the point)."""
    li = load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS ks,
           CAST(props->>'$.k' AS BIGINT) AS kv,
           len(json_keys(props)) AS n_keys
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions over JSON-derived maps: from_json -> map_keys /
    element access / size (SURVEY.md 2.8 map family).  Key order is
    normalized by array_sort so the concatenation is deterministic."""
    ev = events(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("ks"),
        m.getItem("k").alias("kv"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "q_regex_extract",
    oracle="""
    SELECT event_id,
           nullif(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS k_str,
           CAST(nullif(regexp_extract(props, '"k":\\s*(\\d+)', 1), '')
                AS BIGINT) AS k_num,
           regexp_matches(event_type, '^(click|view)$') AS is_passive
    FROM events
    """,
)
def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture groups + full-match predicate (extends the
    reference's regex usage, app.rb:141,198, to extraction).  Both
    engines return '' for a non-matching extract; nullif normalizes."""
    ev = events(spark, sf_dir)
    k = F.nullif(
        F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1), F.lit("")
    )
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_num"),
        F.col("event_type").rlike("^(click|view)$").alias("is_passive"),
    )


@query(
    "q_cross_join_grid",
    oracle="""
    WITH segs AS (SELECT DISTINCT c_mktsegment FROM customer),
    counts AS (
        SELECT n_regionkey, c_mktsegment, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_regionkey, c_mktsegment
    )
    SELECT r_name, segs.c_mktsegment AS c_mktsegment,
           coalesce(n_cust, 0) AS n_cust
    FROM region CROSS JOIN segs
    LEFT JOIN counts ON counts.n_regionkey = region.r_regionkey
                     AND counts.c_mktsegment = segs.c_mktsegment
    """,
)
def q_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join as a dense dimension grid (region x market segment)
    left-joined to observed counts — the zero-filled-matrix pattern.
    Both cross-join sides are tiny dimension sets; the fact aggregation
    happens BEFORE the grid join, so the grid never multiplies facts."""
    region = load(spark, sf_dir, "region")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    segs = cust.select("c_mktsegment").distinct()
    counts = (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_regionkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    return (
        region.crossJoin(segs)
        .join(
            counts,
            (counts["n_regionkey"] == region["r_regionkey"])
            & (counts["c_mktsegment"] == segs["c_mktsegment"]),
            "left",
        )
        .select(
            "r_name",
            segs["c_mktsegment"].alias("c_mktsegment"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        )
    )
