"""Declared relational queries (SURVEY.md section 2.1-2.8, 2.6-2.7).

Every REF row cites the reference behavior it re-expresses; EXT rows are
the standard-relational surface the oracle harness requires.  Each query
is a pure DataFrame plan (no UDFs) so Catalyst gets full pushdown /
pruning / join-planning freedom — at 100 TB these all stay in
whole-stage codegen and shuffle only on their natural keys.

Hash-match discipline (binding):
- computed doubles go through the exact-decimal-sum pattern or round();
- timestamps are emitted as usec-epoch bigints or formatted strings;
- every LIMIT/top-k sorts on a unique tiebreak key;
- aliases match the oracle SQL exactly (driver sorts columns by name).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import classify_state, task_identifier
from ..tables import (
    ORACLE_DEC_AVG,
    ORACLE_DEC_SUM,
    ORACLE_ROUND4,
    dec_avg,
    dec_sum,
    events,
    load,
    round4,
)
from .registry import query

# ---------------------------------------------------------------------------
# 2.1 Sources / scans
# ---------------------------------------------------------------------------


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 30.0
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + projection + filter; Catalyst pushes both into the
    scan (PushedFilters / ReadSchema).  EXT (SURVEY.md 2.1)."""
    return (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 30.0)
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "q_json_parse",
    oracle="""
    SELECT count(*) AS n_rows,
           count(CAST(props->>'$.k' AS BIGINT)) AS n_valid,
           count(*) - count(CAST(props->>'$.k' AS BIGINT)) AS n_invalid
    FROM events
    """,
)
def q_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant JSON parse: corrupt/missing rows -> NULL and are counted,
    never fatal — the NDJSON parser's drop-bad-lines semantics
    (lib/ndjson.rb:26-34) as a batch invariant."""
    ev = events(spark, sf_dir)
    parsed = ev.withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("bigint")
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("k").alias("n_valid"),
        (F.count(F.lit(1)) - F.count("k")).alias("n_invalid"),
    )


# ---------------------------------------------------------------------------
# 2.2 Projections / filters / predicates
# ---------------------------------------------------------------------------


@query(
    "q_filter_watermark",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us
    FROM events
    WHERE epoch_us(ts) > epoch_us(TIMESTAMP '2024-01-15 00:00:00')
    """,
)
def q_filter_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay suppression: drop rows at-or-below a starting offset
    (app.rb:63-64,119-122 — `Index <= starting_index` skip).  Compared in
    usec so Spark(ns) and DuckDB(usec) agree exactly."""
    start_us = 1705276800000000  # 2024-01-15T00:00:00Z
    ev = events(spark, sf_dir)
    return ev.where(F.col("ts_us") > start_us).select(
        "event_id", "user_id", "ts_us"
    )


@query(
    "q_filter_eq",
    oracle="""
    SELECT event_id, event_type, user_id, value
    FROM events
    WHERE event_type = 'error' AND value IS NOT NULL
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic dispatch + null guard: only Topic=='Allocation' events are
    consumed (app.rb:128-129), allocations without TaskStates skipped
    (app.rb:137)."""
    return (
        events(spark, sf_dir)
        .where((F.col("event_type") == "error") & F.col("value").isNotNull())
        .select("event_id", "event_type", "user_id", "value")
    )


@query(
    "q_project_nested",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
    FROM events
    WHERE CAST(props->>'$.k' AS BIGINT) >= 50
    """,
)
def q_project_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested projection: dig("Payload","Allocation",...) (app.rb:130-135)
    over the testdata's JSON `props` column."""
    ev = events(spark, sf_dir).withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("bigint")
    )
    return ev.where(F.col("k") >= 50).select("event_id", "k")


@query(
    "q_filter_regex_anti",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE NOT regexp_matches(event_type, 'err')
    """,
)
def q_filter_regex_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex anti-filter: drop task ids matching /connect-proxy/
    (app.rb:141)."""
    return (
        events(spark, sf_dir)
        .where(~F.col("event_type").rlike("err"))
        .select("event_id", "event_type", "user_id")
    )


@query(
    "q_filter_not_in",
    oracle="""
    SELECT event_id, event_type, user_id, value
    FROM events
    WHERE event_type NOT IN ('error', 'view')
    """,
)
def q_filter_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist filter: TASK_EVENT_TYPE_DENYLIST (app.rb:169-173)."""
    return (
        events(spark, sf_dir)
        .where(~F.col("event_type").isin("error", "view"))
        .select("event_id", "event_type", "user_id", "value")
    )


@query(
    "q_filter_in",
    oracle="""
    SELECT event_id, event_type, user_id, value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allowlist filter: TASK_EVENT_TYPE_ALLOWLIST (app.rb:175-179)."""
    return (
        events(spark, sf_dir)
        .where(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "event_type", "user_id", "value")
    )


@query(
    "q_dedup_latest",
    oracle="""
    SELECT user_id, event_type, event_id, ts_us, value
    FROM (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the per-key high-water-mark dedup: keep the latest
    event per key (app.rb:78,145-146,157-167 — per task_identifier, the
    max Time wins).  Tiebreak on event_id for a deterministic row set."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts_us", "value")
    )


# ---------------------------------------------------------------------------
# 2.8 Scalar functions
# ---------------------------------------------------------------------------


@query(
    "q_concat_identifier",
    oracle="""
    SELECT doc_id,
           concat(CASE WHEN lang = 'en' THEN '' ELSE concat(lang, '/') END,
                  source, '.', CAST(doc_id AS VARCHAR)) AS identifier
    FROM documents
    """,
)
def q_concat_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Task-identifier build with conditional namespace elision
    (app.rb:143-144): "{ns}/{job}.{task}" with "ns/" omitted when default.
    Here: lang as namespace ('en' is the default), source as job, doc_id
    as task."""
    docs = load(spark, sf_dir, "documents")
    ident = task_identifier(
        F.col("lang"), F.col("source"), F.col("doc_id").cast("string"), default="en"
    )
    return docs.select("doc_id", ident.alias("identifier"))


@query(
    "q_case_when_state",
    oracle="""
    SELECT state, count(*) AS n
    FROM (
        SELECT CASE WHEN event_type = 'error' THEN 'failure'
                    WHEN event_type = 'purchase' THEN
                        CASE WHEN value >= 50.0 THEN 'success' ELSE 'failure' END
                    ELSE NULL END AS state
        FROM events
    )
    GROUP BY state
    """,
)
def q_case_when_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REF state classification (app.rb:195-209): chained when/when/
    otherwise(NULL) — exact three-valued semantics, then counted by
    outcome (NULL group included)."""
    ev = events(spark, sf_dir)
    return (
        ev.select(classify_state(F.col("event_type"), F.col("value")).alias("state"))
        .groupBy("state")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT doc_id,
           upper(substr(text, 1, 10)) AS head10,
           replace(substr(text, 1, 30), ' ', '_') AS underscored,
           length(text) AS n_len
    FROM documents
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: the REF's gsub rewrites ('"'->'\\'' on Details,
    '**'->'*' for Slack markdown, app.rb:189,245) as replace/substr/
    upper/length."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head10"),
        F.expr("replace(substr(text, 1, 30), ' ', '_')").alias("underscored"),
        F.length("text").alias("n_len"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS o_year,
           month(o_orderdate) AS o_month,
           day(o_orderdate) AS o_day,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS days_to_close,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
    FROM orders
    WHERE year(o_orderdate) = 1995
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family (EXT, SURVEY.md 2.8): year/month/day/datediff/date_add.
    due_date emitted as a formatted string so the hash never depends on
    date serialization."""
    orders = load(spark, sf_dir, "orders")
    return orders.where(F.year("o_orderdate") == 1995).select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("o_day"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_close"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


@query(
    "q_math_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(round(abs(CAST(l_extendedprice AS DECIMAL(18,2)))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS net_price,
           CAST(floor(l_quantity) AS BIGINT) AS fq,
           CAST(ceil(l_tax * 100.0) AS BIGINT) AS tax_pct,
           {ORACLE_ROUND4.format(x="sqrt(l_extendedprice)")} AS root_price
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (EXT): abs/round/floor/ceil/sqrt.  The money product
    is computed in exact decimal (2dp inputs -> exact 4dp product ->
    round) so both engines see the identical value; sqrt is IEEE
    correctly-rounded and then portable-rounded (ln/pow are not
    correctly-rounded and are deliberately excluded from the declared
    surface)."""
    li = load(spark, sf_dir, "lineitem")
    net = F.round(
        F.abs(F.col("l_extendedprice").cast("decimal(18,2)"))
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")),
        2,
    ).cast("double")
    return li.where(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        F.floor("l_quantity").cast("bigint").alias("fq"),
        F.ceil(F.col("l_tax") * 100.0).cast("bigint").alias("tax_pct"),
        round4(F.sqrt("l_extendedprice")).alias("root_price"),
    )


@query(
    "q_time_bucket",
    oracle=f"""
    SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
           count(*) AS n,
           {ORACLE_DEC_SUM.format(col="value")} AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour bucketing: the batch analog of a tumbling window count
    (SURVEY.md 2.9 EXT; ns-epoch construction mirrors app.rb:10-23).
    Bucket emitted as usec epoch."""
    ev = events(spark, sf_dir)
    return (
        ev.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts_t"))).alias("bucket_us")
        )
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("value", "sum_value"))
    )


# ---------------------------------------------------------------------------
# Explode (the REF's triple-loop, SURVEY.md 2.9)
# ---------------------------------------------------------------------------


@query(
    "q_explode_tokens",
    oracle="""
    SELECT tok, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    """,
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode: batch analog of the envelope->Events[]->TaskStates{}->
    Events[] triple loop (app.rb:126,139,151) — array explode + count."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# 2.4 Aggregations
# ---------------------------------------------------------------------------


@query(
    "q_agg_groupby",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           {ORACLE_DEC_SUM.format(col="value")} AS sum_value,
           {ORACLE_DEC_AVG.format(col="value")} AS avg_value,
           min(epoch_us(ts)) AS min_ts_us,
           max(epoch_us(ts)) AS max_ts_us
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with count/sum/avg/min/max (EXT, SURVEY.md 2.4).
    Money columns use the exact-decimal pattern; map-side partial
    aggregation is free (HashAggregate partial->final)."""
    ev = events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value", "sum_value"),
        dec_avg("value", "avg_value"),
        F.min("ts_us").alias("min_ts_us"),
        F.max("ts_us").alias("max_ts_us"),
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per group (EXT)."""
    ev = events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n"),
    )


@query("q_approx_count_distinct")  # rows-only: HLL internals differ per engine
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HLL++).  Never oracle-declared: the
    sketch differs from DuckDB's; the scale story is that it replaces the
    exact distinct's full shuffle with a fixed-size sketch merge."""
    ev = events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )


@query(
    "q_agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           count(*) AS n,
           {ORACLE_DEC_SUM.format(col="c_acctbal")} AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over region->nation with grand total (EXT).  nation/region
    are tiny dims: Spark broadcast-joins them (AQE does this from stats;
    explicit hint below makes it deterministic)."""
    cust = load(spark, sf_dir, "customer")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region"))
    joined = cust.join(
        nation, cust.c_nationkey == nation.n_nationkey
    ).join(region, nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("c_acctbal", "sum_bal")
    )


# ---------------------------------------------------------------------------
# 2.5 Window functions
# ---------------------------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
    SELECT user_id, event_id, rn, rk, drk
    FROM (
        SELECT user_id, event_id,
               row_number() OVER w AS rn,
               rank() OVER w AS rk,
               dense_rank() OVER w AS drk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
    )
    WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions with unique tiebreak (EXT, SURVEY.md 2.5)."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.select(
            "user_id",
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_us
    FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics — the basis for sessionization gaps (EXT)."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    )


@query(
    "q_window_runsum",
    oracle="""
    SELECT user_id, event_id,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS run_sum
    FROM events
    """,
)
def q_window_runsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with explicit frame spec (EXT); decimal accumulation
    keeps the prefix sums exact in both engines."""
    ev = events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"), 2)
        .alias("run_sum"),
    )


@query(
    "q_window_runmax",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           max(epoch_us(ts)) OVER (PARTITION BY user_id) AS hwm_us,
           CASE WHEN epoch_us(ts) < max(epoch_us(ts)) OVER (PARTITION BY user_id)
                THEN 1 ELSE 0 END AS is_stale
    FROM events
    """,
)
def q_window_runmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key high-water mark as a window max — the batch analog of the
    REF's task_metadata state (app.rb:78,157-167): every row labeled
    stale/fresh against its key's max timestamp."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    hwm = F.max("ts_us").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts_us"),
        hwm.alias("hwm_us"),
        F.when(F.col("ts_us") < hwm, F.lit(1)).otherwise(F.lit(0)).alias("is_stale"),
    )


# ---------------------------------------------------------------------------
# 2.3 Joins
# ---------------------------------------------------------------------------


@query(
    "q_join_inner",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           {ORACLE_DEC_SUM.format(col="o_totalprice")} AS sum_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + aggregate (EXT, SURVEY.md 2.3).  customer is the
    small side: broadcast hint removes the shuffle for the join entirely;
    only the final tiny groupBy shuffles."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "sum_price"))
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: customers keep their row with zero orders (EXT)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join == EXISTS (EXT); never duplicates the left side."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
              AND o_totalprice > 100000.0
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join == NOT EXISTS (EXT): customers with no large
    finished order (predicate keeps the result non-trivial at every SF)."""
    cust = load(spark, sf_dir, "customer")
    orders = (
        load(spark, sf_dir, "orders")
        .where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0))
        .select("o_custkey")
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q_join_range",
    oracle="""
    SELECT a.event_id AS signup_id, b.event_id AS purchase_id, a.user_id
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'signup' AND b.event_type = 'purchase'
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join: purchases within 1h after a signup by the same
    user (EXT).  Equi-key on user_id keeps it a hash join with a range
    residual — no cartesian product; at scale the equi-prefix is what
    keeps the shuffle bounded."""
    ev = events(spark, sf_dir)
    a = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id"),
        F.col("ts_us").alias("a_us"),
    )
    b = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts_us").alias("b_us"),
    )
    hour_us = 3600 * 1_000_000
    return (
        a.join(
            b,
            (a.user_id == b.b_user)
            & (b.b_us > a.a_us)
            & (b.b_us <= a.a_us + hour_us),
        )
        .select("signup_id", "purchase_id", "user_id")
    )


# ---------------------------------------------------------------------------
# 2.6 Sorts / limits / top-k, 2.7 Set operations
# ---------------------------------------------------------------------------


@query(
    "q_topk",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    ORDER BY value DESC, event_id ASC
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition
    top-k + driver merge — no global sort shuffle).  Unique tiebreak on
    event_id makes the row set deterministic (EXT)."""
    ev = events(spark, sf_dir)
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(10)
        .select("event_id", "user_id", "value")
    )


@query(
    "q_union",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union distinct (EXT)."""
    ev = events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    views = ev.where(F.col("event_type") == "view").select("user_id")
    return clicks.unionByName(views).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersect distinct (EXT)."""
    ev = events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@query(
    "q_except",
    oracle="""
    SELECT user_id FROM events
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 190.0
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Except distinct (EXT): users with no high-value purchase (the
    threshold keeps the result non-trivial at every SF)."""
    ev = events(spark, sf_dir)
    all_users = ev.select("user_id")
    big_buyers = ev.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 190.0)
    ).select("user_id")
    # DataFrame.subtract == EXCEPT DISTINCT, matching the oracle's EXCEPT.
    return all_users.subtract(big_buyers)
