"""Advanced declared queries: sessionization, grouping sets, percentiles,
string aggregation, time-series gap-fill, histograms, pivot, TF-IDF,
minhash-similarity estimation, and TPC-H-shaped join aggregates.

These extend SURVEY.md section 2's inventory beyond the reference's own
surface (the reference is a single-stream processor; SURVEY.md section 0)
with the relational + LLM-pipeline operators the build contract mandates.
Same hash-match discipline as plans/relational.py: exact integer/decimal
arithmetic wherever a ranking or selection depends on it, portable
floor-rounding on emitted doubles, unique tiebreak keys on every LIMIT.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators import dedup, similarity
from ..tables import (
    ORACLE_ROUND2,
    ORACLE_ROUND4,
    events,
    load,
    rebalance_for_cpu,
    round2,
    round4,
)
from .registry import query

SESSION_GAP_US = 2 * 3600 * 1_000_000  # 2 hours
HOUR_US = 3600 * 1_000_000


@query(
    "q_sessionize",
    oracle=f"""
    WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    s AS (
        SELECT user_id, event_id, ts_us,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM g
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts_us) AS session_start_us,
           max(ts_us) - min(ts_us) AS duration_us
    FROM s GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts after a
    >2h silence per user.  lag -> boundary flag -> running sum = session
    id -> per-session aggregate.  Two window passes + one aggregation,
    all sharing the user_id partitioning (one shuffle at scale).  The
    streaming analog is ``F.session_window`` (SURVEY.md 2.9)."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = g.withColumn("session_id", F.sum("is_new").over(ws))
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than rollup/cube, SURVEY.md 2.4)
    with grouping_id disambiguation of the NULL super-aggregate rows.
    One Expand + one aggregation — Spark expands the sets map-side, so
    the shuffle still carries partial aggregates."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("sum_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n_orders", "sum_price"
        )
    )


@query(
    "q_percentile_disc",
    oracle="""
    SELECT event_type,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
           count(value) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (actual data values — no interpolation, so
    the result is float-exact across engines).  Spark computes these as
    a single sort-based aggregate per group."""
    ev = events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90"),
        F.count("value").alias("n"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n_name, count(*) AS n_cust,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg) per group.  collect_list +
    array_sort + array_join gives a deterministic concatenation; the
    dimension join broadcasts."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "names"
            ),
        )
    )


@query(
    "q_gapfill_hours",
    oracle=f"""
    WITH c AS (
        SELECT epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS hour_us,
               count(*) AS n_events
        FROM events GROUP BY 1
    ),
    r AS (SELECT min(hour_us) AS lo, max(hour_us) AS hi FROM c),
    h AS (SELECT unnest(generate_series(lo, hi, {HOUR_US})) AS hour_us FROM r)
    SELECT h.hour_us, coalesce(c.n_events, 0) AS n_events
    FROM h LEFT JOIN c ON h.hour_us = c.hour_us
    """,
)
def q_gapfill_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: dense hourly buckets over the observed range
    with zero counts for silent hours.  The hour spine is generated from
    a single-row min/max aggregate (``sequence`` + explode) — no
    driver-side collect; the spine join broadcasts the small side."""
    ev = events(spark, sf_dir)
    hour = (F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("hour_us")
    counts = ev.groupBy(hour).agg(F.count(F.lit(1)).alias("n_events"))
    spine = (
        counts.agg(
            F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi")
        )
        .select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(HOUR_US))
            ).alias("hour_us")
        )
    )
    return spine.join(counts, "hour_us", "left").select(
        "hour_us", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )


@query(
    "q_histogram",
    oracle=f"""
    SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
           count(*) AS n,
           {ORACLE_ROUND2.format(x="min(l_extendedprice)")} AS lo,
           {ORACLE_ROUND2.format(x="max(l_extendedprice)")} AS hi
    FROM lineitem
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: integer bucketing is exact IEEE division +
    floor, identical in both engines; one hash aggregation."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.floor(F.col("l_extendedprice") / 5000.0).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        round2(F.min("l_extendedprice")).alias("lo"),
        round2(F.max("l_extendedprice")).alias("hi"),
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_pivot_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'error') AS n_error,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           count(*) FILTER (WHERE event_type = 'view') AS n_view
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per-user counts per event type.  Explicit
    pivot values keep the plan a single pass (no distinct-values job)."""
    ev = events(spark, sf_dir)
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


@query(
    "q_tfidf_top3",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, tok, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY doc_id, tok
    ),
    dfc AS (SELECT tok, count(*) AS dfn FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS nd FROM documents),
    ranked AS (
        SELECT tf.doc_id, tf.tok, tf.tf, dfc.dfn, n.nd,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf DESC, dfc.dfn ASC, tf.tok ASC)
                   AS rn
        FROM tf JOIN dfc ON tf.tok = dfc.tok CROSS JOIN n
    )
    SELECT doc_id, tok, tf,
           {ORACLE_ROUND4.format(x="tf * ln(CAST(nd AS DOUBLE) / dfn)")} AS tfidf
    FROM ranked WHERE rn <= 3
    """,
)
def q_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.  The top-3 SELECTION ranks on
    exact integers (tf desc, doc-frequency asc, token asc) so no float
    comparison ever decides membership; ln() appears only in the emitted
    score.  Plan: token hash-agg -> df hash-agg -> broadcast doc count ->
    ranking window on doc_id."""
    docs = rebalance_for_cpu(load(spark, sf_dir, "documents"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dfn"))
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("dfn").asc(), F.col("tok").asc()
    )
    ranked = (
        tf.join(dfc, "tok")
        .crossJoin(F.broadcast(nd))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )
    return ranked.select(
        "doc_id",
        "tok",
        "tf",
        round4(
            F.col("tf") * F.log(F.col("nd").cast("double") / F.col("dfn"))
        ).alias("tfidf"),
    )


def _minhash_est_oracle(num_hashes: int = 16) -> str:
    from .llm_ops import _SHINGLE_CTE

    seeds_values = ", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(dedup.minhash_params(num_hashes))
    )
    return (
        _SHINGLE_CTE
        + f"""
    , based AS (
        SELECT doc_id,
               CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT)
                   % {dedup.MINHASH_P} AS hb
        FROM sh
    ),
    sig AS (
        SELECT doc_id, seed, min((a * hb + b) % {dedup.MINHASH_P}) AS mh
        FROM based CROSS JOIN (VALUES {seeds_values}) AS seeds(seed, a, b)
        GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 2 AS band,
               md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS bucket
        FROM sig GROUP BY doc_id, seed // 2
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                     AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
               AS n_match,
           CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS DOUBLE)
               / {num_hashes} AS jaccard_est
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.doc_a
    JOIN sig sb ON sb.doc_id = p.doc_b AND sb.seed = sa.seed
    GROUP BY p.doc_a, p.doc_b
    """
    )


@query("q_minhash_est", oracle=_minhash_est_oracle(16))
def q_minhash_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard estimation from minhash signatures: for every LSH candidate
    pair, the fraction of matching signature components.  Integer-exact
    (count / 16 is a dyadic rational — bit-identical as double).

    Plan: the wide signature rides through the bucket group-and-expand
    (dedup.minhash_est_pairs) — signature lineage computed once, zero
    pair<->signature joins."""
    docs = rebalance_for_cpu(load(spark, sf_dir, "documents"))
    sh = dedup.shingles(docs, n=3)
    sig = dedup.minhash_signatures(sh, num_hashes=16)
    return dedup.minhash_est_pairs(sig, num_hashes=16, rows_per_band=2)


@query("q_dedup_embed")  # rows-only: float cosine decides membership
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via OR-amplified hyperplane LSH
    (6 tables x 4 planes), exact-cosine verified at 0.35.  The scale path:
    per-table bucket joins generate candidates, never all-pairs."""
    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    return similarity.near_dup_pairs(
        vecs, threshold=0.35, num_tables=6, num_planes=4
    )


@query(
    "q_join_agg_topk",
    oracle=f"""
    SELECT l_orderkey,
           {ORACLE_ROUND2.format(
               x="CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
                 "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
           )} AS revenue,
           epoch_us(o_orderdate) AS o_date_us
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_join_agg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join -> revenue aggregate -> top-10.
    Revenue sums DECIMAL products (order-insensitive, bit-exact), emitted
    through portable round2.  Catalyst/AQE picks broadcast for customer;
    the topk is TakeOrderedAndProject (no global sort)."""
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("double")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round2(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            # NTZ -> TZ cast is wall-clock under the UTC session TZ, so
            # this equals DuckDB's epoch_us on the naive timestamp.
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_date_us"
            ),
        )
    )


@query(
    "q_star_join",
    oracle=f"""
    SELECT n_name,
           count(*) AS n_lineitems,
           {ORACLE_ROUND2.format(
               x="CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
                 "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
           )} AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join over two broadcast dims + fact chain,
    revenue per nation.  region/nation broadcast explicitly; AQE converts
    customer when it fits.  The only large shuffle is lineitem->orders."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("double")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            round2(rev).alias("revenue"),
        )
    )


@query(
    "q_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               max(event_id) AS click_id,
               arg_max(event_id, event_id) AS click_id2
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, epoch_us(ts)
    ),
    purchases AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           c.click_id AS asof_event_id,
           c.ts_us AS asof_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY.md 2.11 custom operator, built as a composition
    of DataFrame ops): each purchase picks up the user's most recent
    click at-or-before it.  One shuffle on the key, no join node — a
    tagged union + last-non-null running window (operators/asof.py);
    the oracle is DuckDB's NATIVE ASOF JOIN, pinning the semantics to a
    reference implementation."""
    from ..operators.asof import asof_join

    ev = events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("event_id"), F.col("ts_us").alias("click_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        ts="ts_us",
        right_value="click_ts",
        right_id="event_id",
    ).select(
        "event_id",
        "user_id",
        "ts_us",
        "asof_event_id",
        F.col("asof_click_ts"),
    )


def _embed_int_body(
    num_tables: int = 3,
    num_planes: int = 6,
    dim: int = 64,
    max_bucket: int | None = None,
) -> str:
    """CTE body (z … scored) of the integer embedding near-dup pipeline
    — shared by the pair oracle (q_dedup_embed_int), the SemDeDup
    cluster oracle (q_semdedup), and the label-propagation oracle, so
    candidate generation and scoring can never drift between them.
    ``max_bucket`` replicates the Spark-side skew cap exactly (the r03
    containment-cap pattern): degenerate (table, bucket) groups are
    dropped BEFORE pair expansion on both engines."""
    import hashlib as _hashlib

    pl_rows = ", ".join(
        f"({t}, {p}, {d}, "
        f"{1 if int(_hashlib.md5(f'{t}:{p}:{d}'.encode()).hexdigest()[:2], 16) % 2 == 0 else -1})"
        for t in range(num_tables)
        for p in range(num_planes)
        for d in range(dim)
    )
    return f"""z AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5)
                             AS BIGINT)) AS v
        FROM embeddings
    ),
    comp AS (
        SELECT vec_id, i, v[i + 1] AS x
        FROM z CROSS JOIN range(0, {dim}) t(i)
    ),
    pl(t, p, i, s) AS (SELECT * FROM (VALUES {pl_rows})),
    dots AS (
        SELECT vec_id, t, p, sum(s * x) AS d
        FROM comp JOIN pl USING (i) GROUP BY 1, 2, 3
    ),
    buck0 AS (
        SELECT vec_id, t,
               CAST(sum(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS BIGINT)
                   AS bucket
        FROM dots GROUP BY 1, 2
    ),
    bsz AS (SELECT t, bucket, count(*) AS bn FROM buck0 GROUP BY 1, 2),
    buck AS (
        SELECT b.vec_id, b.t, b.bucket
        FROM buck0 b JOIN bsz USING (t, bucket)
        WHERE bsz.bn <= {max_bucket if max_bucket is not None else 'bsz.bn'}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buck a JOIN buck b USING (t, bucket)
        WHERE a.vec_id < b.vec_id
    ),
    scored AS (
        SELECT id_a, id_b,
               CAST(floor(
                   CASE WHEN sqrt(list_dot_product(za.v, za.v))
                             * sqrt(list_dot_product(zb.v, zb.v)) > 0
                        THEN list_dot_product(za.v, zb.v)
                             / (sqrt(list_dot_product(za.v, za.v))
                                * sqrt(list_dot_product(zb.v, zb.v)))
                        ELSE 0.0 END * 1000.0 + 0.5
               ) AS BIGINT) AS cos_milli
        FROM cand
        JOIN z za ON za.vec_id = id_a
        JOIN z zb ON zb.vec_id = id_b
    )"""


def _embed_int_oracle(
    threshold_milli: int = 350,
    num_tables: int = 3,
    num_planes: int = 6,
    dim: int = 64,
) -> str:
    return f"""
    WITH {_embed_int_body(num_tables, num_planes, dim)}
    SELECT id_a, id_b, cos_milli FROM scored
    WHERE cos_milli >= {threshold_milli}
    """


def _semdedup_oracle(threshold_milli: int = 350) -> str:
    return f"""
    WITH RECURSIVE {_embed_int_body()},
    edges AS (
        SELECT id_a, id_b FROM scored WHERE cos_milli >= {threshold_milli}
    ),
    und AS (SELECT id_a AS s, id_b AS d FROM edges
            UNION SELECT id_b, id_a FROM edges),
    reach(node, mn) AS (
        SELECT s AS node, s AS mn FROM und
        UNION
        SELECT u.s, r.mn FROM und u JOIN reach r ON u.d = r.node
    ),
    assign AS (SELECT node, min(mn) AS cluster_id FROM reach GROUP BY node),
    o AS (
        SELECT v.vec_id,
               CAST(coalesce(a.cluster_id, v.vec_id) AS BIGINT) AS cluster_id
        FROM embeddings v LEFT JOIN assign a ON a.node = v.vec_id
    ),
    sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
           FROM o GROUP BY 1)
    SELECT o.vec_id, o.cluster_id, sz.cluster_size,
           o.vec_id = o.cluster_id AS kept
    FROM o JOIN sz USING (cluster_id)
    """


@query("q_semdedup", oracle=_semdedup_oracle())
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication") as exact dataflow:
    semantic near-dup PAIRS from the integer embedding LSH
    (q_dedup_embed_int's candidate generation + quantized cosine at
    0.350) become CLUSTERS via min-label connected components, and each
    cluster keeps exactly its minimum-id representative — the per-vector
    decision table (cluster, size, kept) a curation pipeline joins
    against the corpus.  Every vector appears: singletons are their own
    kept cluster of size 1.  End-to-end integer ⇒ full hash oracle
    (recursive-CTE reachability on the DuckDB side).

    Scale: candidate pairs are OR-amplified bucket joins (never
    all-pairs); components iterate join+agg on the node key with
    lineage checkpoints (O(cluster diameter) rounds — semantic-dup
    clusters are shallow); the survivor rule is one aggregate.  At
    100 TB the cluster assignment is the reusable asset: re-curation
    re-joins it instead of re-scoring pairs."""
    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    pairs = similarity.near_dup_pairs_int(vecs, num_planes=6).select("id_a", "id_b")
    comp = dedup.connected_components(pairs, src="id_a", dst="id_b")
    assign = comp.select(
        F.col("doc_id").alias("vec_id"), F.col("cluster_id")
    )
    o = (
        vecs.select("vec_id")
        .join(assign, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", F.col("vec_id"))
            .cast("long")
            .alias("cluster_id"),
        )
    )
    sz = o.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return o.join(sz, "cluster_id").select(
        "vec_id",
        "cluster_id",
        "cluster_size",
        (F.col("vec_id") == F.col("cluster_id")).alias("kept"),
    )


_LP_SEED_MAX = 100  # vec_id < 100 keep their true label (clamped seeds)
_LP_ROUNDS = 3


def _label_prop_oracle(
    rounds: int = _LP_ROUNDS, threshold_milli: int = 350
) -> str:
    """Unrolled label-propagation rounds (the q_pagerank / q_bpe_train
    technique): each round, every unlabeled node takes the majority
    label among its labeled neighbors — votes weighted 1 per edge,
    ties to the SMALLEST label — while seed nodes stay clamped.
    MATERIALIZED per round: lab_{i} is referenced twice in round i+1
    (as vote source and as carry-forward), so inlining would double
    the edge scan per round."""
    parts = [f"""
    WITH {_embed_int_body()},
    edges AS (
        SELECT id_a, id_b FROM scored WHERE cos_milli >= {threshold_milli}
    ),
    und AS (SELECT id_a AS s, id_b AS d FROM edges
            UNION SELECT id_b, id_a FROM edges),
    lab_0 AS MATERIALIZED (
        SELECT vec_id,
               CASE WHEN vec_id < {_LP_SEED_MAX} THEN CAST(label AS BIGINT)
               END AS lab
        FROM embeddings
    )"""]
    for i in range(rounds):
        parts.append(f""",
    votes_{i} AS MATERIALIZED (
        SELECT u.s AS vec_id, l.lab, count(*) AS n
        FROM und u JOIN lab_{i} l ON l.vec_id = u.d
        WHERE l.lab IS NOT NULL
        GROUP BY 1, 2
    ),
    win_{i} AS MATERIALIZED (
        SELECT vec_id, lab FROM (
            SELECT vec_id, lab,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY n DESC, lab) AS rn
            FROM votes_{i}
        ) WHERE rn = 1
    ),
    lab_{i + 1} AS MATERIALIZED (
        SELECT l.vec_id,
               CASE WHEN l.vec_id < {_LP_SEED_MAX} THEN l.lab
                    ELSE coalesce(l.lab, w.lab) END AS lab
        FROM lab_{i} l LEFT JOIN win_{i} w ON w.vec_id = l.vec_id
    )""")
    parts.append(f"""
    SELECT vec_id,
           vec_id < {_LP_SEED_MAX} AS is_seed,
           lab AS label_out
    FROM lab_{rounds}
    """)
    return "".join(parts)


@query("q_label_prop", oracle=_label_prop_oracle())
def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002, the
    weak-labeling primitive): seed labels (vec_id < 100 keep their true
    label, clamped) spread over the integer-LSH similarity graph — per
    round, each unlabeled vector takes the MAJORITY label among its
    labeled neighbors (ties to the smallest label); 3 rounds, once
    labeled a node keeps its label.  Deterministic end to end (integer
    votes, total-order tie-break) ⇒ full hash oracle with unrolled
    per-round CTEs.

    Plan: the similarity graph is the q_dedup_embed_int bucket-join
    output (never all-pairs); each round is ONE edge-keyed join + one
    (node, label)-keyed partial-agg vote + an argmax window partitioned
    by node — all shuffles on node ids, lineage checkpointed per round.
    At 100 TB rounds are a handful (propagation radius), not
    data-sized."""
    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    pairs = similarity.near_dup_pairs_int(vecs, num_planes=6).select("id_a", "id_b")
    # EAGER lineage cut: und's two union branches consume pairs as
    # concurrent stages — a lazy cut would rebuild the LSH pair join
    # twice before the cache fills
    pairs = pairs.localCheckpoint(eager=True)
    und = pairs.select(
        F.col("id_a").alias("s"), F.col("id_b").alias("d")
    ).union(pairs.select(F.col("id_b").alias("s"), F.col("id_a").alias("d")))
    lab = vecs.select(
        "vec_id",
        F.when(
            F.col("vec_id") < _LP_SEED_MAX, F.col("label").cast("long")
        ).alias("lab"),
    )
    for _ in range(_LP_ROUNDS):
        votes = (
            und.join(
                lab.select(F.col("vec_id").alias("d"), "lab"), "d"
            )
            .where(F.col("lab").isNotNull())
            .groupBy(F.col("s").alias("vec_id"), "lab")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("n").desc(), F.col("lab").asc()
        )
        win = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", F.col("lab").alias("wlab"))
        )
        lab = (
            lab.join(win, "vec_id", "left")
            .select(
                "vec_id",
                F.when(F.col("vec_id") < _LP_SEED_MAX, F.col("lab"))
                .otherwise(F.coalesce("lab", "wlab"))
                .alias("lab"),
            )
            .localCheckpoint(eager=False)  # lazy: fixed rounds, no actions
        )
    return lab.select(
        "vec_id",
        (F.col("vec_id") < _LP_SEED_MAX).alias("is_seed"),
        F.col("lab").alias("label_out"),
    )


@query("q_dedup_embed_int", oracle=_embed_int_oracle())
def q_dedup_embed_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact embedding near-dup pairs (the hash-verifiable twin
    of q_dedup_embed): OR-amplified multi-table hyperplane LSH with ±1
    planes — bucket bits are signs of exact integer sums — then the
    quantized cosine at threshold 0.350, half-up milli.  Bucket
    candidate generation AND scores carry the full value-hash oracle,
    extending the round-2 integer-twin device (q_sim_ann_int) from topk
    search to pairwise dedup."""
    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    return similarity.near_dup_pairs_int(vecs, num_planes=6)


@query(
    "q_asof_forward",
    oracle="""
    WITH cd AS (
        SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY 1, 2
    ),
    p AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           arg_min(cd.click_id, cd.ts_us) AS next_click_id,
           min(cd.ts_us) AS next_click_ts
    FROM p
    LEFT JOIN cd ON cd.user_id = p.user_id
                 AND cd.ts_us >= p.ts_us
                 AND cd.ts_us <= p.ts_us + 3600000000
    GROUP BY 1, 2, 3
    """,
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance (pandas ``merge_asof
    direction='forward', tolerance=1h`` semantics): each purchase picks
    up the user's EARLIEST click at-or-after it, but only within the
    next hour — the follow-up-event attribution lookup (did a
    confirmation/next action happen soon after?), the mirror of
    q_asof_join's state-at-event-time backward lookup.

    Same scale shape as the backward operator — the forward direction
    is the SAME tagged-union + running-window composition run on
    NEGATED timestamps (most-recent-at-or-before on -ts ≡
    earliest-at-or-after on ts), so it stays one shuffle on the key
    with a linear per-key merge, never a range-join expansion; the
    tolerance is a post-hoc null-out, not a join condition.  The
    oracle states the semantics independently as a bounded range join
    + arg_min (exact on the deduped click set, where min ts is
    unique per user)."""
    from ..operators.asof import asof_join

    ev = events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        (-F.col("ts_us")).alias("nts"),
        F.col("event_id"),
        F.col("ts_us").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", (-F.col("ts_us")).alias("nts")
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        ts="nts",
        right_value="click_ts",
        right_id="event_id",
    )
    in_tol = F.col("asof_click_ts") <= F.col("ts_us") + F.lit(3_600_000_000)
    return joined.select(
        "event_id",
        "user_id",
        "ts_us",
        F.when(in_tol, F.col("asof_event_id")).alias("next_click_id"),
        F.when(in_tol, F.col("asof_click_ts")).alias("next_click_ts"),
    )


def _lsh_amplification_oracle(
    threshold_milli: int = 350,
    num_tables: int = 3,
    num_planes: int = 6,
    dim: int = 64,
) -> str:
    """DuckDB replay of the OR-amplification tuning table: the
    _embed_int_body device extended with the per-pair MIN colliding
    table index, then the nested-prefix rollup per configuration."""
    import hashlib as _hashlib

    pl_rows = ", ".join(
        f"({t}, {p}, {d}, "
        f"{1 if int(_hashlib.md5(f'{t}:{p}:{d}'.encode()).hexdigest()[:2], 16) % 2 == 0 else -1})"
        for t in range(num_tables)
        for p in range(num_planes)
        for d in range(dim)
    )
    cfg_rows = ", ".join(f"({t})" for t in range(1, num_tables + 1))
    return f"""
    WITH z AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5)
                             AS BIGINT)) AS v
        FROM embeddings
    ),
    comp AS (
        SELECT vec_id, i, v[i + 1] AS x
        FROM z CROSS JOIN range(0, {dim}) t(i)
    ),
    pl(t, p, i, s) AS (SELECT * FROM (VALUES {pl_rows})),
    dots AS (
        SELECT vec_id, t, p, sum(s * x) AS d
        FROM comp JOIN pl USING (i) GROUP BY 1, 2, 3
    ),
    buck AS (
        SELECT vec_id, t,
               CAST(sum(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS BIGINT)
                   AS bucket
        FROM dots GROUP BY 1, 2
    ),
    cand AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(min(a.t) AS BIGINT) AS min_t
        FROM buck a JOIN buck b
          ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT id_a, id_b, min_t,
               CAST(floor(
                   CASE WHEN sqrt(list_dot_product(za.v, za.v))
                             * sqrt(list_dot_product(zb.v, zb.v)) > 0
                        THEN list_dot_product(za.v, zb.v)
                             / (sqrt(list_dot_product(za.v, za.v))
                                * sqrt(list_dot_product(zb.v, zb.v)))
                        ELSE 0.0 END * 1000.0 + 0.5
               ) AS BIGINT) AS cos_milli
        FROM cand
        JOIN z za ON za.vec_id = id_a
        JOIN z zb ON zb.vec_id = id_b
    ),
    cfg(num_tables) AS (SELECT * FROM (VALUES {cfg_rows})),
    -- LEFT JOIN from cfg so a zero-candidate configuration still emits
    -- an explicit (T, 0, 0) row (mirrors the operator's configs-side
    -- left join; ADVICE r07).
    per_t AS (
        SELECT CAST(cfg.num_tables AS BIGINT) AS num_tables,
               CAST(count(scored.id_a) AS BIGINT) AS n_candidates,
               CAST(coalesce(sum(CASE WHEN cos_milli >= {threshold_milli}
                        THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_confirmed
        FROM cfg LEFT JOIN scored ON min_t < cfg.num_tables
        GROUP BY 1
    ),
    full_ AS (
        SELECT CAST(sum(CASE WHEN cos_milli >= {threshold_milli}
                        THEN 1 ELSE 0 END) AS BIGINT) AS full_confirmed
        FROM scored
    )
    SELECT num_tables, n_candidates, n_confirmed,
           CAST(CASE WHEN full_confirmed > 0
                THEN (n_confirmed * 1000) // full_confirmed
                ELSE 1000 END AS BIGINT) AS recall_vs_full_milli
    FROM per_t CROSS JOIN full_
    """


@query("q_embed_lsh_tuning", oracle=_lsh_amplification_oracle())
def q_embed_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplification tuning table for the embedding LSH (the
    ``num_tables`` recall knob measured as a first-class operator — the
    embedding-side complement of the minhash band/row q_lsh_tuning):
    per T = 1..3 tables, candidate pair count, confirmed near-dups at
    cos >= 0.350, and confirmed recall vs the full 3-table
    configuration in integer milli.  One signature computation and one
    scoring pass serve every configuration (per-pair min colliding
    table index rides the pair dedup aggregate); at 100 TB this is the
    dashboard that prices 'drop a table, save a bucket join' against
    lost near-dups — the recall half of the num_planes/num_tables
    trade SCALE.md documents."""
    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    return similarity.lsh_amplification_table(vecs, num_planes=6)


@query(
    "q_asof_nearest",
    oracle="""
    WITH cd AS (
        SELECT user_id, epoch_us(ts) AS cts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY 1, 2
    ),
    p AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
        SELECT p.event_id, cd.click_id, cd.cts,
               abs(cd.cts - p.ts_us) AS delta,
               CASE WHEN cd.cts <= p.ts_us THEN 0 ELSE 1 END AS dirpref
        FROM p JOIN cd ON cd.user_id = p.user_id
                       AND cd.cts BETWEEN p.ts_us - 3600000000
                                      AND p.ts_us + 3600000000
    ),
    best AS (
        SELECT *, row_number() OVER (PARTITION BY event_id
                                     ORDER BY delta, dirpref) AS rn
        FROM cand
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           b.click_id AS near_click_id,
           b.cts AS near_click_ts,
           CAST(b.delta AS BIGINT) AS near_delta_us
    FROM p LEFT JOIN best b ON b.event_id = p.event_id AND b.rn = 1
    """,
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join with tolerance (pandas ``merge_asof
    direction='nearest', tolerance=1h`` semantics): each purchase
    matches the click minimizing |click_ts - ts| within ±1 hour, ties
    broken toward the backward (at-or-before) candidate — completing
    the as-of family's third direction (backward q_asof_join, forward
    q_asof_forward).

    Composition, not a new operator: the nearest match is by
    construction either the backward winner or the forward winner, so
    the plan runs the SAME tagged-union running-window device twice
    (once on ts, once on -ts) and picks per row with a CASE on the two
    deltas — two linear shuffles on the key and an equi-join on the
    purchase id, never a range-join expansion; the tolerance stays a
    post-hoc null-out.  The oracle states the semantics independently
    as a bounded range join + (delta, direction) rank over the SAME
    deduped click set (max event_id per (user, ts), the operator's
    documented tiebreak)."""
    from ..operators.asof import asof_join

    ev = events(spark, sf_dir)
    tol = 3_600_000_000
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    back = asof_join(
        purchases,
        clicks.select(
            "user_id", "ts_us", "event_id",
            F.col("ts_us").alias("click_ts"),
        ),
        key="user_id",
        ts="ts_us",
        right_value="click_ts",
        right_id="event_id",
    ).select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("asof_event_id").alias("b_id"),
        F.col("asof_click_ts").alias("b_ts"),
    )
    fwd = asof_join(
        purchases.withColumn("nts", -F.col("ts_us")),
        clicks.select(
            "user_id",
            (-F.col("ts_us")).alias("nts"),
            "event_id",
            F.col("ts_us").alias("click_ts"),
        ),
        key="user_id",
        ts="nts",
        right_value="click_ts",
        right_id="event_id",
    ).select(
        "event_id",
        F.col("asof_event_id").alias("f_id"),
        F.col("asof_click_ts").alias("f_ts"),
    )
    j = back.join(fwd, "event_id")
    d_b = F.col("ts_us") - F.col("b_ts")
    d_f = F.col("f_ts") - F.col("ts_us")
    b_ok = F.col("b_ts").isNotNull() & (d_b <= tol)
    f_ok = F.col("f_ts").isNotNull() & (d_f <= tol)
    take_b = b_ok & (~f_ok | (d_b <= d_f))
    take_f = ~take_b & f_ok
    return j.select(
        "event_id",
        "user_id",
        "ts_us",
        F.when(take_b, F.col("b_id"))
        .when(take_f, F.col("f_id"))
        .alias("near_click_id"),
        F.when(take_b, F.col("b_ts"))
        .when(take_f, F.col("f_ts"))
        .alias("near_click_ts"),
        F.when(take_b, d_b).when(take_f, d_f).alias("near_delta_us"),
    )
