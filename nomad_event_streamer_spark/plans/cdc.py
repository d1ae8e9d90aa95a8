"""CDC changelog queries: custom batch Python DataSource end-to-end.

The changelog is derived deterministically from the ``events`` table
(key=user_id, seq=event_id, op='D' on error events else 'U', val=value),
written once as NDJSON under /tmp, then read back through the
``changelog`` DataSource (``sources/changelog.py``) — so the oracle can
replay the exact snapshot semantics directly on ``events`` in DuckDB,
giving a full value-hash check across a custom source.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.changelog import ChangelogDataSource, latest_snapshot
from ..tables import events as load_events
from .registry import query


def _changelog_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events-derived changelog once per sf_dir."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/spark_graft_changelog_{tag}"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ev = load_events(spark, sf_dir)
        (
            ev.select(
                F.to_json(
                    F.struct(
                        F.col("user_id").alias("key"),
                        F.col("event_id").alias("seq"),
                        F.when(F.col("event_type") == "error", "D")
                        .otherwise("U")
                        .alias("op"),
                        F.col("value").alias("val"),
                    )
                ).alias("value")
            )
            .repartition(8)
            .write.mode("overwrite")
            .text(out)
        )
    return out


CDC_SNAPSHOT_ORACLE = """
    SELECT user_id AS key,
           arg_max(value, event_id) AS val,
           max(event_id) AS last_seq
    FROM events
    GROUP BY user_id
    HAVING arg_max(CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END,
                   event_id) <> 'D'
    """


@query("q_cdc_snapshot", oracle=CDC_SNAPSHOT_ORACLE)
def q_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state snapshot over a CDC changelog read through the custom
    batch DataSource: one file = one InputPartition (parallel scan), then
    a single map-side-combinable ``max_by`` aggregation per key — no
    window, no sort, one shuffle.  ``seq`` (event_id) is unique, so every
    ``max_by`` is deterministic.  ``val`` passes through unchanged (no
    float arithmetic), so the hash-compare is exact."""
    spark.dataSource.register(ChangelogDataSource)
    changes = spark.read.format("changelog").load(
        _changelog_dir(spark, sf_dir)
    )
    return latest_snapshot(changes)


def _evpart_dir(spark: SparkSession, sf_dir: str) -> str:
    """events written once as Hive-partitioned parquet (by event_type)."""
    import os

    from ..tables import load

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/spark_graft_evpart_{tag}"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load(spark, sf_dir, "events")
            .select("event_id", "user_id", "event_type", "value")
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(out)
        )
    return out


@query(
    "q_partitioned_sink_prune",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_value
    FROM events
    WHERE event_type IN ('click', 'error')
    GROUP BY event_type
    """,
)
def q_partitioned_sink_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet SINK + partition-pruned read-back:
    events written once with ``partitionBy(event_type)``, then re-read
    with a partition-key filter — the scan's PartitionFilters prunes 3 of
    5 directories before any IO (at 100 TB, the difference between
    reading 2 partitions and reading the table).  The aggregate matches
    the oracle computed on the original table, proving the sink
    round-trips losslessly."""
    back = spark.read.parquet(_evpart_dir(spark, sf_dir)).where(
        F.col("event_type").isin("click", "error")
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value"),
    )


@query(
    "q_scd2_merge",
    oracle="""
    WITH upd AS (
        SELECT o_custkey,
               arg_max(o_totalprice, o_orderkey) AS new_bal
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY o_custkey
    )
    SELECT c_custkey, c_acctbal AS acctbal,
           'current' AS version, TRUE AS is_current
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM upd)
    UNION ALL
    SELECT c_custkey, c_acctbal AS acctbal,
           'superseded' AS version, FALSE AS is_current
    FROM customer JOIN upd ON o_custkey = c_custkey
    UNION ALL
    SELECT c_custkey, new_bal AS acctbal,
           'current' AS version, TRUE AS is_current
    FROM customer JOIN upd ON o_custkey = c_custkey
    """,
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 MERGE emulated without a table format: updates
    (latest order total per customer, arg_max on the unique orderkey —
    deterministic) close out the matched dimension rows (kept as
    'superseded' history) and insert fresh 'current' versions;
    unmatched rows pass through untouched via LEFT ANTI.  This is the
    anti-join + union + keyed-window pattern Delta's MERGE INTO
    compiles to; the update aggregation and both joins shuffle on the
    customer key only, and AQE broadcasts the (small) update side.
    Values pass through unchanged — exact hash-compare."""
    from ..tables import load

    base = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    upd = (
        load(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
        )
        .groupBy("o_custkey")
        .agg(F.max_by("o_totalprice", "o_orderkey").alias("new_bal"))
    )
    unchanged = base.join(
        upd, base["c_custkey"] == upd["o_custkey"], "left_anti"
    ).select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.lit("current").alias("version"),
        F.lit(True).alias("is_current"),
    )
    matched = base.join(upd, base["c_custkey"] == upd["o_custkey"])
    closed = matched.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.lit("superseded").alias("version"),
        F.lit(False).alias("is_current"),
    )
    fresh = matched.select(
        "c_custkey",
        F.col("new_bal").alias("acctbal"),
        F.lit("current").alias("version"),
        F.lit(True).alias("is_current"),
    )
    return unchanged.unionAll(closed).unionAll(fresh)


@query(
    "q_dpp_prune",
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               row_number() OVER (ORDER BY count(*) DESC, event_type) AS rn
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n
    FROM events e JOIN ranked r
      ON e.event_type = r.event_type AND r.rn <= 2
    GROUP BY e.event_type
    """,
)
def q_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the Hive-partitioned fact is joined to
    a dim whose filter (top-2 event types by count) exists only at RUN
    time — no static predicate can ever reach the fact scan, yet the plan
    shows ``dynamicpruningexpression(event_type IN dynamicpruning#N)`` in
    PartitionFilters (verified on this plan): Spark executes the dim
    side first and prunes fact partitions with its result, reusing the
    join's broadcast.  At 100 TB this is the only mechanism that saves
    the fact scan when the pruning set is data-dependent."""
    from pyspark.sql import Window

    from ..tables import load

    fact = spark.read.parquet(_evpart_dir(spark, sf_dir))
    counts = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_dim"))
    )
    w = Window.orderBy(F.col("n_dim").desc(), "event_type")
    dim = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("event_type")
    )
    return (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("q_custom_sink_roundtrip", oracle=CDC_SNAPSHOT_ORACLE)
def q_custom_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom DataSource WRITE path: the events-derived changelog is
    written through ``ChangelogWriter`` (executor-side temp files →
    driver-side atomic rename commit + ``_SUCCESS``, the
    FileOutputCommitter two-phase protocol) and read back through the
    partition-per-file reader; the snapshot hash-matches the same oracle
    as the batch and streaming CDC queries — a third independent proof,
    now covering the writer half of the ``pyspark.sql.datasource`` API."""
    import os as _os

    from ..tables import events as _events

    spark.dataSource.register(ChangelogDataSource)
    tag = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/spark_graft_customsink_{tag}"
    if not _os.path.exists(_os.path.join(out, "_SUCCESS")):
        ev = _events(spark, sf_dir)
        (
            ev.select(
                F.col("user_id").alias("key"),
                F.col("event_id").alias("seq"),
                F.when(F.col("event_type") == "error", "D")
                .otherwise("U")
                .alias("op"),
                F.col("value").alias("val"),
            )
            .repartition(8)
            .write.format("changelog")
            .mode("append")
            .save(out)
        )
    changes = spark.read.format("changelog").load(out)
    return latest_snapshot(changes)


@query(
    "q_range_sorted_sink",
    oracle="""
    SELECT count(*) AS n,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
                 2) AS sum_price,
           min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
    FROM lineitem
    WHERE l_orderkey BETWEEN 1000 AND 2000
    """,
)
def q_range_sorted_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered parquet layout: ``repartitionByRange`` +
    ``sortWithinPartitions`` on the key before writing, so each output
    file covers a disjoint key range and rows are sorted inside — parquet
    row-group min/max stats then let a key-range scan skip whole files
    and row groups (the zone-map/Z-order-lite pattern; at 100 TB a
    BETWEEN on the cluster key reads a handful of files instead of the
    table).  The read-back aggregate matches the unclustered oracle,
    proving the layout transform is lossless."""
    import os as _os

    from ..tables import load

    tag = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/spark_graft_lirange_{tag}"
    if not _os.path.exists(_os.path.join(out, "_SUCCESS")):
        (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice")
            .repartitionByRange(8, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.mode("overwrite")
            .parquet(out)
        )
    back = spark.read.parquet(out).where(
        F.col("l_orderkey").between(1000, 2000)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                "double"
            ),
            2,
        ).alias("sum_price"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


@query(
    "q_cdc_time_travel",
    oracle="""
    WITH cut AS (
        SELECT (max(event_id) * 6) // 10 AS s FROM events
    )
    SELECT user_id AS key,
           arg_max(value, event_id) AS val,
           max(event_id) AS last_seq
    FROM events CROSS JOIN cut
    WHERE event_id <= cut.s
    GROUP BY user_id
    HAVING arg_max(CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END,
                   event_id) <> 'D'
    """,
)
def q_cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TRAVEL snapshot over the CDC changelog: the table AS OF
    sequence S (here the deterministic 60%-of-max cutoff — in production
    any committed sequence number), materialized by filtering the
    changelog to ``seq <= S`` BEFORE the same one-shuffle ``max_by``
    snapshot aggregation q_cdc_snapshot uses.  Keys whose last op at S
    was a delete are absent, and keys created after S don't exist yet —
    the read-uncommitted-free historical view a changelog-backed table
    format reconstructs for audits and reproducible backfills.

    Scale: the cutoff is a 1-row broadcast; the seq filter is a pushed
    scan predicate on the changelog (at 100 TB, changelog segments are
    seq-ranged files, so the filter prunes whole segments before IO);
    the snapshot itself stays one map-side-combinable shuffle on key."""
    spark.dataSource.register(ChangelogDataSource)
    changes = spark.read.format("changelog").load(
        _changelog_dir(spark, sf_dir)
    )
    cut = changes.agg(
        F.expr("(max(seq) * 6) div 10").cast("long").alias("s")
    )
    asof = changes.crossJoin(F.broadcast(cut)).where(F.col("seq") <= F.col("s"))
    return latest_snapshot(asof)
