"""Declared sketch/summary queries (SURVEY.md 2.12): frequency sketches
whose sketch-then-verify plans produce EXACT output — so they ship with
full DuckDB value-hash oracles despite being sketch-powered.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import sketch
from ..tables import events, load, rebalance_for_cpu
from .registry import query


@query(
    "q_heavy_hitters",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT tok AS item, count(*) AS cnt,
           CAST(count(*) AS DOUBLE) / CAST((SELECT count(*) FROM toks)
                                           AS DOUBLE) AS frac
    FROM toks
    GROUP BY tok
    HAVING count(*) > 0.0335 * (SELECT count(*) FROM toks)
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over the token stream via distributed Misra-Gries
    sketch-then-verify (operators/sketch.py): per-partition MG summaries
    (k=30 counters, bounded memory at any key cardinality) merge into a
    no-false-negative candidate set for phi=3.35%; a broadcast semi-join
    + exact count yields EXACT results — hence the plain GROUP BY/HAVING
    oracle.  At 100 TB this shuffles only candidate-key rows instead of
    the full distinct-key aggregate."""
    docs = rebalance_for_cpu(load(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    return sketch.heavy_hitters(toks, "tok", phi=0.0335, k=30)


@query("q_hll_rollup")  # rows-only: HLL estimates have no SQL replica
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (the pre-aggregated sketch table pattern):
    per-(event_type, day) HLL sketches are built once (`hll_sketch_agg`),
    then distinct-user counts for ANY grouping roll up by merging
    sketches (`hll_union_agg`) — never re-touching the fact table.  At
    100 TB this is how interactive distinct-count dashboards work: the
    sketch table is aggregate-sized, merges are associative, and any
    time/type slice is a sketch-merge away.  Estimates are
    Spark-implementation-specific (Datasketches HLL), hence rows-only;
    determinism within Spark is covered by the driver's repeat runs."""
    ev = events(spark, sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts_t").alias("day"))
        .agg(F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("hll"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("hll"), F.lit(False))
            ).alias("approx_users"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )


_HLL_ORACLE = sketch.hll_registers_oracle_sql(
    "SELECT event_type, user_id FROM events",
    ["event_type"],
    "user_id",
    p=8,
)


@query("q_hll_registers", oracle=_HLL_ORACLE)
def q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog with VERIFIABLE internals: the register table
    (event_type, bucket, max_rho) is pure integer arithmetic
    (operators/sketch.hll_registers), so unlike the Datasketches-backed
    q_hll_rollup it carries a full cross-engine value-hash oracle.  The
    query builds per-(event_type, day) registers first and merges them
    by element-wise max — exercising the mergeability that makes sketch
    rollups work at 100 TB (union = max, associative, fact table touched
    once) — and the merged result equals the direct computation, which
    is exactly what the oracle computes."""
    ev = events(spark, sf_dir)
    daily = sketch.hll_registers(
        ev.withColumn("day", F.to_date("ts_t")),
        ["event_type", "day"],
        "user_id",
        p=8,
    )
    return (
        daily.groupBy("event_type", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
