"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's declared query surface (SURVEY.md section 2):
``entry`` runs the flagship REF-pipeline batch analog; ``queries`` /
``oracle_sql`` expose every implemented operator with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from nomad_event_streamer_spark.functions import classify_state
from nomad_event_streamer_spark.plans import all_oracles, all_queries
from nomad_event_streamer_spark.tables import events

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference pipeline's batch analog
    (app.rb:106-278) on the events table —

    allowlist filter (app.rb:175-179) -> JSON payload extraction
    (app.rb:130-135) -> latest-per-key dedup (app.rb:157-167) ->
    state classification (app.rb:195-209) -> delivery counts by outcome
    (app.rb:211-267).
    """
    ev = events(spark, SF0001)
    allowed = ev.where(
        F.col("event_type").isin("click", "purchase", "error", "signup")
    )
    parsed = allowed.withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("bigint")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = parsed.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    classified = latest.withColumn(
        "state", classify_state(F.col("event_type"), F.col("value"))
    )
    return classified.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
            "sum_value"
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; float-heavy
    and streaming-only ops are intentionally absent (rows-only check)."""
    return all_oracles()
