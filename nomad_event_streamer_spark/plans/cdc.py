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


@query(
    "q_cdc_snapshot",
    oracle="""
    SELECT user_id AS key,
           arg_max(value, event_id) AS val,
           max(event_id) AS last_seq
    FROM events
    GROUP BY user_id
    HAVING arg_max(CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END,
                   event_id) <> 'D'
    """,
)
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
