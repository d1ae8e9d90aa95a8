"""Streaming runtime: wire the pipeline to sources, dedup, and sinks.

Replaces the reference's single-threaded ingest loop (app.rb:106-278)
with a checkpointed Structured Streaming query:

- source offsets replace the starting_index bookkeeping (app.rb:63-72);
- ``withWatermark`` + ``dropDuplicatesWithinWatermark`` replaces the
  in-memory per-key staleness filter (app.rb:145-167) — relaxed
  semantics; the bit-faithful variant is streaming.dedup_state;
- ``foreachBatch`` fans out to the webhook sinks (app.rb:211-267),
  upgrading at-most-once to at-least-once with idempotent keys.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..session import ensure_runtime_confs
from .pipeline import task_event_pipeline
from .sinks import parquet_transport, webhook_foreach_batch


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession) -> SparkSession:
    """Switch stateful operators to the RocksDB state store — the
    large-key-space posture (SURVEY.md 4.3): state lives off-heap /
    on-disk per executor instead of in the JVM heap, so per-key dedup
    state survives key cardinalities that would OOM the default HDFS-
    backed in-memory provider.  Applies to queries STARTED after the
    call; verified working in tests/test_streaming_rocksdb.py."""
    ensure_runtime_confs(spark)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    return spark


def read_ndjson_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """NDJSON file stream (the fixture-replay source; swap for the
    nomad_events DataSource in live deployments)."""
    ensure_runtime_confs(spark)
    return spark.readStream.text(input_dir)


def build_stream(
    lines: DataFrame,
    starting_index: int = 0,
    denylist: list[str] | None = None,
    allowlist: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    classified = task_event_pipeline(lines, starting_index, denylist, allowlist)
    return classified.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["task_identifier", "event_time_ns"]
    )


def start_webhook_query(
    deduped: DataFrame,
    checkpoint_dir: str,
    output_dir: str,
    transport: Callable[[DataFrame, str], None] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    transport = transport or parquet_transport(output_dir)
    writer = (
        deduped.writeStream.foreachBatch(webhook_foreach_batch(transport))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()


def start_webhook_query_v2(
    deduped: DataFrame,
    checkpoint_dir: str,
    output_dir: str,
    ledger_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Effectively-once variant: per-batch overwrite transport + a
    delivery ledger keyed on batch id, so checkpoint-recovery replays
    neither duplicate files nor re-POST delivered batches.  (The
    reference is at-most-once — app.rb:229-234 — this strictly
    strengthens it.)"""
    from .sinks import (
        batch_overwrite_transport,
        effectively_once,
        webhook_foreach_batch_v2,
    )

    body = effectively_once(
        webhook_foreach_batch_v2(batch_overwrite_transport(output_dir)),
        ledger_dir,
    )
    writer = (
        deduped.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()
