"""Declared streaming queries: Structured Streaming plans run to
completion with availableNow triggers so the driver can hash-match them
like any batch query (SIGMOD 2018 micro-batch model).

The parquet file-stream source replays the same testdata the oracle
reads, so exact oracles apply; the stateful op is checked end-to-end
against a plain GROUP BY — proving the GroupState bookkeeping is exact.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_runtime_confs
from ..streaming.dedup_state import summary_stream
from .registry import query


_STREAM_DIRS: dict[str, str] = {}


def _events_stream_dir(sf_dir: str) -> str:
    """The file-stream source requires a *directory*; expose the single
    events parquet through a symlink in a cached temp dir."""
    if sf_dir not in _STREAM_DIRS:
        d = tempfile.mkdtemp(prefix="nes_stream_")
        os.symlink(f"{sf_dir}/events.parquet", os.path.join(d, "events.parquet"))
        _STREAM_DIRS[sf_dir] = d
    return _STREAM_DIRS[sf_dir]


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a bounded file stream (schema pinned from the batch
    reader — streaming sources never infer)."""
    ensure_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return spark.readStream.schema(schema).parquet(_events_stream_dir(sf_dir))


def _run_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    """Run a bounded streaming query into a memory sink; returns the sink
    table as a DataFrame."""
    name = f"q_{uuid.uuid4().hex[:12]}"
    checkpoint = os.path.join(tempfile.mkdtemp(prefix="nes_ckpt_"), "cp")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


@query("q_stream_nomad_pipeline")  # rows-only: input is a generated stream
def q_stream_nomad_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full REF pipeline (app.rb:106-278) as a bounded streaming run:
    synthetic NDJSON -> parse -> explode*3 -> filters -> watermark dedup ->
    classification, counted by outcome.  Rows-only: the input is the
    deterministic synthetic Nomad stream, not an oracle table."""
    from ..sources.synthetic import sample_stream
    from ..streaming.runner import build_stream

    ensure_runtime_confs(spark)
    input_dir = tempfile.mkdtemp(prefix="nes_nomad_in_")
    with open(os.path.join(input_dir, "stream.ndjson"), "w") as f:
        f.write("\n".join(sample_stream(12)) + "\n")
    lines = spark.readStream.text(input_dir)
    deduped = build_stream(lines)
    counted = _run_to_memory(deduped, "append")
    return counted.groupBy("state").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_stream_agg",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_stream_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming aggregation (readStream -> groupBy -> complete mode)
    replayed to completion; matches the batch GROUP BY exactly — the
    Structured Streaming prefix-consistency guarantee."""
    stream = _stream_events(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return _run_to_memory(agg, "complete")


@query(
    "q_stream_dedup_state",
    oracle="""
    SELECT user_id, count(*) AS n_events, max(epoch_us(ts)) AS max_ts_us
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): cumulative
    per-key counters carried in GroupState across micro-batches — the
    checkpointed upgrade of the REF's in-memory task_metadata
    (app.rb:78,145-146,271-273).  The memory sink accumulates one update
    row per key per batch; the final value per key is the cumulative
    max, giving an exact oracle against a plain GROUP BY."""
    stream = _stream_events(spark, sf_dir).select(
        "user_id", "event_id", F.expr("ts div 1000").alias("ts_us")
    )
    updates = summary_stream(stream.groupBy("user_id"))
    sink = _run_to_memory(updates, "update")
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("max_ts_us").alias("max_ts_us")
    )
