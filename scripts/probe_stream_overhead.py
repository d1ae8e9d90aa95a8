"""Instrument the heavyweight streaming queries (VERDICT r12 item #5):
per-micro-batch durationMs breakdown + state-store commit metrics for
q_stream_outer_join and q_stream_dedup_ttl, from StreamingQuery
progress events — answering "is the cost per-batch planning/commit
overhead, or the state semantics under test?".

Usage: python scripts/probe_stream_overhead.py [out.json]
Builder-side measurement tooling only; never touches bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import uuid

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nomad_event_streamer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run_instrumented(df, output_mode: str) -> list[dict]:
    """Start the streaming query like _run_to_memory, but keep the
    handle and return recentProgress dicts."""
    name = f"p_{uuid.uuid4().hex[:12]}"
    checkpoint = os.path.join(tempfile.mkdtemp(prefix="nes_probe_"), "cp")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    return progress


def outer_join_df(spark):
    from nomad_event_streamer_spark.plans import streaming_queries as sq

    stream = sq._stream_events(spark, SF_DIR).withColumn(
        "ts_t", F.timestamp_micros(F.expr("ts div 1000"))
    )
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts_t").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts_t").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "leftOuter",
    )


def ttl_df(spark):
    from nomad_event_streamer_spark.operators import dedup
    from nomad_event_streamer_spark.plans import streaming_queries as sq
    from nomad_event_streamer_spark.streaming.ttl_dedup import (
        ttl_dedup_stream,
    )

    schema = "doc_id BIGINT, text STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sq._doc_batches_dir(spark, SF_DIR))
    )
    banded = dedup.minhash_bands_rowlocal(
        stream, n=3, num_hashes=16, rows_per_band=2
    )
    keyed = banded.select(
        "doc_id",
        F.element_at("bands", 1).getField("bucket").alias("bucket"),
        (
            F.lit(sq._SESSION_DEDUP_BASE_US)
            + F.col("doc_id") * F.lit(60_000_000)
        ).alias("ts_us"),
    )
    return ttl_dedup_stream(keyed.groupBy("bucket"), sq._TTL_US)


def summarize(name: str, progress: list[dict]) -> dict:
    rows = []
    for p in progress:
        d = p.get("durationMs", {})
        so = p.get("stateOperators", [])
        rows.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": d,
                "state_commit_ms": [
                    s.get("commitTimeMs") for s in so
                ],
                "state_rows_total": [
                    s.get("numRowsTotal") for s in so
                ],
                "state_mem_bytes": [
                    s.get("memoryUsedBytes") for s in so
                ],
            }
        )
    total_trigger = sum(
        r["durationMs"].get("triggerExecution", 0) for r in rows
    )
    total_addbatch = sum(r["durationMs"].get("addBatch", 0) for r in rows)
    overhead = {
        k: sum(r["durationMs"].get(k, 0) for r in rows)
        for k in (
            "queryPlanning",
            "walCommit",
            "commitOffsets",
            "latestOffset",
            "getBatch",
            "triggerExecution",
            "addBatch",
        )
    }
    return {
        "query": name,
        "n_batches": len(rows),
        "sum_durationMs": overhead,
        "non_addBatch_ms": total_trigger - total_addbatch,
        "batches": rows,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stream_probe.json"
    spark = get_spark(master=f"local[{CPUS}]")
    import time

    results = []
    for name, build, mode in (
        ("q_stream_outer_join", outer_join_df, "append"),
        ("q_stream_dedup_ttl", ttl_df, "append"),
    ):
        t0 = time.perf_counter()
        progress = run_instrumented(build(spark), mode)
        wall = round(time.perf_counter() - t0, 3)
        s = summarize(name, progress)
        s["wall_sec"] = wall
        results.append(s)
        print(
            f"# {name}: wall={wall}s batches={s['n_batches']} "
            f"durations={s['sum_durationMs']} "
            f"non_addBatch={s['non_addBatch_ms']}ms",
            file=sys.stderr,
        )
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"out": out_path, "n": len(results)}))


if __name__ == "__main__":
    main()
