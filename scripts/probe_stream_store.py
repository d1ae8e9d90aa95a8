"""State-store provider A/B for the streaming heavyweights (VERDICT r12
item #5 follow-up): the round-13 probe showed addBatch dominated by
state-store COMMIT time (q_stream_outer_join: 112s/219s cumulative
commitTimeMs per batch across partitions vs 3.7s of total non-addBatch
overhead).  This probe re-runs the same two dataflows under
(a) the default HDFSBackedStateStoreProvider and (b) RocksDB
(+ changelog checkpointing), alternating, and reports walls + commit
sums.  Builder-side measurement tooling only.

Usage: python scripts/probe_stream_store.py [rounds] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nomad_event_streamer_spark.session import get_spark  # noqa: E402
from scripts.probe_stream_overhead import (  # noqa: E402
    outer_join_df,
    ttl_df,
    summarize,
)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)


def run_one(spark, df, mode: str) -> list[dict]:
    name = f"p_{uuid.uuid4().hex[:12]}"
    checkpoint = os.path.join(tempfile.mkdtemp(prefix="nes_probe_"), "cp")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    return progress


def main() -> None:
    import time

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stream_store_ab.json"
    spark = get_spark(master=f"local[{CPUS}]")
    results = []
    for rnd in range(rounds):
        order = (HDFS, ROCKSDB) if rnd % 2 == 0 else (ROCKSDB, HDFS)
        for provider in order:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", provider
            )
            spark.conf.set(
                "spark.sql.streaming.stateStore.rocksdb"
                ".changelogCheckpointing.enabled",
                "true",
            )
            for name, build, mode in (
                ("q_stream_outer_join", outer_join_df, "append"),
                ("q_stream_dedup_ttl", ttl_df, "append"),
            ):
                t0 = time.perf_counter()
                progress = run_one(spark, build(spark), mode)
                wall = round(time.perf_counter() - t0, 3)
                s = summarize(name, progress)
                commit_sum = sum(
                    c for b in s["batches"] for c in b["state_commit_ms"] if c
                )
                row = {
                    "round": rnd,
                    "provider": provider.rsplit(".", 1)[-1],
                    "query": name,
                    "wall_sec": wall,
                    "addBatch_ms": s["sum_durationMs"]["addBatch"],
                    "commit_ms_sum": commit_sum,
                    "n_batches": s["n_batches"],
                }
                results.append(row)
                print(f"# {row}", file=sys.stderr, flush=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"out": out_path, "n": len(results)}))


if __name__ == "__main__":
    main()
