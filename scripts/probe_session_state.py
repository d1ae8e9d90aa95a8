"""State-store probe for the stateful session dedup (VERDICT r06 item #5):
state rows vs watermark horizon.

q_stream_session_dedup's scale claim is that session state is O(open
sessions), bounded by the watermark horizon — closed sessions evict once
the watermark passes them.  This probe measures that directly: the
documents corpus streams in arrival order (doc_id-spaced 60 s apart)
split into K mtime-ordered files (maxFilesPerTrigger=1, so the watermark
advances K-1 times mid-run and eviction actually fires), the session
aggregation runs in APPEND mode (the live-deployment mode — complete
mode never evicts), and the peak ``numRowsTotal`` across micro-batch
progress events is recorded per watermark horizon.

Healthy shape: peak state ∝ buckets active within ONE horizon window,
NOT total rows seen — doubling the horizon should roughly double peak
state; an unbounded horizon (≥ the whole replay span) degenerates to
rows-seen and is the anti-pattern the watermark exists to prevent.

Usage: python scripts/probe_session_state.py [--sf /root/testdata/sf0.1]
       [--files 10] [--reps 1]
--reps N > 1 replicates documents N× (disjoint texts -> distinct
buckets; ids offset so arrival order interleaves replicas) to grow the
keyspace the way the ×10 row probes do.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from nomad_event_streamer_spark.operators import dedup  # noqa: E402
from nomad_event_streamer_spark.session import get_spark  # noqa: E402

BASE_US = 1_700_000_000_000_000


def build_arrival_files(spark, sf: str, n_files: int, reps: int) -> str:
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    if reps > 1:
        r = spark.range(reps).select(F.col("id").alias("rep"))
        docs = (
            docs.crossJoin(r)
            .select(
                # interleave replicas in arrival order: doc k of rep j
                # arrives at slot k*reps + j
                (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(
                            t, F.lit("_"), F.col("rep").cast("string")
                        ),
                    ),
                    " ",
                ).alias("text"),
            )
        )
    n_docs = docs.count()
    per = (n_docs + n_files - 1) // n_files
    work = tempfile.mkdtemp(prefix="nes_sess_work_")
    out = tempfile.mkdtemp(prefix="nes_sess_in_")
    for i in range(n_files):
        docs.where(
            (F.col("doc_id") >= i * per) & (F.col("doc_id") < (i + 1) * per)
        ).coalesce(1).write.parquet(f"{work}/b{i}")
        part = glob.glob(f"{work}/b{i}/part-*.parquet")[0]
        dst = os.path.join(out, f"{chr(97 + i)}_{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 + i * 100, 1000 + i * 100))
    shutil.rmtree(work)
    return out


def run_one(spark, d: str, horizon_min: int):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    banded = dedup.minhash_bands_rowlocal(
        stream, n=3, num_hashes=16, rows_per_band=2
    )
    keyed = (
        banded.select(
            "doc_id",
            F.element_at("bands", 1).getField("bucket").alias("bucket"),
            F.timestamp_micros(
                F.lit(BASE_US) + F.col("doc_id") * F.lit(60_000_000)
            ).alias("ts"),
        )
        .withWatermark("ts", f"{horizon_min} minutes")
    )
    agg = keyed.groupBy(F.session_window("ts", "5 minutes"), "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("keeper_doc"),
    )
    name = f"sess_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.mkdtemp(prefix="nes_sess_ckpt_"), "cp")
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    peak = 0
    emitted_rows = spark.table(name).count()
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            peak = max(peak, so.get("numRowsTotal", 0))
    return peak, emitted_rows, wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--files", type=int, default=10)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument(
        "--horizons", default="10,100,1000,1000000",
        help="comma-separated watermark horizons in minutes "
        "(the last default is effectively unbounded for this replay)",
    )
    args = ap.parse_args()
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    d = build_arrival_files(spark, args.sf, args.files, args.reps)
    try:
        print(
            f"{'horizon_min':>12s} {'peak_state':>11s} {'emitted':>8s}"
            f" {'wall_s':>7s}"
        )
        for h in [int(x) for x in args.horizons.split(",")]:
            peak, emitted, wall = run_one(spark, d, h)
            print(f"{h:>12d} {peak:>11d} {emitted:>8d} {wall:>7.1f}")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
