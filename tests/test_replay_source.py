"""Throttled NDJSON replay source: offset arithmetic, batch budgets, and
end-to-end streaming parity with a batch read of the same capture."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from nomad_event_streamer_spark.sources.replay import (
    ReplayDataSource,
    ReplayStreamReader,
)


def _capture(tmp_path, files):
    d = tmp_path / "capture"
    d.mkdir()
    for name, lines in files.items():
        (d / name).write_text("".join(f"{ln}\n" for ln in lines))
    return str(d)


def test_reader_budget_and_offsets(tmp_path):
    d = _capture(
        tmp_path,
        {"a.ndjson": ["1", "2", "3"], "b.ndjson": ["4", "5"]},
    )
    r = ReplayStreamReader({"path": d, "lines_per_batch": "2"})
    off = r.initialOffset()
    seen = []
    for _ in range(4):
        rows, off = r.read(off)
        rows = list(rows)
        assert len(rows) <= 2
        seen.extend(v for (v,) in rows)
        if not rows:
            break
    assert seen == ["1", "2", "3", "4", "5"]
    # exhausted source keeps returning the same offset with no rows
    rows, off2 = r.read(off)
    assert list(rows) == [] and off2 == off


def test_reader_read_between_offsets_replays_exactly(tmp_path):
    d = _capture(
        tmp_path,
        {"a.ndjson": ["x", "y", "z"], "b.ndjson": ["w"]},
    )
    r = ReplayStreamReader({"path": d, "lines_per_batch": "3"})
    rows, end = r.read(r.initialOffset())
    first = list(rows)
    replay = list(r.readBetweenOffsets(r.initialOffset(), end))
    assert replay == first
    # a mid-file → next-file range
    rows2, end2 = r.read(end)
    replay2 = list(r.readBetweenOffsets(end, end2))
    assert replay2 == list(rows2)


def test_streaming_batches_respect_budget(spark, tmp_path):
    lines = [f'{{"n": {i}}}' for i in range(25)]
    d = _capture(tmp_path, {"cap.ndjson": lines})
    spark.dataSource.register(ReplayDataSource)
    stream = (
        spark.readStream.format("replay_ndjson")
        .option("path", d)
        .option("lines_per_batch", "10")
        .load()
    )
    batch_sizes = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: batch_sizes.append(df.count())
        )
        .option(
            "checkpointLocation", os.path.join(str(tmp_path), "ckpt")
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    assert sum(batch_sizes) == 25
    assert all(b <= 10 for b in batch_sizes)
    assert max(batch_sizes) == 10


def test_streaming_replay_matches_batch_read(spark, tmp_path):
    lines = [f'{{"k": {i % 3}, "v": {i}}}' for i in range(40)]
    d = _capture(tmp_path, {"cap.ndjson": lines})
    spark.dataSource.register(ReplayDataSource)
    stream = (
        spark.readStream.format("replay_ndjson")
        .option("path", d)
        .option("lines_per_batch", "7")
        .load()
    )
    agg = stream.select(
        F.get_json_object("value", "$.k").cast("int").alias("k"),
        F.get_json_object("value", "$.v").cast("long").alias("v"),
    ).groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    name = "replay_parity_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option(
            "checkpointLocation", os.path.join(str(tmp_path), "ckpt2")
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    got = sorted(map(tuple, spark.table(name).collect()))
    expect = sorted(
        (i, sum(1 for x in range(40) if x % 3 == i),
         sum(x for x in range(40) if x % 3 == i))
        for i in range(3)
    )
    assert got == expect
