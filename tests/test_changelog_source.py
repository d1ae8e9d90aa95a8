"""CDC changelog batch DataSource: partition-per-file parallel scan,
latest-state snapshot semantics, delete suppression."""

import json
import os

import pytest

from nomad_event_streamer_spark.sources.changelog import (
    ChangelogDataSource,
    ChangelogReader,
    latest_snapshot,
)


@pytest.fixture()
def changelog_dir(tmp_path):
    rows = [
        # key 1: two upserts -> latest val 2.0
        {"key": 1, "seq": 10, "op": "U", "val": 1.0},
        {"key": 1, "seq": 20, "op": "U", "val": 2.0},
        # key 2: upsert then delete -> gone
        {"key": 2, "seq": 11, "op": "U", "val": 5.0},
        {"key": 2, "seq": 21, "op": "D", "val": None},
        # key 3: delete then re-insert -> present
        {"key": 3, "seq": 12, "op": "D", "val": None},
        {"key": 3, "seq": 22, "op": "U", "val": 7.0},
    ]
    for i in range(3):  # 3 files -> 3 partitions
        with open(tmp_path / f"part-{i}.ndjson", "w") as fh:
            for r in rows[i::3]:
                fh.write(json.dumps(r) + "\n")
    (tmp_path / "_SUCCESS").touch()  # must be ignored
    return str(tmp_path)


def test_partition_per_file(changelog_dir):
    reader = ChangelogReader({"path": changelog_dir})
    parts = reader.partitions()
    assert len(parts) == 3  # _SUCCESS excluded
    all_rows = [r for p in parts for r in reader.read(p)]
    assert len(all_rows) == 6


def test_snapshot_semantics(spark, changelog_dir):
    spark.dataSource.register(ChangelogDataSource)
    changes = spark.read.format("changelog").load(changelog_dir)
    snap = {
        r["key"]: (r["val"], r["last_seq"])
        for r in latest_snapshot(changes).collect()
    }
    assert snap == {1: (2.0, 20), 3: (7.0, 22)}


def test_missing_path_option():
    with pytest.raises(ValueError):
        ChangelogReader({})


def test_writer_roundtrip_and_atomicity(spark, tmp_path):
    import os

    from pyspark.sql import Row

    spark.dataSource.register(ChangelogDataSource)
    rows = [
        Row(key=1, seq=10, op="U", val=1.5),
        Row(key=1, seq=11, op="U", val=2.5),
        Row(key=2, seq=12, op="D", val=None),
    ]
    df = spark.createDataFrame(rows, "key long, seq long, op string, val double")
    out = str(tmp_path / "sink")
    df.repartition(2).write.format("changelog").mode("append").save(out)
    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert not any(n.endswith(".tmp") for n in names)  # commit renamed all
    back = spark.read.format("changelog").load(out)
    got = sorted(map(tuple, back.collect()))
    assert got == sorted((r.key, r.seq, r.op, r.val) for r in rows)


def test_writer_requires_path():
    from nomad_event_streamer_spark.sources.changelog import ChangelogWriter

    with pytest.raises(ValueError):
        ChangelogWriter({})
