"""CDC changelog batch source (PySpark Python DataSource V2, batch side).

Complements the streaming Nomad source (``sources/nomad.py``, a
``SimpleDataSourceStreamReader``) with the batch half of the public
``pyspark.sql.datasource`` API: ``DataSourceReader.partitions()`` splits
the input into one ``InputPartition`` per changelog file, so a
1000-executor cluster reads 1000 files concurrently — the same
parallel-scan contract as the built-in file sources, demonstrated on a
format Spark doesn't ship (an NDJSON upsert/delete changelog, the shape
Debezium-style CDC feeds produce).

Record shape (one JSON object per line):
    {"key": <long>, "seq": <long>, "op": "U"|"D", "val": <double>}
``seq`` is the total order; the latest op per key wins; a latest "D"
deletes the key.  ``latest_snapshot`` materializes current state with
one ``max_by`` aggregation (map-side combinable — no window, no sort).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CHANGELOG_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("val", DoubleType()),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class ChangelogReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("changelog source requires a path option")
        self._dir = path

    def partitions(self) -> list[InputPartition]:
        files = sorted(
            os.path.join(self._dir, f)
            for f in os.listdir(self._dir)
            if not f.startswith((".", "_"))
        )
        # one partition per file: the scan parallelism IS the file count
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                yield (
                    d.get("key"),
                    d.get("seq"),
                    d.get("op"),
                    d.get("val"),
                )


class _CommitMessage(WriterCommitMessage):
    def __init__(self, tmp_path: str, final_path: str, rows: int) -> None:
        self.tmp_path = tmp_path
        self.final_path = final_path
        self.rows = rows


class ChangelogWriter(DataSourceWriter):
    """The write half of the custom-format contract: each task writes its
    partition to a TEMPORARY file and returns a commit message; only the
    driver's ``commit()`` renames temporaries into place and drops the
    ``_SUCCESS`` marker — readers (which skip dot/underscore files) never
    observe a torn write, and ``abort()`` leaves no partial output.  This
    is the two-phase task-commit protocol of Hadoop's FileOutputCommitter
    (algorithm 2: task-direct rename), scaled down to NDJSON."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("changelog sink requires a path option")
        self._dir = path

    def write(self, iterator) -> "_CommitMessage":
        import uuid as _uuid

        os.makedirs(self._dir, exist_ok=True)
        stem = f"part-{_uuid.uuid4().hex}.ndjson"
        tmp = os.path.join(self._dir, f".{stem}.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {
                            "key": row.key,
                            "seq": row.seq,
                            "op": row.op,
                            "val": row.val,
                        },
                        separators=(",", ":"),
                    )
                    + "\n"
                )
                n += 1
        return _CommitMessage(tmp, os.path.join(self._dir, stem), n)

    def commit(self, messages) -> None:
        for m in messages:
            if m is not None:
                os.replace(m.tmp_path, m.final_path)
        with open(os.path.join(self._dir, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class ChangelogDataSource(DataSource):
    """Register with ``spark.dataSource.register(ChangelogDataSource)``;
    read with ``spark.read.format("changelog").load(dir)``, write with
    ``df.write.format("changelog").mode("append").save(dir)``."""

    @classmethod
    def name(cls) -> str:
        return "changelog"

    def schema(self) -> StructType:
        return CHANGELOG_SCHEMA

    def reader(self, schema: StructType) -> ChangelogReader:
        return ChangelogReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ChangelogWriter:
        return ChangelogWriter(self.options)


def latest_snapshot(changes: DataFrame) -> DataFrame:
    """Materialize current state from a changelog: per key, the op with
    the highest ``seq`` wins; keys whose latest op is a delete vanish.
    One hash aggregation with partial combine — at 100 TB this is a
    single shuffle on key, no global sort, no window."""
    return (
        changes.groupBy("key")
        .agg(
            F.max_by("op", "seq").alias("last_op"),
            F.max_by("val", "seq").alias("val"),
            F.max("seq").alias("last_seq"),
        )
        .where(F.col("last_op") != "D")
        .select("key", "val", "last_seq")
    )
