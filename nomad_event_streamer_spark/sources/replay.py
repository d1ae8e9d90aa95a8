"""Throttled NDJSON replay: a rate-limited streaming DataSource.

Spark's built-in ``rate`` source emits synthetic rows at a fixed rate;
this source replays *captured* payloads (an NDJSON event log — the shape
both the Nomad event stream and the CDC changelog produce) with a
deterministic per-micro-batch row budget.  Use cases: load-testing a
streaming pipeline against production captures, deterministic
backfill-through-the-streaming-path (same code path as live, bounded
resource draw), and staging late-data scenarios.

Offset contract: ``{"file": i, "line": n}`` over the lexicographically
sorted file list — total order over lines, exactly replayable.
``readBetweenOffsets`` re-reads any committed range, so recovery after a
crash replays the identical rows (the SimpleDataSourceStreamReader
prefetch-commit cycle).  The file list is snapshotted at reader
construction: replay is over a *capture*, not a growing directory.

Throttle semantics: ``lines_per_batch`` bounds rows per micro-batch —
wall-clock rate = lines_per_batch / trigger interval, chosen by the
runner.  A budget expressed in rows (not wall-clock) keeps every batch
deterministic: the same capture + same budget yields the same batch
boundaries on every run, which is what makes the replayed stream's
aggregates hash-comparable to a batch read of the same capture.

At scale: the simple-reader runs on the driver by design (Spark's
prefetch-then-distribute contract for SimpleDataSourceStreamReader) —
right for a throttled control-plane replay (bounded by the budget), NOT
for bulk ingest; bulk replay is the batch ``changelog`` source
(one InputPartition per file) or ``spark.read.json``.

No reference analog (the reference can only consume a live socket,
app.rb:107); EXT streaming-infrastructure coverage.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StringType, StructField, StructType


def _register_by_value() -> None:
    """Streaming Python data sources are unpickled in a dedicated planner
    subprocess that inherits neither the driver's cwd nor ``addPyFile``
    paths — pickle-by-reference (cloudpickle's rule for importable
    modules) would fail there with ModuleNotFoundError whenever the
    driver wasn't launched from the repo root.  Registering this leaf
    module (stdlib+pyspark imports only) for by-value pickling embeds
    the class definitions in the pickle itself, making registration
    location-independent."""
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # best-effort: in-repo launches work regardless
        pass

REPLAY_SCHEMA = StructType([StructField("value", StringType())])


class ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("replay_ndjson source requires option 'path'")
        self.files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
        self.lines_per_batch = int(options.get("lines_per_batch", "1000"))
        if self.lines_per_batch <= 0:
            raise ValueError("lines_per_batch must be positive")

    def initialOffset(self) -> dict:
        return {"file": 0, "line": 0}

    def _read_from(self, fidx: int, line: int, budget: int):
        """Yield up to ``budget`` (value,) rows starting at (fidx, line);
        returns the end offset."""
        rows = []
        while fidx < len(self.files) and budget > 0:
            with open(self.files[fidx], encoding="utf-8") as fh:
                for i, raw in enumerate(fh):
                    if i < line:
                        continue
                    if budget <= 0:
                        return rows, {"file": fidx, "line": i}
                    raw = raw.rstrip("\n")
                    if raw:
                        rows.append((raw,))
                        budget -= 1
            fidx, line = fidx + 1, 0
        return rows, {"file": fidx, "line": line}

    def read(self, start: dict) -> tuple:
        rows, end = self._read_from(
            int(start["file"]), int(start["line"]), self.lines_per_batch
        )
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        sf, sl = int(start["file"]), int(start["line"])
        ef, el = int(end["file"]), int(end["line"])
        rows = []
        fidx, line = sf, sl
        while (fidx, line) < (ef, el) and fidx < len(self.files):
            with open(self.files[fidx], encoding="utf-8") as fh:
                for i, raw in enumerate(fh):
                    if i < line:
                        continue
                    if (fidx, i) >= (ef, el):
                        return iter(rows)
                    raw = raw.rstrip("\n")
                    if raw:
                        rows.append((raw,))
            fidx, line = fidx + 1, 0
        return iter(rows)


class ReplayDataSource(DataSource):
    """Register with ``spark.dataSource.register(ReplayDataSource)``;
    read with ``spark.readStream.format("replay_ndjson")
    .option("path", dir).option("lines_per_batch", n).load()``."""

    @classmethod
    def name(cls) -> str:
        return "replay_ndjson"

    def schema(self) -> StructType:
        return REPLAY_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> ReplayStreamReader:
        return ReplayStreamReader(self.options)


_register_by_value()
