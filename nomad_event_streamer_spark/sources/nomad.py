"""Custom streaming source for Nomad's event stream (PySpark DataSource
V2, SimpleDataSourceStreamReader).

Replaces the reference's hand-rolled HTTP client (app.rb:29-37,63-83,
107): one long-poll GET per micro-batch against
``/v1/event/stream?index=N&namespace=...&topic=...``, NDJSON-framed by
sources.ndjson.NDJSONBuffer, with the Raft ``last_log_index`` as the
streaming offset — so replay suppression (app.rb:119-122) becomes the
source's offset contract and restarts resume exactly where the
checkpoint left off (an upgrade over the reference, which re-baselines
and silently loses the gap, app.rb:63-72).

Pushdown: ``namespace`` and ``topic`` become server-side query params —
the reference pushes only namespace and filters topic client-side
(app.rb:43,80-81 vs app.rb:128); we push both.

Options:
    url        Nomad address, e.g. http://127.0.0.1:4646 (required)
    token      X-Nomad-Token header value (optional; app.rb:29-37)
    namespace  server-side namespace filter (optional; app.rb:43)
    topic      server-side topic filter (default "Allocation")
    poll_seconds   max wall-clock per micro-batch poll (default 2.0)
    max_bytes      max bytes per poll (default 1 MiB)

Emitted schema: ``value STRING`` — one raw NDJSON document per row
(heartbeats included); downstream, streaming.pipeline.task_event_pipeline
parses and filters exactly like the file-based path.
"""

from __future__ import annotations

import json
import socket
import time
import urllib.error
import urllib.parse
import urllib.request

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StringType, StructField, StructType

from .ndjson import NDJSONBuffer

SCHEMA = StructType([StructField("value", StringType())])


def _register_by_value() -> None:
    """Same location-independence fix as sources.replay: the streaming
    planner subprocess can't import this package unless the driver ran
    from the repo root, so embed this module (and the ndjson framing
    module it closes over) in the pickle by value."""
    try:
        import sys

        from pyspark import cloudpickle

        from . import ndjson as _ndjson

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
        cloudpickle.register_pickle_by_value(_ndjson)
    except Exception:  # best-effort: in-repo launches work regardless
        pass


_register_by_value()


class NomadBootstrapError(RuntimeError):
    """Raised when /v1/agent/self lacks stats.raft.last_log_index — the
    reference aborts in this case (app.rb:66-69)."""


class NomadStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.url = options.get("url")
        if not self.url:
            raise ValueError("nomad_events source requires option 'url'")
        self.token = options.get("token")
        self.namespace = options.get("namespace")
        self.topic = options.get("topic", "Allocation")
        self.poll_seconds = float(options.get("poll_seconds", "2.0"))
        self.max_bytes = int(options.get("max_bytes", str(1 << 20)))

    # -- HTTP plumbing ----------------------------------------------------
    def _request(self, path: str, params: dict | None = None) -> urllib.request.Request:
        query = f"?{urllib.parse.urlencode(params)}" if params else ""
        req = urllib.request.Request(f"{self.url}{path}{query}")
        if self.token:  # app.rb:29-37
            req.add_header("X-Nomad-Token", self.token)
        return req

    def _bootstrap_index(self) -> int:
        """GET /v1/agent/self -> stats.raft.last_log_index (app.rb:63-70)."""
        with urllib.request.urlopen(self._request("/v1/agent/self"), timeout=10) as r:
            body = json.load(r)
        index = (body.get("stats") or {}).get("raft", {}).get("last_log_index")
        if index is None:
            raise NomadBootstrapError(
                "unable to detect last log index from /v1/agent/self"
            )
        return int(index)

    # -- stream reader contract -------------------------------------------
    def initialOffset(self) -> dict:
        return {"index": self._bootstrap_index()}

    def _poll(self, start_index: int) -> tuple[list[str], int]:
        """One long-poll: read NDJSON until poll_seconds/max_bytes, return
        (raw docs, max index seen)."""
        params: dict = {"index": start_index, "topic": self.topic}
        if self.namespace:  # server-side pushdown, app.rb:43,80-81
            params["namespace"] = self.namespace
        buf = NDJSONBuffer()
        docs: list[str] = []
        max_index = start_index
        deadline = time.monotonic() + self.poll_seconds
        try:
            resp = urllib.request.urlopen(
                self._request("/v1/event/stream", params), timeout=self.poll_seconds
            )
        except (urllib.error.URLError, socket.timeout):
            return docs, max_index
        try:
            read = 0
            while time.monotonic() < deadline and read < self.max_bytes:
                try:
                    chunk = resp.read1(8192) if hasattr(resp, "read1") else resp.read(8192)
                except (TimeoutError, socket.timeout):
                    break
                if not chunk:
                    break
                read += len(chunk)
                for doc in buf.feed(chunk):
                    if not doc:  # {} heartbeat: liveness only (app.rb:110-117)
                        continue
                    idx = doc.get("Index")
                    if idx is not None and idx > start_index:  # app.rb:119-122
                        max_index = max(max_index, idx)
                        docs.append(json.dumps(doc, separators=(",", ":")))
        finally:
            resp.close()
        return docs, max_index

    def read(self, start: dict) -> tuple:
        start_index = int(start.get("index", 0))
        docs, max_index = self._poll(start_index)
        return iter([(d,) for d in docs]), {"index": max_index}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay after restart: Nomad serves the event buffer from a given
        # index, so re-poll the gap.
        docs, _ = self._poll(int(start.get("index", 0)))
        end_index = int(end.get("index", 0))
        out = []
        for d in docs:
            if json.loads(d).get("Index", 0) <= end_index:
                out.append((d,))
        return iter(out)


class NomadEventDataSource(DataSource):
    """spark.read/readStream ``format("nomad_events")`` after
    ``spark.dataSource.register(NomadEventDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "nomad_events"

    def schema(self) -> StructType:
        return SCHEMA

    def simpleStreamReader(self, schema: StructType) -> NomadStreamReader:
        return NomadStreamReader(self.options)
