"""Nomad DataSource end-to-end: a local HTTP server standing in for the
Nomad agent (bootstrap endpoint + long-poll event stream), driven
through the real spark.readStream DataSource V2 path."""

from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from nomad_event_streamer_spark.sources.nomad import (
    NomadBootstrapError,
    NomadEventDataSource,
    NomadStreamReader,
)
from nomad_event_streamer_spark.sources.synthetic import sample_stream


class FakeNomad(BaseHTTPRequestHandler):
    """Serves /v1/agent/self and /v1/event/stream from a canned NDJSON
    list, honoring the index param like the real agent."""

    lines: list[str] = []
    last_log_index = 100
    seen_headers: list[dict] = []
    seen_queries: list[dict] = []

    def do_GET(self):  # noqa: N802
        url = urlparse(self.path)
        type(self).seen_headers.append(dict(self.headers))
        type(self).seen_queries.append(parse_qs(url.query))
        if url.path == "/v1/agent/self":
            body = json.dumps(
                {"stats": {"raft": {"last_log_index": str(self.last_log_index)}}}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if url.path == "/v1/event/stream":
            start = int(parse_qs(url.query).get("index", ["0"])[0])
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            for line in self.lines:
                doc = json.loads(line) if line.strip() else {}
                if doc and doc.get("Index", 0) <= start:
                    continue
                self.wfile.write((line + "\n").encode())
            self.wfile.write(b"{}\n")  # trailing heartbeat
            self.wfile.flush()
            # keep the connection open briefly like a real long-poll
            time.sleep(0.2)
            return
        self.send_response(404)
        self.end_headers()

    def log_message(self, *args):  # silence
        pass


@pytest.fixture()
def fake_nomad():
    FakeNomad.lines = sample_stream(6, start_index=110)
    FakeNomad.seen_headers = []
    FakeNomad.seen_queries = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), FakeNomad)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_reader_bootstrap_and_poll(fake_nomad):
    """Unit-level: bootstrap index (app.rb:63-70), token header
    (app.rb:29-37), namespace/topic pushdown (app.rb:43,80-81,128),
    index-based replay suppression (app.rb:119-122)."""
    reader = NomadStreamReader(
        {
            "url": fake_nomad,
            "token": "secret-token",
            "namespace": "default",
            "poll_seconds": "1.0",
        }
    )
    assert reader.initialOffset() == {"index": 100}

    rows, next_off = reader.read({"index": 100})
    rows = list(rows)
    assert rows, "poll returned no documents"
    assert next_off["index"] > 100
    indexes = [json.loads(r[0])["Index"] for r in rows]
    assert all(i > 100 for i in indexes)

    # pushdown + auth reached the wire
    stream_queries = [q for q in FakeNomad.seen_queries if "index" in q]
    assert any(q.get("namespace") == ["default"] for q in stream_queries)
    assert any(q.get("topic") == ["Allocation"] for q in stream_queries)
    assert any(
        h.get("X-Nomad-Token") == "secret-token" for h in FakeNomad.seen_headers
    )

    # replaying from the max offset yields nothing new
    rows2, off2 = reader.read(next_off)
    assert list(rows2) == []
    assert off2 == next_off


def test_reader_bootstrap_failure():
    """Missing last_log_index aborts, like the reference (app.rb:66-69)."""

    class NoRaft(FakeNomad):
        pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), NoRaft)

    def bad_self(handler):
        body = json.dumps({"stats": {}}).encode()
        handler.send_response(200)
        handler.send_header("Content-Length", str(len(body)))
        handler.end_headers()
        handler.wfile.write(body)

    NoRaft.do_GET = lambda self: bad_self(self)  # type: ignore[method-assign]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        reader = NomadStreamReader(
            {"url": f"http://127.0.0.1:{server.server_address[1]}"}
        )
        with pytest.raises(NomadBootstrapError):
            reader.initialOffset()
    finally:
        server.shutdown()


def test_datasource_streaming_end_to_end(fake_nomad, spark, tmp_path):
    """The registered format('nomad_events') through readStream -> memory
    sink: documents arrive with Index > bootstrap offset."""
    spark.dataSource.register(NomadEventDataSource)
    name = f"nomad_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("nomad_events")
        .option("url", fake_nomad)
        .option("poll_seconds", "1.0")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        rows = []
        while time.monotonic() < deadline:
            rows = spark.table(name).collect()
            if len(rows) >= 6:
                break
            time.sleep(0.5)
        assert rows, "no rows arrived through the nomad_events source"
        indexes = [json.loads(r.value)["Index"] for r in rows]
        assert all(i > 100 for i in indexes)
        assert len(set(indexes)) == len(indexes), "no duplicate envelopes"
    finally:
        q.stop()
