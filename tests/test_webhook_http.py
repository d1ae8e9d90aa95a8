"""Real HTTP webhook delivery (app.rb:229-234,258-262): POST bodies that
arrive at a live local server must be byte-identical to the oracled
payload projections, for both Discord and Slack shapes."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from nomad_event_streamer_spark.sources.synthetic import sample_stream
from nomad_event_streamer_spark.streaming.runner import (
    build_stream,
    read_ndjson_stream,
)
from nomad_event_streamer_spark.streaming.sinks import (
    discord_payload,
    http_transport,
    slack_payload,
    webhook_foreach_batch,
)


class _Recorder(BaseHTTPRequestHandler):
    received: list[tuple[str, bytes]] = []
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802 (http.server API)
        body = self.rfile.read(int(self.headers["Content-Length"]))
        with _Recorder.lock:
            _Recorder.received.append((self.path, body))
        self.send_response(204)
        self.end_headers()

    def log_message(self, *args):
        pass


def _serve() -> tuple[ThreadingHTTPServer, str]:
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Recorder)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}"


def test_http_post_bodies_match_payload_projection(tmp_path, spark):
    _Recorder.received = []
    srv, base = _serve()
    try:
        input_dir = tmp_path / "in"
        input_dir.mkdir()
        (input_dir / "a.ndjson").write_text(
            "\n".join(sample_stream(6)) + "\n"
        )
        classified = build_stream(read_ndjson_stream(spark, str(input_dir)))
        transport = http_transport(
            {"discord": f"{base}/discord", "slack": f"{base}/slack"}
        )
        q = (
            classified.writeStream.foreachBatch(
                webhook_foreach_batch(transport)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        # oracle: the same lines through the pure batch payload
        # projections (no duplicates in the fixture, so skipping the
        # streaming dedup is value-neutral)
        from nomad_event_streamer_spark.streaming.pipeline import (
            task_event_pipeline,
        )

        batch = task_event_pipeline(spark.read.text(str(input_dir)))
        want_discord = {
            r["payload"].encode() for r in discord_payload(batch).collect()
        }
        want_slack = {
            r["payload"].encode() for r in slack_payload(batch).collect()
        }
        got_discord = {b for p, b in _Recorder.received if p == "/discord"}
        got_slack = {b for p, b in _Recorder.received if p == "/slack"}

        assert want_discord, "no events made it through the pipeline"
        assert got_discord == want_discord
        assert got_slack == want_slack
        # every delivered body is valid JSON of the right shape
        assert all("embeds" in json.loads(b) for b in got_discord)
        assert all("attachments" in json.loads(b) for b in got_slack)
    finally:
        srv.shutdown()


def test_http_failure_raises_and_fails_batch(tmp_path, spark):
    """No-retry semantics: a non-2xx response must surface as an error
    (the reference is fire-and-forget; we fail loud so checkpoint replay
    + effectively_once can take over)."""

    class _Refuser(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            self.rfile.read(int(self.headers["Content-Length"] or 0))
            self.send_response(500)
            self.end_headers()

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Refuser)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/hook"
        df = spark.createDataFrame(
            [("a", '{"k": 1}')], "task_identifier string, payload string"
        )
        transport = http_transport({"discord": url})
        import pytest as _pytest

        with _pytest.raises(Exception):
            transport(df, "discord")
    finally:
        srv.shutdown()


def test_http_fresh_connection_close_raises_not_retries(tmp_path, spark):
    """Narrowed retry (ADVICE r03): a server that closes the socket
    without responding to a FRESH connection's first request is actively
    rejecting it — the transport must raise, not mask it with a resend
    (the old blanket retry re-POSTed once before failing, doubling
    delivery on servers that process-then-close)."""
    import socketserver

    hits = []

    class _Slammer(socketserver.BaseRequestHandler):
        def handle(self):
            self.request.recv(65536)  # read the request...
            hits.append(1)
            self.request.close()  # ...and slam the connection shut

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Slammer)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/hook"
        df = spark.createDataFrame(
            [("a", '{"k": 1}')], "task_identifier string, payload string"
        ).coalesce(1)
        transport = http_transport({"discord": url})
        import pytest as _pytest

        with _pytest.raises(Exception):
            transport(df, "discord")
        # exactly one request hit the wire: no hidden duplicate resend
        assert len(hits) == 1
    finally:
        srv.shutdown()
