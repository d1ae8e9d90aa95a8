"""Pipeline golden tests (SURVEY.md section 5.2 items 3): the fixture
envelope and the synthetic stream through the full REF-semantics
pipeline as a batch plan."""

from __future__ import annotations

import os

import pytest

from nomad_event_streamer_spark.sources.ndjson import NDJSONBuffer
from nomad_event_streamer_spark.sources.synthetic import sample_stream
from nomad_event_streamer_spark.streaming.pipeline import task_event_pipeline

FIXTURE = "/root/reference/spec/fixtures/nomad/stream_a_1.txt"


def lines_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixture absent")
def test_fixture_golden(spark):
    """FIXTURES.md golden expectations: proxy task dropped (app.rb:141),
    5 run-task events survive, the Terminated one classifies success
    (app.rb:203-208).  The capture needs tolerant recovery first (its
    envelope embeds a raw newline in a string — see test_ndjson)."""
    import json

    from nomad_event_streamer_spark.sources.ndjson import recover_documents

    docs = recover_documents(open(FIXTURE, encoding="utf-8").read())
    raw_lines = [json.dumps(d) for d in docs if d]
    out = task_event_pipeline(lines_df(spark, raw_lines)).collect()

    assert all(r.task_id == "run" for r in out), "proxy task must be filtered"
    assert len(out) == 5
    assert {r.event_type for r in out} == {
        "Received",
        "Task Setup",
        "Started",
        "Terminated",
        "Killing",
    }
    states = {r.event_type: r.state for r in out}
    assert states["Terminated"] == "success"
    assert states["Started"] is None
    (term,) = [r for r in out if r.event_type == "Terminated"]
    assert term.raft_index == 6104
    # namespace "default" elided from the identifier (app.rb:143-144)
    assert term.task_identifier == "plex-meta-manager-run-dynamic/periodic-1641457019.run"


def test_synthetic_classification(spark):
    """Every classification branch (app.rb:195-209) on the synthetic
    stream; heartbeats and proxy tasks dropped."""
    out = task_event_pipeline(lines_df(spark, sample_stream(8))).collect()
    assert out, "pipeline produced no rows"
    assert all("connect-proxy" not in r.task_id for r in out)

    by_type = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    # exit_code "0" -> success
    assert {r.state for r in by_type["Terminated"]} == {"success", "failure"}
    # unhealthy restart -> failure
    assert all(r.state == "failure" for r in by_type["Restart Signaled"])
    # lifecycle events carry no state
    assert all(r.state is None for r in by_type["Started"])


def test_heartbeat_and_replay_filters(spark):
    """Heartbeats (app.rb:110-117) and stale indexes (app.rb:119-122)
    never reach the explode stage."""
    lines = sample_stream(4, start_index=100)  # indexes 100,110,120,130
    out = task_event_pipeline(lines_df(spark, lines), starting_index=115).collect()
    assert out
    assert all(r.raft_index > 115 for r in out)


def test_allow_deny_filters(spark):
    """Deny beats allow; empty allowlist passes everything
    (app.rb:169-179)."""
    lines = sample_stream(8)
    base = task_event_pipeline(lines_df(spark, lines))
    denied = task_event_pipeline(lines_df(spark, lines), denylist=["Received"])
    allowed = task_event_pipeline(
        lines_df(spark, lines), allowlist=["Terminated"]
    )
    assert {r.event_type for r in denied.collect()}.isdisjoint({"Received"})
    assert {r.event_type for r in allowed.collect()} == {"Terminated"}
    assert base.count() > denied.count()


def test_corrupt_lines_dropped(spark):
    """PERMISSIVE parse: garbage lines vanish, valid ones survive
    (lib/ndjson.rb:26-34 semantics)."""
    lines = ["this is not json", '{"broken": '] + sample_stream(4)
    out_good = task_event_pipeline(lines_df(spark, sample_stream(4)))
    out_mixed = task_event_pipeline(lines_df(spark, lines))
    assert out_mixed.count() == out_good.count()
