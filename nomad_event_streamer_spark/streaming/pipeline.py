"""The reference pipeline (app.rb:106-278) as a declarative Spark plan.

One logical plan serves both the batch golden tests and the streaming
runtime (Structured Streaming's prefix-consistency means the same
DataFrame graph runs in either mode — SIGMOD 2018):

    raw NDJSON lines
      -> from_json(ENVELOPE, PERMISSIVE)             (lib/ndjson.rb drop-bad-lines)
      -> heartbeat split                             (app.rb:110-117)
      -> Index > starting_index                      (app.rb:119-122)
      -> explode(Events)                             (app.rb:126)
      -> Topic == "Allocation"                       (app.rb:128-129)
      -> nested projection of Allocation             (app.rb:130-135)
      -> TaskStates null guard                       (app.rb:137)
      -> explode(TaskStates map)                     (app.rb:139)
      -> anti-filter /connect-proxy/                 (app.rb:141)
      -> task_identifier build                       (app.rb:143-144)
      -> explode(TaskState.Events)                   (app.rb:151)
      -> staleness / deny / allow filters            (app.rb:162-179)
      -> message build + state classification       (app.rb:181-209)

Everything is a Column expression — the whole pipeline is one
whole-stage-codegen span per shuffle boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import classify_task_event, task_identifier
from ..schemas import ENVELOPE

HEARTBEAT_COL = "is_heartbeat"


def parse_envelopes(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """NDJSON lines -> typed envelopes.

    PERMISSIVE from_json: corrupt lines -> NULL envelope (dropped, like
    lib/ndjson.rb:26-34); ``{}`` heartbeats parse to an envelope with a
    NULL Index (split out, like app.rb:110-117)."""
    parsed = lines.withColumn("envelope", F.from_json(F.col(value_col), ENVELOPE))
    return (
        parsed.where(F.col("envelope").isNotNull())
        .withColumn(
            HEARTBEAT_COL,
            F.col("envelope.Index").isNull() & F.col("envelope.Events").isNull(),
        )
    )


def data_envelopes(envelopes: DataFrame, starting_index: int = 0) -> DataFrame:
    """Drop heartbeats (app.rb:110-117) and replayed indexes
    (app.rb:119-122)."""
    return envelopes.where(
        (~F.col(HEARTBEAT_COL)) & (F.col("envelope.Index") > F.lit(starting_index))
    )


def explode_task_events(envelopes: DataFrame) -> DataFrame:
    """The reference's triple loop (app.rb:126,139,151) as three explodes
    with the interleaved filters/projections."""
    events = envelopes.select(
        F.col("envelope.Index").alias("raft_index"),
        F.explode("envelope.Events").alias("event"),
    )
    allocs = (
        events.where(F.col("event.Topic") == "Allocation")  # app.rb:128
        .select(
            "raft_index",
            F.col("event.Payload.Allocation.Namespace").alias("namespace"),
            F.col("event.Payload.Allocation.NodeName").alias("node_name"),
            F.col("event.Payload.Allocation.JobID").alias("job_id"),
            F.col("event.Payload.Allocation.TaskStates").alias("task_states"),
        )
        .where(F.col("task_states").isNotNull())  # app.rb:137
    )
    tasks = (
        allocs.select(
            "raft_index",
            "namespace",
            "node_name",
            "job_id",
            F.explode("task_states").alias("task_id", "task_state"),  # app.rb:139
        )
        .where(~F.col("task_id").rlike("connect-proxy"))  # app.rb:141
        .withColumn(
            "task_identifier",
            task_identifier(F.col("namespace"), F.col("job_id"), F.col("task_id")),
        )
    )
    return tasks.select(
        "raft_index",
        "namespace",
        "node_name",
        "job_id",
        "task_id",
        "task_identifier",
        F.explode("task_state.Events").alias("task_event"),  # app.rb:151
    )


def apply_event_filters(
    task_events: DataFrame,
    denylist: list[str] | None = None,
    allowlist: list[str] | None = None,
) -> DataFrame:
    """Deny/allow filters (app.rb:169-179): denylist always wins; the
    allowlist applies only when non-empty — exactly the reference's
    empty-allowlist-passes-everything behavior."""
    out = task_events
    if denylist:
        out = out.where(~F.col("task_event.Type").isin(denylist))
    if allowlist:
        out = out.where(F.col("task_event.Type").isin(allowlist))
    return out


def _details_json() -> Column:
    """Details rendered as JSON with '"' -> "'" rewritten in the values —
    the reference's gsub before embedding in markdown (app.rb:188-189)."""
    return F.to_json(
        F.transform_values(
            F.col("task_event.Details"),
            lambda _k, v: F.regexp_replace(v, '"', "'"),
        )
    )


def classify_and_format(task_events: DataFrame) -> DataFrame:
    """Message build (app.rb:181-189) + state classification
    (app.rb:195-209)."""
    return task_events.select(
        "raft_index",
        "namespace",
        "node_name",
        "job_id",
        "task_id",
        "task_identifier",
        F.col("task_event.Type").alias("event_type"),
        F.col("task_event.Time").alias("event_time_ns"),
        F.timestamp_micros(F.expr("task_event.Time div 1000")).alias("event_time"),
        F.col("task_event.DisplayMessage").alias("display_message"),
        F.col("task_event.Details").alias("details"),
        _details_json().alias("details_json"),
        F.concat(
            F.lit("Task "),
            F.col("task_identifier"),
            F.lit(" "),
            F.lower(F.col("task_event.Type")),
        ).alias("subject"),
        classify_task_event(
            F.col("task_event.Type"), F.col("task_event.Details")
        ).alias("state"),
    )


def task_event_pipeline(
    lines: DataFrame,
    starting_index: int = 0,
    denylist: list[str] | None = None,
    allowlist: list[str] | None = None,
) -> DataFrame:
    """Full REF pipeline, NDJSON lines in -> classified task events out.
    Works unchanged on batch or streaming input."""
    envelopes = data_envelopes(parse_envelopes(lines), starting_index)
    task_events = explode_task_events(envelopes)
    filtered = apply_event_filters(task_events, denylist, allowlist)
    return classify_and_format(filtered)
