"""Canonical Nomad event-stream schema (FIXTURES.md section A).

The reference navigates untyped JSON with ``dig`` (app.rb:130-135) — its
schema exists only implicitly in the Nomad API contract.  Here it is an
explicit StructType applied with ``from_json(..., PERMISSIVE)``: schema
inference is forbidden on the hot path, corrupt rows become NULL rows to
be filtered (the parser's drop-bad-lines semantics, lib/ndjson.rb:26-34).

Only the fields the pipeline consumes are modeled as typed columns (the
starred fields of app.rb:130-135,151-209); unmodeled envelope fields are
simply never parsed — column pruning at the JSON layer.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# fixture: 24 fields; the pipeline reads Type/Time/Message/DisplayMessage/
# Details (app.rb:151-209); the rest stay available for sinks.
TASK_EVENT = StructType(
    [
        StructField("Type", StringType()),  # app.rb:152
        StructField("Time", LongType()),  # ns-epoch! app.rb:154-155
        StructField("Message", StringType()),
        StructField("DisplayMessage", StringType()),  # app.rb:181
        StructField("Details", MapType(StringType(), StringType())),  # app.rb:182,188-207
        StructField("FailsTask", BooleanType()),
        StructField("ExitCode", LongType()),
        StructField("Signal", LongType()),
        StructField("KillTimeout", LongType()),
        StructField("DiskLimit", LongType()),
        StructField("StartDelay", LongType()),
        StructField("RestartReason", StringType()),
        StructField("KillReason", StringType()),
        StructField("DriverMessage", StringType()),
    ]
)

TASK_STATE = StructType(
    [
        StructField("State", StringType()),
        StructField("Failed", BooleanType()),
        StructField("Restarts", LongType()),
        StructField("StartedAt", StringType()),  # RFC3339
        StructField("FinishedAt", StringType()),
        StructField("LastRestart", StringType()),
        StructField("Events", ArrayType(TASK_EVENT)),  # app.rb:147
    ]
)

ALLOCATION = StructType(
    [
        StructField("ID", StringType()),
        StructField("Namespace", StringType()),  # app.rb:131
        StructField("NodeName", StringType()),  # app.rb:132
        StructField("JobID", StringType()),  # app.rb:133
        StructField("TaskStates", MapType(StringType(), TASK_STATE)),  # app.rb:135,139
        StructField("ClientStatus", StringType()),
        StructField("TaskGroup", StringType()),
        StructField("CreateTime", LongType()),  # ns-epoch
        StructField("ModifyTime", LongType()),  # ns-epoch
    ]
)

EVENT = StructType(
    [
        StructField("Topic", StringType()),  # app.rb:128 — only "Allocation"
        StructField("Type", StringType()),
        StructField("Key", StringType()),
        StructField("Namespace", StringType()),
        StructField("FilterKeys", ArrayType(StringType())),
        StructField("Index", LongType()),
        StructField("Payload", StructType([StructField("Allocation", ALLOCATION)])),
    ]
)

ENVELOPE = StructType(
    [
        StructField("Index", LongType()),  # Raft index; app.rb:119-122
        StructField("Events", ArrayType(EVENT)),  # app.rb:126
    ]
)
