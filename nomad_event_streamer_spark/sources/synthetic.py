"""Deterministic synthetic Nomad event stream (FIXTURES.md section A
generator knobs) — for streaming tests and the declared streaming query.

Shapes mirror the Nomad API contract the reference consumes (envelope ->
Events[] -> Allocation -> TaskStates{} -> TaskEvent[]), with the
interesting classification cases: Terminated with exit_code "0"/"1",
oom_killed "true", Restart Signaled with an /unhealthy/ restart reason,
connect-proxy task ids, heartbeats, and intra-batch out-of-order Times.
All values derive from a seed counter — no RNG, byte-stable output.
"""

from __future__ import annotations

import json

EVENT_TYPES = (
    "Received",
    "Task Setup",
    "Started",
    "Terminated",
    "Killing",
    "Killed",
    "Restart Signaled",
)

BASE_NS = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z in ns


def task_event(etype: str, time_ns: int, details: dict | None = None) -> dict:
    return {
        "Type": etype,
        "Time": time_ns,
        "Message": "",
        "DisplayMessage": f"{etype} event",
        "Details": details or {},
        "FailsTask": False,
        "ExitCode": int((details or {}).get("exit_code", 0) or 0),
        "Signal": 0,
        "KillTimeout": 0,
        "DiskLimit": 0,
        "StartDelay": 0,
    }


def envelope(index: int, allocations: list[dict]) -> dict:
    return {
        "Index": index,
        "Events": [
            {
                "Topic": "Allocation",
                "Type": "AllocationUpdated",
                "Key": f"alloc-{index}-{i}",
                "Namespace": a.get("Namespace", "default"),
                "FilterKeys": None,
                "Index": index,
                "Payload": {"Allocation": a},
            }
            for i, a in enumerate(allocations)
        ],
    }


def allocation(
    namespace: str,
    job_id: str,
    node: str,
    task_states: dict[str, list[dict]],
) -> dict:
    return {
        "ID": f"{job_id}-alloc",
        "Namespace": namespace,
        "NodeName": node,
        "JobID": job_id,
        "ClientStatus": "complete",
        "TaskGroup": job_id,
        "CreateTime": BASE_NS,
        "ModifyTime": BASE_NS,
        "TaskStates": {
            task: {
                "State": "dead",
                "Failed": False,
                "Restarts": 0,
                "StartedAt": "2024-01-01T00:00:00.000000000Z",
                "FinishedAt": "2024-01-01T01:00:00.000000000Z",
                "LastRestart": "",
                "Events": events,
            }
            for task, events in task_states.items()
        },
    }


def sample_stream(n_envelopes: int = 8, start_index: int = 100) -> list[str]:
    """NDJSON lines: heartbeats interleaved with envelopes covering every
    classification branch (app.rb:195-209) and the connect-proxy filter
    (app.rb:141)."""
    lines: list[str] = []
    t = BASE_NS
    for i in range(n_envelopes):
        index = start_index + i * 10
        t += 60_000_000_000  # +60s per envelope
        case = i % 4
        if case == 0:  # success: Terminated exit_code "0" (app.rb:205-208)
            events = [
                task_event("Received", t),
                task_event("Started", t + 1),
                task_event("Terminated", t + 2, {"exit_code": "0", "oom_killed": "false"}),
            ]
        elif case == 1:  # failure: oom (app.rb:201-204)
            events = [
                task_event("Started", t),
                task_event("Terminated", t + 2, {"exit_code": "137", "oom_killed": "true"}),
            ]
        elif case == 2:  # failure: unhealthy restart (app.rb:196-199)
            events = [
                task_event(
                    "Restart Signaled",
                    t + 1,
                    {"restart_reason": "Restart within policy: task is unhealthy"},
                ),
            ]
        else:  # no state: plain lifecycle + out-of-order Time
            events = [
                task_event("Started", t + 5),
                task_event("Received", t + 1),  # intra-batch disorder
            ]
        alloc = allocation(
            namespace="default" if i % 2 == 0 else "batch",
            job_id=f"job{i % 3}",
            node=f"node{i % 2}",
            task_states={
                f"task{i}": events,
                # proxy task must be filtered out (app.rb:141)
                f"connect-proxy-task{i}": [task_event("Started", t)],
            },
        )
        lines.append(json.dumps(envelope(index, [alloc]), separators=(",", ":")))
        if i % 3 == 0:
            lines.append("{}")  # heartbeat (app.rb:110-117)
    return lines
