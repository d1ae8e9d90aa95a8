"""Derived-state classification — the reference's case/when tree.

The reference classifies each task event into success / failure / nil
(``app.rb:195-209``):

- ``"Restart Signaled"`` whose ``Details.restart_reason`` matches
  ``/unhealthy/``            -> failure            (app.rb:196-199)
- ``"Terminated"``:
    - ``Details.oom_killed == "true"``  -> failure (app.rb:201-204; note the
      STRING compare — Details is a string->string map)
    - else ``Details.exit_code == "0"`` -> success else failure
      (app.rb:205-208)
- any other type -> nil (three-valued: the event carries no state)

Expressed as a pure Column so it stays inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def classify_task_event(
    event_type: Column, details: Column
) -> Column:
    """Exact REF semantics over a Nomad TaskEvent.

    ``details`` is a MapType(string,string) column (app.rb:188-189): the
    comparisons are string comparisons by design.
    """
    restart_reason = details.getItem("restart_reason")
    oom_killed = details.getItem("oom_killed")
    exit_code = details.getItem("exit_code")
    return (
        F.when(
            (event_type == "Restart Signaled") & restart_reason.rlike("unhealthy"),
            F.lit("failure"),
        )
        .when(
            event_type == "Terminated",
            F.when(oom_killed == "true", F.lit("failure"))
            .when(exit_code == "0", F.lit("success"))
            .otherwise(F.lit("failure")),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def classify_state(event_type: Column, value: Column) -> Column:
    """Batch analog of the classification on the testdata ``events`` table
    (event_type <-> task-event Type, value <-> exit-code-ish signal).

    Keeps the reference's exact three-valued shape: some event types carry
    a state, everything else classifies to NULL (app.rb:195-209).
    """
    return (
        F.when(event_type == "error", F.lit("failure"))
        .when(
            event_type == "purchase",
            F.when(value >= 50.0, F.lit("success")).otherwise(F.lit("failure")),
        )
        .otherwise(F.lit(None).cast("string"))
    )
