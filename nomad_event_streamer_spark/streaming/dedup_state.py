"""Exact REF dedup-state semantics via applyInPandasWithState.

The reference keeps ``task_metadata[task_identifier][:latest_timestamp]``
— a per-key high-water mark (app.rb:78,145-146):

- initialized lazily to process start time (app.rb:72,145);
- events with ``Time <= mark`` are dropped (app.rb:162-167);
- the mark is advanced to the max Time over ALL of the key's events in
  the batch — including ones other filters dropped — and only AFTER the
  batch (app.rb:157-160,271-273), so intra-batch out-of-order events all
  pass if they beat the OLD mark.

Spark's built-in ``dropDuplicatesWithinWatermark`` gives the relaxed
form; this GroupState operator reproduces the exact update-after-batch
contract, checkpointed instead of in-memory (an upgrade over the
reference's lose-on-restart state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

STATE_SCHEMA = StructType([StructField("hwm_us", LongType())])

PASSED_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
    ]
)

SUMMARY_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_ts_us", LongType()),
    ]
)


def _dedup_fn(initial_hwm_us: int):
    """REF semantics: drop rows <= old mark; advance mark to batch max of
    ALL rows afterwards (app.rb:157-167,271-273)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        (old_hwm,) = state.get if state.exists else (initial_hwm_us,)
        batch_max = old_hwm
        for pdf in pdfs:
            passed = pdf[pdf["ts_us"] > old_hwm]
            if len(pdf):
                batch_max = max(batch_max, int(pdf["ts_us"].max()))
            if len(passed):
                yield pd.DataFrame(
                    {
                        "user_id": passed["user_id"],
                        "event_id": passed["event_id"],
                        "ts_us": passed["ts_us"],
                    }
                )
        state.update((batch_max,))

    return fn


def dedup_stream(grouped, initial_hwm_us: int = 0) -> DataFrame:
    """Apply the exact-REF dedup to a streaming GroupedData keyed by
    user_id with columns (user_id, event_id, ts_us)."""
    return grouped.applyInPandasWithState(
        _dedup_fn(initial_hwm_us),
        PASSED_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def _summary_fn():
    """Cumulative per-key counters: (n_events, max_ts_us) carried in
    GroupState across micro-batches — the minimal stateful-op shape used
    by the oracle-checked q_stream_dedup_state."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n_events, max_ts = state.get
        else:
            n_events, max_ts = 0, 0
        for pdf in pdfs:
            n_events += len(pdf)
            if len(pdf):
                max_ts = max(max_ts, int(pdf["ts_us"].max()))
        state.update((n_events, max_ts))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n_events], "max_ts_us": [max_ts]}
        )

    return fn


STATE_SUMMARY_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("max_ts_us", LongType())]
)


def summary_stream(grouped) -> DataFrame:
    return grouped.applyInPandasWithState(
        _summary_fn(),
        SUMMARY_SCHEMA,
        STATE_SUMMARY_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
