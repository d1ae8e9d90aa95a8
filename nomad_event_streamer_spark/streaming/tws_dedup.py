"""Spark 4 ``transformWithStateInPandas`` port of the exact REF dedup
(successor to ``applyInPandasWithState``; see dedup_state.py for the
semantics mapping to app.rb:78,145-167,271-273).

The new state API's Python worker talks to the JVM state server over
protobuf, which this container doesn't ship — so everything here is
import-time safe and activates the moment ``google.protobuf`` appears
in the environment (tests/test_tws_dedup.py is skip-marked on the same
probe; zero code change needed to light it up).
"""

from __future__ import annotations

import importlib.util

import pandas as pd
from pyspark.sql import DataFrame

from .dedup_state import PASSED_SCHEMA


def tws_available() -> bool:
    """True when the transformWithStateInPandas runtime dependency
    (protobuf) is importable."""
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # 'google' namespace absent entirely
        return False


def make_hwm_dedup_processor(initial_hwm_us: int = 0):
    """Build the StatefulProcessor lazily (the base class imports fine
    without protobuf; only query execution needs it)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class HwmDedupProcessor(StatefulProcessor):
        """Per-key high-water-mark dedup, REF-exact: drop rows with
        ``ts_us <= old mark``; after the batch, advance the mark to the
        max over ALL of the key's rows (dropped ones included)."""

        def init(self, handle) -> None:
            self._hwm = handle.getValueState("hwm", "hwm_us BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            old = (
                self._hwm.get()[0]
                if self._hwm.exists()
                else initial_hwm_us
            )
            batch_max = old
            for pdf in rows:
                passed = pdf[pdf["ts_us"] > old]
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
            self._hwm.update((batch_max,))

        def close(self) -> None:
            pass

    return HwmDedupProcessor()


def dedup_stream_tws(grouped, initial_hwm_us: int = 0) -> DataFrame:
    """transformWithStateInPandas twin of dedup_state.dedup_stream —
    same key/columns contract (user_id, event_id, ts_us)."""
    return grouped.transformWithStateInPandas(
        statefulProcessor=make_hwm_dedup_processor(initial_hwm_us),
        outputStructType=PASSED_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
