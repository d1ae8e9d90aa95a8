"""As-of join — the time-series operator Spark lacks natively.

``asof_join(left, right)`` attaches, to every left row, the most recent
right row of the same key with ``right.ts <= left.ts`` (the
quote-at-trade-time / state-at-event-time lookup).

Spark-native implementation (composition of built-ins, SURVEY.md 2.11
custom-operator rule (a)): tag both inputs, union them, and carry the
last non-null right value forward with a running window —

    union -> Window.partitionBy(key).orderBy(ts, side) -> last(ignorenulls)

This is ONE shuffle on the key (the same partitioning both inputs need
anyway) and no join at all — per key the merge is a linear scan, so skew
degrades linearly, never quadratically (a range-join formulation expands
every left row against its whole right history before picking the max).
DuckDB replays it with its native ASOF JOIN, so the semantics are pinned
to a reference implementation.

Ties: right rows at ts equal to the left row's ts DO match (<=); among
several right rows sharing (key, ts) the one with the greatest id wins —
callers that need a different tiebreak dedupe first.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value: str,
    right_id: str,
) -> DataFrame:
    """Left as-of join: left columns + (asof_<right_id>, asof_<right_value>)
    from the latest right row at-or-before each left row's ``ts``.

    ``right`` rows are first reduced to one per (key, ts) — greatest
    ``right_id`` wins — so the match is deterministic."""
    r1 = (
        right.groupBy(key, ts)
        .agg(F.max_by(right_value, right_id).alias("_rv"), F.max(right_id).alias("_rid"))
        .select(
            F.col(key),
            F.col(ts),
            F.lit(0).alias("_side"),
            F.col("_rv"),
            F.col("_rid"),
        )
    )
    lcols = left.columns
    l1 = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r1.schema["_rv"].dataType).alias("_rv"),
        F.lit(None).cast(r1.schema["_rid"].dataType).alias("_rid"),
    )
    # align the union schema: right rows carry NULL for left-only columns
    for c in lcols:
        if c not in (key, ts):
            r1 = r1.withColumn(c, F.lit(None).cast(l1.schema[c].dataType))
    merged = r1.select(l1.columns).unionByName(l1)
    # right rows (side 0) sort before left rows at equal ts -> "<=" match.
    # (_rid, _rv) ride as ONE struct so a NULL right VALUE stays paired
    # with its row — two last(ignorenulls) calls would skip a null value
    # back to an older right row while keeping the newer id.
    pair = F.when(
        F.col("_side") == 0, F.struct(F.col("_rid"), F.col("_rv"))
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        *lcols,
        "_side",
        F.last(pair, ignorenulls=True).over(w).alias("_asof"),
    )
    return carried.where(F.col("_side") == 1).select(
        *lcols,
        F.col("_asof._rid").alias(f"asof_{right_id}"),
        F.col("_asof._rv").alias(f"asof_{right_value}"),
    )
