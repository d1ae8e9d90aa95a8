"""Declared time-series feature queries (SURVEY.md 2.12 EXT): bounded-
horizon EWMA and a cogroup-based point-in-time (feature-store) join.

Both keep the float policy: EWMA is computed in fixed-point integers
(powers of two are exact in double), and the point-in-time join selects
rows by exact integer/date comparisons — so both carry full value-hash
oracles.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import events, load
from .registry import query

_EWMA_TAPS = 16
_EWMA_SCALE_BITS = 24


def _ewma_oracle() -> str:
    taps = " + ".join(
        f"COALESCE(lag(cents, {j}) OVER w, 0) * {1 << (_EWMA_SCALE_BITS - 1 - j)}"
        for j in range(_EWMA_TAPS)
    )
    return f"""
    SELECT user_id, event_id,
           CAST(({taps}) AS DOUBLE) / {1 << _EWMA_SCALE_BITS} / 100.0
               AS ewma
    FROM (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """


@query("q_ewma", oracle=_ewma_oracle())
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-horizon EWMA (alpha = 1/2, 16 taps) per user event stream —
    the standard streaming feature smoother, truncated to a fixed lag
    horizon as production feature stores do (tap 16 carries weight 2^-16;
    the tail is noise).  Fixed-point trick: weights are powers of two and
    values are exact cents, so every product is an exact BIGINT and the
    sum is order-independent — the one trailing double division pair
    (/2^24 exact, /100 rounds once) is cross-engine deterministic, which
    puts an EWMA under the value-hash gate.  Scale: one window sort per
    user partition, then a pure lag-projection — no iteration, no state."""
    ev = events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts_us",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    acc = F.lit(0).cast("long")
    for j in range(_EWMA_TAPS):
        acc = acc + F.coalesce(F.lag("cents", j).over(w), F.lit(0)) * F.lit(
            1 << (_EWMA_SCALE_BITS - 1 - j)
        )
    return ev.select(
        "user_id",
        "event_id",
        (
            acc.cast("double") / F.lit(float(1 << _EWMA_SCALE_BITS)) / 100.0
        ).alias("ewma"),
    )


@query(
    "q_cogroup_asof",
    oracle="""
    WITH cand AS (
        SELECT ev.event_id, o.o_orderkey, o.o_orderdate
        FROM events ev
        JOIN orders o
          ON o.o_custkey = ev.user_id AND o.o_orderdate <= CAST(ev.ts AS DATE)
    ),
    latest AS (
        SELECT event_id, max(o_orderdate) AS d FROM cand GROUP BY event_id
    ),
    sel AS (
        SELECT c.event_id, max(c.o_orderkey) AS as_of_orderkey
        FROM cand c JOIN latest l
          ON c.event_id = l.event_id AND c.o_orderdate = l.d
        GROUP BY c.event_id
    )
    SELECT e.event_id, e.user_id, s.as_of_orderkey
    FROM events e LEFT JOIN sel s USING (event_id)
    """,
)
def q_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (feature-store) join via ``cogroup + applyInPandas``:
    each user's event stream and order history meet in ONE pandas batch,
    where a sorted merge (`searchsorted`) finds, per event, the latest
    order at or before the event date — training-serving-skew-free
    feature lookup.  Cogroup is the right Spark surface: both sides
    hash-partition on the key ONCE, and the per-key pandas merge replaces
    the exploding event×order inequality join the SQL oracle runs
    (max_by over the range join).  Deterministic: ties on order date
    resolve to the max orderkey, selection on exact ints/dates."""
    ev = events(spark, sf_dir).select(
        "event_id", "user_id", F.col("ts_t").cast("date").alias("ev_date")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )

    def merge(evs: pd.DataFrame, ords: pd.DataFrame) -> pd.DataFrame:
        out = evs[["event_id", "user_id"]].copy()
        if not len(evs):
            return out.assign(as_of_orderkey=pd.Series(dtype="Int64"))
        if not len(ords):
            out["as_of_orderkey"] = pd.array([None] * len(evs), dtype="Int64")
            return out
        # sort orders by (date, orderkey): for each event date, the
        # rightmost order with date <= event date IS the max-key order of
        # the latest date (the deterministic tie-break).
        o = ords.sort_values(["o_orderdate", "o_orderkey"]).reset_index(
            drop=True
        )
        idx = o["o_orderdate"].searchsorted(evs["ev_date"], side="right") - 1
        keys = o["o_orderkey"].to_numpy()
        vals = [int(keys[i]) if i >= 0 else None for i in idx]
        out["as_of_orderkey"] = pd.array(vals, dtype="Int64")
        return out

    return (
        ev.groupBy("user_id")
        .cogroup(orders.groupBy(F.col("o_custkey").alias("user_id")))
        .applyInPandas(
            merge, "event_id long, user_id long, as_of_orderkey long"
        )
    )
