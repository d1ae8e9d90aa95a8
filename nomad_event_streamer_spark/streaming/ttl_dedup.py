"""Streaming near-dup dedup with a sliding state TTL.

The maintained-index story's stream side: a crawl stream keyed on its
LSH bucket keeps one (last_seen, keeper) tuple per bucket; an arrival
within TTL of the bucket's last arrival is a duplicate of the current
burst keeper, an arrival after the TTL *expires the state* and starts a
new burst with itself as keeper.  The sliding TTL (last_seen advances
on EVERY arrival, duplicates included) is the re-crawl policy "a page
cluster stays deduped for as long as it keeps re-appearing".

State is O(live buckets), not O(documents seen) — exactly what the TTL
is for; expired entries are semantically dead and get overwritten on
the next arrival (in a long-running deployment GroupStateTimeout would
physically evict them; here the manual TTL keeps the replay
deterministic, which is what puts the whole operator under the hash
gate).

Determinism contract: arrivals are processed in doc_id order within
each micro-batch (sorted below) and the batch files are doc_id-range
monotone, so the replayed verdict stream equals a per-bucket
gaps-and-islands scan in doc_id order — the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

STATE_SCHEMA = StructType(
    [StructField("last_ts_us", LongType()), StructField("keeper", LongType())]
)

VERDICT_SCHEMA = StructType(
    [
        StructField("bucket", StringType()),
        StructField("doc_id", LongType()),
        StructField("is_dup", LongType()),
        StructField("keeper_doc", LongType()),
    ]
)


def _ttl_fn(ttl_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.exists:
            last_ts, keeper = state.get
        else:
            last_ts, keeper = None, None
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("doc_id")
        doc_ids, dups, keepers = [], [], []
        for doc_id, ts in zip(batch["doc_id"], batch["ts_us"]):
            doc_id, ts = int(doc_id), int(ts)
            if keeper is not None and ts - last_ts <= ttl_us:
                is_dup = 1  # inside the burst: keeper unchanged
            else:
                is_dup = 0  # first arrival or TTL expired: new keeper
                keeper = doc_id
            last_ts = ts  # sliding TTL: every arrival renews the lease
            doc_ids.append(doc_id)
            dups.append(is_dup)
            keepers.append(keeper)
        state.update((last_ts, keeper))
        if doc_ids:
            yield pd.DataFrame(
                {
                    "bucket": bucket,
                    "doc_id": doc_ids,
                    "is_dup": dups,
                    "keeper_doc": keepers,
                }
            )

    return fn


def ttl_dedup_stream(grouped, ttl_us: int) -> DataFrame:
    """Apply the sliding-TTL dedup to a streaming GroupedData keyed by
    bucket with columns (bucket, doc_id, ts_us)."""
    return grouped.applyInPandasWithState(
        _ttl_fn(ttl_us),
        VERDICT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
