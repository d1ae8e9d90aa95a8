"""Balanced output sharding: equal-byte-mass shard assignment and the
parquet writer that materializes it.

The assignment is the q_shard_plan device (plans/curation_queries.py):
documents in hash-shuffled order are laid head-to-tail by byte mass and
cut at the S equal-mass boundaries — reproducible across runs, engines,
and partitionings (round-robin-by-task is none of those), with any
shard's deviation from total/S bounded by the largest single row.

Scale: the prefix sum is the 16-nibble-group distributed device
(per-group partitioned window cumsums + a broadcast 16-row offset
table — never a single-task global window); the write is one
``partitionBy`` pass.  The reference (`app.rb`) has no output sharding;
this is EXT surface for the 100 TB training-data use case (write N
same-sized shards for the trainer's data loader).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "bytes",
    num_shards: int = 8,
) -> DataFrame:
    """Add ``shard`` (0..num_shards-1) and carry ``wtot`` (total bytes).

    shard = floor(start_offset * S / total) over the (md5(id), id)
    order — the deterministic equal-mass cut.  Input columns are
    preserved; callers needing only the plan aggregate over ``shard``.

    Edge cases (ADVICE r08 #2): a zero-byte row sorting last has
    start_offset == wtot, which the raw formula maps to shard S —
    clamped to S-1 so the output range is always 0..S-1.  An all-zero
    corpus (wtot == 0) carries no mass to balance; every row goes to
    shard 0 rather than NULL.
    """
    h = F.md5(F.col(id_col).cast("string"))
    base = df.withColumn("h", h).withColumn(
        "grp", F.conv(F.substring("h", 1, 1), 16, 10).cast("long")
    )
    w_in = (
        Window.partitionBy("grp")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_in = base.withColumn("cum_in", F.sum(bytes_col).over(w_in))
    totals = base.groupBy("grp").agg(F.sum(bytes_col).alias("tot"))
    w_off = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "grp", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("off")
    )
    tw = base.agg(F.sum(bytes_col).cast("long").alias("wtot"))
    return (
        cum_in.join(F.broadcast(offsets), "grp")
        .withColumn("cum", F.col("off") + F.col("cum_in"))
        .crossJoin(F.broadcast(tw))
        .withColumn(
            "shard",
            F.when(F.col("wtot") <= 0, F.lit(0)).otherwise(
                F.least(
                    F.expr(
                        f"((cum - {bytes_col}) * {num_shards}) div wtot"
                    ),
                    F.lit(num_shards - 1),
                )
            ).cast("long"),
        )
        .drop("h", "grp", "cum_in", "off", "cum")
    )


def write_balanced_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    bytes_col: str = "bytes",
    num_shards: int = 8,
) -> None:
    """Materialize ``df`` as ``path/shard=K/`` parquet directories with
    near-equal byte mass per shard (one file per shard: the write
    repartitions by the shard key first, so each partition directory
    receives exactly one task's output)."""
    assigned = assign_shards(
        df, id_col=id_col, bytes_col=bytes_col, num_shards=num_shards
    ).drop("wtot")
    (
        assigned.repartition(num_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
