"""Z-order (Morton) clustering for multi-dimensional data skipping.

``repartitionByRange`` + ``sortWithinPartitions`` on ONE key (see
``q_range_sorted_sink``) gives perfect file/row-group skipping on that
key and none on any other.  Interleaving the bits of TWO keys into a
Morton code and range-clustering on the code trades a little
single-key locality for bounded ranges of BOTH keys per file — parquet
footer min/max stats then skip files for predicates on either or both
dimensions (the Delta/Databricks ``OPTIMIZE ZORDER BY`` layout; at
100 TB a two-dimensional range scan reads a Hilbert-ish neighborhood of
files instead of everything).

Everything here is pure JVM Column expressions (shift/and/or inside
whole-stage codegen) — the z-value is computed scan-side with zero
Python involvement, and it only steers file placement: query results
are layout-invariant, which is what the oracle checks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints already scaled to ``bits``
    bits: bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i."""
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(one), 2 * i + 1)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(one), 2 * i)
        )
    return z


def zvalue(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> Column:
    """Z-value over two numeric columns, min/max-scaled into ``bits``
    bits each so arbitrary key domains (including ones wider than 2^bits
    — at SF100 part keys pass 2^16) map onto the Morton grid.  The
    min/max scan is a cheap driver-side scalar aggregate; production
    systems cache these bounds in table metadata."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    span = (1 << bits) - 1

    def scale(c: str, lo, hi) -> Column:
        if hi == lo:
            return F.lit(0).cast("long")
        return F.expr(
            f"CAST(({c} - {lo}) AS BIGINT) * {span} div {hi - lo}"
        )

    return interleave_bits(
        scale(col_a, lo_a, hi_a), scale(col_b, lo_b, hi_b), bits
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Cluster ``df`` by the z-value of (col_a, col_b) into
    ``num_files`` range partitions, sorted within each, and write
    parquet — so every file covers a compact Morton-curve segment and
    its footer min/max on BOTH columns is narrow."""
    z = zvalue(df, col_a, col_b, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
