"""Source-format breadth: the same relational results regardless of the
storage format feeding the scan (parquet / CSV / JSON / ORC).

The declared surface reads the driver's parquet; a complete engine also
ingests the row formats the reference's world produces (its wire format
IS newline-delimited JSON).  Round-trip each format and assert the
aggregate is bit-identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _agg(df):
    return sorted(
        map(
            tuple,
            df.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("string")
                .alias("sum_qty"),
            )
            .collect(),
        )
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_roundtrip(spark, sf_dir, tmp_path, fmt):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    expected = _agg(li)
    out = str(tmp_path / f"lineitem_{fmt}")
    writer = li.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.format(fmt).save(out)

    reader = spark.read
    if fmt == "csv":
        # schema pinned: inference is forbidden on the hot path
        reader = reader.option("header", True).schema(li.schema)
    elif fmt == "json":
        reader = reader.schema(li.schema)
    got = reader.format(fmt).load(out)
    assert _agg(got) == expected
