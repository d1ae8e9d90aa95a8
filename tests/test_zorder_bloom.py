"""Z-order clustering and bloom-style join pruning: beyond the oracled
result-invariance, assert the OPTIMIZATION actually happens — per-file
stat ranges narrow under z-ordering, and the prefilter shrinks the
probe side without losing matches."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq_meta
import pyspark.sql.functions as F

from nomad_event_streamer_spark.operators import sketch, zorder
from nomad_event_streamer_spark.tables import load


def test_interleave_bits_examples(spark):
    df = spark.createDataFrame([(1, 0), (0, 1), (3, 3), (2, 1)], "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder.interleave_bits(F.col("a"), F.col("b"), 4).alias("z")
        ).collect()
    }
    # bit i of a -> position 2i+1, bit i of b -> position 2i
    assert got[(1, 0)] == 2
    assert got[(0, 1)] == 1
    assert got[(3, 3)] == 15
    assert got[(2, 1)] == 0b1001


def test_zorder_narrows_per_file_stats(spark, sf_dir, tmp_path):
    df = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    out = str(tmp_path / "zorded")
    zorder.write_zordered(df, out, "l_partkey", "l_suppkey", num_files=8)
    lo_pk, hi_pk, lo_sk, hi_sk = df.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    files = glob.glob(os.path.join(out, "part-*.parquet"))
    assert len(files) >= 4
    spreads_pk, spreads_sk = [], []
    for f in files:
        md = pq_meta.ParquetFile(f).metadata
        mins = {"l_partkey": [], "l_suppkey": []}
        maxs = {"l_partkey": [], "l_suppkey": []}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mins[name].append(col.statistics.min)
                    maxs[name].append(col.statistics.max)
        spreads_pk.append(max(maxs["l_partkey"]) - min(mins["l_partkey"]))
        spreads_sk.append(max(maxs["l_suppkey"]) - min(mins["l_suppkey"]))
    # each file must cover a strict sub-range of BOTH dimensions on
    # average — the two-dimensional narrowing single-key sorting can't do
    avg_pk = sum(spreads_pk) / len(spreads_pk)
    avg_sk = sum(spreads_sk) / len(spreads_sk)
    assert avg_pk < (hi_pk - lo_pk) * 0.7, (avg_pk, hi_pk - lo_pk)
    assert avg_sk < (hi_sk - lo_sk) * 0.7, (avg_sk, hi_sk - lo_sk)


def test_prefilter_prunes_without_losing_matches(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    build = load(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000)
    )
    pruned = sketch.hash_bucket_prefilter(
        li, build, "l_orderkey", "o_orderkey", m=4096, seeds=(41, 97)
    )
    n_all, n_pruned = li.count(), pruned.count()
    true_match = li.join(
        build, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    ).count()
    assert true_match <= n_pruned < n_all  # no false negatives, real pruning
    assert n_pruned < n_all * 0.5, (n_pruned, n_all)
    # exactness end-to-end: pruned join == plain join
    plain = (
        li.join(build, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count(F.lit(1)), F.sum("l_extendedprice"))
        .collect()
    )
    via = (
        pruned.join(build, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count(F.lit(1)), F.sum("l_extendedprice"))
        .collect()
    )
    assert plain == via
