"""Focused pins for the round-12 ranking-device internals.

The optimization round replaced ``suffix.dense_rank_classes`` (distinct
+ bucketed rank + token-scale join-back) with
``ranking.global_dense_rank`` (one bucketed window + a distinct-count
offset table) bucketed by ``ranking.bitlen_subbucket``.  The driver
hash gate proves the consuming queries end-to-end; these tests pin the
device's two load-bearing contracts in isolation so a future edit
cannot drift on inputs the corpus does not cover:

- ``bitlen_subbucket`` must be MONOTONE (a bigger key never gets a
  smaller bucket) and a pure function of the key (equal keys share a
  bucket) — the ``global_row_number``/``global_dense_rank`` bucket
  contract; and it must actually split the top bitlength class (the
  skew reason it exists, guide §2.5).
- ``global_dense_rank`` must equal a plain partitionless
  ``dense_rank()`` on every input, including tie-heavy ones.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from nomad_event_streamer_spark.operators import ranking


class TestBitlenSubbucket:
    def test_monotone_and_pure(self, spark):
        vals = (
            list(range(1, 3001))
            + [(1 << 20) + d for d in range(-3, 4)]
            + [(1 << 40) + d for d in range(-3, 4)]
            + [(1 << 62) + d for d in range(-3, 4)]
        )
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        rows = (
            df.select("v", ranking.bitlen_subbucket(F.col("v")).alias("b"))
            .orderBy("v")
            .collect()
        )
        prev = None
        for r in rows:
            assert prev is None or r.b >= prev, (r.v, r.b, prev)
            prev = r.b

    def test_splits_top_class(self, spark):
        # dense ranks uniform over [1, 100000]: plain bitlength puts
        # ~half the keys in one bucket; the subbucket must cap the
        # largest bucket near 1/2^sub_bits of the key space
        df = spark.range(1, 100001).select(F.col("id").alias("v"))
        top = (
            df.select(ranking.bitlen_subbucket(F.col("v")).alias("b"))
            .groupBy("b")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert top <= 100000 // 16, top  # sub_bits=5 => <= ~1/32 + slack


class TestGlobalDenseRank:
    def test_matches_partitionless_dense_rank(self, spark):
        rnd = random.Random(12)
        # tie-heavy pairs: few distinct r1 classes, repeated r2
        pairs = [
            (rnd.randint(1, 300), rnd.randint(1, 40)) for _ in range(4000)
        ]
        df = spark.createDataFrame(pairs, "r1 long, r2 long")
        got = ranking.global_dense_rank(
            df, ["r1", "r2"], ranking.bitlen_subbucket(F.col("r1")), "rk"
        )
        w = Window.orderBy(F.col("r1").asc(), F.col("r2").asc())
        exp = df.withColumn("rk", F.dense_rank().over(w))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, exp.collect())
        )

    def test_ranks_are_dense_from_one(self, spark):
        df = spark.createDataFrame(
            [(v,) for v in (5, 5, 9, 1000, 1 << 40, 9)], "r1 long"
        )
        got = ranking.global_dense_rank(
            df, ["r1"], ranking.bitlen_subbucket(F.col("r1")), "rk"
        )
        ranks = sorted({r.rk for r in got.collect()})
        assert ranks == [1, 2, 3, 4]
