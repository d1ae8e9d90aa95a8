"""Bucketed co-located join: the SCALE.md claim made executable.

At 100 TB the repeated lineitem<->orders join key justifies bucketing both
tables on disk; a join between tables bucketed on the join key by the same
bucket count needs NO shuffle exchange on either side.  This test writes
both tables bucketed into a temp warehouse, joins them, and asserts the
physical plan contains zero Exchange operators (vs two for the plain
parquet join) while producing identical results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    for name in ["lineitem", "orders"]:
        spark.sql(f"DROP TABLE IF EXISTS {name}_bkt")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_bkt")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bkt")
    )
    yield
    for name in ["lineitem", "orders"]:
        spark.sql(f"DROP TABLE IF EXISTS {name}_bkt")


def _join(li, orders):
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("sum_price"),
        )
    )


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    # fact-x-fact posture: at scale neither side broadcasts, which is the
    # case bucketing exists for; pin it so the tiny test tables behave
    # like the 100 TB ones.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = _join(spark.table("lineitem_bkt"), spark.table("orders_bkt"))
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # no exchange on either join input: both sides read pre-bucketed
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan

        plain = _join(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        # the unbucketed variant DOES shuffle both sides
        assert "Exchange hashpartitioning(l_orderkey" in plain_plan
        assert "Exchange hashpartitioning(o_orderkey" in plain_plan
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
