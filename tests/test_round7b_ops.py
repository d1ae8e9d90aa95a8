"""Round-7 SQL-surface operator tests (post-rotation batch): recursive
CTE, LATERAL top-k, null-safe join, SQL UDFs, pipe syntax, collation
filter, and the PR-curve eval row — each pinned against an independent
in-engine rewrite or an existing operator computing the same quantity
(q_bfs_reach / q_topk-style window / plain-SQL forms), so a regression
in any front-end surface shows up as a cross-surface disagreement
before the DuckDB oracle ever runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.plans import QUERIES
from nomad_event_streamer_spark.tables import load


class TestRecursiveCte:
    def test_matches_bfs_reach(self, spark, sf_dir):
        # Same seeds, same 3-round bound, same trade graph: the
        # WITH RECURSIVE min-hop must equal the iterative frontier
        # join's answer node-for-node.
        rec = {
            r["node"]: r["hops"]
            for r in QUERIES["q_recursive_cte"](spark, sf_dir).collect()
        }
        bfs = {
            r["node"]: r["hops"]
            for r in QUERIES["q_bfs_reach"](spark, sf_dir).collect()
        }
        assert rec == bfs

    def test_seeds_at_hop_zero_and_paths_positive(self, spark, sf_dir):
        rows = QUERIES["q_recursive_cte"](spark, sf_dir).collect()
        by_node = {r["node"]: r for r in rows}
        assert by_node["NATION_3"]["hops"] == 0
        assert by_node["NATION_17"]["hops"] == 0
        assert all(r["n_paths"] > 0 for r in rows)
        assert all(0 <= r["hops"] <= 3 for r in rows)


class TestLateralTopk:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_lateral_topk"](spark, sf_dir).collect()

    def test_at_most_two_orders_per_customer(self, rows):
        from collections import Counter

        counts = Counter(r["c_custkey"] for r in rows)
        assert counts and max(counts.values()) <= 2

    def test_lateral_equals_window_rewrite(self, rows, spark, sf_dir):
        # The ANSI LATERAL surface and the window-function device must
        # be the same operator: rewrite with row_number and compare.
        from pyspark.sql import Window

        cust = load(spark, sf_dir, "customer").where(
            F.col("c_mktsegment") == "BUILDING"
        )
        orders = load(spark, sf_dir, "orders")
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey")
        )
        expect = (
            orders.join(
                cust.select(F.col("c_custkey")),
                orders["o_custkey"] == F.col("c_custkey"),
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 2)
            .select(
                "c_custkey",
                "o_orderkey",
                F.floor(F.col("o_totalprice") * 100.0 + 0.5)
                .cast("long")
                .alias("price_cents"),
            )
        )
        assert sorted(map(tuple, rows)) == sorted(
            map(tuple, expect.collect())
        )


class TestNullSafeJoin:
    def test_five_buckets_and_totals_conserved(self, spark, sf_dir):
        rows = QUERIES["q_null_safe_join"](spark, sf_dir).collect()
        assert len(rows) == 5
        buckets = {r["bucket"] for r in rows}
        assert None in buckets  # the nullif-folded bucket joined NULL-to-NULL
        n_cust = load(spark, sf_dir, "customer").count()
        n_supp = load(spark, sf_dir, "supplier").count()
        assert sum(r["c_cnt"] for r in rows) == n_cust
        assert sum(r["s_cnt"] for r in rows) == n_supp


class TestSqlUdf:
    def test_udf_equals_inlined_expression(self, spark, sf_dir):
        got = sorted(
            map(tuple, QUERIES["q_sql_udf"](spark, sf_dir).collect())
        )
        li = load(spark, sf_dir, "lineitem")
        band = (
            F.when(F.col("l_quantity") < 10, "small")
            .when(F.col("l_quantity") < 30, "mid")
            .otherwise("large")
        )
        cents = F.floor(
            F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
            + 0.5
        ).cast("long")
        expect = sorted(
            map(
                tuple,
                li.groupBy("l_returnflag", band.alias("band"))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(cents).alias("sum_disc_cents"),
                )
                .collect(),
            )
        )
        assert got == expect


class TestPipeSyntax:
    def test_pipe_equals_plain_sql(self, spark, sf_dir):
        got = sorted(
            map(tuple, QUERIES["q_pipe_syntax"](spark, sf_dir).collect())
        )
        load(spark, sf_dir, "orders").createOrReplaceTempView(
            "orders_pipe_t"
        )
        expect = sorted(
            map(
                tuple,
                spark.sql(
                    """
                    SELECT o_orderpriority, count(*) AS n_orders,
                           sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                                    AS BIGINT)) AS sum_cents
                    FROM orders_pipe_t
                    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                    GROUP BY o_orderpriority
                    """
                ).collect(),
            )
        )
        assert got == expect


class TestCollationFilter:
    def test_collation_equals_lower_rewrite(self, spark, sf_dir):
        got = sorted(
            map(
                tuple,
                QUERIES["q_collation_filter"](spark, sf_dir).collect(),
            )
        )
        cust = load(spark, sf_dir, "customer")
        seg = F.when(
            F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment")
        ).otherwise(F.col("c_mktsegment"))
        expect = sorted(
            map(
                tuple,
                cust.select("c_nationkey", seg.alias("seg"))
                .where(F.lower("seg") == "building")
                .groupBy("c_nationkey")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect(),
            )
        )
        assert got == expect

    def test_mangling_actually_mixes_case(self, spark, sf_dir):
        # If the case-mangle ever collapsed (all-lower or all-original),
        # the collation comparison would be vacuous.
        cust = load(spark, sf_dir, "customer").where(
            F.col("c_mktsegment") == "BUILDING"
        )
        n_even = cust.where(F.col("c_custkey") % 2 == 0).count()
        n_odd = cust.where(F.col("c_custkey") % 2 == 1).count()
        assert n_even > 0 and n_odd > 0


class TestPrCurve:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return sorted(
            QUERIES["q_pr_curve"](spark, sf_dir).collect(),
            key=lambda r: r["pct"],
        )

    def test_four_quintile_rows(self, rows):
        assert [r["pct"] for r in rows] == [20, 40, 60, 80]
        # thresholds are ascending order statistics
        ths = [r["threshold"] for r in rows]
        assert ths == sorted(ths)

    def test_positives_partition_constant(self, rows, spark, sf_dir):
        # tp + fn is the total positive count at EVERY threshold.
        vecs = load(spark, sf_dir, "embeddings")
        n_pos = vecs.where(
            (F.col("label") == 0) & (F.col("vec_id") > 0)
        ).count()
        assert all(r["tp"] + r["fn"] == n_pos for r in rows)

    def test_recall_monotone_in_threshold(self, rows):
        recalls = [r["recall_ppm"] for r in rows]
        assert recalls == sorted(recalls, reverse=True)

    def test_ppm_are_exact_integer_divisions(self, rows):
        for r in rows:
            assert r["precision_ppm"] == r["tp"] * 1_000_000 // (
                r["tp"] + r["fp"]
            )
            assert r["recall_ppm"] == r["tp"] * 1_000_000 // (
                r["tp"] + r["fn"]
            )
