"""Round-11 operators (VERDICT r10 items #4 + new surface).

q_link_predict_capped: the hub-mitigation path of the wedge family,
previously tested but never oracle-gated, now a declared query whose
self-calibrating p90 caps are replicated inside the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from nomad_event_streamer_spark.plans import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


class TestLinkPredictCapped:
    def test_oracle_parity_sf0001(self, spark):
        from tests.oracle_compare import compare, duckdb_connection

        con = duckdb_connection(SF)
        compare(QUERIES["q_link_predict_capped"](spark, SF), con,
                ORACLES["q_link_predict_capped"])

    def test_caps_actually_prune(self, spark):
        """The point of the query is the guarded path: at the fixture,
        the p90 cell cap must drop at least one hot cell (so the pair
        join runs on a strictly smaller input than the uncapped
        sibling's)."""
        from nomad_event_streamer_spark.tables import events

        cell = (
            events(spark, SF)
            .select(
                "user_id",
                "event_type",
                F.expr("ts_us div 3600000000").alias("h"),
            )
            .distinct()
        )
        cs = cell.groupBy("event_type", "h").agg(
            F.count(F.lit(1)).alias("n")
        )
        sizes = sorted(r["n"] for r in cs.collect())
        cap = sizes[max((len(sizes) * 9) // 10, 1) - 1]
        dropped = sum(1 for s in sizes if s > cap)
        assert dropped > 0, (
            "fixture degenerate: p90 cap prunes nothing — cap device "
            "untested"
        )

    def test_differs_from_uncapped(self, spark):
        """Hub mitigation must change the answer on this fixture (if the
        capped and uncapped top-20 coincide, the hash gate would not be
        evidence the guards executed)."""
        capped = {
            tuple(r) for r in QUERIES["q_link_predict_capped"](spark, SF)
            .select("a", "b", "n_common").collect()
        }
        uncapped = {
            tuple(r) for r in QUERIES["q_link_predict"](spark, SF)
            .select("a", "b", "n_common").collect()
        }
        assert capped != uncapped
