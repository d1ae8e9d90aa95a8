"""Round-9e referees: greedy set cover against a pure-python greedy,
and the CLUSTER BY layout contract (hash exchange + local sort, no
global-order range exchange)."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from nomad_event_streamer_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


class TestGreedySetCover:
    def test_matches_pure_python_greedy(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        by_src: dict[str, set] = defaultdict(set)
        for src, txt in zip(docs["source"], docs["text"]):
            toks = txt.split(" ")
            for a, b in zip(toks, toks[1:]):
                by_src[src].add(f"{a} {b}")
        covered: set = set()
        picked: list[str] = []
        expected = []
        for r in range(1, 6):
            best = None
            for src in sorted(by_src):
                if src in picked:
                    continue
                gain = len(by_src[src] - covered)
                if gain == 0:
                    continue
                key = (-gain, src)
                if best is None or key < best:
                    best = key
            if best is None:
                break
            gain, src = -best[0], best[1]
            picked.append(src)
            covered |= by_src[src]
            expected.append((r, src, gain, len(covered)))
        got = [
            (r["rnk"], r["source"], r["gain"], r["covered_total"])
            for r in sorted(
                QUERIES["q_greedy_set_cover"](spark, SF).collect(),
                key=lambda r: r["rnk"],
            )
        ]
        assert got == expected

    def test_gains_monotone_nonincreasing(self, spark):
        """Submodularity: greedy marginal gains never increase."""
        rows = sorted(
            QUERIES["q_greedy_set_cover"](spark, SF).collect(),
            key=lambda r: r["rnk"],
        )
        gains = [r["gain"] for r in rows]
        assert gains == sorted(gains, reverse=True)
        # covered_total is the running sum of gains (sets are disjoint
        # increments by construction of "uncovered")
        run = 0
        for r in rows:
            run += r["gain"]
            assert r["covered_total"] == run


class TestClusterBy:
    def test_layout_contract(self, spark):
        """CLUSTER BY must plan exactly a hash repartition on the
        cluster keys plus a partition-LOCAL sort — and must NOT plan
        the global-order range exchange an ORDER BY would."""
        from nomad_event_streamer_spark.tables import load

        load(spark, SF, "lineitem").createOrReplaceTempView(
            "lineitem_cb_v"
        )
        clustered = spark.sql(
            "SELECT l_returnflag, l_linestatus, l_quantity "
            "FROM lineitem_cb_v CLUSTER BY l_returnflag, l_linestatus"
        )
        plan = clustered._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(l_returnflag" in plan
        assert "rangepartitioning" not in plan
        assert "Sort [l_returnflag" in plan
        # the sort is local: global flag false
        assert "false, 0" in plan.split("Sort [", 1)[1].split("\n")[0]

    def test_sort_by_alone_is_exchange_free(self, spark):
        """SORT BY without DISTRIBUTE BY costs only a local sort — no
        exchange at all (the 100 TB point: never a global range
        shuffle)."""
        from nomad_event_streamer_spark.tables import load

        load(spark, SF, "lineitem").createOrReplaceTempView(
            "lineitem_cb_v2"
        )
        sorted_only = spark.sql(
            "SELECT l_returnflag FROM lineitem_cb_v2 SORT BY l_returnflag"
        )
        plan = sorted_only._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Sort [l_returnflag" in plan


class TestFfdBinpack:
    def test_packing_invariants(self, spark):
        """Every group assigned exactly once; first-fit property holds
        (an item in bin b>1 means bins 1..b-1 could not hold it at
        placement time); loads respect cap unless the overflow arm
        fired."""
        from nomad_event_streamer_spark.plans import QUERIES
        from nomad_event_streamer_spark.plans.storage_queries import (
            _FFD_BINS,
            _FFD_GROUPS,
        )

        rows = sorted(
            QUERIES["q_ffd_binpack"](spark, SF).collect(),
            key=lambda r: r["rnk"],
        )
        assert len(rows) == _FFD_GROUPS
        assert {r["grp"] for r in rows} == set(range(_FFD_GROUPS))
        # bytes non-increasing in rank (the "decreasing" in FFD)
        bts = [r["bytes"] for r in rows]
        assert bts == sorted(bts, reverse=True)
        total = sum(bts)
        cap = max(total * 5 // 32, max(bts))
        loads = [0] * (_FFD_BINS + 1)
        for r in rows:
            b = r["bin"]
            assert 1 <= b <= _FFD_BINS
            if loads[b] + r["bytes"] <= cap:
                # first-fit: no earlier bin could have held it
                for e in range(1, b):
                    assert loads[e] + r["bytes"] > cap
            else:
                # overflow arm: b must be the least-loaded bin
                ml = min(loads[1:])
                assert loads[b] == ml
                assert b == loads.index(ml)
            loads[b] += r["bytes"]

    def test_packing_quality(self, spark):
        """FFD's point is FEWEST bins (not balance): on this fixture
        nothing overflows (every load <= cap) and the bin count hits
        the ceil(total/cap) lower bound exactly — i.e. the plan is
        capacity-optimal here, not merely feasible."""
        from collections import defaultdict

        from nomad_event_streamer_spark.plans import QUERIES
        from nomad_event_streamer_spark.plans.storage_queries import (
            _FFD_BINS,
        )

        rows = QUERIES["q_ffd_binpack"](spark, SF).collect()
        loads = defaultdict(int)
        for r in rows:
            loads[r["bin"]] += r["bytes"]
        total = sum(loads.values())
        cap = max(total * 5 // 32, max(r["bytes"] for r in rows))
        assert all(v <= cap for v in loads.values())
        lower = -(-total // cap)  # ceil
        assert lower <= len(loads) <= _FFD_BINS
        assert len(loads) == lower
