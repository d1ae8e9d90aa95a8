"""DECIMAL(38,0) accumulator headroom (VERDICT r10 item #2).

Spark's non-ANSI ``sum(long)`` / ``long * long`` silently wraps past
2^63 while DuckDB promotes aggregates to HUGEINT (and raises on BIGINT
multiply overflow) — divergent failure modes on the same input.  Every
n²/n³-scale cross-multiplied accumulator in the registry therefore rides
DECIMAL(38,0) (the q_drift_tri / q_cramers_v convention).  This file
pins both halves of that rule:

1. device tests — each fixed op's accumulator SHAPE, fed operands that
   overflow int64, must produce the exact Python-int result via the
   decimal path (the long path would wrap);
2. plan pins — each swept query's analyzed plan must actually contain
   the decimal cast, so a refactor can't silently regress to long.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from nomad_event_streamer_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
DEC = "decimal(38,0)"

# Each swept slug must keep a decimal(38,0) cast in its analyzed plan.
DECIMAL_SWEPT = [
    "q_mann_whitney_ks",
    "q_wasserstein1",
    "q_gini",
    "q_burstiness",
    "q_anova_f",
    "q_zipf_slope",
    "q_t_closeness",
    # ADVICE r11 #1/#2: guard cross-products and the cc ppm numerator
    # are 36N²- / 10⁶·d²-scale — swept in round 12.
    "q_cochran_armitage",
    "q_clustering_coeff",
]


def _exact_sum(spark, rows, expr) -> int:
    df = spark.createDataFrame(rows)
    [row] = df.agg(expr.alias("s")).collect()
    return int(row["s"])


class TestOverflowDevices:
    """Accumulator shapes fed int64-overflowing operands: the decimal
    path must equal exact Python-int arithmetic."""

    def test_rank_product_r2_0(self, spark):
        # q_mann_whitney_ks r2_0 = sum(c0 * doubled-midrank): operands
        # at 2^33-scale so each term ~2^66 > int64.
        rows = [(2**33, 2**33 + i) for i in range(3)]
        expect = sum(a * b for a, b in rows)
        got = _exact_sum(
            spark,
            [{"a": a, "b": b} for a, b in rows],
            F.sum(F.col("a").cast(DEC) * F.col("b").cast(DEC)),
        )
        assert got == expect > 2**63

    def test_tie_cube(self, spark):
        # q_mann_whitney_ks tie_sum = sum(cnt^3 - cnt): cnt ~2^22 makes
        # the cube 2^66 > int64.
        cnts = [2**22, 2**22 + 7, 2**22 + 99]
        expect = sum(c**3 - c for c in cnts)
        got = _exact_sum(
            spark,
            [{"c": c} for c in cnts],
            F.sum(
                F.col("c").cast(DEC) * F.col("c").cast(DEC)
                * F.col("c").cast(DEC)
                - F.col("c").cast(DEC)
            ),
        )
        assert got == expect > 2**63

    def test_cross_mult_max_d_num(self, spark):
        # q_mann_whitney_ks d_num = max|cum0*n1 - cum1*n0| with counts
        # at 2^33-scale: the products are 2^66 > int64.
        rows = [
            {"cum0": 2**33, "cum1": 1, "n0": 3, "n1": 2**33},
            {"cum0": 2**32, "cum1": 2**5, "n0": 3, "n1": 2**33},
        ]
        expect = max(
            abs(r["cum0"] * r["n1"] - r["cum1"] * r["n0"]) for r in rows
        )
        df = spark.createDataFrame(rows)
        [row] = df.agg(
            F.max(
                F.abs(
                    F.col("cum0").cast(DEC) * F.col("n1").cast(DEC)
                    - F.col("cum1").cast(DEC) * F.col("n0").cast(DEC)
                )
            ).alias("s")
        ).collect()
        assert int(row["s"]) == expect > 2**63

    def test_gap_weighted_w1_num(self, spark):
        # q_wasserstein1 w1_num = sum(|cum0*n1 - cum1*n0| * gap).
        rows = [
            {"cum0": 2**31, "cum1": 5, "n0": 7, "n1": 2**31, "gap": 2**8},
            {"cum0": 2**30, "cum1": 9, "n0": 7, "n1": 2**31, "gap": 3},
        ]
        expect = sum(
            abs(r["cum0"] * r["n1"] - r["cum1"] * r["n0"]) * r["gap"]
            for r in rows
        )
        got = _exact_sum(
            spark,
            rows,
            F.sum(
                F.abs(
                    F.col("cum0").cast(DEC) * F.col("n1").cast(DEC)
                    - F.col("cum1").cast(DEC) * F.col("n0").cast(DEC)
                )
                * F.col("gap").cast(DEC)
            ),
        )
        assert got == expect > 2**63

    def test_second_moment_and_fano(self, spark):
        # q_burstiness / q_anova_f: sum(x^2) with x at 2^33-scale.
        xs = [2**33, 2**33 + 123, 2**32]
        expect = sum(x * x for x in xs)
        got = _exact_sum(
            spark,
            [{"x": x} for x in xs],
            F.sum(F.col("x").cast(DEC) * F.col("x").cast(DEC)),
        )
        assert got == expect > 2**63

    def test_trend_guard_cross_product(self, spark):
        # q_cochran_armitage guard: n*st2n - stn^2 with operands at
        # 2^33-scale so both products are ~2^66 > int64 (ADVICE r11 #1).
        rows = [{"n": 2**33, "st2n": 2**33 + 77, "stn": 2**33 - 5}]
        expect = rows[0]["n"] * rows[0]["st2n"] - rows[0]["stn"] ** 2
        df = spark.createDataFrame(rows)
        [row] = df.select(
            (
                F.col("n").cast(DEC) * F.col("st2n").cast(DEC)
                - F.col("stn").cast(DEC) * F.col("stn").cast(DEC)
            ).alias("s")
        ).collect()
        assert int(row["s"]) == expect

    def test_cc_ppm_decimal_div(self, spark):
        # q_clustering_coeff cc_ppm: 2000000*t div (d*(d-1)) with hub
        # degree d = 2^33 (t = d^2/2, the complete-neighborhood max) —
        # the numerator is ~10^6 * 2^65, far past int64 (ADVICE r11 #2).
        d = 2**33
        t = 2**50  # <= d^2/2; numerator 2e6 * 2^50 ~ 2^71 > int64
        expect = 2000000 * t // (d * (d - 1))
        df = spark.createDataFrame([{"t": t, "d": d}])
        [row] = df.select(
            F.expr(
                "CAST((CAST(2000000 AS DECIMAL(38,0)) * coalesce(t, 0))"
                " div (CAST(d AS DECIMAL(38,0)) * (d - 1)) AS BIGINT)"
            ).alias("s")
        ).collect()
        assert int(row["s"]) == expect > 0

    def test_long_path_fails_where_decimal_succeeds(self, spark):
        # The hazard this file guards: the SAME shape in plain long
        # arithmetic cannot produce the exact value — under ANSI mode
        # (this repo's Spark 4.x default) it RAISES ARITHMETIC_OVERFLOW,
        # under non-ANSI it silently wraps; DuckDB meanwhile promotes to
        # HUGEINT and answers.  Either way the engines diverge, proving
        # the decimal casts are load-bearing, not decorative.
        rows = [{"a": 2**33, "b": 2**33}]
        expect = 2**66
        try:
            [row] = (
                spark.createDataFrame(rows)
                .agg(F.sum(F.col("a") * F.col("b")).alias("s"))
                .collect()
            )
            assert row["s"] != expect  # non-ANSI: wrapped, not exact
        except Exception as exc:  # ANSI: loud overflow
            assert "ARITHMETIC_OVERFLOW" in str(exc) or "overflow" in str(exc)


class TestPlanPins:
    def test_swept_queries_keep_decimal_accumulators(self, spark):
        for slug in DECIMAL_SWEPT:
            df = QUERIES[slug](spark, SF)
            plan = df._jdf.queryExecution().analyzed().toString()
            assert "decimal(38,0)" in plan, (
                f"{slug}: decimal(38,0) accumulator regressed out of the "
                "plan — n²-scale sums would silently wrap at scale"
            )
