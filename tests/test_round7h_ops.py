"""Round-7h operator tests: streaming OHLC parity twin, int8
quantization audit, Kendall tau-b — invariants plus exact replays."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.plans import QUERIES
from nomad_event_streamer_spark.tables import load


class TestStreamOhlc:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_stream_ohlc"](spark, sf_dir).collect()

    def test_matches_batch_twin_exactly(self, rows, spark, sf_dir):
        batch = {
            (r["event_type"], r["bucket"] * 3_600_000_000): (
                r["n"], r["open_cents"], r["high_cents"],
                r["low_cents"], r["close_cents"],
            )
            for r in QUERIES["q_tumbling_ohlc"](spark, sf_dir).collect()
        }
        stream = {
            (r["event_type"], r["window_start_us"]): (
                r["n"], r["open_cents"], r["high_cents"],
                r["low_cents"], r["close_cents"],
            )
            for r in rows
        }
        assert stream == batch

    def test_candle_invariants(self, rows):
        for r in rows:
            assert r["low_cents"] <= r["open_cents"] <= r["high_cents"]
            assert r["low_cents"] <= r["close_cents"] <= r["high_cents"]


class TestEmbedQuantizeInt8:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_embed_quantize_int8"](spark, sf_dir).collect()

    def test_one_row_per_dim_no_clipping(self, rows):
        assert len(rows) == 64
        for r in rows:
            assert 0 <= r["max_code"] <= 127
            assert 0 <= r["max_err_127"] <= r["sum_err_127"] or (
                r["max_err_127"] == 0 and r["sum_err_127"] == 0
            )
            # half-up rounding error is bounded by s/2 in the 127-grid
            assert r["max_err_127"] * 2 <= r["scale_milli"] + 1

    def test_matches_python_replay(self, rows, spark, sf_dir):
        vecs = [
            r["embedding"]
            for r in load(spark, sf_dir, "embeddings").collect()
        ]
        dims = len(vecs[0])
        by_dim = {r["dim"]: r for r in rows}
        for d in range(dims):
            q = [math.floor(float(v[d]) * 1000.0 + 0.5) for v in vecs]
            s = max(abs(x) for x in q)
            errs = []
            for x in q:
                v8 = (
                    0
                    if s == 0
                    else (1 if x >= 0 else -1)
                    * ((2 * abs(x) * 127 + s) // (2 * s))
                )
                errs.append(abs(127 * x - v8 * s))
            r = by_dim[d + 1]
            assert r["scale_milli"] == s
            assert r["sum_err_127"] == sum(errs)
            assert r["max_err_127"] == max(errs)


class TestKendallTau:
    @pytest.fixture(scope="class")
    def row(self, spark, sf_dir):
        rows = QUERIES["q_kendall_tau"](spark, sf_dir).collect()
        assert len(rows) == 1
        return rows[0]

    def test_pair_partition(self, row, spark, sf_dir):
        n = (
            load(spark, sf_dir, "documents")
            .select("source")
            .distinct()
            .count()
        )
        assert row["n_pairs"] == n * (n - 1) // 2
        # every pair is concordant, discordant, or tied in >= one metric
        assert (
            row["concordant"] + row["discordant"] <= row["n_pairs"]
        )
        assert row["tau2_sign_ppm"] <= 1_000_000

    def test_consistent_with_spearman_sign(self, row, spark, sf_dir):
        sp = QUERIES["q_spearman_sources"](spark, sf_dir).collect()[0]
        # Kendall and Spearman must agree on the DIRECTION of monotone
        # association whenever both are decisively signed
        if abs(sp["rho_milli"]) > 100 and abs(row["tau2_sign_ppm"]) > 10_000:
            assert (sp["rho_milli"] > 0) == (row["tau2_sign_ppm"] > 0)


class TestSaxSymbols:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_sax_symbols"](spark, sf_dir).collect()

    def test_word_shape(self, rows):
        for r in rows:
            assert len(r["sax_word"]) == r["n_segments"] <= 8
            assert set(r["sax_word"]) <= set("abcd")
            assert r["min_paa_cents"] <= r["max_paa_cents"]

    def test_quartile_symbolization_is_balanced(self, rows):
        # discrete quartiles of 8 PAA values put >= 2 segments at or
        # below b1 ('a') and >= 1 above b3 ('d') whenever values are
        # distinct; weaker invariant: 'a' occurs and word is not
        # constant when the PAA spread is nonzero
        for r in rows:
            if r["min_paa_cents"] < r["max_paa_cents"]:
                assert "a" in r["sax_word"]
                assert len(set(r["sax_word"])) >= 2

    def test_matches_python_replay(self, rows, spark, sf_dir):
        from nomad_event_streamer_spark.tables import events as ev_t

        ev = (
            ev_t(spark, sf_dir)
            .select(
                "event_type",
                F.expr("ts_us div 3600000000").alias("bucket"),
                F.floor(F.col("value") * 100.0 + 0.5)
                .cast("long")
                .alias("cents"),
                F.format_string("%020d-%010d", "ts_us", "event_id").alias(
                    "ord"
                ),
            )
            .collect()
        )
        by_type: dict[str, dict[int, tuple[str, int]]] = {}
        for r in ev:
            cur = by_type.setdefault(r["event_type"], {})
            if r["bucket"] not in cur or r["ord"] > cur[r["bucket"]][0]:
                cur[r["bucket"]] = (r["ord"], r["cents"])
        got = {r["event_type"]: r["sax_word"] for r in rows}
        for et, buckets in by_type.items():
            series = [c for _, (_, c) in sorted(buckets.items())]
            n = len(series)
            segs: dict[int, list[int]] = {}
            for i, c in enumerate(series, 1):
                segs.setdefault((i - 1) * 8 // n, []).append(c)
            paa = [sum(v) // len(v) for _, v in sorted(segs.items())]
            sp = sorted(paa)

            def disc(q: float) -> int:
                import math

                return sp[max(0, math.ceil(q * len(sp)) - 1)]

            b1, b2, b3 = disc(0.25), disc(0.50), disc(0.75)
            word = "".join(
                "a" if p <= b1 else "b" if p <= b2 else "c" if p <= b3 else "d"
                for p in paa
            )
            assert got[et] == word, et
