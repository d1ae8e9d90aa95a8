"""Round-10 regression tests for the ADVICE r09 guard fixes: the
grid_components label-domain raise, the ANOVA k==1 NULL guard (engine
parity on the degenerate input), and the Hilbert zero-span constant-0
fallback (rows must not vanish through the LUT join)."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from nomad_event_streamer_spark.plans import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


def _degenerate_sf(tmp_path, table: str, frame: pd.DataFrame) -> str:
    """A tmp sf-dir that mirrors sf0.001 but swaps ONE table for a
    degenerate fixture (symlinks for the rest, so DuckDB's view
    registration over all 10 tables still binds)."""
    d = tmp_path / "sf_degenerate"
    d.mkdir()
    for name in os.listdir(SF):
        os.symlink(os.path.join(SF, name), d / name)
    os.unlink(d / f"{table}.parquet")
    frame.to_parquet(d / f"{table}.parquet", index=False)
    return str(d)


class TestGridComponentsLabelDomain:
    def test_out_of_range_cell_raises(self, spark):
        """(cx+32768)*65536+(cy+32768) only linearizes bijectively on
        [-32768, 32767]; an out-of-range cell would alias into another
        cell's label.  ADVICE r09: that must raise, not mis-label."""
        from pyspark.errors.exceptions.captured import (
            SparkRuntimeException,
        )

        from nomad_event_streamer_spark.operators.graph import (
            grid_components,
        )

        core = spark.createDataFrame(
            [(0, 0), (40000, 1)], "cx long, cy long"
        )
        with pytest.raises(SparkRuntimeException, match="label domain"):
            grid_components(core)

    def test_boundary_cells_still_fine(self, spark):
        from nomad_event_streamer_spark.operators.graph import (
            grid_components,
        )

        core = spark.createDataFrame(
            [(-32768, -32768), (32767, 32767)], "cx long, cy long"
        )
        lab, rounds = grid_components(core)
        rows = {(r["cx"], r["cy"]): r["lab"] for r in lab.collect()}
        assert rows[(-32768, -32768)] == 0
        assert rows[(32767, 32767)] == 65535 * 65536 + 65535
        assert rounds >= 1

    def test_labels_distinct_on_fixture_grid(self, spark):
        """No aliasing on an in-range grid: every initial label is
        unique per cell (bijectivity smoke over a spread of cells)."""
        from nomad_event_streamer_spark.operators.graph import (
            grid_components,
        )

        cells = [(x * 100 - 30000, y * 700 - 3000) for x in range(20) for y in range(3)]
        core = spark.createDataFrame(cells, "cx long, cy long")
        lab, _ = grid_components(core)
        got = lab.collect()
        # cells are >1 apart in both axes, so every component is a
        # singleton: all final labels distinct == no aliasing
        assert len({r["lab"] for r in got}) == len(cells)


class TestAnovaDegenerateGroupCount:
    def test_single_group_yields_null_in_both_engines(self, spark, tmp_path):
        """ADVICE r09: with k == 1 the F denominator is (k-1) == 0 and
        Spark/DuckDB disagree on double/0.0 — both engines must emit
        NULL instead, keeping the hash gate meaningful on ANY fixture."""
        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev["event_type"] = "only"
        sf_dir = _degenerate_sf(tmp_path, "events", ev)

        [row] = QUERIES["q_anova_f"](spark, sf_dir).collect()
        assert row["k"] == 1
        assert row["f_stat"] is None

        from tests.oracle_compare import duckdb_connection

        con = duckdb_connection(sf_dir)
        [(k, n, ssb, ssw, f)] = con.execute(ORACLES["q_anova_f"]).fetchall()
        assert k == 1 and f is None
        assert (row["n"], row["ssb"], row["ssw"]) == (n, ssb, ssw)

    def test_fixture_path_unchanged(self, spark):
        """The guard must not perturb the k=5 fixture result (committed
        hash evidence)."""
        [row] = QUERIES["q_anova_f"](spark, SF).collect()
        assert row["k"] == 5
        assert row["f_stat"] is not None and row["f_stat"] > 0


class TestHilbertZeroSpan:
    def test_constant_key_maps_to_cell_zero_not_null(self, spark, tmp_path):
        """ADVICE r09: a constant l_partkey made hx = x div 0 = NULL in
        Spark, silently dropping every row through the inner LUT join.
        The guard maps a zero span to constant cell 0 (the
        write_hilbert_clustered policy), so all rows survive."""
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        li["l_partkey"] = 7
        sf_dir = _degenerate_sf(tmp_path, "lineitem", li)

        rows = QUERIES["q_hilbert_cluster"](spark, sf_dir).collect()
        assert sum(r["n"] for r in rows) == len(li)
        assert all(r["min_pk"] == 7 and r["max_pk"] == 7 for r in rows)

    def test_fixture_bucket_count_is_49(self, spark):
        """d div 1365 over 65,536 cells yields 49 buckets (48 full +
        one 16-cell remainder) — the corrected prose, pinned."""
        rows = QUERIES["q_hilbert_cluster"](spark, SF).collect()
        assert 1 <= len(rows) <= 49
        assert max(r["bucket"] for r in rows) <= 48


class TestImageDhashPairs:
    def _referee_sigs(self) -> dict[int, tuple[int, int]]:
        """Independent pure-python dHash from the closed form (no numpy
        codec involvement — a decoder bug can't hide here)."""
        docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        sigs = {}
        for doc_id in docs["doc_id"].astype(int):
            base = doc_id // 8
            w, h = 9 + base % 8, 6 + base % 5
            j0 = ((doc_id % 8) * 151) % (w * h)
            delta = ((doc_id % 8) * 29) % 256

            def byte(j):
                v = (base * 73 + j * 151 + 11) % 256
                return v

            def gray(p):
                if base % 2 == 0:
                    c0 = byte(p * 3)
                    if p == j0:
                        c0 = (c0 + delta) % 256
                    return (c0 + byte(p * 3 + 1) + byte(p * 3 + 2)) // 3
                v = byte(p)
                if p == j0:
                    v = (v + delta) % 256
                return v

            g = [
                [gray((r * h // 8) * w + (c * w // 9)) for c in range(9)]
                for r in range(8)
            ]
            lo = hi = 0
            for r in range(8):
                for c in range(8):
                    i = r * 8 + c
                    bit = 1 if g[r][c] < g[r][c + 1] else 0
                    if i < 32:
                        lo |= bit << i
                    else:
                        hi |= bit << (i - 32)
            sigs[doc_id] = (lo, hi)
        return sigs

    def test_signatures_match_pure_python(self, spark):
        from nomad_event_streamer_spark.operators import multimodal
        from nomad_event_streamer_spark.tables import load

        docs = load(spark, SF, "documents")
        sig = multimodal.dhash64(multimodal.synthetic_media_variants(docs))
        got = {
            r["doc_id"]: (r["dhash_lo"], r["dhash_hi"])
            for r in sig.collect()
        }
        assert got == self._referee_sigs()

    def test_pairs_match_quadratic_referee(self, spark):
        sigs = self._referee_sigs()
        ids = sorted(sigs)
        expected = set()
        for ai, a in enumerate(ids):
            for b in ids[ai + 1 :]:
                d = bin(sigs[a][0] ^ sigs[b][0]).count("1") + bin(
                    sigs[a][1] ^ sigs[b][1]
                ).count("1")
                if d <= 3:
                    expected.add((a, b, d))
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in QUERIES["q_image_dhash_pairs"](spark, SF).collect()
        }
        assert got == expected
        assert len(got) > 100, "planted near-dup structure missing"

    def test_planted_groups_yield_small_hamming(self, spark):
        """Variants of one base image must mostly land within d<=3 of
        the pristine variant (the perturbation touches <= 2 grid cells
        => <= 4 gradient bits)."""
        sigs = self._referee_sigs()
        in_group = 0
        for doc in sigs:
            if doc % 8 == 0:
                continue
            b = (doc // 8) * 8
            if b in sigs:
                d = bin(sigs[doc][0] ^ sigs[b][0]).count("1") + bin(
                    sigs[doc][1] ^ sigs[b][1]
                ).count("1")
                in_group += d <= 3
        assert in_group > 200  # most of the ~437 variant docs


class TestAudioGoertzel:
    def test_matches_recurrence_referee(self, spark):
        """Pure-python Goertzel recurrence over the closed-form samples
        — independently of the WAV chunk walk AND of the oracle's
        impulse-response form."""
        docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        expected = {}
        for doc_id in docs["doc_id"].astype(int):
            n = 64 + doc_id % 97
            s1p = s2p = s1m = s2m = 0
            for t in range(n):
                v = ((doc_id * 7919 + t * 104729 + 1234) % 65536) - 32768
                s1p, s2p = v + s1p - s2p, s1p
                s1m, s2m = v - s1m - s2m, s1m
            expected[doc_id] = (
                n,
                s1p * s1p + s2p * s2p - s1p * s2p,
                s1m * s1m + s2m * s2m + s1m * s2m,
            )
        got = {
            r["doc_id"]: (r["n_samples"], r["energy_sr6"], r["energy_sr3"])
            for r in QUERIES["q_audio_goertzel"](spark, SF).collect()
        }
        assert got == expected

    def test_integer_bins_agree_with_float_goertzel(self):
        """The integer-coefficient bins ARE the textbook float Goertzel
        at w = pi/3 and 2*pi/3: same recurrence with c = 2*cos(w) =
        exactly +/-1, so the float path reproduces the integer energies
        to rounding."""
        import math

        for doc_id in (0, 17, 123):
            n = 64 + doc_id % 97
            x = [
                ((doc_id * 7919 + t * 104729 + 1234) % 65536) - 32768
                for t in range(n)
            ]
            for c, sign in ((1.0, -1), (-1.0, 1)):
                s1 = s2 = 0.0
                for v in x:
                    s1, s2 = v + c * s1 - s2, s1
                e_float = s1 * s1 + s2 * s2 + sign * s1 * s2
                s1i = s2i = 0
                for v in x:
                    s1i, s2i = v + int(c) * s1i - s2i, s1i
                e_int = s1i * s1i + s2i * s2i + sign * s1i * s2i
                assert abs(e_float - e_int) <= 1e-6 * max(1.0, abs(e_int))

    def test_energy_detects_planted_tone(self, spark):
        """Behavioral: a pure sr/6 tone must put (almost) all its
        energy in the sr/6 bin and (near) none in sr/3 — the reason the
        operator exists.  Uses the operator's own kernel on a synthetic
        int16 tone, not the fixture stream."""
        import math

        import numpy as np

        from nomad_event_streamer_spark.operators.multimodal import (
            encode_wav,
            goertzel_energies,
        )

        n = 120
        tone = np.round(
            30000 * np.cos(2 * math.pi * np.arange(n) / 6.0)
        ).astype(np.int16)
        pdf = pd.DataFrame({"doc_id": [1], "payload": [encode_wav(tone)]})
        df = spark.createDataFrame(pdf)
        [row] = goertzel_energies(df).collect()
        assert row["n_samples"] == n
        assert row["energy_sr6"] > 100 * max(row["energy_sr3"], 1)
