"""Round-9 operator invariants: the stock dropDuplicatesWithinWatermark
query (VERDICT r08 item #6) and companions, replayed against independent
batch computations."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.plans import QUERIES


class TestOphSignatures:
    def test_matches_pure_python_referee(self, spark):
        """Three-way pin: the Spark windowed-min densification equals a
        plain nearest-non-empty scan that shares no engine code (the
        DuckDB side is pinned by the driver hash gate)."""
        import hashlib

        from nomad_event_streamer_spark.operators import dedup
        from nomad_event_streamer_spark.operators.dedup import (
            MINHASH_P,
            OPH_BINS,
            oph_signatures,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        sh = dedup.shingles(docs, n=3)
        out = {
            (r["doc_id"], r["bin"]): r["sig"]
            for r in oph_signatures(sh).collect()
        }
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        K, VMAX = OPH_BINS, MINHASH_P // OPH_BINS + 2
        ref = {}
        for d, t in texts.items():
            toks = t.split(" ")
            shset = {
                " ".join(toks[i : i + 3])
                for i in range(max(len(toks) - 2, 1))
            }
            bins: dict[int, int] = {}
            for s in shset:
                hb = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
                bins[hb % K] = min(bins.get(hb % K, 1 << 62), hb // K)
            for t_ in range(K):
                best = min(
                    (t_ + dist) * VMAX + bins[(t_ + dist) % K]
                    for dist in range(K)
                    if (t_ + dist) % K in bins
                )
                ref[(d, t_)] = best - t_ * VMAX
        assert out == ref

    def test_filled_bins_equal_raw_minima(self, spark):
        """A non-empty bin's signature is its own min value (distance 0
        adds no offset) — the densification must only touch empty bins."""
        from pyspark.sql import Row

        from nomad_event_streamer_spark.operators.dedup import (
            MINHASH_P,
            OPH_BINS,
            oph_signatures,
        )
        import hashlib

        docs = spark.createDataFrame(
            [Row(doc_id=1, shingle=f"tok {i} x") for i in range(200)]
        )
        out = {
            r["bin"]: r["sig"] for r in oph_signatures(docs).collect()
        }
        K = OPH_BINS
        bins: dict[int, int] = {}
        for i in range(200):
            hb = (
                int(hashlib.md5(f"tok {i} x".encode()).hexdigest()[:15], 16)
                % MINHASH_P
            )
            bins[hb % K] = min(bins.get(hb % K, 1 << 62), hb // K)
        # 200 shingles over 16 bins: every bin should be occupied
        assert set(bins) == set(range(K))
        assert out == bins


class TestStreamDedupWatermark:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_stream_dedup_watermark"](spark, sf_dir).collect()

    @pytest.fixture(scope="class")
    def batch_buckets(self, spark, sf_dir):
        """Independent batch computation of (bucket, min doc_id)."""
        from nomad_event_streamer_spark.operators import dedup
        from nomad_event_streamer_spark.tables import load

        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        banded = dedup.minhash_bands_rowlocal(
            docs, n=3, num_hashes=16, rows_per_band=2
        )
        b0 = banded.select(
            "doc_id",
            F.element_at("bands", 1).getField("bucket").alias("bucket"),
        )
        return {
            r["bucket"]: r["mn"]
            for r in b0.groupBy("bucket")
            .agg(F.min("doc_id").alias("mn"))
            .collect()
        }

    def test_emits_exactly_one_row_per_distinct_bucket(
        self, rows, batch_buckets
    ):
        assert len(rows) == len(batch_buckets)
        assert {r["bucket"] for r in rows} == set(batch_buckets)

    def test_duplicates_were_actually_dropped(self, spark, sf_dir, rows):
        """The corpus has more documents than distinct buckets — if the
        operator dropped nothing the sink would hold one row per doc."""
        from nomad_event_streamer_spark.tables import load

        n_docs = load(spark, sf_dir, "documents").count()
        assert len(rows) < n_docs

    def test_first_batch_matches_min_docid_range(
        self, spark, sf_dir, rows, batch_buckets
    ):
        """Whichever row of the winning micro-batch the engine kept, its
        derived batch index must equal the batch of the bucket's min
        doc_id (batches are doc_id-range monotone)."""
        from nomad_event_streamer_spark.tables import load

        n = (
            load(spark, sf_dir, "documents")
            .agg(F.max("doc_id"))
            .collect()[0][0]
            + 1
        )
        cut1, cut2 = n // 3, 2 * (n // 3)

        def batch_of(doc_id: int) -> int:
            return 0 if doc_id < cut1 else (1 if doc_id < cut2 else 2)

        for r in rows:
            assert r["first_batch"] == batch_of(batch_buckets[r["bucket"]])

    def test_all_three_batches_win_some_bucket(self, rows):
        """Cross-batch drops only exist if later batches lose some keys
        AND still win others — all three batch indices must appear."""
        assert {r["first_batch"] for r in rows} == {0, 1, 2}


class TestFmSketch:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_fm_sketch"](spark, sf_dir).collect()

    def test_bitmap_bits_are_consistent_with_r(self, rows):
        """R must be the index of the lowest unset bit of the bitmap."""
        for r in rows:
            b = r["bitmap"]
            assert b > 0
            k = r["r_lowest_zero"]
            assert (b >> k) & 1 == 0
            assert all((b >> j) & 1 for j in range(k))

    def test_pcsa_estimate_within_band(self, spark, sf_dir, rows):
        """Estimator accuracy with the standard regime split: PCSA's
        mean-R estimator (n-hat = m * 2^(mean R) / 0.77351) when the
        buckets are mostly occupied; LINEAR COUNTING (n-hat =
        -m ln(V/m), V = empty buckets — Whang et al. 1990, the same
        small-range correction HLL uses) when they are not, which is
        where PCSA's additive bias dominates (n ~ m)."""
        import math
        from collections import defaultdict

        from nomad_event_streamer_spark.tables import events

        truth = {
            r["event_type"]: r["n"]
            for r in events(spark, sf_dir)
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        sums: dict[str, int] = defaultdict(int)
        occ: dict[str, int] = defaultdict(int)
        for r in rows:
            sums[r["event_type"]] += r["r_lowest_zero"]
            occ[r["event_type"]] += 1
        m = 64
        for et, n in truth.items():
            empty = m - occ[et]
            if empty > 0.3 * m:
                est = -m * math.log(empty / m)
            else:
                est = m * (2 ** (sums[et] / m)) / 0.77351
            assert 0.7 * n <= est <= 1.4 * n, (et, n, est)

    def test_sketches_are_mergeable(self, spark, sf_dir):
        """bit_or is associative/commutative: sketching two disjoint
        halves and OR-merging equals sketching the whole — the property
        that makes the one-pass distributed shape correct."""
        from nomad_event_streamer_spark.tables import events

        ev = events(spark, sf_dir)
        full = {
            (r["event_type"], r["bucket"]): r["bitmap"]
            for r in QUERIES["q_fm_sketch"](spark, sf_dir).collect()
        }

        def sketch_of(df):
            h = df.select(
                "event_type",
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 15
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("hv"),
            ).distinct()
            parts = h.select(
                "event_type",
                (F.col("hv") % 64).alias("bucket"),
                F.expr("hv div 64").alias("v"),
            )
            return {
                (r["event_type"], r["bucket"]): r["bm"]
                for r in parts.groupBy("event_type", "bucket")
                .agg(
                    F.bit_or(
                        F.expr(
                            "shiftleft(1L, CASE WHEN v = 0 THEN 62 ELSE "
                            "cast(length(bin(v & -v)) as int) - 1 END)"
                        )
                    ).alias("bm")
                )
                .collect()
            }

        a = sketch_of(ev.where(F.col("user_id") % 2 == 0))
        b = sketch_of(ev.where(F.col("user_id") % 2 == 1))
        merged = {}
        for d in (a, b):
            for k, v in d.items():
                merged[k] = merged.get(k, 0) | v
        assert merged == full


class TestKcenterSeed:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_kcenter_seed"](spark, sf_dir).collect()

    def test_k_clusters_cover_all_vectors(self, spark, sf_dir, rows):
        from nomad_event_streamer_spark.tables import load

        n = load(spark, sf_dir, "embeddings").count()
        assert len(rows) == 4
        assert sum(r["n_members"] for r in rows) == n

    def test_matches_pure_python_referee(self, spark, sf_dir, rows):
        """Replay Gonzalez farthest-first seeding + assignment in plain
        python over the quantized vectors."""
        import math

        from nomad_event_streamer_spark.tables import load

        def q(x):
            return math.floor(x * 1000.0 + 0.5)

        vecs = {
            r["vec_id"]: [q(float(x)) for x in r["embedding"]]
            for r in load(spark, sf_dir, "embeddings").collect()
        }

        def d2(a, b):
            return sum((x - y) * (x - y) for x, y in zip(a, b))

        centers = [0]
        dmin = {v: d2(vecs[v], vecs[0]) for v in vecs}
        for _ in range(3):
            far = min(vecs, key=lambda v: (-dmin[v], v))
            centers.append(far)
            for v in vecs:
                dmin[v] = min(dmin[v], d2(vecs[v], vecs[far]))
        agg = {}
        for v in vecs:
            best = min(
                ((d2(vecs[v], vecs[c]), c) for c in centers),
            )
            n, cost, radius = agg.get(best[1], (0, 0, 0))
            agg[best[1]] = (n + 1, cost + best[0], max(radius, best[0]))
        got = {
            r["center_id"]: (r["n_members"], r["cost"], r["radius"])
            for r in rows
        }
        assert got == agg


class TestPathPrefixRollup:
    def test_prefix_tree_is_consistent(self, spark, sf_dir):
        """Parent mass >= sum of any child's mass; depth-1 totals equal
        the corpus."""
        from collections import defaultdict

        from nomad_event_streamer_spark.tables import load

        rows = QUERIES["q_path_prefix_rollup"](spark, sf_dir).collect()
        n_docs = load(spark, sf_dir, "documents").count()
        by_depth = defaultdict(list)
        for r in rows:
            by_depth[r["depth"]].append(r)
        for d in (1, 2, 3, 4):
            assert sum(r["n_docs"] for r in by_depth[d]) == n_docs
        parents = {r["prefix"]: r for r in by_depth[1]}
        for r in by_depth[2]:
            parent = r["prefix"].rsplit("/", 1)[0]
            assert parents[parent]["n_docs"] >= r["n_docs"]
            assert parents[parent]["bytes_sum"] >= r["bytes_sum"]
            assert parents[parent]["n_leaves"] >= r["n_leaves"]


class TestSchemaEvolution:
    def test_old_generation_lang_is_null(self, spark, sf_dir):
        rows = {
            r["gen"]: r
            for r in QUERIES["q_schema_evolution"](spark, sf_dir).collect()
        }
        assert set(rows) == {0, 1}
        # generation 0 predates the column: every row NULL, 0 distinct
        assert rows[0]["n_lang_null"] == rows[0]["n_docs"]
        assert rows[0]["n_langs"] == 0
        # generation 1 carries it: no NULLs, several languages
        assert rows[1]["n_lang_null"] == 0
        assert rows[1]["n_langs"] >= 2


class TestUnicodeNfc:
    def test_composition_counts(self, spark, sf_dir):
        """n_composed must equal the number of injected combining marks
        (every 'a' and 'o' of the source text composes away one char)."""
        from nomad_event_streamer_spark.tables import load

        texts = {
            r["doc_id"]: r["text"]
            for r in load(spark, sf_dir, "documents").collect()
        }
        rows = QUERIES["q_unicode_nfc"](spark, sf_dir).collect()
        assert len(rows) == len(texts)
        import hashlib
        import unicodedata

        for r in rows:
            t = texts[r["doc_id"]]
            marks = t.count("a") + t.count("o")
            assert r["n_composed"] == marks
            assert r["chars_before"] == len(t) + marks
            assert r["chars_after"] == len(t)
            dec = t.replace("a", "á").replace("o", "ö")
            norm = unicodedata.normalize("NFC", dec)
            assert r["norm_md5"] == hashlib.md5(norm.encode()).hexdigest()


class TestHoltWinters:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_holt_winters"](spark, sf_dir).collect()

    def test_full_path_emitted(self, rows, spark, sf_dir):
        from nomad_event_streamer_spark.tables import events

        n_types = (
            events(spark, sf_dir).select("event_type").distinct().count()
        )
        # t = 8..30 per series
        assert len(rows) == n_types * 23

    def test_one_step_fit_is_prior_state(self, rows):
        """fit_t must equal l_{t-1} + b_{t-1} + s_{t-m} — replay the
        recurrence per series and check every step."""
        from collections import defaultdict

        by_et = defaultdict(dict)
        for r in rows:
            by_et[r["event_type"]][r["t"]] = r
        for et, steps in by_et.items():
            for t in sorted(steps):
                if t - 1 in steps:
                    prev = steps[t - 1]
                    # s_{t-m} is not visible for t-m <= 7 (init band),
                    # so only check consecutive emitted steps where the
                    # seasonal lookback is itself an emitted step
                    if t - 7 in steps:
                        assert (
                            steps[t]["fit_milli"]
                            == prev["l_milli"]
                            + prev["b_milli"]
                            + steps[t - 7]["s_milli"]
                        )

    def test_constant_series_reaches_zero_trend(self, spark):
        """On a constant series, trend decays toward 0 and level toward
        the constant — the sanity anchor for the recurrences."""
        import pandas as pd
        from pyspark.sql import Row

        # replay the registered recurrence directly on a constant grid
        from nomad_event_streamer_spark.plans.timeseries_queries import (
            _HOLT_ALPHA_MILLI,
            _HOLT_BETA_MILLI,
            _HW_GAMMA_MILLI,
            _HW_M,
        )

        xs = [10] * 30
        m = _HW_M
        a, na = _HOLT_ALPHA_MILLI, 1000 - _HOLT_ALPHA_MILLI
        be, nbe = _HOLT_BETA_MILLI, 1000 - _HOLT_BETA_MILLI
        g, ng = _HW_GAMMA_MILLI, 1000 - _HW_GAMMA_MILLI

        def tdiv(p, q):
            return -((-p) // q) if p < 0 else p // q

        level = tdiv(sum(xs[:m]) * 1000, m)
        b = tdiv((sum(xs[m : 2 * m]) - sum(xs[:m])) * 1000, m * m)
        season = [xs[i] * 1000 - level for i in range(m)]
        for t in range(m + 1, 31):
            x = xs[t - 1]
            s_m = season[t - 1 - m]
            l_new = tdiv(a * (x * 1000 - s_m) + na * (level + b), 1000)
            b = tdiv(be * (l_new - level) + nbe * b, 1000)
            season.append(tdiv(g * (x * 1000 - l_new) + ng * s_m, 1000))
            level = l_new
        assert b == 0
        assert abs(level - 10_000) <= 1
        assert all(abs(s) <= 1 for s in season[-m:])


class TestStorageRound9:
    def test_dynamic_overwrite_preserves_untouched_partitions(
        self, spark, sf_dir
    ):
        from nomad_event_streamer_spark.tables import events

        rows = {
            r["event_type"]: r
            for r in QUERIES["q_partition_overwrite_dynamic"](
                spark, sf_dir
            ).collect()
        }
        src = {
            r["event_type"]: r["n"]
            for r in events(spark, sf_dir)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert rows["click"]["version"] == 2
        assert rows["click"]["n_rows"] < src["click"]
        for et, n in src.items():
            if et != "click":
                assert rows[et]["version"] == 1
                assert rows[et]["n_rows"] == n

    def test_csv_permissive_captures_exactly_the_injected_corruption(
        self, spark, sf_dir
    ):
        from nomad_event_streamer_spark.tables import events

        rows = QUERIES["q_csv_permissive"](spark, sf_dir).collect()
        expect = {
            r["event_type"]: (r["n"], r["bad"])
            for r in events(spark, sf_dir)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("event_id") % 7 == 0, 1).otherwise(0)).alias(
                    "bad"
                ),
            )
            .collect()
        }
        for r in rows:
            n, bad = expect[r["event_type"]]
            assert r["n_rows"] == n
            assert r["n_corrupt"] == bad
            assert bad > 0  # corruption really occurs in every group

    def test_content_address_shards_cover_docs(self, spark, sf_dir):
        from nomad_event_streamer_spark.tables import load

        rows = QUERIES["q_content_address"](spark, sf_dir).collect()
        n = load(spark, sf_dir, "documents").count()
        assert sum(r["n_docs"] for r in rows) == n
        assert all(0 <= r["shard"] <= 255 for r in rows)
        assert all(r["n_objects"] <= r["n_docs"] for r in rows)


class TestJlProject:
    def test_ratio_concentrates_near_unity(self, spark, sf_dir):
        """The JL guarantee, empirically: the median normalized ratio
        must sit near 1000 milli and the bulk within the k=16
        concentration band."""
        rows = QUERIES["q_jl_project"](spark, sf_dir).collect()
        ratios = sorted(r["ratio_milli"] for r in rows)
        n = len(ratios)
        assert 850 <= ratios[n // 2] <= 1150
        # 90% of pairs within a generous ±4 sigma band for k=16
        assert ratios[n // 20] >= 300
        assert ratios[-n // 20] <= 2200

    def test_projection_matches_manual_dot(self, spark, sf_dir):
        """One vector's projection recomputed in python from the same
        sign matrix and quantization."""
        import math

        from nomad_event_streamer_spark.plans.llm_ops import _jl_signs
        from nomad_event_streamer_spark.tables import load

        signs = _jl_signs()
        [row] = (
            load(spark, sf_dir, "embeddings")
            .where(F.col("vec_id") == 5)
            .collect()
        )
        v = [math.floor(float(x) * 1000.0 + 0.5) for x in row["embedding"]]
        y = [sum(x * s for x, s in zip(v, signs[j])) for j in range(16)]
        # reproduce one pair's d2_proj via the registered query
        out = {
            (r["query_id"], r["vec_id"]): r
            for r in QUERIES["q_jl_project"](spark, sf_dir).collect()
        }
        [q0] = (
            load(spark, sf_dir, "embeddings")
            .where(F.col("vec_id") == 0)
            .collect()
        )
        v0 = [math.floor(float(x) * 1000.0 + 0.5) for x in q0["embedding"]]
        y0 = [sum(x * s for x, s in zip(v0, signs[j])) for j in range(16)]
        d2p = sum((a - b) * (a - b) for a, b in zip(y, y0))
        assert out[(0, 5)]["d2_proj"] == d2p


class TestBitmapDau:
    def test_dau_equals_count_distinct(self, spark, sf_dir):
        """The bitmap formulation must agree exactly with the
        count-distinct formulation, day by day."""
        from nomad_event_streamer_spark.tables import events

        rows = {
            r["day_us"]: r
            for r in QUERIES["q_bitmap_dau"](spark, sf_dir).collect()
        }
        truth = {
            r["day_us"]: r["n"]
            for r in events(spark, sf_dir)
            .select(
                F.expr("(ts_us div 86400000000) * 86400000000").alias(
                    "day_us"
                ),
                "user_id",
            )
            .groupBy("day_us")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert set(rows) == set(truth)
        for day, n in truth.items():
            assert rows[day]["dau"] == n
            assert rows[day]["wau"] >= n
            assert rows[day]["stickiness_milli"] <= 1000


class TestWindowFunnel:
    def test_depths_nest_and_bound_unwindowed_funnel(self, spark, sf_dir):
        """Depth counts must cover every user with a view, and the
        48h-windowed depth-3 count can never exceed q_funnel's
        unwindowed stage-3 reach."""
        from nomad_event_streamer_spark.tables import events

        rows = {
            r["depth"]: r
            for r in QUERIES["q_window_funnel"](spark, sf_dir).collect()
        }
        n_viewers = (
            events(spark, sf_dir)
            .where(F.col("event_type") == "view")
            .select("user_id")
            .distinct()
            .count()
        )
        assert sum(r["n_users"] for r in rows.values()) == n_viewers
        assert rows[1]["elapsed_us_sum"] == 0
        if 3 in rows:
            win_us = 48 * 3600 * 1_000_000
            # average elapsed for depth-3 users within the window bound
            assert (
                rows[3]["elapsed_us_sum"] <= rows[3]["n_users"] * win_us
            )


class TestTokenBucket:
    def test_matches_pure_python_referee(self, spark, sf_dir):
        from collections import defaultdict

        from nomad_event_streamer_spark.tables import events

        ev = sorted(
            (
                (r["user_id"], r["ts_us"], r["event_id"])
                for r in events(spark, sf_dir)
                .select("user_id", "ts_us", "event_id")
                .collect()
            ),
            key=lambda t: (t[1], t[2]),
        )
        per_user = defaultdict(list)
        for uid, ts, eid in ev:
            per_user[uid].append(ts)
        CAP, COST, DIV, MAXK = 3_000_000, 1_000_000, 86400, 100
        ref = {}
        for uid, tss in per_user.items():
            tok, na, nd, prev = CAP, 0, 0, None
            for ts in tss[:MAXK]:
                if prev is not None:
                    tok = min(CAP, tok + (ts - prev) // DIV)
                if tok >= COST:
                    tok -= COST
                    na += 1
                else:
                    nd += 1
                prev = ts
            ref[uid] = (na, nd, tok)
        got = {
            r["user_id"]: (r["n_allowed"], r["n_denied"], r["tokens_final"])
            for r in QUERIES["q_token_bucket"](spark, sf_dir).collect()
        }
        assert got == ref

    def test_both_verdicts_exercised(self, spark, sf_dir):
        rows = QUERIES["q_token_bucket"](spark, sf_dir).collect()
        assert sum(r["n_allowed"] for r in rows) > 0
        assert sum(r["n_denied"] for r in rows) > 0


class TestIpLpmJoin:
    def test_all_three_prefix_lengths_win(self, spark, sf_dir):
        rows = QUERIES["q_ip_lpm_join"](spark, sf_dir).collect()
        kinds = {r["route"].split("_")[0] for r in rows}
        assert kinds == {"rt8", "rt16", "rt24"}

    def test_every_event_matched_exactly_once(self, spark, sf_dir):
        from nomad_event_streamer_spark.tables import events

        rows = QUERIES["q_ip_lpm_join"](spark, sf_dir).collect()
        n = events(spark, sf_dir).count()
        assert sum(r["n_events"] for r in rows) == n
        assert all(r["n_events"] == r["n_matched"] for r in rows)

    def test_precedence_matches_python_lpm(self, spark, sf_dir):
        """Replay the LPM in plain python over the same synthesized IPs
        and route table."""
        from collections import Counter

        from nomad_event_streamer_spark.tables import events

        routes = {}
        routes[(8, 10)] = "rt8_default"
        for k in range(3):
            routes[(16, (10 << 8) | k)] = f"rt16_{k}"
        for o in (4, 5, 6, 7):
            routes[(24, (((10 << 8) | (o % 4)) << 8) | o)] = f"rt24_{o % 4}_{o}"
        counts = Counter()
        for r in events(spark, sf_dir).select("user_id").collect():
            u = r["user_id"]
            ip = 10 * 16777216 + (u % 4) * 65536 + (u % 8) * 256 + u % 256
            for plen, shift in ((24, 8), (16, 16), (8, 24)):
                key = (plen, ip >> shift)
                if key in routes:
                    counts[routes[key]] += 1
                    break
        got = {
            r["route"]: r["n_events"]
            for r in QUERIES["q_ip_lpm_join"](spark, sf_dir).collect()
        }
        assert got == dict(counts)


class TestLttb:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_lttb_downsample"](spark, sf_dir).collect()

    def test_shape(self, rows, spark, sf_dir):
        from nomad_event_streamer_spark.tables import events

        n_types = (
            events(spark, sf_dir).select("event_type").distinct().count()
        )
        assert len(rows) == n_types * 10

    def test_endpoints_forced_and_selection_in_bucket(self, rows):
        for r in rows:
            if r["b"] == 1:
                assert r["t"] == 1 and r["area3x"] == 0
            elif r["b"] == 10:
                assert r["t"] == 30 and r["area3x"] == 0
            else:
                lo = (r["b"] - 1) * 3 + 1
                assert lo <= r["t"] <= lo + 2

    def test_selection_is_monotone_in_time(self, rows):
        from collections import defaultdict

        per = defaultdict(list)
        for r in rows:
            per[r["event_type"]].append((r["b"], r["t"]))
        for et, pts in per.items():
            pts.sort()
            ts = [t for _, t in pts]
            assert ts == sorted(ts)


class TestMutualBestMatch:
    def test_mutuality_and_uniqueness(self, spark, sf_dir):
        rows = QUERIES["q_mutual_best_match"](spark, sf_dir).collect()
        assert rows
        a_ids = [r["a_id"] for r in rows]
        b_ids = [r["b_id"] for r in rows]
        # mutual best match is a partial matching: no id repeats
        assert len(a_ids) == len(set(a_ids))
        assert len(b_ids) == len(set(b_ids))
        assert all(r["a_id"] % 2 == 0 and r["b_id"] % 2 == 1 for r in rows)

    def test_filter_is_strictly_stronger_than_one_directional(
        self, spark, sf_dir
    ):
        """The mutual filter must drop SOME one-directional best
        matches, or the criterion is vacuous on this corpus."""
        from nomad_event_streamer_spark.tables import load

        n_a = (
            load(spark, sf_dir, "embeddings")
            .where(F.col("vec_id") % 2 == 0)
            .count()
        )
        rows = QUERIES["q_mutual_best_match"](spark, sf_dir).collect()
        assert 0 < len(rows) < n_a
