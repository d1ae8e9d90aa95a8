"""Round-8b batch-4 operator tests: GROUP BY ALL, link prediction,
Bloom FPR audit, McNemar, RFM segmentation, VWAP, precision@k.

Invariants + pure-Python replays (oracle-independent ground truth)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.plans import QUERIES
from nomad_event_streamer_spark.tables import events, load


def _cents(v: float) -> int:
    import math

    return int(math.floor(v * 100.0 + 0.5))


def _doc_texts(spark, sf_dir) -> dict[int, str]:
    return {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }


class TestGroupByAll:
    def test_matches_explicit_group_by(self, spark, sf_dir):
        got = {
            (r["o_orderpriority"], r["o_orderstatus"]): (
                r["n_orders"],
                r["sum_cents"],
            )
            for r in QUERIES["q_group_by_all"](spark, sf_dir).collect()
        }
        explicit = (
            load(spark, sf_dir, "orders")
            .where(F.expr("o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'"))
            .groupBy("o_orderpriority", "o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(
                    F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
                )
                .cast("long")
                .alias("cents"),
            )
            .collect()
        )
        assert got == {
            (r["o_orderpriority"], r["o_orderstatus"]): (r["n"], r["cents"])
            for r in explicit
        }
        assert len(got) > 1


class TestLinkPredict:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_link_predict"](spark, sf_dir).collect()

    @pytest.fixture(scope="class")
    def graph(self, spark, sf_dir):
        ev = (
            events(spark, sf_dir)
            .selectExpr("user_id", "event_type", "ts_us div 3600000000 AS h")
            .collect()
        )
        cells: dict[int, set] = {}
        for r in ev:
            cells.setdefault(r["user_id"], set()).add(
                (r["event_type"], r["h"])
            )
        users = sorted(cells)
        edges = set()
        for i, u in enumerate(users):
            for v in users[i + 1 :]:
                if len(cells[u] & cells[v]) >= 3:
                    edges.add((u, v))
        nbrs: dict[int, set] = {}
        for u, v in edges:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        return edges, nbrs

    def test_python_replay_top20(self, rows, graph):
        edges, nbrs = graph
        scored = []
        seen = set()
        for m, ns in nbrs.items():
            ns_sorted = sorted(ns)
            for i, a in enumerate(ns_sorted):
                for b in ns_sorted[i + 1 :]:
                    if (a, b) in edges or (a, b) in seen:
                        continue
                    seen.add((a, b))
                    cn = len(nbrs[a] & nbrs[b])
                    jacc = cn * 1000 // (len(nbrs[a]) + len(nbrs[b]) - cn)
                    scored.append((-cn, -jacc, a, b))
        scored.sort()
        expect = scored[:20]
        got = sorted(rows, key=lambda r: r["rnk"])
        assert len(got) == len(expect)
        for r, (ncn, njacc, a, b) in zip(got, expect):
            assert (r["a"], r["b"]) == (a, b)
            assert r["n_common"] == -ncn
            assert r["jacc_milli"] == -njacc

    def test_predictions_are_non_edges(self, rows, graph):
        edges, _ = graph
        for r in rows:
            assert (r["a"], r["b"]) not in edges
            assert r["a"] < r["b"]

    def test_rank_dense(self, rows):
        assert sorted(r["rnk"] for r in rows) == list(range(1, len(rows) + 1))
        assert rows  # the co-activity graph must yield predictions


class TestBloomFpr:
    @pytest.fixture(scope="class")
    def row(self, spark, sf_dir):
        rows = QUERIES["q_bloom_fpr"](spark, sf_dir).collect()
        assert len(rows) == 1
        return rows[0]

    def test_python_replay(self, row, spark, sf_dir):
        cust = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        ).collect()
        mem = [r["c_custkey"] for r in cust if r["c_mktsegment"] == "BUILDING"]
        probe = [
            r["c_custkey"] for r in cust if r["c_mktsegment"] != "BUILDING"
        ]

        def bits_of(key):
            return {
                int(
                    hashlib.md5(f"b{j}:{key}".encode()).hexdigest()[:15], 16
                )
                % 4096
                for j in range(3)
            }

        filt = set()
        for k in mem:
            filt |= bits_of(k)
        fp = sum(1 for k in probe if bits_of(k) <= filt)
        assert row["n_members"] == len(mem)
        assert row["n_probes"] == len(probe)
        assert row["n_bits_set"] == len(filt)
        assert row["n_false_positives"] == fp
        assert row["fpr_ppm"] == fp * 1_000_000 // len(probe)

    def test_no_false_negatives(self, row):
        # the Bloom guarantee: every member tests positive
        assert row["n_members_positive"] == row["n_members"]

    def test_bits_bounded(self, row):
        assert row["n_bits_set"] <= min(
            row["m_bits"], row["n_members"] * row["k_hashes"]
        )
        # FPs are possible but never total (0 at sf0.001's sparse fill,
        # 11/1198 measured at sf0.01)
        assert 0 <= row["n_false_positives"] < row["n_probes"]


class TestMcnemar:
    @pytest.fixture(scope="class")
    def row(self, spark, sf_dir):
        rows = QUERIES["q_mcnemar"](spark, sf_dir).collect()
        assert len(rows) == 1
        return rows[0]

    def test_python_replay(self, row, spark, sf_dir):
        from nomad_event_streamer_spark.operators.text import LANG_MARKERS

        langs = sorted(LANG_MARKERS)
        docs = (
            load(spark, sf_dir, "documents").select("text", "lang").collect()
        )

        def argmax(scores):
            for i, lang in enumerate(langs[:-1]):
                if scores[lang] >= max(scores[o] for o in langs[i + 1 :]):
                    return lang
            return langs[-1]

        table = Counter()
        for r in docs:
            toks = r["text"].split(" ")
            sa = {
                lang: sum(1 for t in toks if t in LANG_MARKERS[lang])
                for lang in langs
            }
            sb = {
                lang: sum(1 for t in toks if t == LANG_MARKERS[lang][0])
                for lang in langs
            }
            a_ok = argmax(sa) == r["lang"]
            b_ok = argmax(sb) == r["lang"]
            table[(a_ok, b_ok)] += 1
        assert row["n_both_right"] == table[(True, True)]
        assert row["n_a_only"] == table[(True, False)]
        assert row["n_b_only"] == table[(False, True)]
        assert row["n_both_wrong"] == table[(False, False)]
        b, c = table[(True, False)], table[(False, True)]
        expect = 0 if b + c == 0 else (b - c) * (b - c) * 1000 // (b + c)
        assert row["chi2_milli"] == expect

    def test_table_covers_corpus(self, row, spark, sf_dir):
        total = (
            row["n_both_right"]
            + row["n_a_only"]
            + row["n_b_only"]
            + row["n_both_wrong"]
        )
        assert total == load(spark, sf_dir, "documents").count()

    def test_discordant_pairs_exist(self, row):
        # the test statistic is only meaningful if the classifiers
        # actually disagree somewhere
        assert row["n_a_only"] + row["n_b_only"] > 0


class TestRfmSegments:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["segment"]: r
            for r in QUERIES["q_rfm_segments"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        ev = events(spark, sf_dir).select("user_id", "ts_us", "value").collect()
        per: dict[int, list] = {}
        for r in ev:
            per.setdefault(r["user_id"], []).append(r)
        rfm = {
            uid: (
                max(r["ts_us"] for r in es),
                len(es),
                sum(_cents(r["value"]) for r in es),
            )
            for uid, es in per.items()
        }

        def disc_median(vals):
            # smallest value whose cumulative share >= 0.5 (what both
            # engines' percentile_disc(0.5) computes on this data)
            s = sorted(vals)
            import math

            return s[math.ceil(0.5 * len(s)) - 1]

        rt = disc_median([v[0] for v in rfm.values()])
        ft = disc_median([v[1] for v in rfm.values()])
        mt = disc_median([v[2] for v in rfm.values()])
        agg: dict[str, list] = {}
        for r_us, f, m in rfm.values():
            seg = (
                f"R{1 if r_us > rt else 0}"
                f"F{1 if f > ft else 0}"
                f"M{1 if m > mt else 0}"
            )
            agg.setdefault(seg, []).append((f, m))
        assert set(rows) == set(agg)
        for seg, members in agg.items():
            r = rows[seg]
            assert r["n_users"] == len(members)
            assert r["sum_events"] == sum(f for f, _ in members)
            assert r["sum_cents"] == sum(m for _, m in members)

    def test_users_partitioned(self, rows, spark, sf_dir):
        n_users = (
            events(spark, sf_dir).select("user_id").distinct().count()
        )
        assert sum(r["n_users"] for r in rows.values()) == n_users

    def test_multiple_segments(self, rows):
        assert len(rows) >= 4


class TestVwap:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["event_type"], r["hour_us"]): r
            for r in QUERIES["q_vwap"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        ev = events(spark, sf_dir).select(
            "event_id", "event_type", "ts_us", "value"
        ).collect()
        agg: dict[tuple, list] = {}
        for r in ev:
            hour = (r["ts_us"] // 3_600_000_000) * 3_600_000_000
            agg.setdefault((r["event_type"], hour), []).append(
                (_cents(r["value"]), r["event_id"] % 7 + 1)
            )
        assert set(rows) == set(agg)
        for key, items in agg.items():
            r = rows[key]
            vol = sum(v for _, v in items)
            pv = sum(c * v for c, v in items)
            assert r["n"] == len(items)
            assert r["vol_sum"] == vol
            assert r["pv_sum"] == pv
            assert r["vwap_cents"] == pv // vol

    def test_vwap_within_price_range(self, rows):
        for r in rows.values():
            assert r["vol_sum"] >= r["n"]  # volumes are >= 1


class TestPrecAtK:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["query_id"], r["k"]): r
            for r in QUERIES["q_prec_at_k"](spark, sf_dir).collect()
        }

    def test_full_grid(self, rows):
        qids = {q for q, _ in rows}
        assert {k for _, k in rows} == {1, 3, 5, 10}
        assert len(rows) == 4 * len(qids)

    def test_hits_monotone_in_k(self, rows):
        qids = {q for q, _ in rows}
        for q in qids:
            hits = [rows[(q, k)]["n_hits"] for k in (1, 3, 5, 10)]
            assert hits == sorted(hits)
            for k, h in zip((1, 3, 5, 10), hits):
                assert 0 <= h <= k

    def test_formulas(self, rows):
        for (q, k), r in rows.items():
            assert r["prec_milli"] == r["n_hits"] * 1000 // k

    def test_consistent_with_mrr(self, rows, spark, sf_dir):
        mrr = {
            r["query_id"]: r["first_rel_rank"]
            for r in QUERIES["q_eval_mrr"](spark, sf_dir).collect()
        }
        for q, first in mrr.items():
            for k in (1, 3, 5, 10):
                if first and first <= k:
                    assert rows[(q, k)]["n_hits"] >= 1
                elif first == 0 or first > k:
                    pass
            if first == 0:
                assert rows[(q, 10)]["n_hits"] == 0
            assert (rows[(q, 1)]["n_hits"] == 1) == (first == 1)


class TestHoltLinear:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["event_type"], r["t"]): r
            for r in QUERIES["q_holt_linear"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        ev = events(spark, sf_dir).selectExpr(
            "event_type", "(ts_us div 86400000000) * 86400000000 AS day_us"
        ).collect()
        days = sorted({r["day_us"] for r in ev})
        types = {r["event_type"] for r in ev}
        cnt = Counter((r["event_type"], r["day_us"]) for r in ev)

        def tdiv(p, q):
            return -((-p) // q) if p < 0 else p // q

        for et in types:
            xs = [cnt.get((et, d), 0) for d in days]
            s, b = xs[0] * 1000, (xs[1] - xs[0]) * 1000
            path = [(1, xs[0], s, b)]
            for t in range(2, len(xs) + 1):
                x = xs[t - 1]
                s_new = tdiv(300 * x * 1000 + 700 * (s + b), 1000)
                b = tdiv(200 * (s_new - s) + 800 * b, 1000)
                s = s_new
                path.append((t, x, s, b))
            for t, x, s_m, b_m in path:
                r = rows[(et, t)]
                assert (r["x"], r["s_milli"], r["b_milli"]) == (x, s_m, b_m)

    def test_full_path_emitted(self, rows):
        types = {et for et, _ in rows}
        steps = {t for _, t in rows}
        assert steps == set(range(1, 31))
        assert len(rows) == 30 * len(types)

    def test_trend_reacts(self, rows):
        # the trend term must not be constant across the path
        assert len({r["b_milli"] for r in rows.values()}) > 1


class TestRollingCorr:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["day_us"], r["hour_us"]): r
            for r in QUERIES["q_rolling_corr"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        import math

        ev = (
            events(spark, sf_dir)
            .where(F.col("event_type").isin("click", "view"))
            .selectExpr(
                "(ts_us div 86400000000) * 86400000000 AS day_us",
                "(ts_us div 3600000000) * 3600000000 AS hour_us",
                "event_type",
            )
            .collect()
        )
        cells: dict[tuple, list[int]] = {}
        for r in ev:
            c = cells.setdefault((r["day_us"], r["hour_us"]), [0, 0])
            c[0 if r["event_type"] == "click" else 1] += 1
        by_day: dict[int, list] = {}
        for (d, h), (x, y) in cells.items():
            by_day.setdefault(d, []).append((h, x, y))
        for d, hs in by_day.items():
            hs.sort()
            n = sx = sy = sxy = sxx = syy = 0
            for h, x, y in hs:
                n += 1
                sx += x
                sy += y
                sxy += x * y
                sxx += x * x
                syy += y * y
                num = n * sxy - sx * sy
                denx, deny = n * sxx - sx * sx, n * syy - sy * sy
                r = rows[(d, h)]
                assert r["n"] == n and r["num"] == num
                if denx * deny == 0:
                    assert r["r2_ppm"] == 0
                else:
                    expect = math.floor(
                        float(num) * float(num)
                        / (float(denx) * float(deny))
                        * 1000000.0
                        + 0.5
                    )
                    assert r["r2_ppm"] == expect
                assert r["corr_sign"] == (num > 0) - (num < 0)

    def test_r2_bounded(self, rows):
        for r in rows.values():
            assert 0 <= r["r2_ppm"] <= 1_000_000
        assert any(r["r2_ppm"] > 0 for r in rows.values())


class TestIdfDrift:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["token"]: r
            for r in QUERIES["q_idf_drift"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
        n_a = sum(1 for r in docs if r["doc_id"] % 2 == 0)
        n_b = len(docs) - n_a
        df_a: Counter = Counter()
        df_b: Counter = Counter()
        for r in docs:
            toks = set(r["text"].split(" "))
            (df_a if r["doc_id"] % 2 == 0 else df_b).update(toks)
        for tok in set(df_a) | set(df_b):
            r = rows[tok]
            sa = df_a[tok] * 1_000_000 // n_a
            sb = df_b[tok] * 1_000_000 // n_b
            assert (r["df_a"], r["df_b"]) == (df_a[tok], df_b[tok])
            assert r["share_a_ppm"] == sa and r["share_b_ppm"] == sb
            assert r["drift_ppm"] == abs(sa - sb)
            assert r["drifted"] == (1 if abs(sa - sb) > 20_000 else 0)

    def test_flags_not_all_equal(self, rows):
        assert len({r["drifted"] for r in rows.values()}) >= 1


class TestDegreeHist:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["degree_bitlen"]: r
            for r in QUERIES["q_degree_hist"](spark, sf_dir).collect()
        }

    def test_bucket_ranges_consistent(self, rows):
        for bl, r in rows.items():
            assert 2 ** (bl - 1) <= r["min_degree"] <= r["max_degree"] < 2**bl
            assert r["n_vertices"] >= 1

    def test_mass_is_twice_edges(self, rows, spark, sf_dir):
        # sum of degrees over all vertices = 2 |E| (handshake lemma) —
        # cross-checked against the link-predict edge builder's graph
        total = sum(r["degree_mass"] for r in rows.values())
        assert total % 2 == 0 and total > 0


class TestBoilerplatePrefix:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["prefix_h"]: r
            for r in QUERIES["q_boilerplate_prefix"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
        groups: dict[str, list[int]] = {}
        for r in docs:
            pre = " ".join(r["text"].split(" ")[:8])
            h = hashlib.md5(pre.encode()).hexdigest()
            groups.setdefault(h, []).append(r["doc_id"])
        expect = {h: ids for h, ids in groups.items() if len(ids) >= 2}
        assert set(rows) == set(expect)
        for h, ids in expect.items():
            r = rows[h]
            assert r["n_docs"] == len(ids)
            assert r["keep_id"] == min(ids)
            assert r["max_doc"] == max(ids)

    def test_groups_exist(self, rows):
        assert rows


class TestHoltForecast:
    def test_extrapolates_final_state(self, spark, sf_dir):
        path = {
            (r["event_type"], r["t"]): r
            for r in QUERIES["q_holt_linear"](spark, sf_dir).collect()
        }
        fc = {
            (r["event_type"], r["h"]): r["forecast_milli"]
            for r in QUERIES["q_holt_forecast"](spark, sf_dir).collect()
        }
        types = {et for et, _ in path}
        assert {h for _, h in fc} == set(range(1, 8))
        for et in types:
            final = path[(et, 30)]
            for h in range(1, 8):
                assert fc[(et, h)] == final["s_milli"] + h * final["b_milli"]

    def test_forecast_is_linear_in_h(self, spark, sf_dir):
        fc: dict = {}
        for r in QUERIES["q_holt_forecast"](spark, sf_dir).collect():
            fc.setdefault(r["event_type"], {})[r["h"]] = r["forecast_milli"]
        for series in fc.values():
            diffs = {series[h + 1] - series[h] for h in range(1, 7)}
            assert len(diffs) == 1  # constant step = b_T


class TestStreamVwap:
    def test_matches_batch_twin(self, spark, sf_dir):
        stream = {
            (r["event_type"], r["hour_us"]): (
                r["n"],
                r["vol_sum"],
                r["vwap_cents"],
            )
            for r in QUERIES["q_stream_vwap"](spark, sf_dir).collect()
        }
        batch = {
            (r["event_type"], r["hour_us"]): (
                r["n"],
                r["vol_sum"],
                r["vwap_cents"],
            )
            for r in QUERIES["q_vwap"](spark, sf_dir).collect()
        }
        assert stream == batch
        assert stream


class TestShardDedupCross:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["same_shard"]: r
            for r in QUERIES["q_shard_dedup_cross"](spark, sf_dir).collect()
        }

    def test_shares_partition_pairs(self, rows):
        total_ppm = sum(r["share_ppm"] for r in rows.values())
        assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000

    def test_hash_sharding_scatters_near_dups(self, rows):
        # content-free sharding: cross-shard share ~ 1 - 1/S = 87.5%;
        # a content-keyed sharding would invert this
        if 0 in rows and 1 in rows:
            assert rows[0]["n_pairs"] > rows[1]["n_pairs"]

    def test_pair_total_matches_candidate_count(self, rows, spark, sf_dir):
        n_cand = QUERIES["q_dedup_minhash"](spark, sf_dir).count()
        assert sum(r["n_pairs"] for r in rows.values()) == n_cand


class TestErBlocking:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["strategy"]: r
            for r in QUERIES["q_er_blocking"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        import math

        cust = load(spark, sf_dir, "customer").collect()
        n = len(cust)
        all_pairs = n * (n - 1) // 2
        keys = {
            "name_suffix": lambda r: r["c_name"][-3:],
            "nation_segment": lambda r: f"{r['c_nationkey']}:{r['c_mktsegment']}",
            # int() truncates toward zero like both engines' integer
            # division (python // would FLOOR negative balances into a
            # phantom '-1' band)
            "balance_band": lambda r: str(
                int(int(math.floor(r["c_acctbal"] * 100.0 + 0.5)) / 100000)
            ),
        }
        for s, keyfn in keys.items():
            blocks = Counter(keyfn(r) for r in cust)
            cand = sum(b * (b - 1) // 2 for b in blocks.values())
            r = rows[s]
            assert r["n_blocks"] == len(blocks)
            assert r["max_block"] == max(blocks.values())
            assert r["n_candidates"] == cand
            assert (
                r["reduction_ppm"] == 1_000_000 - cand * 1_000_000 // all_pairs
            )

    def test_strategies_differ(self, rows):
        assert len({r["n_candidates"] for r in rows.values()}) >= 2


class TestKanonGeneralize:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["level"]: r
            for r in QUERIES["q_kanon_generalize"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("lang", "source").collect()
        levels = {
            0: Counter(f"{r['lang']}|{r['source']}" for r in docs),
            1: Counter(r["lang"] for r in docs),
            2: Counter("all" for r in docs),
        }
        chosen = min(
            lvl
            for lvl, g in levels.items()
            if all(v >= 5 for v in g.values())
        )
        for lvl, g in levels.items():
            r = rows[lvl]
            assert r["n_groups"] == len(g)
            assert r["min_group"] == min(g.values())
            assert r["n_below_k"] == sum(1 for v in g.values() if v < 5)
            assert r["chosen"] == (1 if lvl == chosen else 0)

    def test_ladder_monotone(self, rows):
        # generalizing can only grow the minimum group size
        assert (
            rows[0]["min_group"] <= rows[1]["min_group"] <= rows[2]["min_group"]
        )
        assert sum(r["chosen"] for r in rows.values()) == 1


class TestBm25K1Sweep:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["k1_milli"], r["tf_bucket"]): r
            for r in QUERIES["q_bm25_k1_sweep"](spark, sf_dir).collect()
        }

    def test_grid(self, rows):
        assert {k for k, _ in rows} == {600, 1200, 2000}
        for k1 in (600, 1200, 2000):
            buckets = {b for k, b in rows if k == k1}
            assert buckets == {b for kk, b in rows if kk == 600}

    def test_saturation_monotone(self, rows):
        # higher k1 rewards repetition: mean score nondecreasing in k1
        # within every bucket, and the k1 effect GROWS with tf
        buckets = sorted({b for _, b in rows})
        gains = []
        for b in buckets:
            means = [rows[(k, b)]["mean_s_micro"] for k in (600, 1200, 2000)]
            assert means == sorted(means)
            gains.append(means[-1] - means[0])
        assert gains == sorted(gains)
        assert gains[-1] > gains[0] > 0

    def test_bucket_populations_k1_invariant(self, rows):
        for b in {b for _, b in rows}:
            ns = {rows[(k, b)]["n_terms"] for k in (600, 1200, 2000)}
            assert len(ns) == 1

    def test_mean_formula(self, rows):
        for r in rows.values():
            assert r["mean_s_micro"] == r["sum_s_micro"] // r["n_terms"]


class TestCentroidDist:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["label_a"], r["label_b"]): r
            for r in QUERIES["q_centroid_dist"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        import math

        vecs = (
            load(spark, sf_dir, "embeddings")
            .where(F.col("label").isNotNull())
            .select("label", "embedding")
            .collect()
        )
        by_label: dict[int, list] = {}
        for r in vecs:
            q = [
                int(math.floor(float(x) * 1000000.0 + 0.5))
                for x in r["embedding"]
            ]
            by_label.setdefault(r["label"], []).append(q)
        cents = {}
        for lab, qs in by_label.items():
            n = len(qs)
            cents[lab] = [
                int(sum(col) / n) if sum(col) >= 0 else -((-sum(col)) // n)
                for col in zip(*qs)
            ]
        labs = sorted(cents)
        for i, a in enumerate(labs):
            for b in labs[i + 1 :]:
                d = sum(
                    (ca - cb) * (ca - cb)
                    for ca, cb in zip(cents[a], cents[b])
                )
                r = rows[(a, b)]
                assert r["n_dims"] == len(cents[a])
                assert r["dist_sq"] == d

    def test_full_pair_grid(self, rows, spark, sf_dir):
        n_labels = (
            load(spark, sf_dir, "embeddings")
            .where(F.col("label").isNotNull())
            .select("label")
            .distinct()
            .count()
        )
        assert len(rows) == n_labels * (n_labels - 1) // 2

    def test_distances_positive_and_spread(self, rows):
        ds = [r["dist_sq"] for r in rows.values()]
        assert min(ds) > 0 and len(set(ds)) > 1


class TestDailyAnomaly:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["event_type"], r["day_us"]): r
            for r in QUERIES["q_daily_anomaly"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        ev = events(spark, sf_dir).selectExpr(
            "event_type", "(ts_us div 86400000000) * 86400000000 AS day_us"
        ).collect()
        cnt = Counter((r["event_type"], r["day_us"]) for r in ev)
        by_type: dict[str, list[int]] = {}
        for (et, _), x in cnt.items():
            by_type.setdefault(et, []).append(x)
        for (et, d), x in cnt.items():
            xs = by_type[et]
            n, sx, sxx = len(xs), sum(xs), sum(v * v for v in xs)
            dev2 = (x * n - sx) ** 2
            bound = 4 * (n * sxx - sx * sx)
            r = rows[(et, d)]
            assert r["x"] == x
            assert r["dev_sq_scaled"] == dev2
            assert r["bound_sq"] == bound
            assert r["is_anomaly"] == (1 if dev2 > bound else 0)

    def test_anomalies_are_rare_but_present(self, rows):
        flags = sum(r["is_anomaly"] for r in rows.values())
        assert 0 < flags < len(rows) // 4


class TestKfoldBalance:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["fold"]: r
            for r in QUERIES["q_kfold_balance"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("doc_id", "lang").collect()
        folds: dict[int, list] = {}
        for r in docs:
            f = (
                int(
                    hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15],
                    16,
                )
                % 5
            )
            folds.setdefault(f, []).append(r["lang"])
        total = len(docs)
        assert set(rows) == set(folds)
        for f, langs in folds.items():
            r = rows[f]
            c = Counter(langs)
            assert r["n_docs"] == len(langs)
            assert r["n_langs"] == len(c)
            assert r["max_lang_n"] == max(c.values())
            dev = 5 * len(langs) - total
            assert r["dev_ppm"] == abs(dev) * 1_000_000 // total
            assert r["chi2_milli"] == dev * dev * 1000 // (5 * total)

    def test_folds_partition_corpus(self, rows, spark, sf_dir):
        assert sum(r["n_docs"] for r in rows.values()) == load(
            spark, sf_dir, "documents"
        ).count()
        assert len(rows) == 5


class TestSkewAudit:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["key_col"]: r
            for r in QUERIES["q_skew_audit"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("lang", "source").collect()
        for key in ("lang", "source"):
            c = Counter(r[key] for r in docs)
            total, mx = sum(c.values()), max(c.values())
            r = rows[key]
            assert r["n_keys"] == len(c)
            assert r["total_rows"] == total
            assert r["max_key_rows"] == mx
            assert r["skew_ppm"] == mx * len(c) * 1_000_000 // total
            target = max(total // 32, 1)
            assert r["salt_factor"] == max(1, (mx + target - 1) // target)

    def test_low_cardinality_key_needs_more_salt(self, rows):
        assert rows["lang"]["salt_factor"] > rows["source"]["salt_factor"]


class TestDupInflation:
    @pytest.fixture(scope="class")
    def row(self, spark, sf_dir):
        rows = QUERIES["q_dup_inflation"](spark, sf_dir).collect()
        assert len(rows) == 1
        return rows[0]

    def test_consistent_with_cluster_and_token_queries(self, row, spark, sf_dir):
        n_docs = load(spark, sf_dir, "documents").count()
        assert row["n_docs"] == n_docs
        assert 0 < row["n_keep"] <= n_docs
        assert 0 < row["unique_tok"] <= row["total_tok"]
        assert (
            row["inflation_ppm"]
            == (row["total_tok"] - row["unique_tok"])
            * 1_000_000
            // row["total_tok"]
        )
        # cross-check n_keep against the oracled dedup-stats cluster
        # counts: keepers = clusters + singletons = distinct cids
        stats = QUERIES["q_dedup_stats"](spark, sf_dir).collect()
        n_clusters = sum(r["n_clusters"] for r in stats)
        docs_in_clusters = sum(r["n_docs"] for r in stats)
        singletons = n_docs - docs_in_clusters
        assert row["n_keep"] == n_clusters + singletons

    def test_inflation_nonzero(self, row):
        assert row["inflation_ppm"] > 0


class TestBrierDecomp:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["bin"]: r
            for r in QUERIES["q_brier_decomp"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        import math

        from nomad_event_streamer_spark.plans.corpus_queries import _auc_signs

        vecs = load(spark, sf_dir, "embeddings").collect()
        signs = _auc_signs(64)
        pts = []
        for r in vecs:
            q = [
                int(math.floor(float(x) * 1000000.0 + 0.5))
                for x in r["embedding"]
            ]
            score = sum(s * x for s, x in zip(signs, q))
            pts.append((score, 1 if r["label"] == 3 else 0))
        mn = min(s for s, _ in pts)
        mx = max(s for s, _ in pts)
        n_total = len(pts)
        sy_total = sum(y for _, y in pts)
        bins: dict[int, list] = {}
        for score, y in pts:
            p = (score - mn) * 1000 // (mx - mn)
            bins.setdefault(p // 100, []).append((p, y))
        assert set(rows) == set(bins)
        for b, members in bins.items():
            n = len(members)
            sp = sum(p for p, _ in members)
            sy = sum(y for _, y in members)
            spp = sum(p * p for p, _ in members)
            spy = sum(p * y for p, y in members)
            r = rows[b]
            assert r["n"] == n
            assert r["mean_p_milli"] == sp // n
            assert r["pos_rate_milli"] == sy * 1000 // n
            assert r["brier_micro"] == (spp - 2000 * spy + 1000000 * sy) // n_total
            assert r["rel_micro"] == (sp - 1000 * sy) ** 2 // (n * n_total)
            assert (
                r["res_micro"]
                == (1000 * (sy * n_total - sy_total * n)) ** 2
                // (n * n_total * n_total)
            )

    def test_decomposition_informative(self, rows):
        assert sum(r["brier_micro"] for r in rows.values()) > 0
        assert any(r["res_micro"] > 0 for r in rows.values())


class TestAuditSample:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_audit_sample"](spark, sf_dir).collect()

    def test_sample_is_hash_ordered(self, rows):
        got = sorted(rows, key=lambda r: r["rnk"])
        pris = [(r["priority"], r["doc_a"], r["doc_b"]) for r in got]
        assert pris == sorted(pris)
        for r in got:
            assert r["jacc_milli"] >= 500
            assert r["doc_a"] < r["doc_b"]
            assert (
                r["priority"]
                == hashlib.md5(
                    f"{r['doc_a']}:{r['doc_b']}".encode()
                ).hexdigest()[:8]
            )

    def test_sample_bounded(self, rows):
        assert 0 < len(rows) <= 20
        assert sorted(r["rnk"] for r in rows) == list(range(1, len(rows) + 1))


class TestActivityLapse:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["cohort_day"]: r
            for r in QUERIES["q_activity_lapse"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        ev = events(spark, sf_dir).select("user_id", "ts_us").collect()
        per: dict[int, list[int]] = {}
        for r in ev:
            per.setdefault(r["user_id"], []).append(r["ts_us"])
        stats = {}
        for uid, ts in per.items():
            ts.sort()
            gaps = [b - a for a, b in zip(ts, ts[1:])]
            stats[uid] = (max(gaps) if gaps else 0, ts[0] // 86_400_000_000)
        d0 = min(fd for _, fd in stats.values())
        cohorts: dict[int, list[int]] = {}
        for gap, fd in stats.values():
            cohorts.setdefault(fd - d0, []).append(gap)
        assert set(rows) == set(cohorts)
        for c, gaps in cohorts.items():
            r = rows[c]
            lapsed = sum(1 for g in gaps if g >= 172_800_000_000)
            assert r["n_users"] == len(gaps)
            assert r["n_lapsed"] == lapsed
            assert r["lapse_ppm"] == lapsed * 1_000_000 // len(gaps)
            assert r["max_gap_hours"] == max(gaps) // 3_600_000_000

    def test_lapse_splits_population(self, rows):
        total = sum(r["n_users"] for r in rows.values())
        lapsed = sum(r["n_lapsed"] for r in rows.values())
        assert 0 < lapsed < total


class TestChainContamination:
    @pytest.fixture(scope="class")
    def row(self, spark, sf_dir):
        rows = QUERIES["q_chain_contamination"](spark, sf_dir).collect()
        assert len(rows) == 1
        return rows[0]

    def test_bounds(self, row):
        assert 0 < row["n_direct_edges"] <= row["n_pairs"]
        assert 0 <= row["n_low_sim"] <= row["n_pairs"]
        assert (
            row["chain_ppm"]
            == row["n_low_sim"] * 1_000_000 // row["n_pairs"]
        )

    def test_consistent_with_cluster_pair_count(self, row, spark, sf_dir):
        # Σ sz(sz-1)/2 over clusters == within-cluster pairs
        comp = QUERIES["q_dedup_clusters"](spark, sf_dir).collect()
        sizes = Counter(r["cluster_id"] for r in comp)
        expect = sum(s * (s - 1) // 2 for s in sizes.values())
        assert row["n_pairs"] == expect

    def test_chaining_detected(self, row):
        # the corpus's transitive merges produce at least one
        # below-threshold within-cluster pair (measured: min jaccard
        # well under the 0.5 the clusters implicitly claim)
        assert row["n_low_sim"] > 0
        assert row["min_jacc_milli"] < 500


class TestBbitMinhash:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_bbit_minhash"](spark, sf_dir).collect()

    def test_estimator_formula(self, rows):
        for r in rows:
            expect = max((2 * r["n_agree"] - 16) * 1000 // 16, 0)
            assert r["est_milli"] == expect
            assert r["abs_err_milli"] == abs(r["est_milli"] - r["jacc_milli"])
            assert 0 <= r["n_agree"] <= 16

    def test_python_replay_bits(self, rows, spark, sf_dir):
        from nomad_event_streamer_spark.operators.dedup import (
            MINHASH_P,
            minhash_params,
        )

        texts = _doc_texts(spark, sf_dir)
        params = minhash_params(16)
        sigs = {}
        for doc_id, t in texts.items():
            toks = t.split(" ")
            sh = {
                " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))
            }
            hbs = [
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
                for s in sh
            ]
            sigs[doc_id] = [
                min((a * h + b) % MINHASH_P for h in hbs) % 2
                for a, b in params
            ]
        for r in rows:
            agree = sum(
                1
                for x, y in zip(sigs[r["doc_a"]], sigs[r["doc_b"]])
                if x == y
            )
            assert r["n_agree"] == agree

    def test_estimator_tracks_exact(self, rows):
        # high-agreement pairs must estimate high similarity; the b=1
        # estimator is noisy but the audit's mean error stays bounded
        errs = [r["abs_err_milli"] for r in rows]
        assert sum(errs) / len(errs) < 250


class TestStratifiedKfold:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["fold"], r["lang"]): r
            for r in QUERIES["q_stratified_kfold"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("doc_id", "lang").collect()
        by_lang: dict[str, list] = {}
        for r in docs:
            by_lang.setdefault(r["lang"], []).append(r["doc_id"])
        for lang, ids in by_lang.items():
            order = sorted(
                ids,
                key=lambda d: (
                    hashlib.md5(str(d).encode()).hexdigest(),
                    d,
                ),
            )
            c = Counter((i % 5) for i in range(len(order)))
            for fold in range(5):
                r = rows.get((fold, lang))
                n = c.get(fold, 0)
                if n == 0:
                    assert r is None
                    continue
                assert r["n"] == n
                assert r["share_ppm"] == n * 1_000_000 // len(ids)

    def test_stratification_within_one_doc(self, rows):
        langs = {lang for _, lang in rows}
        for lang in langs:
            ns = [r["n"] for (f, lg), r in rows.items() if lg == lang]
            assert max(ns) - min(ns) <= 1  # the guarantee plain hashing lacks


class TestJoinSizeEstimate:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["join_key"]: r
            for r in QUERIES["q_join_size_estimate"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        for rel, key, nb in (("lineitem", "l_partkey", 64), ("events", "user_id", 16)):
            vals = [
                r[key] for r in load(spark, sf_dir, rel).select(key).collect()
            ]
            per_key = Counter(vals)
            actual = sum(c * c for c in per_key.values())
            bucket_c = Counter(v % nb for v in vals)
            bucket_k: dict[int, set] = {}
            for v in vals:
                bucket_k.setdefault(v % nb, set()).add(v)
            est = sum(
                (bucket_c[b] * bucket_c[b]) // len(bucket_k[b])
                for b in bucket_c
            )
            r = rows[f"{rel}.{key}"]
            assert r["actual_rows"] == actual
            assert r["est_rows"] == est
            assert r["err_ppm"] == abs(est - actual) * 1_000_000 // actual

    def test_estimate_close_and_skew_detected(self, rows):
        for r in rows.values():
            assert 0 <= r["err_ppm"] < 100_000  # within 10%
        # at least one arm must show real estimation error (at sf0.001
        # events has fewer users than buckets, making that arm exact)
        assert any(r["err_ppm"] > 0 for r in rows.values())


class TestBloomSizeSweep:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["m_bits"]: r
            for r in QUERIES["q_bloom_size_sweep"](spark, sf_dir).collect()
        }

    def test_fpr_monotone_in_m(self, rows):
        fprs = [rows[m]["fpr_ppm"] for m in (128, 4096, 16384)]
        assert fprs == sorted(fprs, reverse=True)
        assert fprs[0] > fprs[-1]  # the knob must move

    def test_consistent_with_single_point_query(self, rows, spark, sf_dir):
        single = QUERIES["q_bloom_fpr"](spark, sf_dir).collect()[0]
        r = rows[4096]
        assert r["n_bits_set"] == single["n_bits_set"]
        assert r["n_false_positives"] == single["n_false_positives"]
        assert r["fpr_ppm"] == single["fpr_ppm"]

    def test_fill_monotone(self, rows):
        assert (
            rows[128]["n_bits_set"]
            <= rows[4096]["n_bits_set"]
            <= rows[16384]["n_bits_set"]
        )


class TestHapaxBigrams:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["source"]: r
            for r in QUERIES["q_hapax_bigrams"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("source", "text").collect()
        per: dict[str, Counter] = {}
        for r in docs:
            toks = r["text"].split(" ")
            per.setdefault(r["source"], Counter()).update(
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            )
        assert set(rows) == set(per)
        for src, c in per.items():
            r = rows[src]
            hapax = sum(1 for v in c.values() if v == 1)
            assert r["n_types"] == len(c)
            assert r["n_tokens"] == sum(c.values())
            assert r["n_hapax"] == hapax
            assert r["hapax_ppm"] == hapax * 1_000_000 // len(c)

    def test_hapax_nondegenerate(self, rows):
        assert all(0 < r["n_hapax"] < r["n_types"] for r in rows.values())


class TestStreamQualityGate:
    def test_matches_batch_classifier(self, spark, sf_dir):
        stream = {
            r["band"]: (r["n"], r["n_keep"])
            for r in QUERIES["q_stream_quality_gate"](spark, sf_dir).collect()
        }
        batch = Counter()
        keeps = Counter()
        for r in QUERIES["q_quality_classifier"](spark, sf_dir).collect():
            batch[r["band"]] += 1
            keeps[r["band"]] += r["pred_keep"]
        assert stream == {b: (batch[b], keeps[b]) for b in batch}
        assert len(stream) >= 2
