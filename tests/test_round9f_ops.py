"""Round-9f referees: Kaplan-Meier against a pure-python lifetable and
Slope One against a pure-python deviation model."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from nomad_event_streamer_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _events_pd() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    dt = str(ev["ts"].dtype)
    if dt == "datetime64[us]":
        ev["ts_us"] = ev["ts"].astype("int64")
    else:
        ev["ts_us"] = (
            ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
        )
    return ev


class TestSurvivalKm:
    def test_matches_pure_python_lifetable(self, spark):
        ev = _events_pd()
        h = 48
        obs = []
        for _, g in ev.groupby("user_id"):
            first = int(g["ts_us"].min())
            p = g[g["event_type"] == "purchase"]["ts_us"]
            pt = int(p.min()) if len(p) else None
            if pt is not None and pt - first < h * 3_600_000_000:
                obs.append(((pt - first) // 3_600_000_000, 1))
            else:
                obs.append((h, 0))
        s = 1_000_000
        expected = []
        for t in range(h):
            n_risk = sum(1 for o, _ in obs if o >= t)
            d = sum(1 for o, e in obs if e == 1 and o == t)
            if n_risk > 0:
                s = s * (n_risk - d) // n_risk
            if d > 0:
                expected.append((t, n_risk, d, s))
        got = [
            (r["t_hours"], r["n_risk"], r["n_events"], r["s_ppm"])
            for r in sorted(
                QUERIES["q_survival_km"](spark, SF).collect(),
                key=lambda r: r["t_hours"],
            )
        ]
        assert got == expected

    def test_censoring_respected(self, spark):
        """Survival must stay strictly positive while censored users
        remain at risk, and be non-increasing."""
        rows = sorted(
            QUERIES["q_survival_km"](spark, SF).collect(),
            key=lambda r: r["t_hours"],
        )
        assert rows, "no event steps"
        s_vals = [r["s_ppm"] for r in rows]
        assert s_vals == sorted(s_vals, reverse=True)
        assert all(0 <= s <= 1_000_000 for s in s_vals)


class TestSlopeOne:
    def test_matches_pure_python_model(self, spark):
        ev = _events_pd()
        ev["c"] = (ev["value"] * 100.0 + 0.5).apply(lambda x: int(x // 1))
        r: dict[tuple, int] = {}
        agg: dict[tuple, list] = defaultdict(lambda: [0, 0])
        for u, t, c in zip(ev["user_id"], ev["event_type"], ev["c"]):
            a = agg[(int(u), t)]
            a[0] += int(c)
            a[1] += 1
        for k, (sm, n) in agg.items():
            r[k] = sm // n
        by_user: dict[int, dict] = defaultdict(dict)
        for (u, t), rc in r.items():
            by_user[u][t] = rc
        dev: dict[tuple, list] = defaultdict(lambda: [0, 0])
        for u, tr in by_user.items():
            for ta in tr:
                for tb in tr:
                    if ta != tb:
                        d = dev[(ta, tb)]
                        d[0] += tr[ta] - tr[tb]
                        d[1] += 1
        expected = {}
        for u, tr in by_user.items():
            for t in tr:
                num = den = 0
                for tb in tr:
                    if tb == t or (t, tb) not in dev:
                        continue
                    dnum, n = dev[(t, tb)]
                    num += dnum + n * tr[tb]
                    den += n
                if den > 0:
                    expected[(u, t)] = (
                        tr[t],
                        num,
                        den,
                        (1000 * num) // den,  # python // floors
                    )
        got = {
            (r_["user_id"], r_["event_type"]): (
                r_["actual_cents"],
                r_["pred_num"],
                r_["pred_den"],
                r_["pred_milli"],
            )
            for r_ in QUERIES["q_slope_one"](spark, SF).collect()
        }
        assert got == expected

    def test_floored_division_identity(self, spark):
        """pred_milli must be the FLOOR of 1000·num/den for every row —
        including negative numerators, where Spark's truncating `div`
        would differ (the explicit pmod form exists exactly for this);
        and den > 0 on every emitted row.  (No beats-the-mean quality
        assertion on purpose: the fixture's values are per-event noise
        with no collaborative structure, so Slope One legitimately
        cannot beat the global mean here — the referee above pins the
        MODEL, not the data.)"""
        rows = QUERIES["q_slope_one"](spark, SF).collect()
        assert rows
        for r in rows:
            assert r["pred_den"] > 0
            # python // floors — the exact integer identity
            assert (
                r["pred_milli"] == (1000 * r["pred_num"]) // r["pred_den"]
            )


class TestTwap:
    def test_matches_pure_python_locf(self, spark):
        ev = _events_pd().sort_values(["user_id", "ts_us", "event_id"])
        ev["c"] = (ev["value"] * 100.0 + 0.5).apply(lambda x: int(x // 1))
        expected = {}
        for u, g in ev.groupby("user_id"):
            ts = [int(t) for t in g["ts_us"]]
            cs = [int(c) for c in g["c"]]
            n = sp = cw = 0
            for i in range(len(ts) - 1):
                dt = ts[i + 1] - ts[i]
                if dt > 0:
                    n += 1
                    sp += dt
                    cw += cs[i] * dt
            if n:
                expected[int(u)] = (n, sp, cw, cw // sp)
        got = {
            r["user_id"]: (
                r["n_intervals"],
                r["span_us"],
                r["cw_sum"],
                r["twap_cents"],
            )
            for r in QUERIES["q_twap"](spark, SF).collect()
        }
        assert got == expected


class TestSpatialNnJoin:
    def test_matches_brute_force(self, spark):
        """The grid join must equal the BRUTE-FORCE radius-bounded NN —
        the exactness-by-construction claim (cell width = r ⇒ 3×3
        neighborhood suffices) checked against a referee that never
        builds the grid."""
        docs = pd.read_parquet(f"{SF}/embeddings.parquet")
        pts = {
            int(v): (
                int((float(e[0]) * 1000.0 + 0.5) // 1),
                int((float(e[1]) * 1000.0 + 0.5) // 1),
            )
            for v, e in zip(docs["vec_id"], docs["embedding"])
        }
        r2 = 100 * 100
        expected = {}
        for pid, (px, py) in pts.items():
            best = None
            for qid, (qx, qy) in pts.items():
                if qid == pid:
                    continue
                d2 = (px - qx) ** 2 + (py - qy) ** 2
                if d2 <= r2 and (best is None or (d2, qid) < best):
                    best = (d2, qid)
            expected[pid] = (best[1], best[0]) if best else (-1, -1)
        got = {
            r["vec_id"]: (r["nn_id"], r["nn_dist2"])
            for r in QUERIES["q_spatial_nn_join"](spark, SF).collect()
        }
        assert got == expected

    def test_symmetric_distance_and_radius(self, spark):
        rows = {
            r["vec_id"]: (r["nn_id"], r["nn_dist2"])
            for r in QUERIES["q_spatial_nn_join"](spark, SF).collect()
        }
        matched = sum(1 for nn, _ in rows.values() if nn != -1)
        assert matched > 0, "radius too small for the fixture"
        assert any(nn == -1 for nn, _ in rows.values()) or matched == len(
            rows
        )
        for vid, (nn, d2) in rows.items():
            if nn != -1:
                assert 0 <= d2 <= 100 * 100
                assert nn != vid


class TestBellmanFord:
    # the 170-shipment edge threshold yields a graph only at sf0.01+
    SF_BF = "/root/testdata/sf0.01"

    def test_matches_python_dijkstra(self, spark):
        """Independent referee: edges recomputed via DuckDB's join
        engine (independent of Spark), then DIJKSTRA in pure python —
        a different shortest-path algorithm entirely, so a relaxation
        bug in the unrolled rounds can't correlate."""
        import heapq

        import duckdb

        from nomad_event_streamer_spark.plans.graph_queries import (
            _BF_EDGES_SQL,
        )

        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem".split()
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{self.SF_BF}/{t}.parquet')"
            )
        edges = con.execute(_BF_EDGES_SQL).fetchall()
        adj: dict[int, list] = {}
        nodes = set()
        for s, d, w in edges:
            adj.setdefault(int(s), []).append((int(d), int(w)))
            nodes.add(int(s))
            nodes.add(int(d))
        src = min(nodes)
        dist = {v: None for v in nodes}
        dist[src] = 0
        pq = [(0, src)]
        while pq:
            du, u = heapq.heappop(pq)
            if dist[u] is not None and du > dist[u]:
                continue
            for v, w in adj.get(u, []):
                nd = du + w
                if dist[v] is None or nd < dist[v]:
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        expected = {
            v: (d if d is not None else -1) for v, d in dist.items()
        }
        got = {
            r["nationkey"]: r["latency_days"]
            for r in QUERIES["q_bellman_ford"](spark, self.SF_BF).collect()
        }
        assert got == expected

    def test_triangle_inequality_on_result(self, spark):
        """Shortest-path sanity: for every edge (u,v,w) with both ends
        reached, dist(v) <= dist(u) + w."""
        import duckdb

        from nomad_event_streamer_spark.plans.graph_queries import (
            _BF_EDGES_SQL,
        )

        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem".split()
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{self.SF_BF}/{t}.parquet')"
            )
        edges = con.execute(_BF_EDGES_SQL).fetchall()
        got = {
            r["nationkey"]: r["latency_days"]
            for r in QUERIES["q_bellman_ford"](spark, self.SF_BF).collect()
        }
        for s, d, w in edges:
            ds, dd = got.get(int(s), -1), got.get(int(d), -1)
            if ds != -1:
                assert dd != -1 and dd <= ds + int(w)


class TestImageHisteq:
    def test_matches_pure_python_on_real_bytes(self, spark):
        """Referee decodes the SAME real PGM bytes with its own tiny
        parser (header split + frombuffer) and equalizes with the
        textbook formula — no shared code with operators/multimodal."""
        import numpy as np

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        expected = {}
        for doc_id in docs["doc_id"]:
            d = int(doc_id)
            if d % 2 == 0:
                continue
            w, h = 9 + d % 8, 6 + d % 5
            n = w * h
            j = np.arange(n, dtype=np.int64)
            flat = (d * 73 + j * 151 + 11) % 256
            vals, counts = np.unique(flat, return_counts=True)
            cf = np.cumsum(counts)
            cmin = int(cf[0])
            mapped = {
                int(v): int((int(c) - cmin) * 255 // (n - cmin))
                for v, c in zip(vals, cf)
            }
            eq = np.array([mapped[int(v)] for v in flat])
            header = f"P5\n{w} {h}\n255\n"
            expected[d] = (
                w,
                h,
                len(header) + n,
                int(flat.sum()),
                int(eq.sum()),
                len(vals),
                len(set(mapped.values())),
            )
        got = {
            r["doc_id"]: (
                r["width"],
                r["height"],
                r["out_bytes"],
                r["sum_before"],
                r["sum_after"],
                r["ndv_before"],
                r["ndv_after"],
            )
            for r in QUERIES["q_image_histeq"](spark, SF).collect()
        }
        assert got == expected

    def test_equalization_stretches_range(self, spark):
        """Equalized pixel mass should move toward the mid-gray target
        (mean ~127.5 for a full equalization) and ndv must not grow."""
        rows = QUERIES["q_image_histeq"](spark, SF).collect()
        for r in rows:
            n = r["width"] * r["height"]
            assert r["ndv_after"] <= r["ndv_before"]
            mean_after = r["sum_after"] / n
            assert 80 <= mean_after <= 180, (r["doc_id"], mean_after)


class TestCuped:
    def test_matches_pure_python_moments(self, spark):
        ev = _events_pd()
        ev["c"] = (ev["value"] * 100.0 + 0.5).apply(lambda x: int(x // 1))
        mid = (int(ev["ts_us"].min()) + int(ev["ts_us"].max())) // 2
        users: dict[int, list] = {}
        for u, t, c in zip(ev["user_id"], ev["ts_us"], ev["c"]):
            pre, post = users.setdefault(int(u), [0, 0])
            if int(t) < mid:
                users[int(u)][0] += int(c)
            else:
                users[int(u)][1] += int(c)
        n = len(users)
        sx = float(sum(p for p, _ in users.values()))
        sy = float(sum(q for _, q in users.values()))
        sxx = float(sum(p * p for p, _ in users.values()))
        sxy = float(sum(p * q for p, q in users.values()))
        theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        expected = {}
        for variant in (0, 1):
            vs = [pq for u, pq in users.items() if u % 2 == variant]
            n_v = len(vs)
            sum_pre = sum(p for p, _ in vs)
            sum_post = sum(q for _, q in vs)
            mean_post = float(sum_post) / float(n_v)
            mean_adj = mean_post - theta * (
                float(sum_pre) / float(n_v) - sx / float(n)
            )
            expected[variant] = (
                n_v,
                sum_pre,
                sum_post,
                mean_post,
                mean_adj,
            )
        got = {
            r["variant"]: (
                r["n_v"],
                r["sum_pre"],
                r["sum_post"],
                r["mean_post"],
                r["mean_adj"],
            )
            for r in QUERIES["q_cuped"](spark, SF).collect()
        }
        # integer parts exact; float parts are the same fixed IEEE tree
        for k in expected:
            assert got[k][:3] == expected[k][:3]
            assert abs(got[k][3] - expected[k][3]) < 1e-9
            assert abs(got[k][4] - expected[k][4]) < 1e-9

    def test_adjustment_centers_on_global_mean(self, spark):
        """CUPED identity: the user-weighted average of the variant
        adjustments is zero — Σ n_v·(mean_adj − mean_post) = −θ·Σ n_v·
        (mean_pre_v − mean_pre) = 0, so CUPED shifts variants, never
        the global average."""
        rows = QUERIES["q_cuped"](spark, SF).collect()
        shift = sum(
            r["n_v"] * (r["mean_adj"] - r["mean_post"]) for r in rows
        )
        total = sum(r["n_v"] for r in rows)
        assert abs(shift / total) < 1e-6
