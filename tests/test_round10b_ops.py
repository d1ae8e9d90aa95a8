"""Round-10 batch-2 operator referees: Lloyd k-means (pure-python
fixpoint replay), Flesch-Kincaid profile (re-based recount), log-line
roundtrip (python printf + regex referee), diff-in-diff (pandas cells),
and the SPRT boundary walk (sorted sequential replay — also pins the
distributed day-bucket prefix-sum against a plain cumsum)."""

from __future__ import annotations

import re
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
        ev["ts_us"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    return ev


class TestKmeansLloyd:
    def test_matches_pure_python_lloyd(self, spark):
        emb = pd.read_parquet(f"{SF}/embeddings.parquet")
        vecs = {
            int(v): [int((float(x) * 1000.0 + 0.5) // 1) for x in e]
            for v, e in zip(emb["vec_id"], emb["embedding"])
        }
        cent = {cid: vecs[cid][:] for cid in range(4)}

        def assign(c):
            out = {}
            for vid, v in vecs.items():
                best = min(
                    (sum((a - b) * (a - b) for a, b in zip(v, c[k])), k)
                    for k in sorted(c)
                )
                out[vid] = best
            return out

        prev = cent
        for _ in range(2):
            a = assign(prev)
            sums: dict[int, list[int]] = defaultdict(lambda: [0] * 64)
            cnt: dict[int, int] = defaultdict(int)
            for vid, (_, k) in a.items():
                cnt[k] += 1
                for i, x in enumerate(vecs[vid]):
                    sums[k][i] += x
            last = prev
            # trunc-toward-zero division: Spark `div` and DuckDB `//`
            # both truncate on negatives (verified: -3465/112 -> -30 in
            # both engines); python's // floors, hence the explicit form
            prev = {
                k: [
                    s // cnt[k] if s >= 0 else -((-s) // cnt[k])
                    for s in sums[k]
                ]
                for k in cnt
            }
        shift = {
            k: sum((a - b) * (a - b) for a, b in zip(prev[k], last[k]))
            for k in prev
            if k in last
        }
        final = assign(prev)
        expected = {}
        for k in prev:
            ds = [d for (d, kk) in final.values() if kk == k]
            expected[k] = (len(ds), sum(ds), max(ds), shift[k])

        got = {
            r["cluster_id"]: (
                r["n_members"],
                r["inertia"],
                r["radius"],
                r["centroid_shift"],
            )
            for r in QUERIES["q_kmeans_lloyd"](spark, SF).collect()
        }
        assert got == expected

    def test_clusters_nonempty_and_converging(self, spark):
        rows = QUERIES["q_kmeans_lloyd"](spark, SF).collect()
        assert len(rows) == 4
        assert all(r["n_members"] > 0 for r in rows)
        # after two rounds the centroids should be moving by much less
        # than the cluster radius (convergence observable)
        assert all(r["centroid_shift"] < r["radius"] for r in rows)


class TestReadabilityFK:
    def test_matches_re_referee(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        expected = {}
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            words = re.findall(r"[a-z0-9]+", text.lower())
            syls = [
                max(len(re.findall(r"[aeiouy]+", w)), 1) for w in words
            ]
            sentences = max(len(re.findall(r"[.!?]+", text)), 1)
            w, s = len(words), sum(syls)
            fk = 0.39 * (w / sentences) + 11.8 * (s / w) - 15.59
            expected[int(doc_id)] = (
                w,
                sentences,
                s,
                sum(1 for x in syls if x == 1),
                sum(1 for x in syls if x >= 3),
                fk,
            )
        got = {
            r["doc_id"]: (
                r["words"],
                r["sentences"],
                r["syllables"],
                r["mono_words"],
                r["poly_words"],
                r["fk_grade"],
            )
            for r in QUERIES["q_readability_fk"](spark, SF).collect()
        }
        assert got == expected


class TestLogParse:
    def test_matches_python_printf_regex_referee(self, spark):
        ev = _events_pd()
        pat = re.compile(
            r'^(\S+) - (\S+) \[(\d+)\] "GET /([a-z]+)/(\d+) HTTP/1\.1" '
            r"(\d+) (\d+)$"
        )
        agg: dict[tuple, list] = defaultdict(lambda: [0, 0, set(), 0])
        for _, r in ev.iterrows():
            uid = int(r["user_id"])
            line = (
                f'10.{uid % 256}.{(uid // 256) % 256}.{uid % 100} - u{uid} '
                f"[{int(r['ts_us']) // 1_000_000}] "
                f'"GET /{r["event_type"]}/{int(r["event_id"])} HTTP/1.1" '
                f"{200 + (int(r['event_id']) % 3) * 100} "
                f"{int(r['value'] * 100.0 + 0.5)}"
            )
            m = pat.match(line)
            assert m, line
            key = (m.group(4), int(m.group(6)))
            agg[key][0] += 1
            agg[key][1] += int(m.group(7))
            agg[key][2].add(m.group(1))
        expected = {
            k: (v[0], v[1], len(v[2]), 0) for k, v in agg.items()
        }
        got = {
            (r["path_type"], r["status"]): (
                r["n"],
                r["sum_bytes"],
                r["n_ips"],
                r["n_parse_fail"],
            )
            for r in QUERIES["q_log_parse"](spark, SF).collect()
        }
        assert got == expected


class TestDiffInDiff:
    def test_matches_pandas_cells(self, spark):
        ev = _events_pd()
        ev["g"] = ev["user_id"] % 2
        ev["c"] = (ev["value"] * 100.0 + 0.5).apply(int)
        mid = (int(ev["ts_us"].min()) + int(ev["ts_us"].max())) // 2
        ev["p"] = (ev["ts_us"] >= mid).astype(int)
        cells = {
            (g, p): (len(grp), int(grp["c"].sum()))
            for (g, p), grp in ev.groupby(["g", "p"])
        }
        did = (
            cells[(1, 1)][1] / cells[(1, 1)][0]
            - cells[(1, 0)][1] / cells[(1, 0)][0]
        ) - (
            cells[(0, 1)][1] / cells[(0, 1)][0]
            - cells[(0, 0)][1] / cells[(0, 0)][0]
        )
        [row] = QUERIES["q_diff_in_diff"](spark, SF).collect()
        assert (row["n00"], row["s00"]) == cells[(0, 0)]
        assert (row["n11"], row["s11"]) == cells[(1, 1)]
        assert row["did_cents"] == did


class TestSprtBoundary:
    def test_matches_sequential_replay(self, spark):
        ev = _events_pd().sort_values(["ts_us", "event_id"])
        expected = {}
        for variant in (0, 1):
            sub = ev[ev["user_id"] % 2 == variant]
            cum = 0
            mx, mn = -(1 << 62), 1 << 62
            up = down = 0
            final = 0
            for rnk, (_, r) in enumerate(sub.iterrows(), start=1):
                w = 9 if r["event_type"] == "purchase" else -1
                cum += w
                final += w
                mx, mn = max(mx, cum), min(mn, cum)
                if up == 0 and cum >= 200:
                    up = rnk
                if down == 0 and cum <= -200:
                    down = rnk
            expected[variant] = (len(sub), final, mx, mn, up, down)
        got = {
            r["variant"]: (
                r["n"],
                r["final_llr"],
                r["max_llr"],
                r["min_llr"],
                r["first_cross_up"],
                r["first_cross_down"],
            )
            for r in QUERIES["q_sprt_boundary"](spark, SF).collect()
        }
        assert got == expected

    def test_never_crossed_channel_is_exercised(self, spark):
        rows = QUERIES["q_sprt_boundary"](spark, SF).collect()
        # the fixture drifts upward (+9 on 1-in-5 purchases), so the
        # upper boundary is crossed and the lower never is — both
        # channels (rank and the 0 = never sentinel) are pinned
        assert all(r["first_cross_up"] > 0 for r in rows)
        assert all(r["first_cross_down"] == 0 for r in rows)


class TestViterbi2State:
    def test_matches_pure_python_viterbi(self, spark):
        ev = _events_pd()
        expected = {}
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values(["ts_us", "event_id"]).head(16)
            v0 = v1 = es = 0
            for _, r in g.iterrows():
                x = 1 if r["event_type"] in ("purchase", "signup") else 0
                v0, v1 = (
                    max(v0, v1 - 7) + (-12 if x == 1 else 0),
                    max(v1, v0 - 7) + (-12 if x == 0 else 0),
                )
                if v1 > v0:
                    es += 1
            expected[int(uid)] = (
                len(g),
                v0,
                v1,
                max(v0, v1),
                1 if v1 > v0 else 0,
                es,
            )
        got = {
            r["user_id"]: (
                r["n_steps"],
                r["v_browse"],
                r["v_engage"],
                r["best_score"],
                r["best_state"],
                r["engaged_steps"],
            )
            for r in QUERIES["q_viterbi_2state"](spark, SF).collect()
        }
        assert got == expected

    def test_engaged_channel_exercised(self, spark):
        rows = QUERIES["q_viterbi_2state"](spark, SF).collect()
        # mid-walk engaged dominance occurs even when the final state is
        # browsing — the es counter pins the interior of the recurrence
        assert any(r["engaged_steps"] > 0 for r in rows)
        assert all(0 <= r["engaged_steps"] <= r["n_steps"] for r in rows)


class TestIsotonicPAV:
    def test_matches_textbook_pav_stack(self, spark):
        """The minimax identity max_{j<=i} min_{k>=j} avg(j..k) must
        equal the sequential pool-adjacent-violators fit — the classic
        L2 isotonic equivalence, checked against a stack-based PAV."""
        ev = pd.read_parquet(f"{SF}/events.parquet")
        b = ((ev["value"] * 100.0 + 0.5).astype(int) // 1000).clip(upper=19)
        y = (ev["event_type"] == "purchase").astype(int)
        g = (
            pd.DataFrame({"b": b, "y": y})
            .groupby("b")
            .agg(n=("y", "size"), c=("y", "sum"))
            .reset_index()
            .sort_values("b")
        )
        stack: list[list[int]] = []
        for r in g.itertuples():
            stack.append([int(r.n), int(r.c), 1])
            while (
                len(stack) > 1
                and stack[-2][1] * stack[-1][0]
                >= stack[-1][1] * stack[-2][0]
            ):
                n2, c2, k2 = stack.pop()
                stack[-1][0] += n2
                stack[-1][1] += c2
                stack[-1][2] += k2
        fitted: list[float] = []
        for n, c, k in stack:
            fitted.extend([c / n] * k)
        expected = {
            int(r.b): (int(r.n), int(r.c), fitted[i])
            for i, r in enumerate(g.itertuples())
        }
        got = {
            r["bucket"]: (r["n"], r["conv"], r["iso_rate"])
            for r in QUERIES["q_isotonic_pav"](spark, SF).collect()
        }
        assert got == expected

    def test_fit_is_monotone_nondecreasing(self, spark):
        rows = sorted(
            QUERIES["q_isotonic_pav"](spark, SF).collect(),
            key=lambda r: r["bucket"],
        )
        rates = [r["iso_rate"] for r in rows]
        assert all(a <= b for a, b in zip(rates, rates[1:]))
        # and the fit genuinely pools (at least one violation existed)
        raw = [r["conv"] / r["n"] for r in rows]
        assert raw != rates


class TestMannWhitneyKS:
    def test_matches_pure_python_referee(self, spark):
        from itertools import groupby

        ev = pd.read_parquet(f"{SF}/events.parquet")
        c = (ev["value"] * 100.0 + 0.5).astype(int)
        v = ev["user_id"] % 2
        pooled = sorted(zip(c, v))
        n0 = int((v == 0).sum())
        n1 = int((v == 1).sum())
        r2_0 = tie = 0
        i = 1
        for _, grp in groupby(pooled, key=lambda t: t[0]):
            grp = list(grp)
            k = len(grp)
            r2_0 += (2 * i + k - 1) * sum(1 for _, vv in grp if vv == 0)
            tie += k**3 - k
            i += k
        u2_0 = r2_0 - n0 * (n0 + 1)
        cum0 = cum1 = dnum = 0
        for _, grp in groupby(pooled, key=lambda t: t[0]):
            for _, vv in grp:
                if vv == 0:
                    cum0 += 1
                else:
                    cum1 += 1
            dnum = max(dnum, abs(cum0 * n1 - cum1 * n0))
        [row] = QUERIES["q_mann_whitney_ks"](spark, SF).collect()
        assert (
            row["n0"],
            row["n1"],
            row["u2_0"],
            row["u2_1"],
            row["tie_sum"],
            row["d_num"],
        ) == (n0, n1, u2_0, 2 * n0 * n1 - u2_0, tie, dnum)
        assert row["ks_d"] == dnum / (n0 * n1)

    def test_u_statistic_invariant(self, spark):
        [row] = QUERIES["q_mann_whitney_ks"](spark, SF).collect()
        assert row["u2_0"] + row["u2_1"] == 2 * row["n0"] * row["n1"]
        assert 0 <= row["d_num"] <= row["n0"] * row["n1"]


class TestWasserstein1:
    def test_matches_numpy_cdf_integral(self, spark):
        import numpy as np

        ev = pd.read_parquet(f"{SF}/events.parquet")
        c = (ev["value"] * 100.0 + 0.5).astype(int).to_numpy()
        v = (ev["user_id"] % 2).to_numpy()
        a = np.sort(c[v == 0])
        b = np.sort(c[v == 1])
        xs = np.unique(c)
        cum0 = np.searchsorted(a, xs, side="right")
        cum1 = np.searchsorted(b, xs, side="right")
        w1_num = int(
            np.sum(
                np.abs(
                    cum0[:-1].astype(np.int64) * len(b)
                    - cum1[:-1].astype(np.int64) * len(a)
                )
                * np.diff(xs)
            )
        )
        [row] = QUERIES["q_wasserstein1"](spark, SF).collect()
        assert (row["n0"], row["n1"], row["w1_num"]) == (
            len(a),
            len(b),
            w1_num,
        )
        assert row["w1_cents"] == w1_num / (len(a) * len(b))

    def test_w1_dominates_ks_times_range(self, spark):
        """Sanity coupling with the KS battery: W1 <= D * range and
        W1 >= 0 — both metrics ride the same CDF gap, max vs sum."""
        [w] = QUERIES["q_wasserstein1"](spark, SF).collect()
        [k] = QUERIES["q_mann_whitney_ks"](spark, SF).collect()
        assert w["w1_num"] >= 0
        ev = pd.read_parquet(f"{SF}/events.parquet")
        c = (ev["value"] * 100.0 + 0.5).astype(int)
        rng = int(c.max() - c.min())
        assert w["w1_num"] <= k["d_num"] * rng
