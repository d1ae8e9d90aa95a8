"""Round-9d operator referees: path mining, bit-domain naive Bayes,
grid DBSCAN (pure-python union-find referee + convergence-depth pin vs
the oracle's fixed unroll), and the chained-stateful streaming query's
dedup-verification property."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pandas as pd

from nomad_event_streamer_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _events_pd() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    dt = str(ev["ts"].dtype)
    if dt == "datetime64[us]":
        ev["ts_us"] = ev["ts"].astype("int64")
    elif dt.startswith("datetime"):
        ev["ts_us"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    else:
        ev["ts_us"] = ev["ts"] // 1000
    return ev


class TestPath3gram:
    def test_matches_pure_python_counts(self, spark):
        ev = _events_pd().sort_values(["user_id", "ts_us", "event_id"])
        counts: dict[tuple, int] = defaultdict(int)
        for _, g in ev.groupby("user_id"):
            ts = list(g["event_type"])
            for i in range(len(ts) - 2):
                counts[(ts[i], ts[i + 1], ts[i + 2])] += 1
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        expected = [
            (t1, t2, t3, n, i + 1)
            for i, ((t1, t2, t3), n) in enumerate(ranked)
        ]
        got = [
            (r["t1"], r["t2"], r["t3"], r["n"], r["rnk"])
            for r in sorted(
                QUERIES["q_path_3gram"](spark, SF).collect(),
                key=lambda r: r["rnk"],
            )
        ]
        assert got == expected


class TestNaiveBayesBits:
    def test_matches_pure_python_model(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        toks = [
            (int(d), lang, t)
            for d, lang, txt in zip(
                docs["doc_id"], docs["lang"], docs["text"]
            )
            for t in txt.split(" ")
        ]
        vocab = {t for _, _, t in toks}
        cc: dict[tuple, int] = defaultdict(int)
        nl: dict[str, int] = defaultdict(int)
        for _, lang, t in toks:
            cc[(lang, t)] += 1
            nl[lang] += 1
        pri = docs.groupby("lang").size().to_dict()
        total = len(docs)
        classes = sorted(nl)
        bydoc: dict[int, list[str]] = defaultdict(list)
        true = {}
        for d, lang, t in toks:
            bydoc[d].append(t)
            true[d] = lang
        expected = {}
        for d, ts in bydoc.items():
            best = None
            for cls in classes:
                bits = (total.bit_length() - pri[cls].bit_length()) + sum(
                    (nl[cls] + len(vocab)).bit_length()
                    - (cc.get((cls, t), 0) + 1).bit_length()
                    for t in ts
                )
                key = (bits, cls)
                if best is None or key < best:
                    best = key
            expected[d] = (
                best[1],
                best[0],
                int(best[1] == true[d]),
            )
        got = {
            r["doc_id"]: (r["pred_lang"], r["bits_best"], r["is_correct"])
            for r in QUERIES["q_naive_bayes_bits"](spark, SF).collect()
        }
        assert got == expected

    def test_classifier_beats_majority_class(self, spark):
        rows = QUERIES["q_naive_bayes_bits"](spark, SF).collect()
        acc = sum(r["is_correct"] for r in rows) / len(rows)
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        majority = docs.groupby("lang").size().max() / len(docs)
        assert acc >= majority


class TestDbscanGrid:
    @staticmethod
    def _referee():
        from nomad_event_streamer_spark.plans.llm_ops import (
            _DB_G,
            _DB_MINPTS,
        )

        docs = pd.read_parquet(f"{SF}/embeddings.parquet")
        pts = {}
        for vid, emb in zip(docs["vec_id"], docs["embedding"]):
            x = int((float(emb[0]) * 1000.0 + 0.5) // 1)
            y = int((float(emb[1]) * 1000.0 + 0.5) // 1)
            pts[int(vid)] = (x // _DB_G, y // _DB_G)  # python // floors
        cellcnt: dict[tuple, int] = defaultdict(int)
        for c in pts.values():
            cellcnt[c] += 1
        core = {c for c, n in cellcnt.items() if n >= _DB_MINPTS}
        # union-find over 8-neighborhood core adjacency
        parent = {c: c for c in core}

        def find(c):
            while parent[c] != c:
                parent[c] = parent[parent[c]]
                c = parent[c]
            return c

        for cx, cy in core:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cx + dx, cy + dy)
                    if nb in core:
                        ra, rb = find((cx, cy)), find(nb)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
        lin = lambda c: (c[0] + 32768) * 65536 + (c[1] + 32768)  # noqa: E731
        comp_label = {}
        for c in core:
            root = find(c)
            comp = [x for x in core if find(x) == root]
            comp_label[c] = min(lin(x) for x in comp)
        expected = {}
        for vid, c in pts.items():
            cands = [
                comp_label[(c[0] + dx, c[1] + dy)]
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (c[0] + dx, c[1] + dy) in core
            ]
            expected[vid] = (
                min(cands) if cands else -1,
                int(c in core),
            )
        return expected

    def test_matches_pure_python_union_find(self, spark):
        got = {
            r["vec_id"]: (r["cluster"], r["is_core"])
            for r in QUERIES["q_dbscan_grid"](spark, SF).collect()
        }
        assert got == self._referee()

    def test_convergence_within_oracle_unroll(self, spark):
        """The oracle unrolls exactly _DB_ROUNDS label-prop rounds;
        Spark's measured fixpoint depth on the fixture must fit inside
        (extra oracle rounds are no-ops after the fixpoint)."""
        import pyspark.sql.functions as F

        from nomad_event_streamer_spark.operators.graph import (
            grid_components,
        )
        from nomad_event_streamer_spark.plans.llm_ops import (
            _DB_G,
            _DB_MINPTS,
            _DB_ROUNDS,
        )
        from nomad_event_streamer_spark.tables import load

        vecs = load(spark, SF, "embeddings")
        g = _DB_G
        pc = vecs.select(
            F.expr(
                "CAST(floor(element_at(embedding, 1) * 1000.0 + 0.5)"
                " AS BIGINT)"
            ).alias("x"),
            F.expr(
                "CAST(floor(element_at(embedding, 2) * 1000.0 + 0.5)"
                " AS BIGINT)"
            ).alias("y"),
        ).select(
            F.expr(f"(x - ((x % {g}) + {g}) % {g}) div {g}").alias("cx"),
            F.expr(f"(y - ((y % {g}) + {g}) % {g}) div {g}").alias("cy"),
        )
        core = (
            pc.groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= _DB_MINPTS)
            .select("cx", "cy")
        )
        _, rounds = grid_components(core, max_rounds=_DB_ROUNDS)
        assert rounds <= _DB_ROUNDS
        assert rounds >= 1

    def test_noise_and_clusters_both_present(self, spark):
        rows = QUERIES["q_dbscan_grid"](spark, SF).collect()
        clusters = {r["cluster"] for r in rows if r["cluster"] != -1}
        assert len(clusters) >= 2, "fixture should yield >= 2 clusters"
        assert any(r["cluster"] == -1 for r in rows), "no noise points"
        # every core point is clustered
        for r in rows:
            if r["is_core"] == 1:
                assert r["cluster"] != -1


class TestStreamDedupThenWindow:
    def test_dedup_stage_verified_by_counts(self, spark):
        """The stream synthesizes doubled rows for event_id % 5 == 0;
        emitted window counts must equal the UNIQUE event counts — a
        dedup miss would inflate exactly the windows holding those ids."""
        import duckdb

        rows = QUERIES["q_stream_dedup_then_window"](spark, SF).collect()
        got = {(r["event_type"], r["win_start_us"]): r["n"] for r in rows}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')"
        )
        [cut] = con.execute(
            "SELECT max(epoch_us(ts)) - 1800000000 FROM events"
        ).fetchone()
        exp = {
            (r[0], r[1]): r[2]
            for r in con.execute(
                f"""SELECT event_type,
                       epoch_us(ts) // 3600000000 * 3600000000,
                       count(*) FROM events
                    GROUP BY 1, 2
                    HAVING epoch_us(ts) // 3600000000 * 3600000000
                           + 3600000000 <= {cut}"""
            ).fetchall()
        }
        assert got == exp
