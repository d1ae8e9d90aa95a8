"""Round-7g operator tests: positional phrase search, binary-segmentation
changepoint, and RAKE keyphrase extraction — invariants plus exact
Python replays at sf0.001."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.plans import QUERIES
from nomad_event_streamer_spark.tables import events, load


class TestPhraseSearch:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_phrase_search"](spark, sf_dir).collect()

    def test_three_phrases_all_hit(self, rows):
        assert {r["phrase_rank"] for r in rows} == {1, 2, 3}
        for r in rows:
            assert r["n_hits"] >= 1

    def test_matches_python_replay(self, rows, spark, sf_dir):
        from collections import Counter

        docs = load(spark, sf_dir, "documents").collect()
        bg: Counter = Counter()
        per_doc: dict[int, Counter] = {}
        for d in docs:
            toks = d["text"].split(" ")
            c = Counter(zip(toks, toks[1:]))
            per_doc[d["doc_id"]] = c
            bg.update(c)
        top3 = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        expect = {}
        for rank, ((w1, w2), _) in enumerate(top3, 1):
            for doc_id, c in per_doc.items():
                if c[(w1, w2)]:
                    expect[(rank, w1, w2, doc_id)] = c[(w1, w2)]
        got = {
            (r["phrase_rank"], r["w1"], r["w2"], r["doc_id"]): r["n_hits"]
            for r in rows
        }
        assert got == expect


class TestChangepointBinseg:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_changepoint_binseg"](spark, sf_dir).collect()

    def test_one_row_per_type_gain_nonneg(self, rows, spark, sf_dir):
        ev = events(spark, sf_dir)
        types = {r["event_type"] for r in ev.select("event_type").distinct().collect()}
        assert {r["event_type"] for r in rows} == types
        for r in rows:
            # between-groups SS is >= 0 up to the two integer floors
            assert r["gain_micro"] >= -2
            assert r["split_rn"] >= 1

    def test_matches_python_replay_one_type(self, rows, spark, sf_dir):
        target = rows[0]["event_type"]
        sl = (
            events(spark, sf_dir)
            .where(F.col("event_type") == target)
            .select(
                "ts_us",
                "event_id",
                F.floor(F.col("value") * 100.0 + 0.5)
                .cast("long")
                .alias("cents"),
            )
            .orderBy("ts_us", "event_id")
            .collect()
        )
        vals = [r["cents"] for r in sl]
        n, ltot = len(vals), sum(vals)
        best = None
        l1 = 0
        for rn in range(1, n):
            l1 += vals[rn - 1]
            gain = (
                (l1 * l1 * (n - rn) * 10**6 + (ltot - l1) ** 2 * rn * 10**6)
                // (rn * (n - rn))
                - (ltot * ltot * 10**6) // n
            )
            if best is None or gain > best[1]:
                best = (rn, gain)
        by_type = {r["event_type"]: r for r in rows}
        assert by_type[target]["split_rn"] == best[0]
        assert by_type[target]["gain_micro"] == best[1]


class TestRakeKeyphrases:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_rake_keyphrases"](spark, sf_dir).collect()

    def test_topk_shape(self, rows):
        assert [r["r"] for r in sorted(rows, key=lambda r: r["r"])] == list(
            range(1, 11)
        )
        ordered = sorted(rows, key=lambda r: r["r"])
        for a, b in zip(ordered, ordered[1:]):
            assert (a["score_milli"], ) >= (b["score_milli"], )

    def test_phrases_are_stopword_free_runs(self, rows):
        stops = {"the", "a", "of", "and", "to"}
        for r in rows:
            toks = r["phrase"].split(" ")
            assert 2 <= len(toks) <= 6
            assert not (set(toks) & stops)
            assert r["n_occ"] >= 1

    def test_matches_python_replay(self, rows, spark, sf_dir):
        from collections import Counter, defaultdict

        docs = load(spark, sf_dir, "documents").collect()
        stops = {"the", "a", "of", "and", "to"}
        cands = []  # list of token tuples
        for d in docs:
            run: list[str] = []
            for tok in d["text"].split(" ") + ["the"]:
                if tok in stops:
                    if 2 <= len(run) <= 6:
                        cands.append(tuple(run))
                    run = []
                else:
                    run.append(tok)
        freq: Counter = Counter()
        deg: Counter = Counter()
        for c in cands:
            for w in c:
                freq[w] += 1
                deg[w] += len(c)
        ws = {w: deg[w] * 1000 // freq[w] for w in freq}
        pscore: dict[str, int] = {}
        occ: Counter = Counter()
        for c in cands:
            s = sum(ws[w] for w in c)
            phrase = " ".join(c)
            pscore[phrase] = s
            occ[phrase] += 1
        top = sorted(pscore.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = {r["phrase"]: (r["score_milli"], r["n_occ"]) for r in rows}
        assert got == {p: (s, occ[p]) for p, s in top}
