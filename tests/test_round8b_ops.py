"""Round-8b pipeline-curation operator tests: line-level dedup, quality
classifier, robots gate, contamination matrix (the R09_QUEUE batch).

Each class checks algebraic invariants plus a pure-Python replay on a
sample (the oracle-independent ground truth the DuckDB hash gate can't
provide — it shares no code with either engine)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from nomad_event_streamer_spark.plans import QUERIES
from nomad_event_streamer_spark.plans.pipeline_queries import (
    _CONTAM_K,
    _LINE_MAX_FREQ,
    _LINE_WORDS,
    _QC_B,
    _QC_TOK_CAP,
    _QC_W_AWL,
    _QC_W_STOP,
    _QC_W_TOK,
    _QC_W_TTR,
    ROBOTS_RULES,
)
from nomad_event_streamer_spark.tables import load


def _doc_texts(spark, sf_dir) -> dict[int, str]:
    return {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }


def _py_lines(text: str) -> list[str]:
    toks = text.split(" ")
    return [
        " ".join(toks[i : i + _LINE_WORDS])
        for i in range(0, len(toks), _LINE_WORDS)
    ]


def _py_split(doc_id: int) -> str:
    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 10
    return "train" if b < 8 else ("val" if b == 8 else "test")


class TestLineDedup:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["doc_id"]: r
            for r in QUERIES["q_line_dedup"](spark, sf_dir).collect()
        }

    def test_one_row_per_doc_and_counts_add_up(self, rows, spark, sf_dir):
        assert len(rows) == load(spark, sf_dir, "documents").count()
        for r in rows.values():
            assert r["n_kept"] + r["n_dropped"] == r["n_lines"]
            assert r["n_lines"] >= 1

    def test_python_replay(self, rows, spark, sf_dir):
        texts = _doc_texts(spark, sf_dir)
        freq = Counter()
        for t in texts.values():
            freq.update(_py_lines(t))
        for doc_id, t in texts.items():
            lines = _py_lines(t)
            kept = [ln for ln in lines if freq[ln] <= _LINE_MAX_FREQ]
            r = rows[doc_id]
            assert r["n_lines"] == len(lines)
            assert r["n_kept"] == len(kept)
            assert r["clean_text"] == " ".join(kept)

    def test_something_dropped_and_something_survives(self, rows):
        # the corpus carries duplicate documents, so duplicated lines
        # exist; most lines are unique word-soup, so most survive.
        assert sum(r["n_dropped"] for r in rows.values()) > 0
        assert sum(r["n_kept"] for r in rows.values()) > 0

    def test_clean_text_is_subsequence(self, rows, spark, sf_dir):
        texts = _doc_texts(spark, sf_dir)
        for doc_id, r in list(rows.items())[:100]:
            if not r["clean_text"]:
                continue
            # surviving lines appear in the original, in order
            pos = 0
            orig = texts[doc_id]
            for ln in _py_lines_of_clean(r["clean_text"]):
                nxt = orig.find(ln, pos)
                assert nxt >= 0, (doc_id, ln)
                pos = nxt + len(ln)


def _py_lines_of_clean(clean: str) -> list[str]:
    # clean_text is kept lines re-joined with ' '; reconstruct the kept
    # 10-word groups for the subsequence check
    toks = clean.split(" ")
    return [
        " ".join(toks[i : i + _LINE_WORDS])
        for i in range(0, len(toks), _LINE_WORDS)
    ]


class TestQualityClassifier:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["doc_id"]: r
            for r in QUERIES["q_quality_classifier"](spark, sf_dir).collect()
        }

    def test_decision_consistent_with_logit(self, rows):
        for r in rows.values():
            assert r["pred_keep"] == (1 if r["logit_milli"] > 0 else 0)
            lg = r["logit_milli"]
            expect = (
                "high"
                if lg >= 1000
                else "mid" if lg >= 0 else "low" if lg >= -1000 else "reject"
            )
            assert r["band"] == expect

    def test_python_replay(self, rows, spark, sf_dir):
        texts = _doc_texts(spark, sf_dir)
        for doc_id, t in list(texts.items())[:300]:
            toks = t.split(" ")
            n_tok = len(toks)
            stop_milli = sum(1 for x in toks if x in ("a", "the")) * 1000 // n_tok
            ttr_milli = len(set(toks)) * 1000 // n_tok
            awl_milli = (len(t) - n_tok + 1) * 1000 // n_tok
            logit = (
                _QC_B
                + _QC_W_TOK * min(n_tok, _QC_TOK_CAP)
                - _QC_W_STOP * stop_milli
                + _QC_W_TTR * ttr_milli
                - _QC_W_AWL * awl_milli
            )
            r = rows[doc_id]
            assert r["n_tok"] == n_tok
            assert r["stop_milli"] == stop_milli
            assert r["ttr_milli"] == ttr_milli
            assert r["awl_milli"] == awl_milli
            assert r["logit_milli"] == logit

    def test_classes_are_not_degenerate(self, rows):
        kept = sum(r["pred_keep"] for r in rows.values())
        assert 0 < kept < len(rows)
        assert len({r["band"] for r in rows.values()}) >= 2


class TestRobotsGate:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["doc_id"]: r
            for r in QUERIES["q_robots_gate"](spark, sf_dir).collect()
        }

    def test_one_verdict_per_doc(self, rows, spark, sf_dir):
        assert len(rows) == load(spark, sf_dir, "documents").count()

    def test_matched_rule_actually_matches(self, rows):
        by_id = {rid: (dom, pre, allow) for rid, dom, pre, allow in ROBOTS_RULES}
        for r in rows.values():
            dom, pre, allow = by_id[r["rule_id"]]
            assert dom in ("*", r["domain"])
            assert r["path"].startswith(pre)
            assert r["matched_prefix"] == pre
            assert r["allowed"] == allow

    def test_python_replay_precedence(self, rows):
        for r in rows.values():
            matches = [
                (rid, dom, pre, allow)
                for rid, dom, pre, allow in ROBOTS_RULES
                if dom in ("*", r["domain"]) and r["path"].startswith(pre)
            ]
            winner = min(
                matches,
                key=lambda m: (-len(m[2]), m[1] == "*", -m[3], m[0]),
            )
            assert r["rule_id"] == winner[0], (r["domain"], r["path"], matches)

    def test_gate_actually_blocks_something(self, rows):
        blocked = [r for r in rows.values() if r["allowed"] == 0]
        allowed = [r for r in rows.values() if r["allowed"] == 1]
        assert blocked and allowed


class TestContaminationMatrix:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["src_split"], r["dst_split"]): r
            for r in QUERIES["q_contamination_matrix"](spark, sf_dir).collect()
        }

    def test_all_six_ordered_pairs(self, rows):
        assert set(rows) == {
            (a, b)
            for a in ("train", "val", "test")
            for b in ("train", "val", "test")
            if a != b
        }

    def test_shared_counts_symmetric(self, rows):
        for (a, b), r in rows.items():
            assert r["n_shared_shingles"] == rows[(b, a)]["n_shared_shingles"]

    def test_bounds(self, rows):
        for r in rows.values():
            assert 0 <= r["n_contaminated"] <= r["n_docs_dst"]
            assert (
                r["contam_ppm"]
                == r["n_contaminated"] * 1_000_000 // r["n_docs_dst"]
            )

    def test_python_replay(self, rows, spark, sf_dir):
        texts = _doc_texts(spark, sf_dir)
        shingles: dict[int, set] = {}
        splits: dict[int, str] = {}
        for doc_id, t in texts.items():
            toks = t.split(" ")
            shingles[doc_id] = {
                " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))
            }
            splits[doc_id] = _py_split(doc_id)
        union: dict[str, set] = {"train": set(), "val": set(), "test": set()}
        for doc_id, sh in shingles.items():
            union[splits[doc_id]] |= sh
        for (a, b), r in rows.items():
            assert r["n_shared_shingles"] == len(union[a] & union[b])
            docs_b = [d for d in texts if splits[d] == b]
            assert r["n_docs_dst"] == len(docs_b)
            contam = sum(
                1 for d in docs_b if len(shingles[d] & union[a]) >= _CONTAM_K
            )
            assert r["n_contaminated"] == contam
