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


class TestTokenizerCompare:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["source"]: r
            for r in QUERIES["q_tokenizer_compare"](spark, sf_dir).collect()
        }

    def test_one_row_per_source(self, rows, spark, sf_dir):
        n_sources = (
            load(spark, sf_dir, "documents").select("source").distinct().count()
        )
        assert len(rows) == n_sources

    def test_more_merges_never_inflate_the_budget(self, rows):
        for r in rows.values():
            assert r["n_bpe_b"] <= r["n_bpe_a"]
            assert r["delta_milli"] == r["fert_a_milli"] - r["fert_b_milli"]
            assert (
                r["saving_ppm"]
                == (r["n_bpe_a"] - r["n_bpe_b"]) * 1_000_000 // r["n_bpe_a"]
            )

    def test_b_side_equals_the_oracled_fertility_query(self, rows, spark, sf_dir):
        # internal consistency: vocab B IS q_bpe_fertility's tokenizer
        fert = {
            r["source"]: r
            for r in QUERIES["q_bpe_fertility"](spark, sf_dir).collect()
        }
        for src, r in rows.items():
            assert r["n_bpe_b"] == fert[src]["n_bpe"]
            assert r["fert_b_milli"] == fert[src]["fertility_milli"]

    def test_fertility_floor(self, rows):
        # a BPE tokenizer can never emit fewer than one token per word
        for r in rows.values():
            assert r["fert_b_milli"] >= 1000
            assert r["fert_a_milli"] >= r["fert_b_milli"]


class TestPqRecallSweep:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_pq_recall_sweep"](spark, sf_dir).collect()

    def test_grid_shape(self, rows):
        assert {(r["ncodes"], r["query_id"]) for r in rows} == {
            (n, q) for n in (8, 32) for q in range(20)
        }

    def test_recall_bounds_and_formula(self, rows):
        for r in rows:
            assert 0 <= r["n_hits"] <= r["n_exact"] == 5
            assert (
                r["recall_milli"]
                == int(r["n_hits"] * 1000.0 / r["n_exact"] + 0.5)
            )

    def test_bigger_codebook_buys_recall(self, rows):
        avg = {}
        for n in (8, 32):
            vals = [r["recall_milli"] for r in rows if r["ncodes"] == n]
            avg[n] = sum(vals) / len(vals)
        assert avg[32] >= avg[8]


class TestWarcParse:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["doc_id"]: r
            for r in QUERIES["q_warc_parse"](spark, sf_dir).collect()
        }

    def test_round_trip_fields(self, rows, spark, sf_dir):
        texts = _doc_texts(spark, sf_dir)
        assert set(rows) == set(texts)
        for doc_id, t in texts.items():
            r = rows[doc_id]
            assert r["rec_type"] == "response"
            assert r["declared_len"] == r["payload_len"] == len(t.encode())
            assert r["payload_md5"] == hashlib.md5(t.encode()).hexdigest()
            assert r["n_headers"] == 4
            assert r["length_ok"] == 1
            assert r["target_uri"].lower().startswith("http")
            assert f"id={doc_id}&" in r["target_uri"]

    def test_multibyte_payload_declares_octets(self, spark):
        """ADVICE r08 #1: Content-Length is OCTETS — a non-ASCII payload
        (3 chars, 7 UTF-8 bytes) must round-trip with length_ok=1 and a
        byte-based declared length, not the character count."""
        from pyspark.sql import Row

        from nomad_event_streamer_spark.operators import warc

        text = "é☃a"  # 2 + 3 + 1 = 6 bytes? é=2, ☃=3, a=1 -> 6 octets
        docs = spark.createDataFrame(
            [Row(doc_id=1, url="http://x.test/a", text=text)]
        )
        [r] = warc.parse_warc(warc.synthesize_warc(docs)).collect()
        n_bytes = len(text.encode("utf-8"))
        assert n_bytes > len(text)
        assert r["declared_len"] == r["payload_len"] == n_bytes
        assert r["length_ok"] == 1
        assert r["payload_md5"] == hashlib.md5(text.encode()).hexdigest()

    def test_malformed_framing_raises(self, spark):
        from pyspark.sql import Row

        from nomad_event_streamer_spark.operators import warc

        bad = spark.createDataFrame(
            [Row(record=bytearray(b"WARC/1.0\r\nonly-header-no-separator"))]
        )
        with pytest.raises(Exception, match="CRLFCRLF|PythonException"):
            warc.parse_warc(bad).collect()

    def test_wrong_magic_raises(self, spark):
        from pyspark.sql import Row

        from nomad_event_streamer_spark.operators import warc

        bad = spark.createDataFrame(
            [Row(record=bytearray(b"HTTP/1.1 200\r\nA: b\r\n\r\nbody"))]
        )
        with pytest.raises(Exception, match="version|PythonException"):
            warc.parse_warc(bad).collect()


class TestStreamDedupTtl:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["doc_id"]: r
            for r in QUERIES["q_stream_dedup_ttl"](spark, sf_dir).collect()
        }

    def test_every_doc_gets_a_verdict(self, rows, spark, sf_dir):
        assert len(rows) == load(spark, sf_dir, "documents").count()

    def test_keeper_invariants(self, rows):
        for r in rows.values():
            assert r["keeper_doc"] <= r["doc_id"]
            if r["is_dup"] == 0:
                assert r["keeper_doc"] == r["doc_id"]

    def test_both_verdict_classes_fire(self, rows):
        dups = sum(r["is_dup"] for r in rows.values())
        assert 0 < dups < len(rows)

    def test_python_replay(self, rows, spark, sf_dir):
        """Full oracle-independent replay: md5-minhash band-0 buckets,
        then the sliding-TTL gaps-and-islands scan in doc_id order."""
        from nomad_event_streamer_spark.operators.dedup import (
            MINHASH_P,
            minhash_params,
        )
        from nomad_event_streamer_spark.plans.streaming_queries import _TTL_US

        texts = _doc_texts(spark, sf_dir)
        params = minhash_params(16)[:2]
        buckets: dict[int, str] = {}
        for doc_id, t in texts.items():
            toks = t.split(" ")
            sh = {
                " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))
            }
            hbs = [
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
                for s in sh
            ]
            mins = [min((a * h + b) % MINHASH_P for h in hbs) for a, b in params]
            buckets[doc_id] = hashlib.md5(
                "|".join(str(m) for m in mins).encode()
            ).hexdigest()
        by_bucket: dict[str, list[int]] = {}
        for doc_id in sorted(texts):
            by_bucket.setdefault(buckets[doc_id], []).append(doc_id)
        for bucket, ids in by_bucket.items():
            last_ts, keeper = None, None
            for doc_id in ids:
                ts = doc_id * 60_000_000
                if keeper is not None and ts - last_ts <= _TTL_US:
                    is_dup = 1
                else:
                    is_dup = 0
                    keeper = doc_id
                last_ts = ts
                r = rows[doc_id]
                assert r["bucket"] == bucket
                assert r["is_dup"] == is_dup
                assert r["keeper_doc"] == keeper

    def test_state_carries_across_micro_batches(self, rows, spark, sf_dir):
        """At least one duplicate verdict must depend on state written in
        an EARLIER micro-batch (the burst straddles a doc_id-range batch
        cut) — otherwise the test exercises only within-batch logic."""
        n = load(spark, sf_dir, "documents").count()
        cuts = [n // 3, 2 * n // 3]
        straddling = [
            r
            for r in rows.values()
            if r["is_dup"] == 1
            and any(r["keeper_doc"] < c <= r["doc_id"] for c in cuts)
        ]
        assert straddling


class TestUrlDedup:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["domain"], r["path"]): r
            for r in QUERIES["q_url_dedup"](spark, sf_dir).collect()
        }

    def test_groups_partition_docs(self, rows, spark, sf_dir):
        n = load(spark, sf_dir, "documents").count()
        assert sum(r["n_dups"] for r in rows.values()) == n

    def test_python_replay_groups(self, rows, spark, sf_dir):
        canon = QUERIES["q_url_canon"](spark, sf_dir).collect()
        groups: dict[tuple, list] = {}
        for r in canon:
            from urllib.parse import urlsplit

            s = urlsplit(r["canon_url"])
            groups.setdefault((r["domain"], r["path"]), []).append(
                (r["doc_id"], r["canon_url"])
            )
        assert set(rows) == set(groups)
        for key, members in groups.items():
            r = rows[key]
            assert r["keep_id"] == min(d for d, _ in members)
            assert r["n_dups"] == len(members)
            assert r["n_variants"] == len({c for _, c in members})

    def test_variants_bounded_by_dups(self, rows):
        for r in rows.values():
            assert 1 <= r["n_variants"] <= r["n_dups"]


class TestSoftDedupWeight:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["doc_id"]: r
            for r in QUERIES["q_soft_dedup_weight"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        texts = _doc_texts(spark, sf_dir)
        fps = {
            doc_id: hashlib.md5(
                " ".join(sorted(set(t.split(" ")))).encode()
            ).hexdigest()
            for doc_id, t in texts.items()
        }
        sizes = Counter(fps.values())
        for doc_id, t in texts.items():
            r = rows[doc_id]
            n = sizes[fps[doc_id]]
            n_tok = len(t.split(" "))
            assert r["n_copies"] == n
            assert r["weight_milli"] == 1000 // n
            assert r["n_tok"] == n_tok
            assert r["eff_tok_milli"] == n_tok * 1000 // n

    def test_duplicate_groups_exist(self, rows):
        assert any(r["n_copies"] > 1 for r in rows.values())
        assert any(r["n_copies"] == 1 for r in rows.values())

    def test_group_mass_bounded(self, rows):
        by_copies: dict[int, list] = {}
        for r in rows.values():
            by_copies.setdefault(r["n_copies"], []).append(r)
        for n, members in by_copies.items():
            assert len(members) % n == 0  # whole groups
            # per group the weights sum to <= 1000 (floor rounding)
            assert 1000 - n < (1000 // n) * n <= 1000


class TestLmInterp:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_lm_interp"](spark, sf_dir).collect()

    def test_python_replay_full_model(self, rows, spark, sf_dir):
        texts = _doc_texts(spark, sf_dir)
        cb: Counter = Counter()
        u: Counter = Counter()
        t_tok = 0
        for t in texts.values():
            toks = t.split(" ")
            u.update(toks)
            t_tok += len(toks)
            cb.update(zip(toks, toks[1:]))
        c_v: Counter = Counter()
        for (v, _), c in cb.items():
            c_v[v] += c
        model = []
        for (v, w), c_vw in cb.items():
            jm = (c_vw * 700 * 1000) // c_v[v] + (u[w] * 300 * 1000) // t_tok
            model.append((-jm, v, w, c_vw))
        model.sort()
        top = model[:40]
        assert len(rows) == 40
        got = sorted(rows, key=lambda r: r["rnk"])
        for r, (neg_jm, v, w, c_vw) in zip(got, top):
            assert (r["w1"], r["w2"]) == (v, w)
            assert r["jm_micro"] == -neg_jm
            assert r["c_vw"] == c_vw

    def test_rank_dense(self, rows):
        assert sorted(r["rnk"] for r in rows) == list(range(1, 41))


class TestVocabPrune:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["token"]: r
            for r in QUERIES["q_vocab_prune"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        texts = _doc_texts(spark, sf_dir)
        df: Counter = Counter()
        for t in texts.values():
            df.update(set(t.split(" ")))
        n_docs = len(texts)
        assert set(rows) == set(df)
        for token, d in df.items():
            r = rows[token]
            ppm = d * 1_000_000 // n_docs
            assert r["df"] == d
            assert r["df_ppm"] == ppm
            expect = (
                "cut_low"
                if ppm < 100_000
                else "cut_high" if ppm > 780_000 else "keep"
            )
            assert r["action"] == expect

    def test_all_actions_present(self, rows):
        assert {r["action"] for r in rows.values()} == {
            "keep",
            "cut_low",
            "cut_high",
        }


class TestTemporalSplit:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["user_id"]: r
            for r in QUERIES["q_temporal_split"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        ev = (
            load(spark, sf_dir, "events")
            .selectExpr("user_id", "ts div 1000 AS us")
            .collect()
        )
        us = [r["us"] for r in ev]
        cut = min(us) + (max(us) - min(us)) * 49 // 50
        per: dict[int, list[int]] = {}
        for r in ev:
            per.setdefault(r["user_id"], []).append(r["us"])
        assert set(rows) == set(per)
        for uid, times in per.items():
            r = rows[uid]
            n_train = sum(1 for t in times if t < cut)
            assert r["n_train"] == n_train
            assert r["n_test"] == len(times) - n_train
            assert r["spans_cut"] == (
                1 if 0 < n_train < len(times) else 0
            )

    def test_both_leak_classes_present(self, rows):
        flags = {r["spans_cut"] for r in rows.values()}
        assert flags == {0, 1}


class TestHashedNgramScore:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["doc_id"]: r
            for r in QUERIES["q_hashed_ngram_score"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        from nomad_event_streamer_spark.plans.pipeline_queries import _HNG_W

        texts = _doc_texts(spark, sf_dir)
        for doc_id, t in texts.items():
            toks = t.split(" ")
            bigrams = [
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            ] if len(toks) >= 2 else []
            score = sum(
                _HNG_W[
                    int(hashlib.md5(b.encode()).hexdigest()[:15], 16)
                    % len(_HNG_W)
                ]
                for b in bigrams
            )
            r = rows[doc_id]
            assert r["n_feats"] == len(bigrams)
            assert r["score_milli"] == score
            assert r["pred_keep"] == (1 if score > 0 else 0)

    def test_classes_not_degenerate(self, rows):
        kept = sum(r["pred_keep"] for r in rows.values())
        assert 0 < kept < len(rows)


class TestJaccardThresholdSweep:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            r["thresh_milli"]: r
            for r in QUERIES["q_jaccard_threshold_sweep"](spark, sf_dir).collect()
        }

    def test_all_thresholds_emit(self, rows):
        assert set(rows) == {10, 500, 960, 980}

    def test_monotone_in_threshold(self, rows):
        ts = sorted(rows)
        for lo, hi in zip(ts, ts[1:]):
            assert rows[lo]["n_pairs"] >= rows[hi]["n_pairs"]
            assert rows[lo]["n_docs"] >= rows[hi]["n_docs"]

    def test_docs_bounded_by_pairs(self, rows):
        for r in rows.values():
            assert r["n_docs"] <= 2 * r["n_pairs"]
            if r["n_pairs"] > 0:
                assert r["n_docs"] >= 2

    def test_python_replay(self, rows, spark, sf_dir):
        """Full oracle-independent replay: 16-seed md5 minhash, 8 bands
        of 2 rows, bucket pairs, exact Jaccard, threshold counts."""
        from nomad_event_streamer_spark.operators.dedup import (
            MINHASH_P,
            minhash_params,
        )

        texts = _doc_texts(spark, sf_dir)
        params = minhash_params(16)
        shingles: dict[int, set] = {}
        bands: dict[tuple, list] = {}
        for doc_id, t in texts.items():
            toks = t.split(" ")
            sh = {
                " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))
            }
            shingles[doc_id] = sh
            hbs = [
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
                for s in sh
            ]
            sig = [min((a * h + b) % MINHASH_P for h in hbs) for a, b in params]
            for band in range(8):
                bucket = hashlib.md5(
                    "|".join(
                        str(m) for m in sig[band * 2 : band * 2 + 2]
                    ).encode()
                ).hexdigest()
                bands.setdefault((band, bucket), []).append(doc_id)
        cand = set()
        for members in bands.values():
            ms = sorted(members)
            for i, a in enumerate(ms):
                for b in ms[i + 1 :]:
                    cand.add((a, b))
        jacc = {}
        for a, b in cand:
            i = len(shingles[a] & shingles[b])
            jacc[(a, b)] = i * 1000 // (len(shingles[a]) + len(shingles[b]) - i)
        for t, r in rows.items():
            hits = [p for p, j in jacc.items() if j >= t]
            assert r["n_pairs"] == len(hits)
            assert r["n_docs"] == len({d for p in hits for d in p})


class TestLangidMargin:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {
            (r["pred_lang"], r["margin_band"]): r
            for r in QUERIES["q_langid_margin"](spark, sf_dir).collect()
        }

    def test_python_replay(self, rows, spark, sf_dir):
        from nomad_event_streamer_spark.operators.text import LANG_MARKERS

        texts = _doc_texts(spark, sf_dir)
        langs = sorted(LANG_MARKERS)
        agg: dict[tuple, list[int]] = {}
        for t in texts.values():
            toks = t.split(" ")
            scores = {
                lang: sum(1 for x in toks if x in LANG_MARKERS[lang])
                for lang in langs
            }
            pred = None
            for i, lang in enumerate(langs[:-1]):
                rest = max(scores[o] for o in langs[i + 1 :])
                if scores[lang] >= rest:
                    pred = lang
                    break
            pred = pred or langs[-1]
            vals = sorted(scores.values())
            margin = vals[-1] - vals[-2]
            band = (
                "tie"
                if margin == 0
                else "narrow"
                if margin <= 2
                else "clear" if margin <= 5 else "strong"
            )
            agg.setdefault((pred, band), []).append(margin)
        assert set(rows) == set(agg)
        for key, margins in agg.items():
            r = rows[key]
            assert r["n"] == len(margins)
            assert r["min_margin"] == min(margins)
            assert r["max_margin"] == max(margins)

    def test_band_counts_cover_corpus(self, rows, spark, sf_dir):
        assert sum(r["n"] for r in rows.values()) == load(
            spark, sf_dir, "documents"
        ).count()
