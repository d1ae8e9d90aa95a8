"""Round-8 curation operator tests: URL canonicalization + domain
rollup, mojibake detector, PII scorecard, license classification,
Kneser-Ney bigram LM, source-concentration HHI, balanced shard plan.

Each class checks algebraic invariants plus a pure-Python replay on a
sample (the oracle-independent ground truth the DuckDB hash gate can't
provide — it shares no code with either engine)."""

from __future__ import annotations

from urllib.parse import urlsplit

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.plans import QUERIES
from nomad_event_streamer_spark.tables import load


class TestUrlCanon:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return {r["doc_id"]: r for r in QUERIES["q_url_canon"](spark, sf_dir).collect()}

    def test_one_row_per_doc(self, rows, spark, sf_dir):
        assert len(rows) == load(spark, sf_dir, "documents").count()

    def test_canon_is_normalized(self, rows):
        for r in rows.values():
            c = r["canon_url"]
            s = urlsplit(c)
            assert s.scheme in ("http", "https")
            assert s.hostname == s.netloc.split(":")[0]  # no userinfo
            assert not s.netloc.startswith("www.")
            assert s.netloc == s.netloc.lower()
            assert s.port not in (443, 80)  # default ports dropped
            assert s.fragment == ""
            assert "utm_" not in s.query
            # params sorted
            parts = [p for p in s.query.split("&") if p]
            assert parts == sorted(parts)
            # no trailing slash except root
            assert s.path == "/" or not s.path.endswith("/")

    def test_python_replay_against_urllib(self, rows):
        # independent replay: parse the RAW url with urllib and apply
        # the documented rules; must reproduce canon_url exactly.
        for r in list(rows.values())[:200]:
            s = urlsplit(r["url"])
            scheme = s.scheme.lower()
            host = (s.hostname or "").lower()
            if host.startswith("www."):
                host = host[4:]
            port = ""
            if s.port is not None and not (
                (scheme == "https" and s.port == 443)
                or (scheme == "http" and s.port == 80)
            ):
                port = f":{s.port}"
            path = s.path.rstrip("/") or "/"
            kept = sorted(
                p for p in s.query.split("&") if p and not p.startswith("utm_")
            )
            expect = f"{scheme}://{host}{port}{path}" + (
                "?" + "&".join(kept) if kept else ""
            )
            assert r["canon_url"] == expect, r["url"]

    def test_idempotent(self, rows):
        # canonicalizing an already-canonical URL is a no-op: run the
        # operator's rules (python replay above proved they match) on
        # canon_url and expect identity.
        for r in list(rows.values())[:50]:
            s = urlsplit(r["canon_url"])
            path = s.path.rstrip("/") or "/"
            parts = sorted(p for p in s.query.split("&") if p)
            re_canon = f"{s.scheme}://{s.netloc}{path}" + (
                "?" + "&".join(parts) if parts else ""
            )
            assert re_canon == r["canon_url"]

    def test_tracking_params_counted(self, rows):
        # the synthetic URL always carries utm_source + utm_campaign
        for r in rows.values():
            assert r["n_tracking"] == 2
            assert r["n_params_kept"] == 2  # id=, ref=


class TestDomainRollup:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_domain_rollup"](spark, sf_dir).collect()

    def test_domains_partition_docs(self, rows, spark, sf_dir):
        n_docs = load(spark, sf_dir, "documents").count()
        assert sum(r["n_docs"] for r in rows) == n_docs

    def test_shares_sum_to_about_one(self, rows):
        total = sum(r["tok_share_ppm"] for r in rows)
        # floor-div: sum <= 1e6, within one ppm per domain
        assert 1_000_000 - len(rows) <= total <= 1_000_000

    def test_domains_match_canon(self, rows, spark, sf_dir):
        canon_domains = {
            r["domain"]
            for r in QUERIES["q_url_canon"](spark, sf_dir)
            .select("domain")
            .distinct()
            .collect()
        }
        assert {r["domain"] for r in rows} == canon_domains

    def test_cut_flag_matches_threshold(self, rows):
        for r in rows:
            assert r["kept"] == (0 if r["tok_share_ppm"] > 52_000 else 1)


class TestMojibake:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_mojibake"](spark, sf_dir).collect()

    def test_python_replay(self, rows, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").collect()
        expect: dict[str, dict[str, int]] = {}
        for d in docs:
            t = d["text"]
            m = d["doc_id"] % 5
            if m == 0:
                t = t.replace("a", "Ã¡")
            elif m == 1:
                t = t.replace("e", "â€™")
            elif m == 2:
                t = t + " ï¿½ï¿½data"
            e = expect.setdefault(
                d["source"],
                {"n_docs": 0, "n_damaged": 0, "h1": 0, "h2": 0, "h3": 0},
            )
            h1 = t.count("Ã")
            h2 = t.count("â€")
            h3 = t.count("ï¿½")
            e["n_docs"] += 1
            e["n_damaged"] += 1 if h1 + h2 + h3 > 0 else 0
            e["h1"] += h1
            e["h2"] += h2
            e["h3"] += h3
        for r in rows:
            e = expect[r["source"]]
            assert (
                r["n_docs"],
                r["n_damaged"],
                r["hits_latin1"],
                r["hits_punct"],
                r["hits_replacement"],
            ) == (e["n_docs"], e["n_damaged"], e["h1"], e["h2"], e["h3"])
            assert r["damaged_ppm"] == e["n_damaged"] * 1_000_000 // e["n_docs"]

    def test_damage_rate_matches_injection(self, rows):
        # 3 of 5 residue classes are damaged; 'Ã' appears inside the
        # other damage classes' artifacts too, so damaged >= injected.
        n_docs = sum(r["n_docs"] for r in rows)
        n_damaged = sum(r["n_damaged"] for r in rows)
        assert 0 < n_damaged < n_docs


class TestPiiScorecard:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_pii_scorecard"](spark, sf_dir).collect()

    def test_python_replay(self, rows, spark, sf_dir):
        import re

        docs = load(spark, sf_dir, "documents").collect()
        expect: dict[str, list[int]] = {}
        for d in docs:
            m = d["doc_id"] % 4
            t = d["text"]
            if m == 0:
                t += f" contact user{d['doc_id']}@mail{d['doc_id'] % 3}.com now"
            elif m == 1:
                t += f" call 555-{d['doc_id'] % 10000:04d} today"
            elif m == 2:
                t += f" host 10.{d['doc_id'] % 256}.{d['doc_id'] % 250}.7 up"
            e = len(re.findall(r"[a-z0-9]+@[a-z0-9]+\.[a-z]+", t))
            p = len(re.findall(r"555-[0-9]{4}", t))
            i = len(re.findall(r"10\.[0-9]+\.[0-9]+\.[0-9]+", t))
            agg = expect.setdefault(d["source"], [0, 0, 0, 0, 0])
            agg[0] += 1
            agg[1] += e
            agg[2] += p
            agg[3] += i
            agg[4] += 1 if e + p + i > 0 else 0
        for r in rows:
            agg = expect[r["source"]]
            assert (
                r["n_docs"],
                r["n_emails"],
                r["n_phones"],
                r["n_ips"],
                r["docs_with_pii"],
            ) == tuple(agg)
            assert (
                r["pii_free_ppm"]
                == (agg[0] - agg[4]) * 1_000_000 // agg[0]
            )


class TestLicenseDetect:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_license_detect"](spark, sf_dir).collect()

    def test_all_six_classes_present(self, rows):
        assert {r["license"] for r in rows} == {
            "apache-2.0",
            "mit",
            "gpl",
            "cc-by-sa-4.0",
            "proprietary",
            "none",
        }

    def test_permissive_flags(self, rows):
        perm = {"apache-2.0": 1, "mit": 1, "cc-by-sa-4.0": 1}
        for r in rows:
            assert r["permissive"] == perm.get(r["license"], 0)

    def test_rollup_partitions_docs(self, rows, spark, sf_dir):
        assert sum(r["n_docs"] for r in rows) == load(
            spark, sf_dir, "documents"
        ).count()

    def test_class_sizes_match_injection(self, rows, spark, sf_dir):
        # residues 0..5 map 1:1 onto classes; corpus text itself has no
        # license phrases, so counts follow doc_id % 6 exactly.
        by_lic: dict[str, int] = {}
        for r in rows:
            by_lic[r["license"]] = by_lic.get(r["license"], 0) + r["n_docs"]
        docs = load(spark, sf_dir, "documents").select("doc_id").collect()
        residue = [0] * 6
        for d in docs:
            residue[d["doc_id"] % 6] += 1
        assert by_lic["mit"] == residue[0]
        assert by_lic["apache-2.0"] == residue[1]
        assert by_lic["gpl"] == residue[2]
        assert by_lic["proprietary"] == residue[3]
        assert by_lic["cc-by-sa-4.0"] == residue[4]
        assert by_lic["none"] == residue[5]


class TestKneserNey:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_kneser_ney"](spark, sf_dir).collect()

    def test_topk_shape_and_rank(self, rows):
        assert len(rows) == 40
        ordered = sorted(
            rows, key=lambda r: (-r["p_kn_micro"], r["w1"], r["w2"])
        )
        assert [r["rnk"] for r in ordered] == list(range(1, 41))

    def test_probability_bounds(self, rows):
        for r in rows:
            assert 0 < r["p_kn_micro"] <= 1_000_000
            assert 0 < r["c_vw"] <= r["c_v"]
            assert r["n1_fwd"] >= 1 and r["n1_back"] >= 1

    def test_python_replay(self, rows, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("text").collect()
        from collections import Counter, defaultdict

        cb: Counter = Counter()
        for d in docs:
            toks = d["text"].split(" ")
            for a, b in zip(toks, toks[1:]):
                cb[(a, b)] += 1
        cv: Counter = Counter()
        n1f: Counter = Counter()
        n1b: Counter = Counter()
        for (a, b), c in cb.items():
            cv[a] += c
            n1f[a] += 1
            n1b[b] += 1
        T = len(cb)
        for r in rows:
            key = (r["w1"], r["w2"])
            c_vw, c_v = cb[key], cv[r["w1"]]
            assert (c_vw, c_v, n1f[r["w1"]], n1b[r["w2"]]) == (
                r["c_vw"],
                r["c_v"],
                r["n1_fwd"],
                r["n1_back"],
            )
            t1 = (
                ((c_vw * 1000 - 750) * 1_000_000) // (c_v * 1000)
                if c_vw * 1000 > 750
                else 0
            )
            t2 = (750 * n1f[r["w1"]] * n1b[r["w2"]] * 1_000_000) // (
                c_v * 1000 * T
            )
            assert r["p_kn_micro"] == t1 + t2

    def test_mass_sums_below_one_per_context(self, spark, sf_dir):
        # Σ_w P(w|v) <= 1 for the fullest context (floor-div loses mass,
        # never adds): recompute all probabilities for the top context.
        docs = load(spark, sf_dir, "documents").select("text").collect()
        from collections import Counter

        cb: Counter = Counter()
        for d in docs:
            toks = d["text"].split(" ")
            for a, b in zip(toks, toks[1:]):
                cb[(a, b)] += 1
        cv: Counter = Counter()
        n1f: Counter = Counter()
        n1b: Counter = Counter()
        for (a, b), c in cb.items():
            cv[a] += c
            n1f[a] += 1
            n1b[b] += 1
        T = len(cb)
        v = cv.most_common(1)[0][0]
        total = 0
        for (a, b), c in cb.items():
            if a != v:
                continue
            t1 = (
                ((c * 1000 - 750) * 1_000_000) // (cv[v] * 1000)
                if c * 1000 > 750
                else 0
            )
            t2 = (750 * n1f[v] * n1b[b] * 1_000_000) // (cv[v] * 1000 * T)
            total += t1 + t2
        # discount mass not spent on unseen continuations keeps the
        # seen-bigram sum strictly under 1
        assert total <= 1_000_000


class TestHhiConcentration:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_hhi_concentration"](spark, sf_dir).collect()

    def test_hhi_bounds(self, rows):
        n = len(rows)
        hhi = rows[0]["hhi_ppm"]
        assert all(r["hhi_ppm"] == hhi for r in rows)
        # uniform lower bound 1e6/n (minus floor loss), monopoly 1e6
        assert 1_000_000 // n - n <= hhi <= 1_000_000

    def test_python_replay(self, rows, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").collect()
        tok: dict[str, int] = {}
        for d in docs:
            tok[d["source"]] = tok.get(d["source"], 0) + len(
                d["text"].split(" ")
            )
        wtot = sum(tok.values())
        sq = sum(v * v for v in tok.values())
        for r in rows:
            assert r["n_tok"] == tok[r["source"]]
            assert r["share_ppm"] == tok[r["source"]] * 1_000_000 // wtot
            assert r["hhi_ppm"] == sq * 1_000_000 // (wtot * wtot)

    def test_rank_is_dense_by_size(self, rows):
        ordered = sorted(rows, key=lambda r: (-r["n_tok"], r["source"]))
        assert [r["rnk"] for r in ordered] == list(range(1, len(rows) + 1))


class TestShardPlan:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        return QUERIES["q_shard_plan"](spark, sf_dir).collect()

    def test_all_shards_used_and_docs_partitioned(self, rows, spark, sf_dir):
        assert sorted(r["shard"] for r in rows) == list(range(8))
        assert sum(r["n_docs"] for r in rows) == load(
            spark, sf_dir, "documents"
        ).count()

    def test_bytes_partitioned(self, rows, spark, sf_dir):
        total = (
            load(spark, sf_dir, "documents")
            .agg(F.sum("n_chars").alias("s"))
            .collect()[0]["s"]
        )
        assert sum(r["bytes_sum"] for r in rows) == total

    def test_balance_within_one_max_doc(self, rows, spark, sf_dir):
        # equal-mass cutting bounds any shard's deviation from ideal by
        # the largest single document
        max_doc = (
            load(spark, sf_dir, "documents")
            .agg(F.max("n_chars").alias("m"))
            .collect()[0]["m"]
        )
        total = sum(r["bytes_sum"] for r in rows)
        ideal = total / 8
        for r in rows:
            assert abs(r["bytes_sum"] - ideal) <= max_doc + ideal / 100

    def test_load_ppm_formula(self, rows):
        total = sum(r["bytes_sum"] for r in rows)
        for r in rows:
            assert r["load_ppm"] == r["bytes_sum"] * 8 * 1_000_000 // total

    def test_python_replay(self, rows, spark, sf_dir):
        import hashlib

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "n_chars"
        ).collect()
        order = sorted(
            (hashlib.md5(str(d["doc_id"]).encode()).hexdigest(), d["doc_id"], d["n_chars"])
            for d in docs
        )
        wtot = sum(n for _, _, n in order)
        shards: dict[int, list[int]] = {}
        cum = 0
        for _, _, n in order:
            s = (cum * 8) // wtot
            agg = shards.setdefault(s, [0, 0])
            agg[0] += 1
            agg[1] += n
            cum += n
        for r in rows:
            assert shards[r["shard"]] == [r["n_docs"], r["bytes_sum"]]


class TestWriteBalancedShards:
    def test_writes_equal_mass_partition_dirs(self, spark, sf_dir, tmp_path):
        import os

        from nomad_event_streamer_spark.operators import sharding
        from nomad_event_streamer_spark.tables import load

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", F.col("n_chars").cast("long").alias("bytes")
        )
        path = os.path.join(str(tmp_path), "shards")
        sharding.write_balanced_shards(docs, path, num_shards=8)
        back = spark.read.parquet(path)
        # lossless: every doc in exactly one shard
        assert back.count() == docs.count()
        assert back.select("doc_id").distinct().count() == docs.count()
        per = {
            r["shard"]: r["b"]
            for r in back.groupBy("shard")
            .agg(F.sum("bytes").alias("b"))
            .collect()
        }
        assert sorted(per) == list(range(8))
        # the written shards realize the plan's byte sums exactly
        plan = {
            r["shard"]: r["bytes_sum"]
            for r in QUERIES["q_shard_plan"](spark, sf_dir).collect()
        }
        assert per == plan
        # one data file per shard directory (repartition-by-shard write)
        for k in range(8):
            files = [
                f
                for f in os.listdir(os.path.join(path, f"shard={k}"))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1

    def test_assignment_is_partitioning_invariant(self, spark, sf_dir):
        from nomad_event_streamer_spark.operators import sharding
        from nomad_event_streamer_spark.tables import load

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", F.col("n_chars").cast("long").alias("bytes")
        )
        a = {
            (r["doc_id"], r["shard"])
            for r in sharding.assign_shards(docs).collect()
        }
        b = {
            (r["doc_id"], r["shard"])
            for r in sharding.assign_shards(docs.repartition(13)).collect()
        }
        assert a == b

    def test_zero_byte_rows_stay_in_range(self, spark):
        """ADVICE r08 #2: a zero-byte row sorting LAST has start offset
        == wtot — the raw floor formula maps it to shard S (out of
        0..S-1); the clamp must keep every row in range, whichever
        md5-order position the zero-byte rows land in."""
        from pyspark.sql import Row

        from nomad_event_streamer_spark.operators import sharding

        rows = [Row(doc_id=i, bytes=(0 if i % 3 == 0 else 10)) for i in range(30)]
        docs = spark.createDataFrame(rows)
        out = sharding.assign_shards(docs, num_shards=4).collect()
        assert len(out) == 30
        assert all(r["shard"] is not None for r in out)
        assert {r["shard"] for r in out} <= set(range(4))

    def test_all_zero_bytes_goes_to_shard_zero(self, spark):
        """wtot == 0 has no mass to balance: documented degenerate case —
        every row lands in shard 0, never NULL."""
        from pyspark.sql import Row

        from nomad_event_streamer_spark.operators import sharding

        docs = spark.createDataFrame([Row(doc_id=i, bytes=0) for i in range(7)])
        out = sharding.assign_shards(docs, num_shards=4).collect()
        assert len(out) == 7
        assert {r["shard"] for r in out} == {0}
