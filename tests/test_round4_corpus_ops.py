"""Property tests for the round-4 corpus-hygiene operators: winnowing's
shared-substring guarantee and density bound, chunk-dedup's byte-exact
reassembly, bigram-vs-unigram surprisal semantics, the novelty curve's
conservation law, and Wilson-bound ordering."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Window

from nomad_event_streamer_spark.plans.corpus_queries import (
    q_bigram_surprisal,
    q_chunk_dedup,
    q_ngram_novelty,
    q_quality_wilson,
    q_winnow_fingerprint,
    q_zipf_slope,
)


def test_winnow_density_bound(spark, sf_dir):
    """Winnowing selects at most one fingerprint per window start, and at
    least ceil(n_windows / w) of them (each selection can cover at most w
    windows) — the 2/(w+1) expected-density algorithm's hard bounds."""
    out = q_winnow_fingerprint(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("T")
    )
    j = out.join(docs, "doc_id").withColumn(
        "n_windows", F.col("T") - 4 + 1 - 5 + 1
    )
    bad = j.where(
        (F.col("n_fp") > F.col("n_windows"))
        | (F.col("n_fp") * 5 < F.col("n_windows"))
    ).count()
    assert bad == 0


def test_winnow_shared_substring_guarantee(spark):
    """Two docs sharing a >= w+k-1 = 8-token substring must share at
    least one (hash, local-relative) fingerprint hash — the winnowing
    correctness theorem (Schleimer et al. §3).  Checked on a constructed
    pair via the fingerprint *sets* (recomputed at row level)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    d1 = "x1 x2 " + shared + " y1 y2"
    d2 = "z1 " + shared + " w1 w2 w3"

    def fps(text: str, k: int = 4, w: int = 5) -> set[str]:
        toks = text.split(" ")
        grams = [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ]
        keys = [
            int(hashlib.md5(g.encode()).hexdigest()[:10], 16) * (1 << 20)
            + ((1 << 20) - 1 - (i + 1))
            for i, g in enumerate(grams)
        ]
        sel = {
            min(keys[p : p + w]) >> 20
            for p in range(0, len(keys) - w + 1)
        }
        return {hex(h) for h in sel}

    assert fps(d1) & fps(d2), "shared 8-token substring yielded no shared fp"


def test_chunk_dedup_reassembly_is_byte_exact(spark, sf_dir):
    """A document whose chunks are all kept must reassemble to exactly
    its original text (kept_md5 == md5(text), kept_bytes == length)."""
    out = q_chunk_dedup(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.md5("text").alias("h"), F.length("text").alias("L")
    )
    full = out.where(F.col("n_kept") == F.col("n_chunks")).join(docs, "doc_id")
    assert full.count() > 0
    bad = full.where(
        (F.col("kept_md5") != F.col("h")) | (F.col("kept_bytes") != F.col("L"))
    ).count()
    assert bad == 0
    # and kept never exceeds total
    assert out.where(F.col("n_kept") > F.col("n_chunks")).count() == 0


def test_bigram_surprisal_bounds(spark, sf_dir):
    """Each bigram's surprisal is in [0, bit_length(total prefix count)]
    and a doc's total is bounded by n_bigrams * max-bits; also every doc
    with >= 2 tokens appears exactly once."""
    out = q_bigram_surprisal(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.size(F.split("text", " ")) >= 2
    )
    assert out.count() == docs.count()
    bad = out.where(
        (F.col("surprisal_bits") < 0)
        | (F.col("surprisal_bits") > F.col("n_bigrams") * 64)
    ).count()
    assert bad == 0


def test_novelty_conservation(spark, sf_dir):
    """Sum of novel shingles over all docs == corpus-wide distinct
    shingle count (each shingle is novel exactly once), and the earliest
    doc is 100% novel."""
    out = q_ngram_novelty(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from nomad_event_streamer_spark.operators import dedup

    n_distinct = dedup.shingles(docs, n=3).select("shingle").distinct().count()
    total_novel = out.agg(F.sum("n_novel")).collect()[0][0]
    assert total_novel == n_distinct
    first = out.orderBy("doc_id").first()
    assert first["n_novel"] == first["n_shingles"]


def test_wilson_below_pointwise_rate(spark, sf_dir):
    """The Wilson lower bound is a LOWER bound: wlb <= n_pass/n for
    every source, and it is within [0, 1]."""
    rows = q_quality_wilson(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lb"] <= 1.0
        assert r["wilson_lb"] <= r["n_pass"] / r["n"] + 1e-12


def test_t_closeness_emd_in_unit_range(spark, sf_dir):
    """EMD is a metric on probability distributions normalized by (m-1):
    0 <= num/den <= 1 for every group, and the t-flag is consistent
    with the 0.2 threshold."""
    from nomad_event_streamer_spark.plans.corpus_queries import q_t_closeness

    rows = q_t_closeness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["emd_num"] <= r["emd_den"]
        assert r["above_t"] == (r["emd_num"] * 5 > r["emd_den"])


def test_mix_temperature_flattens(spark, sf_dir):
    """α=1/2 temperature scaling compresses the share ratio: the
    max/min ppm ratio must not exceed sqrt(max/min doc-count ratio)
    (+1 ppm slack for the floor), and shares sum to ~1e6."""
    from nomad_event_streamer_spark.plans.corpus_queries import (
        q_mix_temperature,
    )

    rows = q_mix_temperature(spark, sf_dir).collect()
    tot = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= tot <= 1_000_000
    n_hi = max(r["n"] for r in rows)
    n_lo = min(r["n"] for r in rows)
    p_hi = max(r["share_ppm"] for r in rows)
    p_lo = min(r["share_ppm"] for r in rows)
    assert (p_hi / p_lo) ** 2 <= (n_hi / n_lo) * 1.01 + 1


def test_systematic_sample_mass_and_bounds(spark, sf_dir):
    """Exactly k boundary slots are covered (sum of n_slots == k minus
    any boundary landing at offset 0), selected docs are distinct, and
    no doc claims more slots than its token mass allows."""
    from nomad_event_streamer_spark.plans.corpus_queries import (
        q_systematic_sample,
    )

    rows = q_systematic_sample(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    total_slots = sum(r["n_slots"] for r in rows)
    assert 99 <= total_slots <= 100
    for r in rows:
        assert r["n_slots"] >= 1


def test_interval_join_matches_quadratic(spark, sf_dir):
    """The banded plan must equal the naive θ-join computed driver-side
    on the same session table (the oracle's semantics, re-derived
    independently in python)."""
    from nomad_event_streamer_spark.plans.corpus_queries import (
        q_interval_join,
    )
    from nomad_event_streamer_spark.tables import events

    banded = {
        (r["user_id"], r["session_id"]): r["n_concurrent"]
        for r in q_interval_join(spark, sf_dir).collect()
    }
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = (
        ev.withColumn(
            "is_new",
            F.when(
                F.lag("ts_us").over(w).isNull()
                | (
                    (F.col("ts_us") - F.lag("ts_us").over(w))
                    > 2 * 3600 * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("is_new").over(ws))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts_us").alias("s"), F.max("ts_us").alias("e"))
        .collect()
    )
    naive: dict = {}
    for a in sess:
        c = sum(
            1
            for b in sess
            if a["user_id"] != b["user_id"] and a["s"] <= b["e"] and b["s"] <= a["e"]
        )
        if c:
            naive[(a["user_id"], a["session_id"])] = c
    assert banded == naive


def test_wav_codec_roundtrip_and_validation():
    """encode_wav/decode_wav round-trip bit-exactly, skip unknown RIFF
    chunks (honoring the even-byte padding rule), and reject non-PCM /
    truncated / foreign containers."""
    import struct

    import numpy as np
    import pytest

    from nomad_event_streamer_spark.operators import multimodal as m

    s = m._sample_stream(7, m._sample_count(7))
    w = m.encode_wav(s)
    s2, sr = m.decode_wav(w)
    assert sr == m.WAV_SAMPLE_RATE and (s2 == s).all()
    # odd-size unknown chunk before fmt: walker must skip size+pad bytes
    lst = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    w2 = w[:12] + lst + w[12:]
    w2 = w2[:4] + struct.pack("<I", len(w2) - 8) + w2[8:]
    s3, _ = m.decode_wav(w2)
    assert (s3 == s).all()
    with pytest.raises(ValueError):
        m.decode_wav(b"RIFFxxxxAVI " + w[12:])
    # stereo fmt chunk must be rejected
    bad_fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 2, 8000, 32000, 4, 16
    )
    bad = w[:12] + bad_fmt + w[12 + 24 :]
    with pytest.raises(ValueError):
        m.decode_wav(bad)


def test_wav_empty_data_chunk_yields_zero_stats(spark):
    """A structurally valid WAV with a zero-length data chunk (legal:
    an empty recording) must decode to n_samples=0 with zeroed stats,
    not crash the partition."""
    import numpy as np

    from nomad_event_streamer_spark.operators import multimodal as m

    empty = m.encode_wav(np.array([], dtype=np.int16))
    s, sr = m.decode_wav(empty)
    assert s.size == 0 and sr == m.WAV_SAMPLE_RATE
    df = spark.createDataFrame([(1, bytearray(empty))], m.PAYLOAD_SCHEMA)
    row = m.decode_audio_stats(df).collect()[0]
    assert (row["n_samples"], row["sum_abs"], row["max_abs"],
            row["zero_cross"]) == (0, 0, 0, 0)


def test_gear_chunks_window_overflow_guard(spark, sf_dir):
    """window > 23 would overflow int64 in the shifted gear sum (Spark
    wraps silently, the oracle errors) — must raise instead."""
    import pytest

    from nomad_event_streamer_spark.operators.text import gear_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1)
    with pytest.raises(ValueError, match="window"):
        gear_chunks(docs, window=24)


def test_audio_stats_match_signal(spark, sf_dir):
    """Every document yields one stats row and the zero-crossing count
    is bounded by n_samples - 1."""
    from nomad_event_streamer_spark.plans.corpus_queries import (
        q_audio_pcm_stats,
    )

    out = q_audio_pcm_stats(spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = out.collect()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r["zero_cross"] <= r["n_samples"] - 1
        assert 0 < r["max_abs"] <= 32768
        assert r["sample_rate"] == 8000


def test_class_balance_is_exact_and_deterministic(spark, sf_dir):
    """All classes keep exactly the min class count, and a second run
    selects the identical membership (checksums equal)."""
    from nomad_event_streamer_spark.plans.corpus_queries import (
        q_class_balance,
    )

    a = {r["lang"]: (r["n_kept"], r["id_checksum"])
         for r in q_class_balance(spark, sf_dir).collect()}
    kept_counts = {v[0] for v in a.values()}
    assert len(kept_counts) == 1
    b = {r["lang"]: (r["n_kept"], r["id_checksum"])
         for r in q_class_balance(spark, sf_dir).collect()}
    assert a == b


def test_exactsubstr_cut_rewrite_semantics(spark, sf_dir):
    """Uncut documents reassemble to exactly their original text; cut
    documents lose at least MIN_CUT tokens per region and never more
    than the whole document."""
    from nomad_event_streamer_spark.plans.corpus_queries import (
        _XS_MIN_CUT,
        q_exactsubstr_cut,
    )

    out = q_exactsubstr_cut(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.md5("text").alias("orig_md5")
    )
    j = out.join(docs, "doc_id")
    assert j.where(
        (F.col("n_regions") == 0)
        & ((F.col("n_cut") != 0) | (F.col("kept_md5") != F.col("orig_md5")))
    ).count() == 0
    cut_docs = j.where(F.col("n_regions") > 0)
    assert cut_docs.count() > 0
    # regions may overlap in token space (maximal runs separated by one
    # unflagged position still cover overlapping 7-grams), so the union
    # bound is >= MIN_CUT, not MIN_CUT * n_regions
    assert cut_docs.where(
        (F.col("n_cut") < F.lit(_XS_MIN_CUT))
        | (F.col("n_cut") > F.col("n_tokens"))
        | (F.col("kept_md5") == F.col("orig_md5"))
    ).count() == 0


def test_skyline_matches_bruteforce(spark, sf_dir):
    """The bucketed sort-sweep must equal quadratic dominance checking
    re-derived in python over the distinct value pairs."""
    from nomad_event_streamer_spark.plans.corpus_queries import q_skyline

    got = {
        (r["cents"], r["size"]) for r in q_skyline(spark, sf_dir).collect()
    }
    parts = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.floor(F.col("p_retailprice") * 100.0 + 0.5).cast("long").alias("c"),
        F.col("p_size").cast("long").alias("s"),
    ).distinct().collect()
    pts = [(r["c"], r["s"]) for r in parts]
    brute = {
        p
        for p in pts
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and q != p for q in pts
        )
    }
    assert got == brute


def test_countmin_one_sided_error(spark, sf_dir):
    """CMS estimates never undercount, and at w=16 the 31-token
    vocabulary collides, so at least one probe strictly overestimates."""
    from nomad_event_streamer_spark.plans.sketch_queries import q_countmin

    rows = q_countmin(spark, sf_dir).collect()
    assert all(r["est"] >= r["exact"] for r in rows)
    assert all(r["is_overestimate"] for r in rows)
    assert any(r["est"] > r["exact"] for r in rows)


def test_weighted_median_balance(spark, sf_dir):
    """At the weighted median m: weight of {val <= m} >= tot/2 AND
    weight of {val >= m} >= tot/2 (the defining property), re-derived
    independently from the raw table."""
    from nomad_event_streamer_spark.plans.corpus_queries import (
        q_weighted_median,
    )

    med = {r["lang"]: r["wmedian"]
           for r in q_weighted_median(spark, sf_dir).collect()}
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", "n_chars", F.size(F.split("text", " ")).alias("w"))
        .collect()
    )
    from collections import defaultdict

    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append((r["n_chars"], r["w"]))
    for lang, pts in by_lang.items():
        m = med[lang]
        tot = sum(w for _, w in pts)
        below = sum(w for v, w in pts if v <= m)
        above = sum(w for v, w in pts if v >= m)
        assert 2 * below >= tot and 2 * above >= tot, lang


def test_seasonal_index_mass_weighted_mean_is_unit(spark, sf_dir):
    """Event-count-weighted mean of the per-weekday indices is ~1000
    milli (each index is the ratio of that day's mean to the overall
    mean), within integer-division slack."""
    from nomad_event_streamer_spark.plans.timeseries_queries import (
        q_seasonal_index,
    )

    rows = q_seasonal_index(spark, sf_dir).collect()
    tn = sum(r["n"] for r in rows)
    weighted = sum(r["n"] * r["index_milli"] for r in rows) / tn
    assert abs(weighted - 1000) <= 2


def test_autocorr_bounded(spark, sf_dir):
    """|r_k| <= 1 ⟺ r_num² <= den_x·den_y, and variances positive."""
    from nomad_event_streamer_spark.plans.timeseries_queries import q_autocorr

    for r in q_autocorr(spark, sf_dir).collect():
        assert r["den_x"] > 0 and r["den_y"] > 0
        assert r["r_num"] * r["r_num"] <= r["den_x"] * r["den_y"]


def test_zipf_slope_is_negative(spark, sf_dir):
    """Frequency decreases with rank, so the octave-binned regression
    slope must be negative and the denominator positive."""
    row = q_zipf_slope(spark, sf_dir).collect()[0]
    assert row["slope_den"] > 0
    assert row["slope_num"] < 0
    assert row["n_vocab"] > 1
