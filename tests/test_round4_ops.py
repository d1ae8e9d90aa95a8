"""Semantics tests for the round-4 operators (VERDICT r03 item #8):
containment-from-MinHash (vs the exact shingle join), gear-hash CDC
(vs an independent pure-Python reimplementation + the edit-locality
property that motivates CDC), and maximal repeated-span lengths (vs a
hand-computable crafted corpus)."""

from __future__ import annotations

from nomad_event_streamer_spark.operators.dedup import (
    containment_minhash_pairs,
    containment_pairs,
)
from nomad_event_streamer_spark.operators.text import GEAR_TABLE, gear_chunks


def _doc(i: int, words: list[str]) -> tuple[int, str]:
    return (i, " ".join(words))


def test_containment_minhash_tracks_exact_on_subset_duplicate(spark):
    """A doc fully quoted inside a 4x longer one: the sketch estimate
    must agree with the exact join that cont(a in b) is near-total and
    cont(b in a) is small — the asymmetric signal containment exists
    for, recovered from sketches alone."""
    quoted = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    filler = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt ut labore et dolore magna aliqua "
    )
    df = spark.createDataFrame(
        [(1, quoted), (2, filler + quoted + " " + filler[::-1])],
        "doc_id long, text string",
    )
    est = {
        (r.doc_a, r.doc_b): r
        for r in containment_minhash_pairs(df, n=3, num_hashes=16).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r
        for r in containment_pairs(df, n=3, min_shared=1).collect()
    }
    assert (1, 2) in est, "LSH missed a true subset duplicate"
    e, x = est[(1, 2)], exact[(1, 2)]
    # exact says full containment of A; the estimate must land high
    assert x.cont_a_milli == 1000
    assert e.cont_a_est_milli >= 600
    # and both agree B is NOT inside A
    assert x.cont_b_milli < 400
    assert e.cont_b_est_milli < 500
    # set sizes riding the sketch are the exact ones
    assert e.na < e.nb


def test_containment_minhash_estimates_bounded_error_on_corpus(spark, sf_dir):
    """Cross-check sketch-join vs exact-join on the real corpus: every
    LSH candidate that the exact operator also scores must estimate
    containment within 250 milli on average (16-hash sketches are
    coarse; the screening decision they feed tolerates that)."""
    from nomad_event_streamer_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    est = containment_minhash_pairs(docs, n=3, num_hashes=16).collect()
    exact = {
        (r.doc_a, r.doc_b): r
        for r in containment_pairs(docs, n=3, min_shared=1).collect()
    }
    joint = [
        (e, exact[(e.doc_a, e.doc_b)])
        for e in est
        if (e.doc_a, e.doc_b) in exact
    ]
    assert joint, "no overlap between sketch candidates and exact pairs"
    errs = [abs(e.cont_a_est_milli - x.cont_a_milli) for e, x in joint]
    assert sum(errs) / len(errs) <= 250


def _py_gear_cuts(text: str, window: int = 16, modulus: int = 61) -> list[int]:
    """Independent pure-Python reimplementation of the gear predicate
    (same GEAR_TABLE constants, none of the Spark expression code)."""
    cuts = []
    for p in range(window + 1, len(text) + 1):
        h = 0
        for j in range(window):
            h += GEAR_TABLE[ord(text[p - 2 - j]) % 256] << j
        if h % modulus == 0:
            cuts.append(p)
    return cuts


def _py_gear_stats(text: str) -> tuple[int, int, int, int]:
    bounds = sorted({1, *(p for p in _py_gear_cuts(text)), len(text) + 1})
    lens = [b - a for a, b in zip(bounds, bounds[1:])]
    return (len(lens), min(lens), max(lens), sum(lens))


def test_gear_chunks_match_independent_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again " * 8,
        "short one",
        "x" * 200,
        "content defined chunking moves boundaries with the content " * 5,
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chunks, r.min_chunk, r.max_chunk, r.n_bytes)
        for r in gear_chunks(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_gear_stats(t), f"doc {i} diverges from reference"


def test_gear_cut_locality_under_edit():
    """The property CDC exists for, on the gear predicate itself: a
    one-character edit may only create/destroy cut points whose 16-byte
    window overlaps the edit — every boundary further away survives
    byte-for-byte.  (Pure Python on the shared GEAR_TABLE; no Spark.)"""
    base = (
        "distributed content defined chunking keeps boundaries stable "
        "under local edits because each cut depends on a bounded window "
        "of preceding bytes only, nothing else in the document matters "
    ) * 3
    m = len(base) // 2
    edited = base[:m] + "Q" + base[m + 1 :]
    a, b = set(_py_gear_cuts(base)), set(_py_gear_cuts(edited))
    # window of p covers positions p-16..p-1; edit at index m (1-based
    # m+1) can affect only p in [m+1, m+17]
    changed = a.symmetric_difference(b)
    assert changed <= set(range(m + 1, m + 18)), (
        f"non-local boundary change: {sorted(changed)} vs edit at {m + 1}"
    )
    far = {p for p in a if p < m - 20 or p > m + 40}
    assert far <= b, "a far-away boundary vanished"


def test_dup_span_lengths_measures_shared_region(spark):
    """Two docs sharing exactly one 20-token region inside unique
    filler: each must report ONE maximal run whose span length is the
    region's 20 tokens (run of 20-7+1 = 14 duplicated positions)."""
    shared = [f"s{i}" for i in range(20)]
    a = [f"a{i}" for i in range(15)] + shared + [f"A{i}" for i in range(15)]
    b = [f"b{i}" for i in range(10)] + shared + [f"B{i}" for i in range(20)]
    c = [f"c{i}" for i in range(40)]  # no overlap with anything
    df = spark.createDataFrame(
        [_doc(1, a), _doc(2, b), _doc(3, c)], "doc_id long, text string"
    )
    from nomad_event_streamer_spark.plans.llm_ops import q_dup_span_lengths

    # the plan reads {sf_dir}/documents.parquet; hand it a crafted one
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {r.doc_id: r for r in q_dup_span_lengths(spark, d).collect()}
    assert set(out) == {1, 2}, "only the two sharing docs may appear"
    for i in (1, 2):
        assert out[i].n_runs == 1
        assert out[i].max_span_tokens == 20
        assert out[i].dup_ngram_positions == 14


def test_sim_recall_values_are_sane(spark, sf_dir):
    """Recall table semantics: every query reports n_exact = 5, hits
    between 0 and 5, recall_milli = floor(hits/5*1000+0.5) exactly, and
    the bucketed path finds SOMETHING overall (a recall table of all
    zeros would mean the LSH plan broke, not that recall is low)."""
    from nomad_event_streamer_spark.plans.llm_ops import q_sim_recall

    rows = q_sim_recall(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_exact == 5
        assert 0 <= r.n_hits <= 5
        assert r.recall_milli == int(r.n_hits / 5 * 1000 + 0.5)
    assert sum(r.n_hits for r in rows) > 0


def test_dedup_incremental_flags_on_crafted_batch(spark):
    """Crafted corpus: index doc 0; new docs — 1 = verbatim copy of 0
    (dropped_exact AND dropped_near: identical signatures collide in
    every band), 3 = near-copy of 0 with one token changed
    (dropped_near only), 5 = unrelated (kept)."""
    import os
    import tempfile

    base = (
        "the quick brown fox jumps over the lazy dog while the busy "
        "spider spins a careful web across the quiet garden gate"
    )
    near = base.replace("garden", "meadow")
    other = "completely unrelated content about distributed query engines " \
            "and columnar storage formats nothing shared with the index"
    df = spark.createDataFrame(
        [(0, base), (1, base), (3, near), (5, other)],
        "doc_id long, text string",
    )
    from nomad_event_streamer_spark.plans.llm_ops import q_dedup_incremental

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {r.doc_id: r for r in q_dedup_incremental(spark, d).collect()}
    assert set(out) == {1, 3, 5}
    assert out[1].dropped_exact and out[1].dropped_near and not out[1].kept
    assert not out[3].dropped_exact
    assert out[3].dropped_near and not out[3].kept
    assert not out[5].dropped_exact and not out[5].dropped_near
    assert out[5].kept
