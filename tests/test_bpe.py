"""BPE trainer/encoder tests — the Sennrich et al. (ACL 2016) worked
example with known merge order, plus encode round-trip properties."""

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.operators import bpe


@pytest.fixture(scope="module")
def sennrich_docs(spark):
    # word frequencies: low*5 lower*2 newest*6 widest*3 (paper's example)
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(
        [(0, " ".join(words))], ["doc_id", "text"]
    )


def test_bpe_train_sennrich_merge_order(sennrich_docs):
    merges = bpe_merges = bpe.bpe_train(
        sennrich_docs, num_merges=4, min_pair_count=2
    )
    # es appears in newest(6)+widest(3)=9 — the unique max; then est(9),
    # then est</w>(9) — each chained merge stays at count 9 and ties
    # break lexicographically against lo(7)/ow(7).
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", bpe.END)
    # fourth: l+o at 7 (low 5 + lower 2)
    assert merges[3] == ("l", "o")


def test_bpe_encode_applies_merges(spark, sennrich_docs):
    merges = bpe.bpe_train(sennrich_docs, num_merges=6, min_pair_count=2)
    out = bpe.bpe_encode(
        spark.createDataFrame([(1, "newest low")], ["doc_id", "text"]),
        merges,
    ).collect()[0]["bpe_tokens"]
    # 'newest' must end with the fused est</w>; 'low' with the fused lo
    assert "est" + bpe.END in out
    joined = "".join(out)
    assert joined == "newest" + bpe.END + "low" + bpe.END


def test_bpe_token_counts_positive(spark, sennrich_docs):
    merges = bpe.bpe_train(sennrich_docs, num_merges=3)
    counts = bpe.bpe_token_counts(sennrich_docs, merges).collect()
    assert all(r["n_bpe_tokens"] > 0 for r in counts)


def _ref_train(word_counts, num_merges, min_pair_count=2):
    # pure-python ONE-merge-per-round BPE (same helper as the fast-tier
    # twin tests/test_round13_bpe.py; duplicated because test modules
    # are not importable cross-file under rootdir collection)
    words = [(list(w) + [bpe.END], c) for w, c in word_counts]
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_count:
            break
        merges.append((l, r))
        words = [(bpe._fuse(syms, l, r), cnt) for syms, cnt in words]
    return merges


def test_batched_equals_sequential_seed_sweep(spark):
    """Round-13 batched-round referee, full-tier sweep: 10 seeded tie-
    and collision-heavy corpora vs the pure-python one-merge-per-round
    algorithm (fast-tier twin: tests/test_round13_bpe.py)."""
    import random

    for seed in range(100, 110):
        rng = random.Random(seed)
        alpha = "ab" if seed % 2 else "abc"
        words = {}
        for _ in range(rng.randint(12, 30)):
            w = "".join(
                rng.choice(alpha) for _ in range(rng.randint(1, 7))
            )
            words[w] = words.get(w, 0) + rng.randint(1, 6)
        wc = sorted(words.items())
        text = " ".join(w for w, c in wc for _ in range(c))
        df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
        got = bpe.bpe_train(df, num_merges=15)
        assert got == _ref_train(wc, 15), f"seed {seed}"


def test_bpe_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bpe.bpe_train(empty, num_merges=3) == []


def test_bpe_encode_unseen_chars(spark):
    # encoding with an empty merge list = character tokens + END marker
    df = spark.createDataFrame([(1, "ab")], ["doc_id", "text"])
    out = bpe.bpe_encode(df, []).collect()[0]["bpe_tokens"]
    assert out == ["a", "b", bpe.END]
