"""Equivalence pin for the optimized unigram Viterbi E-step.

Round 12 (optimization) replaced the 12-round unrolled relational DP in
``operators/unigram.viterbi_emissions`` with one Arrow-batched
``mapInPandas`` pass (guide §4.2).  The DuckDB oracle still unrolls the
ORIGINAL relational DP as CTEs, so the driver hash gate already proves
end-to-end equality on the testdata; this test pins the per-word loop
against an independent brute-force referee on adversarial words —
tie-heavy, repeated chars, unreachable-piece shapes — so a future edit
to the loop cannot drift inside the class the corpus does not cover.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Row

from nomad_event_streamer_spark.operators import unigram


def _brute_force(word: str, cost: dict[str, int], max_piece: int):
    """Independent referee: min prefix cost per boundary (memoized),
    then the backtrace policy — walking right-to-left, at every
    boundary take the LONGEST piece whose prefix cost + piece cost
    equals the boundary's optimal prefix cost."""
    n = len(word)
    memo: dict[int, int | None] = {0: 0}

    def best_cost(j: int):  # min cost of word[:j]
        if j in memo:
            return memo[j]
        cands = [
            best_cost(j - k) + cost[word[j - k:j]]
            for k in range(1, min(max_piece, j) + 1)
            if word[j - k:j] in cost and best_cost(j - k) is not None
        ]
        memo[j] = min(cands) if cands else None
        return memo[j]

    if best_cost(n) is None:
        return None
    pieces = []
    j = n
    while j > 0:
        kbest = None
        for k in range(1, min(max_piece, j) + 1):
            piece = word[j - k:j]
            if piece not in cost or best_cost(j - k) is None:
                continue
            if best_cost(j - k) + cost[piece] == best_cost(j):
                kbest = k
        pieces.append(word[j - kbest:j])
        j -= kbest
    return sorted(pieces)


def test_viterbi_matches_brute_force(spark):
    # vocab with deliberate ties: 'ab'+'a' == 'a'+'ba' cost shapes,
    # an expensive single char, a 4-piece, and a char missing multis
    vocab_rows = [
        ("a", 5, 1000),
        ("b", 4, 2000),
        ("c", 1, 3000),
        ("ab", 3, 3000),  # tie with a+b path
        ("ba", 2, 2500),
        ("abab", 1, 5000),
        ("bb", 2, 1500),
    ]
    cost = {p: c for p, _f, c in vocab_rows}
    words = [
        "".join(t)
        for n in range(1, 6)
        for t in itertools.product("abc", repeat=n)
    ][:200] + ["abababab", "bbbbbbbb", "cacacaca", "abbaabba"]
    words = [w for w in words if len(w) <= unigram.MAXW]

    wdf = spark.createDataFrame([Row(w=w, cnt=1) for w in words])
    vdf = spark.createDataFrame(
        [Row(piece=p, freq=f, cost_milli=c) for p, f, c in vocab_rows]
    )
    emitted = (
        unigram.viterbi_emissions(wdf, vdf)
        .groupBy("w")
        .agg({"piece": "collect_list"})
        .collect()
    )
    got = {r["w"]: sorted(r["collect_list(piece)"]) for r in emitted}
    for w in words:
        want = _brute_force(w, cost, unigram.MAX_PIECE)
        assert got.get(w) == want, (w, got.get(w), want)
