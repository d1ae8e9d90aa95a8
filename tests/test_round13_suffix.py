"""Round-13 optimization pins: the direct suffix-array form
(operators/suffix.py suffix_arrays + one bucketed global rank + the
zip_with LCP) must be bit-identical to the prefix-doubling chain it
replaced (suffix_rank_levels + the 7-level binary walk).

The doubling chain stays in the package as the long-document form and
serves as the referee here; a pure-Python brute force referees both.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from nomad_event_streamer_spark.operators import ranking
from nomad_event_streamer_spark.operators import suffix as sfx

# Deliberately nasty corpus: duplicate documents (every suffix class
# multiply occupied), one doc a prefix of another (pad ordering), deep
# shared prefixes (rank ties resolved only late in the doubling), a
# one-token doc, a doc with an empty token (split artifacts), and a doc
# at exactly 2^rounds tokens.
_ROUNDS = 3  # cap = 8 tokens
_DOCS = [
    (1, "a b c d e f g h"),
    (2, "a b c d e f g h"),
    (3, "a b c d"),
    (4, "a b c d e"),
    (5, "x"),
    (6, "a  b"),  # split on ' ' yields an empty middle token
    (7, "b a b a b a b"),
    (8, "c c c c c c c c"),
]


def _brute_final_ranks():
    """(doc, pos) -> dense rank of the suffix tail under (tail) order,
    tails truncated at 2^_ROUNDS tokens, shorter-prefix-first."""
    sufs = []
    for d, text in _DOCS:
        ts = text.split(" ")
        for p in range(1, len(ts) + 1):
            sufs.append((tuple(ts[p - 1 : p - 1 + (1 << _ROUNDS)]), d, p))
    tails = sorted({t for t, _, _ in sufs})
    rank = {t: i + 1 for i, t in enumerate(tails)}
    return {(d, p): rank[t] for t, d, p in sufs}


def test_suffix_arrays_rank_matches_doubling_chain(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    toks = sfx.token_positions(docs)
    old = {
        (r["doc_id"], r["pos"]): r["r"]
        for r in sfx.suffix_rank_levels(toks, _ROUNDS)[-1].collect()
    }
    suf = sfx.suffix_arrays(docs, _ROUNDS)
    new = {
        (r["doc_id"], r["pos"]): r["r"]
        for r in ranking.global_dense_rank(
            suf,
            ["sarr"],
            sfx.suffix_array_bucket(F.col("sarr")),
            "r",
        ).collect()
    }
    assert new == old
    assert new == _brute_final_ranks()


def test_zipwith_lcp_matches_brute_force(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    suf = sfx.suffix_arrays(docs, _ROUNDS)
    rn = ranking.global_row_number(
        suf,
        [F.col("sarr").asc(), F.col("doc_id").asc(), F.col("pos").asc()],
        bucket=sfx.suffix_array_bucket(F.col("sarr")),
        out_col="rn",
    )
    a = rn.select(
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
        F.col("sarr").alias("sa"),
        "rn",
    )
    b = rn.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        F.col("sarr").alias("sb"),
        (F.col("rn") - F.lit(1)).alias("rn"),
    )
    zipped = F.zip_with("sa", "sb", lambda x, y: x.eqNullSafe(y))
    p = F.array_position(zipped, F.lit(False))
    got = {
        (r["doc_a"], r["pos_a"], r["doc_b"], r["pos_b"]): r["lcp"]
        for r in a.join(b, "rn")
        .select(
            "doc_a",
            "pos_a",
            "doc_b",
            "pos_b",
            F.when(p == 0, F.size("sa")).otherwise(p - 1).alias("lcp"),
        )
        .collect()
    }
    # brute force: sort all (truncated) tails under (tail, doc, pos),
    # LCP of each adjacent pair
    sufs = []
    for d, text in _DOCS:
        ts = text.split(" ")
        for pp in range(1, len(ts) + 1):
            sufs.append(
                (tuple(ts[pp - 1 : pp - 1 + (1 << _ROUNDS)]), d, pp)
            )
    sufs.sort()
    want = {}
    for (ta, da, pa), (tb, db, pb) in zip(sufs, sufs[1:]):
        lcp = 0
        for x, y in zip(ta, tb):
            if x != y:
                break
            lcp += 1
        want[(da, pa, db, pb)] = lcp
    assert got == want
