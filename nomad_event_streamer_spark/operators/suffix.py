"""Distributed suffix ranking by prefix doubling (Manber & Myers 1993;
Flick & Aluru, SC'15 "Parallel distributed memory construction of
suffix and LCP arrays" — the standard bulk-synchronous suffix-array
algorithm, which maps 1:1 onto DataFrame ops).

Upgrades the ExactSubstr family (Lee et al. 2022 §4) from fixed-k
shingle spans to TRUE suffix order: after ``rounds`` doubling steps the
rank of every document suffix is the dense rank of its
``2^rounds``-token prefix, so equal ranks = equal tails and
rank-adjacent suffixes maximize the longest-common-prefix — the exact
machinery maximal-repeat / exact-substring dedup needs.

Design for 100 TB:
- One doubling round = one self equi-join on (doc_id, pos + 2^j)
  (co-partitioned by doc) + one dense rank.  O(log maxlen) rounds
  TOTAL — round count is bounded by document length, NOT corpus size.
- Dense rank never runs a partitionless window: distinct pair classes
  (vocabulary-scale after round 0, at most suffix-scale later) ride the
  bucketed global-rank device (operators/ranking.py) and join back.
- Rank vectors are integers ⇒ the DuckDB oracle unrolls the identical
  rounds as chained CTEs with plain ``dense_rank()`` windows — full
  hash gate despite the iterative algorithm.

Reference parity: the reference pipeline (app.rb:1-278) has no text
indexing at all; this is EXT surface for the LLM-dedup north star.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from . import ranking

__all__ = [
    "token_positions",
    "suffix_rank_levels",
    "suffix_cte",
]


def token_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, tok) with 1-based positions (matches DuckDB's
    ``generate_subscripts``)."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("p0", "tok"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")


def suffix_rank_levels(toks: DataFrame, rounds: int) -> list[DataFrame]:
    """All prefix-doubling levels ``lv[j]``: (doc_id, pos, r) where r is
    the corpus-wide dense rank of the ``2^j``-token (zero-padded)
    prefix of the suffix at (doc_id, pos).  ``lv[rounds]`` is the final
    suffix rank, exact for documents up to ``2^rounds`` tokens.

    Execution (optimization round 12; ranks are unchanged — the oracle
    CTE chain in ``suffix_cte`` is the same):

    - The per-round ``(doc_id, pos + 2^j)`` self-join became a
      ``lead(r, 2^j)`` window over (doc_id, pos): positions are DENSE
      1..n per document (posexplode), so lead-by-h IS the rank at
      pos + h, with 0 beyond the end — two full-table shuffles per
      round gone (guide §2.4).
    - Dense ranks ride ``ranking.global_dense_rank`` (one bucketed
      window + a distinct-count offset table) instead of distinct +
      rank + token-scale join-back, bucketed by ``bitlen_subbucket`` so
      the top bucket holds ~1/32 of the rank space, not half.
    - Levels are localCheckpointed LAZILY (eager=False): lineage is
      still cut (level j feeds level j+1 and the binary LCP walk,
      which probes every level), but all levels materialize inside the
      consumer's ONE job with stage-level parallelism instead of
      ``rounds`` serialized driver-blocking jobs."""
    lv = (
        ranking.global_dense_rank(
            toks,
            ["tok"],
            F.substring("tok", 1, 1),
            "r",
        )
        .select("doc_id", "pos", F.col("r").cast("long").alias("r"))
        .localCheckpoint(eager=False)
    )
    levels = [lv]
    for j in range(rounds):
        h = 1 << j
        w_doc = Window.partitionBy("doc_id").orderBy(F.col("pos").asc())
        paired = lv.select(
            "doc_id",
            "pos",
            F.col("r").alias("r1"),
            F.coalesce(F.lead("r", h).over(w_doc), F.lit(0))
            .cast("long")
            .alias("r2"),
        )
        lv = (
            ranking.global_dense_rank(
                paired,
                ["r1", "r2"],
                ranking.bitlen_subbucket(F.col("r1")),
                "r",
            )
            .select("doc_id", "pos", F.col("r").cast("long").alias("r"))
            .localCheckpoint(eager=False)
        )
        levels.append(lv)
    return levels


def suffix_cte(rounds: int) -> str:
    """DuckDB CTE chain mirroring ``suffix_rank_levels`` exactly:
    ``t`` (token positions), ``lv0`` .. ``lv{rounds}``.  Callers append
    their own consuming CTEs / SELECT."""
    parts = [
        """t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    )""",
        """lv0 AS (
        SELECT doc_id, pos,
               CAST(dense_rank() OVER (ORDER BY tok) AS BIGINT) AS r
        FROM t
    )""",
    ]
    for j in range(rounds):
        h = 1 << j
        parts.append(
            f"""lv{j + 1} AS (
        SELECT a.doc_id, a.pos,
               CAST(dense_rank() OVER (ORDER BY a.r, coalesce(b.r, 0))
                    AS BIGINT) AS r
        FROM lv{j} a LEFT JOIN lv{j} b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + {h}
    )"""
        )
    return "WITH " + ",\n    ".join(parts)
