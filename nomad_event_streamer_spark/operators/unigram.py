"""Unigram-LM (SentencePiece-style) subword tokenizer — seed fit plus
one integer-quantized EM round (Kudo, "Subword Regularization", ACL
2018 §3; the SentencePiece unigram model).  The second tokenizer family
every modern pipeline compares against BPE (operators/bpe.py).

Shape, and why it holds at 100 TB:
- The corpus is touched ONCE: a word-frequency aggregation (the BPE
  posture).  Everything after — seed-vocabulary extraction, Viterbi
  segmentation, the M-step recount — runs on the DISTINCT-WORD table,
  which is vocabulary-scale.
- Seed vocabulary = all single characters (feasibility floor) + the
  top-``top_multi`` substrings of length 2..``max_piece`` by corpus
  frequency (freq DESC, piece ASC tie-break).
- Piece costs are integer surprisal: cost_milli = 1000·(bitlen(total)
  − bitlen(freq)) — the house bit_length log2 device (within one bit
  of −log2 p, and hash-exact across engines where float logs never
  are).
- E-step: per-word Viterbi as an UNROLLED relational DP — ``maxw``
  rounds of dp(w, j) = min over k ≤ max_piece of dp(w, j−k) +
  cost(w[j−k+1 .. j]); ties in the backtrace break to the LONGEST
  piece (max k), the deterministic policy both engines replay.
- M-step: pieces emitted by the backtrace, weighted by word counts.
- Everything is integer ⇒ the DuckDB oracle unrolls the identical DP
  and backtrace as chained CTEs — FULL hash gate on an EM algorithm.

No reference counterpart (app.rb has no text analytics); EXT surface
beside BPE per the LLM-pipeline mandate.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "word_freq",
    "seed_vocab",
    "viterbi_emissions",
    "unigram_fit_oracle",
    "unigram_em_oracle",
]

MAX_PIECE = 4
TOP_MULTI = 64
MAXW = 12  # unrolled DP rounds; loud guard for longer words


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (w, cnt): the single corpus-sized aggregation."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _substring_freq(words: DataFrame, k: int) -> DataFrame:
    """(piece, freq) for all length-k substrings, weighted by word
    count.  The sequence guard matters: Spark's sequence(1, 0) counts
    DOWN instead of returning empty."""
    pos = F.expr(
        f"CASE WHEN length(w) >= {k} THEN sequence(1, length(w) - {k} + 1)"
        " ELSE array() END"
    )
    return (
        words.select("cnt", F.explode(pos).alias("i"), "w")
        .select(F.expr(f"substr(w, i, {k})").alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("freq"))
    )


def seed_vocab(
    words: DataFrame,
    max_piece: int = MAX_PIECE,
    top_multi: int = TOP_MULTI,
) -> DataFrame:
    """(piece, freq, cost_milli): all single chars + the top-
    ``top_multi`` multi-char substrings.  cost_milli is the bit_length
    surprisal against the vocabulary's total frequency mass."""
    singles = _substring_freq(words, 1)
    multis = None
    for k in range(2, max_piece + 1):
        part = _substring_freq(words, k)
        multis = part if multis is None else multis.unionAll(part)
    top = multis.orderBy(
        F.col("freq").desc(), F.col("piece").asc()
    ).limit(top_multi)
    vocab = singles.unionAll(top)
    tot = vocab.agg(F.sum("freq").cast("long").alias("total"))
    return vocab.crossJoin(F.broadcast(tot)).select(
        "piece",
        "freq",
        (
            1000
            * (F.length(F.bin("total")) - F.length(F.bin("freq")))
        )
        .cast("long")
        .alias("cost_milli"),
    )


def _guard_word_len(words: DataFrame, maxw: int) -> None:
    """Loud failure, never silent truncation: the unrolled DP covers
    words up to ``maxw`` chars (one vocab-scale agg)."""
    [row] = words.agg(F.max(F.length("w")).alias("mx")).collect()
    if row["mx"] is not None and row["mx"] > maxw:
        raise ValueError(
            f"unigram DP unrolled to {maxw} rounds but corpus has a "
            f"{row['mx']}-char word: raise MAXW"
        )


def viterbi_emissions(
    words: DataFrame,
    vocab: DataFrame,
    max_piece: int = MAX_PIECE,
    maxw: int = MAXW,
) -> DataFrame:
    """One E-step: Viterbi-segment every distinct word under the vocab
    costs and return the emitted pieces (w, piece) — one row per piece
    occurrence in the segmentation (a word may repeat a piece).

    Execution (optimization round 12, guide §4.2): ONE Arrow-batched
    ``mapInPandas`` pass over the distinct-word table, replaying the
    exact integer DP the oracle unrolls as CTEs — forward
    dp(j) = min over k <= max_piece of dp(j-k) + cost(w[j-k+1..j]),
    backtrace choosing at every boundary the LONGEST k whose candidate
    cost equals dp(j) exactly.  All arithmetic is integer, so the
    per-word loop is bit-identical to the previous 12-round relational
    unroll (the r11-r12 build-phase implementation), which cost 24
    eager localCheckpoints and ~100 word-keyed joins; the vocabulary
    (single chars + top-64 substrings, alphabet-bounded) ships in the
    closure — the broadcast-dim pattern of ``operators/bpe.py``.
    Equivalence is pinned by tests/test_unigram_viterbi.py and the
    unchanged CTE oracle.

    Contract (ADVICE r12): BOTH the forward DP and the backtrace honor
    the ``max_piece`` ARGUMENT — piece length is bounded by
    min(max_piece, j) in both loops.  The pre-r12 relational backtrace
    used the module constant MAX_PIECE regardless of the argument; that
    inconsistency was a bug, not a contract — do not reintroduce it as
    a "fix".  (No caller passes max_piece != MAX_PIECE today.)"""
    _guard_word_len(words, maxw)
    cost = {
        r["piece"]: r["cost_milli"]
        for r in vocab.select("piece", "cost_milli").collect()
    }

    def segment(batches):
        for pdf in batches:
            out_w: list[str] = []
            out_p: list[str] = []
            for w in pdf["w"]:
                n = len(w)
                if n == 0:
                    continue
                # forward DP over boundaries 0..n (dp[0] = 0); a None
                # means "boundary unreachable" (never happens in
                # practice — single chars of the corpus are always in
                # the vocab — but mirrors the relational "no dp row")
                dp: list = [None] * (n + 1)
                dp[0] = 0
                for j in range(1, n + 1):
                    best = None
                    for k in range(1, min(max_piece, j) + 1):
                        prev = dp[j - k]
                        if prev is None:
                            continue
                        c = cost.get(w[j - k:j])
                        if c is None:
                            continue
                        t = prev + c
                        if best is None or t < best:
                            best = t
                    dp[j] = best
                # backtrace: LONGEST k with dp[j-k] + cost == dp[j]
                # (ascending k loop keeps the last = max k, matching
                # the relational groupBy(w, j).max(k))
                j = n
                while j > 0 and dp[j] is not None:
                    kbest = None
                    for k in range(1, min(max_piece, j) + 1):
                        prev = dp[j - k]
                        if prev is None:
                            continue
                        c = cost.get(w[j - k:j])
                        if c is None:
                            continue
                        if prev + c == dp[j]:
                            kbest = k
                    if kbest is None:
                        break
                    out_w.append(w)
                    out_p.append(w[j - kbest:j])
                    j -= kbest
            yield pd.DataFrame({"w": out_w, "piece": out_p})

    return words.select("w").mapInPandas(segment, "w string, piece string")


def _words_cte() -> str:
    return """words AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    )"""


def _vocab_ctes(max_piece: int = MAX_PIECE, top_multi: int = TOP_MULTI) -> str:
    per_k = []
    for k in range(1, max_piece + 1):
        per_k.append(
            f"""sub{k} AS (
        SELECT substr(w.w, t.i, {k}) AS piece,
               CAST(sum(w.cnt) AS BIGINT) AS freq
        FROM words w,
             LATERAL (SELECT unnest(range(1, length(w.w) - {k} + 2)) AS i) t
        GROUP BY 1
    )"""
        )
    multi_union = " UNION ALL ".join(
        f"SELECT piece, freq FROM sub{k}" for k in range(2, max_piece + 1)
    )
    return (
        ",\n    ".join(per_k)
        + f""",
    topm AS (
        SELECT piece, freq FROM ({multi_union})
        ORDER BY freq DESC, piece LIMIT {top_multi}
    ),
    vocab AS MATERIALIZED (
        SELECT piece, freq FROM sub1 UNION ALL SELECT piece, freq FROM topm
    ),
    tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM vocab),
    vc AS MATERIALIZED (
        SELECT piece, freq,
               CAST(1000 * (length(bin(total)) - length(bin(freq)))
                    AS BIGINT) AS cost_milli
        FROM vocab, tot
    )"""
    )


def unigram_fit_oracle(top_out: int = 20) -> str:
    return (
        "WITH "
        + _words_cte()
        + ",\n    "
        + _vocab_ctes()
        + f"""
    SELECT piece, freq, cost_milli,
           CAST(row_number() OVER (ORDER BY freq DESC, piece) AS BIGINT)
               AS rnk
    FROM (SELECT * FROM vc ORDER BY freq DESC, piece LIMIT {top_out})
    """
    )


def _em_parts(max_piece: int = MAX_PIECE, maxw: int = MAXW) -> list[str]:
    """Shared CTE chain: words → vocab costs → unrolled DP forward →
    unrolled backtrace steps (``step_1`` .. ``step_{maxw}``).  Both EM
    consumers (the M-step table and the per-doc token counts) append
    their own finishers."""
    parts = [
        "WITH "
        + _words_cte()
        + ",\n    "
        + _vocab_ctes()
        + """,
    dp_0 AS (SELECT w, 0 AS j, CAST(0 AS BIGINT) AS c FROM words)"""
    ]
    for j in range(1, maxw + 1):
        branches = []
        for k in range(1, min(max_piece, j) + 1):
            branches.append(
                f"""SELECT d.w, d.c + v.cost_milli AS c
            FROM dp_{j - k} d
            JOIN vc v ON v.piece = substr(d.w, {j - k + 1}, {k})
            WHERE length(d.w) >= {j}"""
            )
        union = "\n            UNION ALL ".join(branches)
        parts.append(
            f"""dp_{j} AS MATERIALIZED (
        SELECT w, {j} AS j, CAST(min(c) AS BIGINT) AS c
        FROM ({union})
        GROUP BY w
    )"""
        )
    dp_union = " UNION ALL ".join(
        f"SELECT w, j, c FROM dp_{j}" for j in range(maxw + 1)
    )
    parts.append(f"dp_all AS MATERIALIZED ({dp_union})")
    parts.append(
        """cur_0 AS (SELECT w, length(w) AS j FROM words WHERE length(w) > 0)"""
    )
    for r in range(1, maxw + 1):
        branches = []
        for k in range(1, max_piece + 1):
            branches.append(
                f"""SELECT c.w, c.j, {k} AS k
            FROM cur_{r - 1} c
            JOIN vc v ON v.piece = substr(c.w, c.j - {k} + 1, {k})
            JOIN dp_all dc ON dc.w = c.w AND dc.j = c.j
            JOIN dp_all dpv ON dpv.w = c.w AND dpv.j = c.j - {k}
            WHERE c.j >= {k} AND dpv.c + v.cost_milli = dc.c"""
            )
        union = "\n            UNION ALL ".join(branches)
        parts.append(
            f"""step_{r} AS MATERIALIZED (
        SELECT w, j, max(k) AS k FROM ({union}) GROUP BY w, j
    )"""
        )
        parts.append(
            f"""cur_{r} AS (
        SELECT w, j - k AS j FROM step_{r} WHERE j - k > 0
    )"""
        )
    return parts


def _emit_union(maxw: int = MAXW) -> str:
    return " UNION ALL ".join(
        f"SELECT w, substr(w, j - k + 1, k) AS piece FROM step_{r}"
        for r in range(1, maxw + 1)
    )


def unigram_em_oracle(
    max_piece: int = MAX_PIECE, maxw: int = MAXW, top_out: int = 20
) -> str:
    parts = _em_parts(max_piece, maxw)
    parts.append(
        f"""newcnt AS (
        SELECT e.piece, CAST(sum(words.cnt) AS BIGINT) AS new_cnt
        FROM ({_emit_union(maxw)}) e JOIN words ON words.w = e.w
        GROUP BY e.piece
    )"""
    )
    sql = ",\n    ".join(parts)
    sql += f"""
    SELECT vc.piece, vc.freq AS seed_freq,
           coalesce(n.new_cnt, 0) AS new_cnt,
           CAST(row_number() OVER (ORDER BY coalesce(n.new_cnt, 0) DESC,
                                   vc.piece) AS BIGINT) AS rnk
    FROM (
        SELECT vc.piece FROM vc LEFT JOIN newcnt n ON n.piece = vc.piece
        ORDER BY coalesce(n.new_cnt, 0) DESC, vc.piece LIMIT {top_out}
    ) sel
    JOIN vc ON vc.piece = sel.piece
    LEFT JOIN newcnt n ON n.piece = sel.piece
    """
    return sql


def unigram_token_count_oracle(
    max_piece: int = MAX_PIECE, maxw: int = MAXW
) -> str:
    """Per-document token counts under the Viterbi segmentation: each
    word's piece count is its backtrace emission count; documents roll
    up by word (the _bpe_token_count_oracle factoring)."""
    parts = _em_parts(max_piece, maxw)
    parts.append(
        f"""wn AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n
        FROM ({_emit_union(maxw)}) GROUP BY w
    )"""
    )
    sql = ",\n    ".join(parts)
    sql += """
    SELECT d.doc_id,
           CAST(coalesce(t.n_tok, 0) AS BIGINT) AS n_unigram_tokens
    FROM documents d LEFT JOIN (
        SELECT doc_id, sum(wn.n) AS n_tok
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents) wpd
        JOIN wn ON wpd.w = wn.w
        WHERE wpd.w <> ''
        GROUP BY doc_id
    ) t ON d.doc_id = t.doc_id
    """
    return sql
