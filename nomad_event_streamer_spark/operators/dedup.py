"""Deduplication operators for large-scale text corpora.

Four families, all pure DataFrame plans (no Python UDFs — everything stays
in whole-stage codegen and scales by shuffle-on-key):

- exact:   hash-group on a content digest; one shuffle on the digest.
- MinHash+LSH: shingle -> K min-wise hashes -> banded buckets -> bucket
  self-join for candidate pairs.  The band join is the scale path: at
  100 TB you never compare all pairs, only same-bucket pairs.
- n-gram Jaccard: exact set similarity for candidate verification via a
  shared-shingle equi-join (|A inter B| by join+count, |A|,|B| by group).
- SimHash: bit-wise majority vote over token hashes -> one 32-bit
  fingerprint per doc; near-dups collide or differ in few bits.

Cross-engine determinism: the hash primitive is md5-as-hex-string (both
Spark and DuckDB agree bit-for-bit), min-wise hashing uses the
*lexicographic* min of ``md5(seed || '|' || shingle)`` so the DuckDB
oracle can replay the exact computation in ANSI SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("toks", F.split(F.col(text_col), " "))


def shingles(docs: DataFrame, n: int = 3, doc_col: str = "doc_id") -> DataFrame:
    """Distinct n-token shingles per document.

    Array-level transform: shingle generation is per-row (no shuffle, no
    explode-then-window) — ``slice`` + ``concat_ws`` over the token array.
    """
    toks = F.split(F.col("text"), " ")
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(doc_col), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 16, doc_col: str = "doc_id"
) -> DataFrame:
    """K min-wise hashes per doc: ``min(md5(seed || '|' || shingle))`` for
    seed in 0..K-1.  The seed fan-out is an array transform + explode
    (per-row, shuffle-free); the only shuffle is the (doc, seed) groupBy."""
    seeded = sh.select(
        doc_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                lambda s: F.struct(
                    s.cast("int").alias("seed"),
                    F.md5(
                        F.concat_ws("|", s.cast("string"), F.col("shingle"))
                    ).alias("h"),
                ),
            )
        ).alias("sh"),
    ).select(doc_col, F.col("sh.seed").alias("seed"), F.col("sh.h").alias("h"))
    return seeded.groupBy(doc_col, "seed").agg(F.min("h").alias("mh"))


def lsh_bands(
    sig: DataFrame, rows_per_band: int = 2, doc_col: str = "doc_id"
) -> DataFrame:
    """Group the signature into bands; bucket id = md5 of the in-order
    concatenation of the band's min-hashes."""
    banded = sig.withColumn("band", F.floor(F.col("seed") / rows_per_band))
    bucket = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                lambda x: x["mh"],
            ),
            "|",
        )
    )
    return banded.groupBy(doc_col, "band").agg(bucket.alias("bucket"))


def lsh_candidate_pairs(bands: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Same-bucket self-join -> distinct candidate pairs (doc_a < doc_b).
    This join shuffles on (band, bucket) — bounded by bucket sizes, never
    all-pairs."""
    a = bands.select(
        F.col(doc_col).alias("doc_a"), F.col("band"), F.col("bucket")
    )
    b = bands.select(
        F.col(doc_col).alias("doc_b"), F.col("band"), F.col("bucket")
    )
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(sh: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard for every pair sharing >= 1 shingle.

    |A inter B| via shared-shingle equi-join + count; |A|,|B| via per-doc
    counts broadcast back.  jaccard = inter / (|A| + |B| - inter) — exact
    rational arithmetic in double, identical across engines."""
    sizes = sh.groupBy(doc_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(doc_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(doc_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    sa = sizes.select(F.col(doc_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(doc_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("ni").cast("double")
                / (F.col("na") + F.col("nb") - F.col("ni"))
            ).alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, doc_col: str = "doc_id", hex_chars: int = 8) -> DataFrame:
    """32-bit SimHash per document from md5 hex digits of each token.

    For hex position p (1..hex_chars) and bit b (0..3), each token votes
    +1/-1 by bit ``(hexdigit >> b) & 1`` of ``md5(token)[p]``; the
    fingerprint bit is the sign of the vote sum.  All arithmetic is
    integer/exact so the DuckDB oracle replays it bit-for-bit."""
    toks = docs.select(doc_col, F.explode(F.split("text", " ")).alias("tok"))
    hashed = toks.withColumn("h", F.md5("tok"))
    pb = hashed.select(
        doc_col,
        "h",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, {hex_chars}), "
                "p -> transform(sequence(0, 3), b -> struct(p as p, b as b))))"
            )
        ).alias("pb"),
    ).select(doc_col, "h", F.col("pb.p").alias("p"), F.col("pb.b").alias("b"))
    digit = F.expr("instr('0123456789abcdef', substring(h, p, 1)) - 1")
    # (digit >> b) & 1, expressed portably as floor(d / 2^b) % 2
    bit = (F.floor(digit / F.pow(F.lit(2.0), F.col("b"))) % 2).cast("long")
    votes = pb.withColumn("contrib", bit * 2 - 1).groupBy(doc_col, "p", "b").agg(
        F.sum("contrib").alias("s")
    )
    bitpos = (F.lit(hex_chars) - F.col("p")) * 4 + F.col("b")
    weight = F.pow(F.lit(2.0), bitpos).cast("long")
    return votes.groupBy(doc_col).agg(
        F.sum(F.when(F.col("s") > 0, weight).otherwise(F.lit(0))).alias("simhash")
    )
