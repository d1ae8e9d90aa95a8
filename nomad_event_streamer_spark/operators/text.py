"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All pure Column expressions (whole-stage codegen; zero UDFs), and all
cross-engine deterministic: ratios are exact rationals in double, hashes
are md5 hex strings, tie-breaks are lexicographic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..tables import round4

# Marker-token profiles for the rule-based language scorer.  The testdata
# vocabulary is synthetic, so the profiles are arbitrary-but-fixed; the
# operator's mechanics (per-language evidence scores -> argmax with
# deterministic tie-break) are what carry to a real corpus.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("scan", "filter"),
    "en": ("the", "a", "table"),
    "es": ("data", "row"),
    "fr": ("query", "merge"),
    "zh": ("vector", "stream"),
}


def _count_in(toks: Column, markers: tuple[str, ...]) -> Column:
    in_set = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(in_set, t)))


def lang_scores(docs: DataFrame) -> DataFrame:
    """Per-doc marker counts for every language — conditional aggregation
    over the token array, no explode, no shuffle."""
    toks = F.split(F.col("text"), " ")
    cols = {f"s_{lang}": _count_in(toks, m).cast("long") for lang, m in LANG_MARKERS.items()}
    return docs.withColumns(cols)


def predict_lang() -> Column:
    """argmax over the score columns; ties go to the alphabetically first
    language (the CASE order) so the result is deterministic."""
    langs = sorted(LANG_MARKERS)
    expr = F.lit(langs[-1])
    # Build the CASE chain back-to-front: earlier languages win ties.
    for i in range(len(langs) - 2, -1, -1):
        rest = [F.col(f"s_{other}") for other in langs[i + 1 :]]
        expr = F.when(
            F.col(f"s_{langs[i]}") >= F.greatest(*rest) if len(rest) > 1 else F.col(f"s_{langs[i]}") >= rest[0],
            F.lit(langs[i]),
        ).otherwise(expr)
    return expr


def quality_features(docs: DataFrame) -> DataFrame:
    """Length / stopword-ratio quality features + a composite score.

    score = min(1, n_tok/100) * (1 - stop_ratio): favors long documents
    with low filler density.  Exact rational arithmetic."""
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("long")
    stop = _count_in(toks, ("a", "the")).cast("long")
    stop_ratio = stop.cast("double") / n_tok
    score = F.least(F.lit(1.0), n_tok / F.lit(100.0)) * (F.lit(1.0) - stop_ratio)
    return docs.withColumns(
        {
            "n_tok": n_tok,
            "stop_ratio": round4(stop_ratio),
            "quality": round4(score),
        }
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count, distinct-token count, regex word count,
    char count."""
    toks = F.split(F.col("text"), " ")
    return docs.withColumns(
        {
            "n_ws": F.size(toks).cast("long"),
            "n_uniq": F.size(F.array_distinct(toks)).cast("long"),
            "n_words_re": F.regexp_count(F.col("text"), F.lit("[a-z]+")).cast("long"),
            "n_chars_len": F.length("text").cast("long"),
        }
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprints: raw md5, and an order-insensitive fingerprint
    (md5 of the sorted distinct token set) that survives token
    reordering — the cheap "same bag of words" near-dup signal."""
    toks = F.split(F.col("text"), " ")
    return docs.withColumns(
        {
            "fp": F.md5("text"),
            "fp_short": F.substring(F.md5("text"), 1, 8),
            "fp_sorted": F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")),
        }
    )
