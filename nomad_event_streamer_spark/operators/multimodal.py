"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

Contract: image/audio/video bytes travel as a ``binary`` column next to a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each executor processes whole record batches without
per-row Python overhead.  The *decode* itself is stubbed (the real codec
libraries are not in this container — see ``decode_image_stub``); the
Spark-side plumbing (schema, batch iteration, partitioning) is real and
tested.

At 100 TB: binary payloads dominate size, so the pattern is
scan -> (pushdown-prune metadata) -> repartition to decode parallelism ->
mapInPandas decode -> write features columnar.  Nothing here collects to
the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("head_byte", LongType()),
    ]
)


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decoder.

    A real implementation would do ``PIL.Image.open(io.BytesIO(payload))``
    etc.; codec libraries are unavailable here, so we emit exact byte-level
    features that an oracle can verify.  Raise NotImplementedError for the
    parts that genuinely need a codec."""
    return {"n_bytes": len(payload), "head_byte": payload[0] if payload else None}


def real_decode_unavailable(payload: bytes):  # pragma: no cover
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "decode_image_stub provides the deterministic stand-in"
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Stand-in multimodal table: text bytes as the opaque payload column
    (the testdata ships no real media; the binary plumbing is identical)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def frame_sample(
    binary_df: DataFrame,
    frame_size: int = 64,
    stride: int = 128,
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling over an opaque binary payload: one fixed-size slice
    every ``stride`` bytes (the video-keyframe access pattern), each
    fingerprinted.  Pure per-row Column ops on the BINARY column —
    explode of byte offsets + substring + md5; a real codec would replace
    the fingerprint with a decode inside mapInPandas (see
    decode_features), the slicing/batching plumbing is identical."""
    n_frames = F.ceil(F.length(payload_col) / F.lit(stride))
    base = binary_df.select(
        "doc_id",
        F.col(payload_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames, F.lit(1)) - 1)
        ).alias("frame_id"),
    )
    frame = F.expr(f"substring({payload_col}, frame_id * {stride} + 1, {frame_size})")
    return base.select(
        "doc_id",
        "frame_id",
        F.md5(frame).alias("frame_fp"),
        F.length(frame).alias("frame_len"),
    )


def resize_payload(
    binary_df: DataFrame, size: int = 256, payload_col: str = "payload"
) -> DataFrame:
    """Resize-to-budget stub: truncate the payload to ``size`` bytes and
    fingerprint the result (a real image resize runs in mapInPandas; the
    byte-level contract — bounded output size per row — is the same)."""
    resized = F.expr(f"substring({payload_col}, 1, {size})")
    return binary_df.select(
        "doc_id",
        F.length(resized).alias("thumb_len"),
        F.md5(resized).alias("thumb_fp"),
    )


def decode_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, payload) batches."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "head_byte": [f["head_byte"] for f in feats],
                }
            )

    return binary_df.mapInPandas(decode_batches, DECODE_SCHEMA)
