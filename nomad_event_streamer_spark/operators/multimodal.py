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
