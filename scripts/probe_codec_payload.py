"""Payload-scaling probe for the re-encode codecs (VERDICT r06 item #5).

The ×10/×30 replica probes scale ROW count; for the two mapInPandas
re-encode codecs (q_image_resize / q_audio_resample) the other axis is
PAYLOAD size — bytes per document.  This probe holds rows fixed (sf0.1
documents, 5000 rows) and scales the per-doc payload 4× (images: 2×
width and 2× height; audio: 4× sample count), timing the full
decode → transform → re-encode pipelines end-to-end (noop sink).

A healthy codec is per-byte-linear with a fixed per-row overhead: the
×4-payload wall should sit well UNDER 4× of the ×1 wall at these sizes
(per-row Python/Arrow overhead dominates tiny payloads and amortizes as
payloads grow).  Super-linear growth would mean a copy inside the codec
loop — the thing to catch before 100 TB.

Usage: python scripts/probe_codec_payload.py
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from nomad_event_streamer_spark.operators import multimodal as mm  # noqa: E402
from nomad_event_streamer_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def synthetic_media_scaled(docs, mult: int):
    """synthetic_media with payload dims scaled: images sqrt(mult) per
    axis (mult x pixels), audio mult x samples.  mult=1 reproduces the
    registered operator's payloads bit-for-bit."""
    axis = int(round(mult**0.5))

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"].astype("int64"):
                doc_id = int(doc_id)
                w, h = mm._media_dims(doc_id)
                w, h = w * axis, h * axis
                if doc_id % 2 == 0:
                    px = mm._pixel_stream(doc_id, w * h * 3).reshape(h, w, 3)
                    payloads.append(mm.encode_bmp(px))
                else:
                    px = mm._pixel_stream(doc_id, w * h).reshape(h, w)
                    payloads.append(mm.encode_pgm(px))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(encode_batches, mm.PAYLOAD_SCHEMA)


def synthetic_audio_scaled(docs, mult: int):
    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"].astype("int64"):
                doc_id = int(doc_id)
                n = mm._sample_count(doc_id) * mult
                payloads.append(mm.encode_wav(mm._sample_stream(doc_id, n)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(encode_batches, mm.PAYLOAD_SCHEMA)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def median3(fn) -> float:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return sorted(runs)[1]


def main() -> None:
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    docs = spark.read.parquet(f"{SRC}/documents.parquet").repartition(32)
    docs.count()
    # warm the Python worker pool
    force(
        spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long")
    )
    payload_bytes = {}
    for mult in (1, 4):
        media = synthetic_media_scaled(docs, mult)
        audio = synthetic_audio_scaled(docs, mult)
        payload_bytes[mult] = (
            media.select(F.sum(F.length("payload"))).first()[0],
            audio.select(F.sum(F.length("payload"))).first()[0],
        )
        t_img = median3(
            lambda: force(mm.resize_media_nn(synthetic_media_scaled(docs, mult), factor=2))
        )
        t_aud = median3(
            lambda: force(
                mm.resample_audio_decimate(
                    synthetic_audio_scaled(docs, mult), factor=2
                )
            )
        )
        mb_img = payload_bytes[mult][0] / 1e6
        mb_aud = payload_bytes[mult][1] / 1e6
        print(
            f"payload x{mult}: image_resize {t_img:.2f}s ({mb_img:.1f} MB)"
            f"  audio_resample {t_aud:.2f}s ({mb_aud:.1f} MB)"
        )


if __name__ == "__main__":
    main()
