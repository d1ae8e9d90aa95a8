"""WARC-ish record codec: the ingest shape for crawl dumps.

A crawl pipeline's first pass splits each WARC record into its header
block and payload, validates the declared Content-Length, and extracts
the typed fields downstream operators key on (target URI, record type,
record id).  The reference (`app.rb:1-278`) has no binary ingest at
all; this is EXT surface mandated by BASELINE.json's LLM-data-pipeline
north star.

Same device as the BMP/PGM codecs (`operators/multimodal.py`): the
record is SYNTHESIZED from document columns by pure Column expressions
(deterministic, engine-portable), encoded to real bytes, then the
Arrow-batched parser works on the actual byte stream — magic check,
CRLF header framing, field extraction, payload digest — so any framing
bug (wrong split, off-by-one on CRLFCRLF, header-order dependence)
breaks the value hash against an oracle that recomputes the fields from
the source columns directly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

WARC_VERSION = "WARC/1.0"

PARSED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("rec_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("declared_len", LongType()),
        StructField("payload_len", LongType()),
        StructField("payload_md5", StringType()),
        StructField("n_headers", LongType()),
        StructField("length_ok", LongType()),
    ]
)


def synthesize_warc(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """One binary WARC record per document: version line, four named
    headers, CRLFCRLF separator, raw text payload.  Pure Column
    concat + encode — per-row, shuffle-free."""
    rec = F.concat(
        F.lit(WARC_VERSION + "\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Record-ID: <urn:uuid:"),
        F.col("doc_id").cast("string"),
        F.lit(">\r\n"),
        F.lit("WARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\n"),
        F.lit("Content-Length: "),
        # WARC Content-Length is OCTETS of the payload block, not
        # characters — octet_length keeps the declared value correct for
        # multi-byte UTF-8 text (ADVICE r08 #1).
        F.octet_length("text").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("text"),
    )
    return docs.select(F.encode(rec, "UTF-8").alias("record"))


def parse_warc(records: DataFrame) -> DataFrame:
    """REAL parse of the record bytes (Arrow-batched, one pass): split
    header block from payload at the first CRLFCRLF, verify the version
    magic, fold the ``Name: value`` header lines into a dict, extract
    the typed fields, digest the payload.  Raises on malformed framing
    (a silent skip would hide codec bugs from the hash gate)."""

    def parse_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in PARSED_SCHEMA.fields}
            for payload in pdf["record"]:
                b = bytes(payload)
                head, sep, body = b.partition(b"\r\n\r\n")
                if not sep:
                    raise ValueError("no CRLFCRLF header terminator")
                lines = head.split(b"\r\n")
                if lines[0].decode("utf-8") != WARC_VERSION:
                    raise ValueError(f"bad WARC version line: {lines[0]!r}")
                headers: dict[str, str] = {}
                for ln in lines[1:]:
                    name, _, value = ln.decode("utf-8").partition(": ")
                    headers[name] = value
                rid = headers["WARC-Record-ID"]
                doc_id = int(rid.removeprefix("<urn:uuid:").removesuffix(">"))
                declared = int(headers["Content-Length"])
                out["doc_id"].append(doc_id)
                out["rec_type"].append(headers["WARC-Type"])
                out["target_uri"].append(headers["WARC-Target-URI"])
                out["declared_len"].append(declared)
                out["payload_len"].append(len(body))
                out["payload_md5"].append(hashlib.md5(body).hexdigest())
                out["n_headers"].append(len(headers))
                out["length_ok"].append(1 if declared == len(body) else 0)
            yield pd.DataFrame(out)

    return records.mapInPandas(parse_batches, PARSED_SCHEMA)
