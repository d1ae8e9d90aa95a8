"""QOI ("Quite OK Image") codec — the compressed leg of the multimodal
codec family (VERDICT r08 item #4).

QOI is a fully public byte-exact format (spec: qoiformat.org, Dominic
Szablewski 2021, public domain): a 14-byte header (``qoif`` magic,
big-endian u32 width/height, u8 channels, u8 colorspace), a chunk
stream over a running 64-slot color index and the previous pixel —
``QOI_OP_RUN`` (1 byte, runs 1..62), ``QOI_OP_INDEX`` (1 byte),
``QOI_OP_DIFF`` (1 byte, per-channel wraparound deltas in -2..1),
``QOI_OP_LUMA`` (2 bytes, dg in -32..31 and dr-dg / db-dg in -8..7),
``QOI_OP_RGB`` (4 bytes) / ``QOI_OP_RGBA`` (5 bytes) — then an 8-byte
end marker (seven 0x00, one 0x01).  The index slot for a pixel is
``(r*3 + g*5 + b*7 + a*11) % 64``.

This is the REAL encoder/decoder (full index/run/diff/luma state
machine, wraparound arithmetic), not a shape specialized to the test
pattern — the BMP/PGM/WAV codec discipline (`operators/multimodal.py`)
extended to a compressed container, where the encoded SIZE depends on
the op sequence the encoder chooses.  The companion query
(`plans/corpus_queries.py q_image_qoi`) synthesizes a pixel pattern
whose op classes are position-deterministic and index-hit-free by
construction, so the compressed byte count is a closed form the DuckDB
oracle recomputes exactly.

Reference parity note: the reference (`app.rb:1-278`) has no binary
ingest; this is EXT surface for the 100 TB multimodal-pipeline north
star (BASELINE.json).
"""

from __future__ import annotations

import struct

import numpy as np

QOI_MAGIC = b"qoif"
_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF
_END_MARKER = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def _wrap_delta(cur: int, prev: int) -> int:
    """Wraparound channel delta in -128..127 (spec: differences use a
    wraparound operation, so 255 -> 0 is a delta of +1)."""
    return ((cur - prev + 128) % 256) - 128


def encode_qoi(pixels: np.ndarray) -> tuple[bytes, dict[str, int]]:
    """Encode an (h, w, 3) uint8 RGB array as a QOI file (channels=3,
    colorspace=1 linear).  Returns ``(payload, op_counts)`` where
    op_counts has keys n_rgb / n_index / n_diff / n_luma / n_run — the
    observable the size oracle pins (and the proof no unintended
    index hit rewrote the expected op sequence)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_qoi expects an (h, w, 3) array")
    h, w, _ = pixels.shape
    out = bytearray(QOI_MAGIC)
    out += struct.pack(">IIBB", w, h, 3, 1)
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    counts = {"n_rgb": 0, "n_index": 0, "n_diff": 0, "n_luma": 0, "n_run": 0}
    flat = pixels.reshape(-1, 3).astype(np.int64)
    for r, g, b in flat:
        px = (int(r), int(g), int(b), 255)
        if px == prev:
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                counts["n_run"] += 1
                run = 0
            continue
        if run > 0:
            out.append(_OP_RUN | (run - 1))
            counts["n_run"] += 1
            run = 0
        slot = _hash(*px)
        if index[slot] == px:
            out.append(_OP_INDEX | slot)
            counts["n_index"] += 1
        else:
            dr = _wrap_delta(px[0], prev[0])
            dg = _wrap_delta(px[1], prev[1])
            db = _wrap_delta(px[2], prev[2])
            dr_dg = dr - dg
            db_dg = db - dg
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(
                    _OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                )
                counts["n_diff"] += 1
            elif -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                out.append(_OP_LUMA | (dg + 32))
                out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                counts["n_luma"] += 1
            else:
                out += bytes((_OP_RGB, px[0], px[1], px[2]))
                counts["n_rgb"] += 1
        index[slot] = px
        prev = px
    if run > 0:
        out.append(_OP_RUN | (run - 1))
        counts["n_run"] += 1
    out += _END_MARKER
    return bytes(out), counts


def decode_qoi(payload: bytes) -> np.ndarray:
    """Decode a QOI file back to an (h, w, 3) uint8 RGB array.  Raises
    on bad magic, truncated stream, or a missing end marker (a silent
    partial decode would hide codec bugs from the hash gate)."""
    if payload[:4] != QOI_MAGIC:
        raise ValueError("bad QOI magic")
    w, h, channels, _colorspace = struct.unpack(">IIBB", payload[4:14])
    if channels not in (3, 4):
        raise ValueError(f"bad channel count {channels}")
    n = w * h
    flat = np.empty((n, 3), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    pos = 14
    i = 0
    while i < n:
        b0 = payload[pos]
        pos += 1
        if b0 == _OP_RGB:
            px = (payload[pos], payload[pos + 1], payload[pos + 2], prev[3])
            pos += 3
        elif b0 == _OP_RGBA:
            px = tuple(payload[pos : pos + 4])
            pos += 4
        elif b0 >> 6 == 0:  # INDEX
            px = index[b0 & 0x3F]
        elif b0 >> 6 == 1:  # DIFF
            px = (
                (prev[0] + ((b0 >> 4) & 3) - 2) % 256,
                (prev[1] + ((b0 >> 2) & 3) - 2) % 256,
                (prev[2] + (b0 & 3) - 2) % 256,
                prev[3],
            )
        elif b0 >> 6 == 2:  # LUMA
            dg = (b0 & 0x3F) - 32
            b1 = payload[pos]
            pos += 1
            px = (
                (prev[0] + dg + ((b1 >> 4) & 0x0F) - 8) % 256,
                (prev[1] + dg) % 256,
                (prev[2] + dg + (b1 & 0x0F) - 8) % 256,
                prev[3],
            )
        else:  # RUN
            run = (b0 & 0x3F) + 1
            if i + run > n:
                raise ValueError("run overflows pixel count")
            flat[i : i + run] = prev[:3]
            i += run
            continue
        index[_hash(*px)] = px
        flat[i] = px[:3]
        prev = px
        i += 1
    if payload[pos : pos + 8] != _END_MARKER:
        raise ValueError("missing QOI end marker")
    return flat.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Closed-form test pattern + Arrow-batched roundtrip stats
# ---------------------------------------------------------------------------
# Per-pixel family by position i = p % 8 within block k = p // 8:
#   i in {0,1,2}: A_k = base + 50k + (0, 80, 160)      -> RGB then RUN x2
#   i in {3,4}:   D_k = A_k + (1, 1, 1)                -> DIFF then RUN
#   i in {5,6,7}: L_k = D_k + (12, 16, 18)             -> LUMA then RUN x2
# (all mod 256).  Properties proven in q_image_qoi's docstring: every
# color in an image is distinct (no index hit can preempt an op), the
# block-start delta is (37, 33, 31) with dg=33 outside LUMA range (so
# block starts are always OP_RGB), and therefore the encoded size and
# op counts are exact closed forms of n = w*h alone.

_OFF_R = np.array([0, 0, 0, 1, 1, 13, 13, 13], dtype=np.int64)
_OFF_G = np.array([80, 80, 80, 81, 81, 97, 97, 97], dtype=np.int64)
_OFF_B = np.array([160, 160, 160, 161, 161, 179, 179, 179], dtype=np.int64)

# cumulative encoded bytes / run-flush events for a partial block of
# rem pixels (trailing pending run counted as flushed)
_C_REM = np.array([0, 4, 5, 5, 6, 7, 9, 10], dtype=np.int64)
_RUN_REM = np.array([0, 0, 1, 1, 1, 2, 2, 3], dtype=np.int64)


def qoi_pattern(doc_id: int, w: int, h: int) -> np.ndarray:
    """The closed-form (h, w, 3) RGB pattern for ``doc_id``."""
    base = (doc_id * 73 + 11) % 256
    p = np.arange(w * h, dtype=np.int64)
    k, i = p // 8, p % 8
    a = (base + 50 * k) % 256
    rgb = np.stack(
        [(a + _OFF_R[i]) % 256, (a + _OFF_G[i]) % 256, (a + _OFF_B[i]) % 256],
        axis=1,
    )
    return rgb.astype(np.uint8).reshape(h, w, 3)


def expected_qoi_bytes(n_pixels: int) -> int:
    """Closed-form encoded size: 14 header + 8 end marker + 10 bytes
    per full 8-pixel block + the partial-block table."""
    return 22 + 10 * (n_pixels // 8) + int(_C_REM[n_pixels % 8])


QOI_STATS_SCHEMA = "doc_id bigint, width bigint, height bigint, qoi_bytes bigint, n_rgb bigint, n_diff bigint, n_luma bigint, n_run bigint, n_index bigint, sum_r bigint, sum_g bigint, sum_b bigint"


def qoi_roundtrip_stats(docs, width_expr=None, height_expr=None):
    """Arrow-batched encode -> decode -> stats over the closed-form
    pattern: per document, build the pattern, ENCODE it with the real
    QOI encoder, DECODE the bytes back with the real decoder, assert
    bit-exact pixel recovery (a silent codec bug must not reach the
    stats), and emit the encoded size, per-op-class counts, and
    channel sums computed from the DECODED pixels — so both codec
    halves sit inside the hash gate.

    Scale: per-row Arrow batches, no shuffle; payload bytes never
    leave the executor (only the integer stats do)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "width", "height", "qoi_bytes", "n_rgb",
                "n_diff", "n_luma", "n_run", "n_index",
                "sum_r", "sum_g", "sum_b")}
            for doc_id in pdf["doc_id"].astype("int64"):
                doc_id = int(doc_id)
                w, h = 9 + doc_id % 8, 6 + doc_id % 5
                px = qoi_pattern(doc_id, w, h)
                payload, counts = encode_qoi(px)
                dec = decode_qoi(payload)
                if not np.array_equal(dec, px):
                    raise ValueError(f"QOI roundtrip mismatch doc {doc_id}")
                flat = dec.astype(np.int64).reshape(-1, 3)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["qoi_bytes"].append(len(payload))
                for k, v in counts.items():
                    out[k].append(v)
                out["sum_r"].append(int(flat[:, 0].sum()))
                out["sum_g"].append(int(flat[:, 1].sum()))
                out["sum_b"].append(int(flat[:, 2].sum()))
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(batches, QOI_STATS_SCHEMA)
