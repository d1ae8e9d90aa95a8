"""QOI codec invariants (round 9, VERDICT r08 item #4): the real
encoder/decoder roundtrip, spec-conformant framing, every op class
exercised, and the closed-form size/op-count model the q_image_qoi
oracle relies on verified by brute force over the whole corpus id
space.  Cites: qoiformat.org spec (public domain)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nomad_event_streamer_spark.operators.qoi import (
    _RUN_REM,
    decode_qoi,
    encode_qoi,
    expected_qoi_bytes,
    qoi_pattern,
)


class TestCodecContract:
    def test_header_and_end_marker(self):
        px = qoi_pattern(3, 9, 6)
        payload, _ = encode_qoi(px)
        assert payload[:4] == b"qoif"
        w, h, ch, cs = struct.unpack(">IIBB", payload[4:14])
        assert (w, h, ch, cs) == (9, 6, 3, 1)
        assert payload[-8:] == b"\x00" * 7 + b"\x01"

    @given(st.integers(0, 10_000), st.integers(1, 24), st.integers(1, 24))
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_any_pattern_dims(self, doc_id, w, h):
        px = qoi_pattern(doc_id, w, h)
        payload, _ = encode_qoi(px)
        assert np.array_equal(decode_qoi(payload), px)

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_roundtrip_random_pixels(self, seed):
        """Arbitrary images (not the closed-form pattern): the codec
        pair must be lossless whatever ops the encoder picks —
        including index hits and long runs the pattern avoids."""
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        # low-cardinality palette forces INDEX hits and runs
        palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
        px = palette[rng.integers(0, 4, size=(h, w))]
        payload, counts = encode_qoi(px)
        assert np.array_equal(decode_qoi(payload), px)

    def test_long_run_split_at_62(self):
        px = np.full((1, 130, 3), 7, dtype=np.uint8)
        payload, counts = encode_qoi(px)
        assert np.array_equal(decode_qoi(payload), px)
        # pixel 1 differs from the implicit (0,0,0) prev -> 1 op, then
        # a 129-pixel run = 62 + 62 + 5 -> 3 run chunks
        assert counts["n_run"] == 3

    def test_index_hits_occur_on_revisited_colors(self):
        a = np.array([10, 20, 30], dtype=np.uint8)
        b = np.array([200, 100, 50], dtype=np.uint8)
        px = np.stack([a, b, a, b]).reshape(1, 4, 3)
        _, counts = encode_qoi(px)
        assert counts["n_index"] == 2

    def test_decode_rejects_bad_magic_and_truncation(self):
        px = qoi_pattern(1, 9, 6)
        payload, _ = encode_qoi(px)
        with pytest.raises(ValueError, match="magic"):
            decode_qoi(b"nope" + payload[4:])
        with pytest.raises(Exception):
            decode_qoi(payload[:-9])  # end marker gone


class TestClosedFormModel:
    def test_size_and_op_counts_closed_form_all_docs(self):
        """The oracle's entire size model, brute-forced over every
        doc_id the corpus can produce (dims cycle with period 40)."""
        for doc_id in range(500):
            w, h = 9 + doc_id % 8, 6 + doc_id % 5
            n = w * h
            payload, counts = encode_qoi(qoi_pattern(doc_id, w, h))
            assert len(payload) == expected_qoi_bytes(n)
            assert counts == {
                "n_rgb": (n + 7) // 8,
                "n_diff": (n + 4) // 8,
                "n_luma": (n + 2) // 8,
                "n_run": 3 * (n // 8) + int(_RUN_REM[n % 8]),
                "n_index": 0,
            }

    def test_every_partial_block_remainder_covered(self):
        """n % 8 must hit all 8 values across the corpus dims or the
        partial-block table rows would be dead (untested) entries."""
        rems = {
            ((9 + d % 8) * (6 + d % 5)) % 8 for d in range(40)
        }
        assert rems == set(range(8))

    def test_pattern_colors_distinct_within_image(self):
        """The no-index-hit guarantee: all pixel colors in an image are
        pairwise distinct (checked at the largest dims)."""
        px = qoi_pattern(7, 16, 10).reshape(-1, 3)
        colors = {tuple(int(v) for v in row) for row in px}
        # 160 pixels, 3 distinct colors per 8-pixel block
        assert len(colors) == 3 * 20

    def test_compression_is_real(self):
        """qoi_bytes must be well under the raw 3*n (the point of a
        compressed container) — the pattern averages 10 bytes per 24."""
        n = 16 * 10
        assert expected_qoi_bytes(n) < 3 * n // 2
