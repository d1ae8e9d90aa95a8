"""Real public-format codecs (BMP / PGM), round-3 replacement for the
multimodal decode stub: byte-level roundtrip + adversarial-layout tests.

The decoders are exercised against files the encoders did NOT produce
(top-down BMPs, PGM headers with comments and odd whitespace) so the
parsers are held to the public format spec, not to our own writer.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nomad_event_streamer_spark.operators.multimodal import (
    _media_dims,
    _pixel_stream,
    decode_bmp,
    decode_pgm,
    encode_bmp,
    encode_pgm,
)


@pytest.mark.parametrize("w", [9, 10, 11, 12, 16])  # covers pad 0..3
@pytest.mark.parametrize("h", [1, 6, 10])
def test_bmp_roundtrip_all_paddings(w, h):
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(px))
    np.testing.assert_array_equal(out, px)


def test_bmp_layout_is_the_public_format():
    """The padded bottom-up layout, checked against hand-computed bytes —
    proves the writer emits real BMP, not a private container."""
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)  # w=3 -> pad 3
    raw = encode_bmp(px)
    assert raw[:2] == b"BM"
    assert struct.unpack_from("<I", raw, 10)[0] == 54  # pixel offset
    assert struct.unpack_from("<i", raw, 18)[0] == 3  # width
    assert struct.unpack_from("<i", raw, 22)[0] == 2  # height
    assert struct.unpack_from("<H", raw, 28)[0] == 24  # bpp
    row_bytes = 3 * 3 + 3
    # bottom-up: first stored row is image row 1
    assert raw[54 : 54 + 9] == px[1].tobytes()
    assert raw[54 + 9 : 54 + 12] == b"\x00\x00\x00"  # padding
    assert raw[54 + row_bytes : 54 + row_bytes + 9] == px[0].tobytes()


def test_bmp_top_down_rows_decoded():
    """Negative height = top-down row order (allowed by the spec; our
    encoder never writes it — decoder must still read it)."""
    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    raw = bytearray(encode_bmp(px[::-1]))  # stored rows become top-down
    struct.pack_into("<i", raw, 22, -2)  # height := -2
    np.testing.assert_array_equal(decode_bmp(bytes(raw)), px)


def test_bmp_rejects_wrong_magic_and_compression():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    raw = bytearray(encode_bmp(px))
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + bytes(raw[2:]))
    bad = bytearray(encode_bmp(px))
    struct.pack_into("<I", bad, 30, 1)  # biCompression := BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))


@pytest.mark.parametrize("w,h", [(1, 1), (9, 6), (16, 10)])
def test_pgm_roundtrip(w, h):
    rng = np.random.default_rng(w * h)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    np.testing.assert_array_equal(decode_pgm(encode_pgm(px)), px)


def test_pgm_header_grammar_comments_and_whitespace():
    """Foreign-writer header: comments and arbitrary whitespace between
    tokens are legal PGM — the parser must accept them."""
    px = np.arange(6, dtype=np.uint8).reshape(2, 3)
    raw = b"P5 # a comment\n# another\n  3\t2 # dims\n255\n" + px.tobytes()
    np.testing.assert_array_equal(decode_pgm(raw), px)


def test_pgm_rejects_two_byte_maxval():
    raw = b"P5\n1 1\n65535\n\x00\x00"
    with pytest.raises(ValueError):
        decode_pgm(raw)


def test_pixel_stream_matches_oracle_closed_form():
    """The encoder's raster bytes ARE the oracle's closed form."""
    v = _pixel_stream(7, 10)
    assert list(v) == [(7 * 73 + j * 151 + 11) % 256 for j in range(10)]


def test_media_dims_cover_every_bmp_padding():
    pads = {(4 - ((_media_dims(d)[0] * 3) % 4)) % 4 for d in range(16)}
    assert pads == {0, 1, 2, 3}
