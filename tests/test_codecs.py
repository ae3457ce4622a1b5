"""Pure-unit tests for the fixture codecs (no Spark): PPM/BMP
decode/encode roundtrips, header grammar corners (comments, padding,
top-down BMPs), nearest-neighbor resize math, and the unsupported-
container seam.
"""

from __future__ import annotations

import struct

import pytest

from financial_data_engineering_spark.llm import codecs


def _gradient(w, h):
    return bytes(
        v for y in range(h) for x in range(w) for v in (x % 256, y % 256, 7)
    )


@pytest.mark.parametrize("fmt", ["ppm", "bmp"])
@pytest.mark.parametrize("w,h", [(1, 1), (3, 3), (5, 2), (8, 4)])
def test_roundtrip_encode_decode(fmt, w, h):
    # width 5 exercises BMP's 4-byte row padding (15 -> 16 bytes)
    rgb = _gradient(w, h)
    blob = codecs.encode(w, h, rgb, fmt)
    w2, h2, rgb2, fmt2 = codecs.decode(None, blob)
    assert (w2, h2, fmt2) == (w, h, fmt)
    assert rgb2 == rgb


def test_ppm_header_comments_and_whitespace():
    rgb = _gradient(2, 2)
    blob = b"P6\n# a comment\n2 2\n# another\n255\n" + rgb
    w, h, rgb2, fmt = codecs.decode("image/x-portable-pixmap", blob)
    assert (w, h, fmt) == (2, 2, "ppm") and rgb2 == rgb


def test_ppm_truncated_and_bad_maxval():
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode(None, b"P6\n4 4\n255\n\x00\x00")
    with pytest.raises(ValueError, match="maxval"):
        codecs.decode(None, b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_bmp_top_down_negative_height():
    # encode bottom-up, then flip to a top-down (negative height) BMP by
    # hand: decode must yield the same top-down pixel order
    rgb = _gradient(3, 2)
    blob = bytearray(codecs.encode(3, 2, rgb, "bmp"))
    struct.pack_into("<i", blob, 22, -2)  # declare top-down
    # rows are stored bottom-up; swap them so content matches the flag
    stride = (3 * 3 + 3) & ~3
    off = struct.unpack_from("<I", blob, 10)[0]
    r0 = bytes(blob[off : off + stride])
    r1 = bytes(blob[off + stride : off + 2 * stride])
    blob[off : off + stride] = r1
    blob[off + stride : off + 2 * stride] = r0
    w, h, rgb2, _ = codecs.decode("image/bmp", bytes(blob))
    assert (w, h) == (3, 2) and rgb2 == rgb


def test_bmp_unsupported_bpp_raises_at_seam():
    blob = bytearray(codecs.encode(2, 2, _gradient(2, 2), "bmp"))
    struct.pack_into("<H", blob, 28, 8)  # declare 8bpp
    with pytest.raises(NotImplementedError, match="24bpp"):
        codecs.decode("image/bmp", bytes(blob))


def test_sniff_rejects_mime_magic_mismatch():
    ppm = codecs.encode(1, 1, b"\x01\x02\x03", "ppm")
    with pytest.raises(NotImplementedError, match="no fixture codec"):
        codecs.sniff_format("image/png", ppm)
    assert codecs.sniff_format(None, ppm) == "ppm"
    assert codecs.sniff_format("image/ppm", ppm) == "ppm"


def test_resize_nearest_floor_mapping():
    rgb = _gradient(8, 4)
    out = codecs.resize_nearest(8, 4, rgb, 4, 2)
    expected = bytes(
        v
        for y in range(2)
        for x in range(4)
        for v in (2 * x % 256, 2 * y % 256, 7)
    )
    assert out == expected
    # upscale also works (floor mapping repeats source pixels)
    up = codecs.resize_nearest(2, 1, b"\x10\x20\x30\x40\x50\x60", 4, 1)
    assert up == b"\x10\x20\x30" * 2 + b"\x40\x50\x60" * 2


def test_encode_validates_buffer_size():
    with pytest.raises(ValueError, match="pixel buffer"):
        codecs.encode(2, 2, b"\x00" * 5, "ppm")
