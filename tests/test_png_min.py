"""Round-trip and conformance tests for the pure-stdlib baseline PNG
codec (functions/png_min.py) — the PIL-less real-decode tier of the
multimodal path."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from end2end_data_pipeline_spark.functions.png_min import (
    decode_png,
    encode_png,
    luma,
    resize_gray_nearest,
    to_gray,
)


def _gradient(n: int) -> bytes:
    return bytes((i * 7 + (i * i) % 13) % 256 for i in range(n))


@pytest.mark.parametrize("mode,nch", [("L", 1), ("LA", 2), ("RGB", 3), ("RGBA", 4)])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_all_modes_and_filters(mode, nch, ftype):
    w, h = 7, 5
    pixels = _gradient(w * h * nch)
    data = encode_png(w, h, pixels, mode, filter_type=ftype)
    dw, dh, dmode, dpix = decode_png(data)
    assert (dw, dh, dmode) == (w, h, mode)
    assert dpix == pixels


def test_rejects_non_png():
    for junk in (b"", b"hello world", b"\x89PNGbutnot"):
        with pytest.raises(ValueError):
            decode_png(junk)


def test_rejects_unsupported_depth():
    # craft a 16-bit-depth IHDR
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    idat_body = zlib.compress(b"\x00" * 10)
    idat = (
        struct.pack(">I", len(idat_body))
        + b"IDAT"
        + idat_body
        + struct.pack(">I", zlib.crc32(b"IDAT" + idat_body) & 0xFFFFFFFF)
    )
    data = b"\x89PNG\r\n\x1a\n" + chunk + idat
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(data)


def test_rejects_corrupt_idat():
    good = encode_png(4, 4, _gradient(16), "L")
    # truncate inside the IDAT stream
    with pytest.raises(ValueError):
        decode_png(good[:-20] + b"\x00" * 0)


def test_luma_weights():
    # pure red / green / blue single pixels
    assert luma(bytes([255, 0, 0]), "RGB") == 255 * 299 // 1000
    assert luma(bytes([0, 255, 0]), "RGB") == 255 * 587 // 1000
    assert luma(bytes([0, 0, 255]), "RGB") == 255 * 114 // 1000
    assert luma(bytes([42]), "L") == 42
    assert luma(bytes([42, 255]), "LA") == 42


def test_to_gray_and_resize():
    # 2x1 image: black then white -> nearest upscale to 4x2 keeps halves
    gray = to_gray(bytes([0, 0, 0, 255, 255, 255]), "RGB")
    assert gray == bytes([0, 255])
    up = resize_gray_nearest(gray, 2, 1, (4, 2))
    assert up == bytes([0, 0, 255, 255] * 2)


_MODES = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    mode=st.sampled_from(sorted(_MODES)),
    ftype=st.integers(0, 4),
    data=st.data(),
)
def test_roundtrip_property(w, h, mode, ftype, data):
    """Any raw pixel buffer survives encode→decode byte-exactly, for
    every mode and every scanline filter."""
    n = w * h * _MODES[mode]
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    out = decode_png(encode_png(w, h, pixels, mode, filter_type=ftype))
    assert out == (w, h, mode, pixels)
