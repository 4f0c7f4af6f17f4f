"""Minimal RIFF/AVI container codec — header-level only, pure stdlib.

The video analog of the WAV tier (``operators/multimodal.py``) and the
PNG codec (``functions/png_min.py``): training-data pipelines read a
video's resolution, frame count, and frame rate from the CONTAINER
headers without touching a codec, and the AVI main header (``avih``)
plus the video stream header (``strh``/``strf``) carry exactly those
fields as little-endian uint32s (public format: the Microsoft AVI RIFF
spec, mirrored in every open container-parsing library).

``encode_avi_stub`` writes a structurally valid AVI — RIFF('AVI '
LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi')) — with an empty
movi payload (no frames, no codec), and ``parse_avi`` walks the chunks
back out. Roundtrip is exact by construction, which is what lets the
DuckDB oracle regenerate the fields arithmetically in
``operators/ingest_parity.py``.
"""

from __future__ import annotations

import struct

_AVIH_FMT = "<14I"  # MainAVIHeader: 14 little-endian uint32s


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    assert len(fourcc) == 4
    pad = b"\x00" if len(payload) % 2 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_stub(
    width: int,
    height: int,
    n_frames: int,
    usec_per_frame: int,
) -> bytes:
    """A header-complete, payload-empty AVI: every field a reader needs
    (dimensions, frame count, frame duration) is present and true;
    there is simply no frame data behind them."""
    avih = struct.pack(
        _AVIH_FMT,
        usec_per_frame,  # dwMicroSecPerFrame
        0,               # dwMaxBytesPerSec
        0,               # dwPaddingGranularity
        0x10,            # dwFlags (AVIF_HASINDEX conventionally; harmless)
        n_frames,        # dwTotalFrames
        0,               # dwInitialFrames
        1,               # dwStreams
        0,               # dwSuggestedBufferSize
        width,           # dwWidth
        height,          # dwHeight
        0, 0, 0, 0,      # dwReserved[4]
    )
    # AVIStreamHeader: fccType, fccHandler, then 8 uint32, 2 uint32
    # (scale/rate as a rational fps), 4 more uint32, rcFrame as 4 int16
    strh = (
        b"vids"
        + b"\x00\x00\x00\x00"  # fccHandler: none (no codec)
        + struct.pack(
            "<10I4h",
            0,                # dwFlags
            0,                # wPriority | wLanguage packed
            0,                # dwInitialFrames
            usec_per_frame,   # dwScale
            1_000_000,        # dwRate -> fps = rate/scale
            0,                # dwStart
            n_frames,         # dwLength
            0,                # dwSuggestedBufferSize
            0,                # dwQuality
            0,                # dwSampleSize
            0, 0, width, height,  # rcFrame
        )
    )
    # BITMAPINFOHEADER (40 bytes)
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, 0, 0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi = _list(b"movi", b"")
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(buf: bytes, lo: int, hi: int):
    """Yield (fourcc, payload_lo, payload_hi) walking [lo, hi)."""
    pos = lo
    while pos + 8 <= hi:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload_lo = pos + 8
        payload_hi = min(payload_lo + size, hi)
        yield fourcc, payload_lo, payload_hi
        pos = payload_lo + size + (size % 2)  # word alignment


def parse_avi(payload: bytes) -> dict | None:
    """Container metadata from the headers, or None when the bytes are
    not a RIFF/AVI (callers fall back to their stub tier, the same
    degradation contract as ``audio_features``). Truncated or
    header-less RIFFs also return None — a video with unreadable
    headers is quarantine material, not a zero-dimension row."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    out: dict | None = None
    for fourcc, lo, hi in _iter_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST" or payload[lo : lo + 4] != b"hdrl":
            continue
        for inner, ilo, ihi in _iter_chunks(payload, lo + 4, hi):
            if inner == b"avih" and ihi - ilo >= struct.calcsize(_AVIH_FMT):
                f = struct.unpack_from(_AVIH_FMT, payload, ilo)
                out = {
                    "container": "avi",
                    "usec_per_frame": f[0],
                    "n_frames": f[4],
                    "n_streams": f[6],
                    "width": f[8],
                    "height": f[9],
                    "duration_ms": f[4] * f[0] // 1000,
                }
    return out
