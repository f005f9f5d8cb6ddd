"""Minimal RIFF-AVI container codec for MJPEG streams — from scratch,
public layout only (Microsoft RIFF/AVI 1.0 structure: the same RIFF
chunk discipline as :mod:`.audio`'s WAVE, one level deeper).

Motion-JPEG is the one real-world VIDEO format this engine can decode
end-to-end without any codec library: each frame is an independent
baseline JPEG handled by the from-scratch T.81 codec in :mod:`.jpeg`.
The encoder writes the standard layout OpenCV/ffmpeg produce for
``MJPG`` (RIFF('AVI ') → LIST hdrl(avih, LIST strl(strh, strf)) →
LIST movi('00dc' chunks) → idx1), so files round-trip against real
tools; the parser walks chunks defensively and raises loudly on
structural corruption.

Layout reference: the public AVI RIFF form (msdn 'AVI RIFF File
Reference'); reference repo has no video path — this extends the
multimodal column family (task brief), replacing the FVID-only video
plumbing with an industry container.
"""

from __future__ import annotations

import struct

__all__ = ["encode_avi_mjpeg", "parse_avi_mjpeg", "AVI_SIGNATURE"]

AVI_SIGNATURE = b"RIFF"


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # RIFF word alignment
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: "list[bytes]", width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame list -> AVI bytes (one 'vids'/'MJPG' stream)."""
    if not frames:
        raise ValueError("encode_avi_mjpeg: need at least one frame")
    max_sz = max(len(f) for f in frames)
    # avih: MicroSecPerFrame, MaxBytesPerSec, Padding, Flags(HASINDEX),
    # TotalFrames, InitialFrames, Streams, SuggestedBufferSize, Width,
    # Height, Reserved[4]
    avih = struct.pack(
        "<10I4I",
        1_000_000 // fps,
        max_sz * fps,
        0,
        0x10,
        len(frames),
        0,
        1,
        max_sz,
        width,
        height,
        0, 0, 0, 0,
    )
    # strh: fccType, fccHandler, Flags, Priority+Language, InitialFrames,
    # Scale, Rate, Start, Length, SuggestedBufferSize, Quality,
    # SampleSize, rcFrame
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IIIIIIIIII4H",
            0, 0, 0, 1, fps, 0, len(frames), max_sz, 0xFFFFFFFF, 0,
            0, 0, width, height,
        )
    )
    # strf: BITMAPINFOHEADER with biCompression='MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"movi"
    offsets = []  # idx1 offsets are relative to the 'movi' fourcc start
    for f in frames:
        offsets.append(len(movi_payload))
        movi_payload += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
            for off, f in zip(offsets, frames)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for chunks in [pos, end)."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        start = pos + 8
        if start + sz > end:
            raise ValueError(
                f"AVI chunk {fourcc!r} overruns its parent "
                f"({start + sz} > {end})"
            )
        yield fourcc, start, sz
        pos = start + sz + (sz & 1)  # skip the alignment pad byte


def parse_avi_mjpeg(data: bytes) -> "list[bytes]":
    """AVI bytes -> list of per-frame JPEG byte strings.

    Walks RIFF('AVI ') for LIST('movi') and collects ``..dc`` /
    ``..db`` video chunks in stream order; verifies the declared
    stream handler is MJPG. Raises ``ValueError`` on structural
    corruption and ``NotImplementedError`` for non-MJPEG streams
    (real-world H.264 etc. stay behind the honest stub)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI signature")
    (riff_sz,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_sz, len(data))
    handler: bytes | None = None
    frames: list[bytes] = []
    for fourcc, start, sz in _walk(data, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = data[start : start + 4]
        if list_type == b"hdrl":
            for f2, s2, z2 in _walk(data, start + 4, start + sz):
                if f2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    for f3, s3, z3 in _walk(data, s2 + 4, s2 + z2):
                        if f3 == b"strh" and z3 >= 8:
                            if data[s3 : s3 + 4] == b"vids":
                                handler = data[s3 + 4 : s3 + 8]
        elif list_type == b"movi":
            for f2, s2, z2 in _walk(data, start + 4, start + sz):
                if f2[2:4] in (b"dc", b"db"):
                    frames.append(data[s2 : s2 + z2])
    if handler is None:
        raise ValueError("AVI has no video ('vids') stream header")
    if handler != b"MJPG":
        raise NotImplementedError(
            f"AVI video handler {handler!r} needs a codec library; "
            "only MJPG decodes here"
        )
    if not frames:
        raise ValueError("AVI movi list has no video frames")
    return frames
