"""Native MJPEG-in-AVI frame extraction — the video leg of the
round-5 native-codec push (jpeg.py, audio.py): Motion-JPEG AVI is the
one mainstream video container whose frames are decodable with zero
external dependency (every frame IS a baseline JPEG), so the frame
sampler no longer needs ffmpeg for it.

`mjpeg_avi_frames` walks the RIFF/AVI chunk tree: the 'avih' main
header (dwWidth/dwHeight/dwTotalFrames) inside LIST 'hdrl', then every
'..dc'/'..db' video chunk inside LIST 'movi' (word-aligned, 'rec '
sub-lists flattened). Each frame payload is handed to
`jpeg.decode_jpeg` — non-JPEG codecs inside AVI (cinepak, DV, raw
DIB...) raise NotImplementedError naming ffmpeg, and non-AVI
containers (MP4/WebM/MKV) keep the honest stub in
`media.sample_video_frames`.

`encode_mjpeg_avi` is the minimal writer the tests use to round-trip
real AVI bytes (header sizes per the public AVI RIFF spec; no idx1 —
optional for sequential readers like this one).
"""

from __future__ import annotations

import struct


def mjpeg_avi_frames(
    payload: bytes,
) -> tuple[int, int, int, list[bytes]]:
    """(width, height, total_frames_declared, [frame bytes...]) from a
    RIFF/AVI payload; frames are the raw '..dc'/'..db' chunk payloads
    in stream order."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = total = 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, total
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)
            elif cid == b"avih":
                # dwTotalFrames at +16, dwWidth/dwHeight at +32/+36
                total = int.from_bytes(
                    payload[body_start + 16 : body_start + 20], "little"
                )
                width = int.from_bytes(
                    payload[body_start + 32 : body_start + 36], "little"
                )
                height = int.from_bytes(
                    payload[body_start + 36 : body_start + 40], "little"
                )
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(payload[body_start : body_start + size])
            pos = body_start + size + (size & 1)

    walk(12, len(payload))
    return width, height, total, frames


def encode_mjpeg_avi(
    w: int, h: int, jpeg_frames: list[bytes], fps: int = 10
) -> bytes:
    """Minimal MJPEG AVI writer (tests): one video stream, '00dc'
    chunks, no index."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0, 0x10,        # rate, padding, flags (AVIF_HASINDEX off)
        len(jpeg_frames), 0, 1, 0,  # total frames, initial, streams, bufsize
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0,
        len(jpeg_frames), 0, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
