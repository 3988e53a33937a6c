"""Pure-numpy MJPEG-in-AVI container codec (stdlib struct only).

The video leg of the multimodal suite: an AVI (RIFF) container whose
'00dc' chunks are baseline JPEG frames — together with
``sources/jpeg.py`` this makes video a REAL decoded column: container
walk here, per-frame decode with the in-engine JPEG codec.

``write_avi_mjpeg`` is the fixture-free round-trip twin (the
sources/png.py pattern): it emits a spec-shaped AVI (hdrl with
avih/strh/strf, movi with word-aligned 00dc chunks, idx1 index) that
``read_avi_mjpeg`` — and common players — can walk.  Non-MJPEG streams
raise NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def write_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                    quality: int = 90) -> bytes:
    """Encode (H, W, 3) uint8 frames as an MJPEG AVI (all frames must
    share one size)."""
    from .jpeg import write_jpeg

    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one size")
    jpegs = [write_jpeg(f, quality=quality) for f in frames]
    n = len(jpegs)
    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I", us_per_frame, max_bytes * fps, 0, 0x10, n, 0, 1,
        max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, n,
                          max_bytes, 0, -1)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_chunks = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_chunks)
    # idx1: one entry per frame (offset relative to start of 'movi' kind)
    idx = b""
    off = 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def read_avi_mjpeg(data: bytes) -> dict:
    """Walk an MJPEG AVI: {"fps", "width", "height", "n_frames",
    "frames": [jpeg bytes, ...]} — frames stay encoded (decode each with
    ``sources.jpeg.read_jpeg``, e.g. via ImageDecoder mode='real')."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI )")
    fps = width = height = 0
    handler = None
    frames: list[bytes] = []

    def walk(buf: bytes):
        nonlocal fps, width, height, handler
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            body = buf[pos + 8:pos + 8 + size]
            if tag == b"LIST":
                walk(body[4:])
            elif tag == b"avih":
                us_pf, _, _, _, _, _, _, _, width, height = struct.unpack(
                    "<10I", body[:40]
                )
                fps = round(1_000_000 / us_pf) if us_pf else 0
            elif tag == b"strh" and body[:4] == b"vids":
                handler = body[4:8]
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                frames.append(body)
            pos += 8 + size + (size & 1)

    walk(data[12:])
    if handler is not None and handler not in (b"MJPG", b"mjpg", b"\x00" * 4):
        raise NotImplementedError(f"non-MJPEG AVI stream {handler!r}")
    return {"fps": fps, "width": width, "height": height,
            "n_frames": len(frames), "frames": frames}
