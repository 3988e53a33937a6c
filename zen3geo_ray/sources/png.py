"""Minimal pure-numpy PNG codec (stdlib zlib) — completes the real
multimodal decode path next to sources/geotiff.py.

Subset of the public PNG spec a training-data pipeline meets in
practice: 8-bit samples, color types 0 (grey), 2 (RGB), 4 (grey+alpha),
6 (RGBA), no interlace; all five scanline filters on decode (Sub via a
strided cumulative sum, Up/Average vectorized per row, Paeth per-pixel —
it is sequentially defined).  ``write_png`` emits filter-0 scanlines so
tests round-trip without any external fixture; dedicated tests exercise
the other filters from hand-built scanline streams.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def write_png(arr: np.ndarray) -> bytes:
    """(H, W) grey or (H, W, C) uint8 -> PNG bytes (filter 0 rows)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if arr.dtype != np.uint8:
        raise ValueError("8-bit samples only")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw += arr[y].tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def read_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    ctype = bitdepth = interlace = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bitdepth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bitdepth != 8 or interlace != 0 or ctype not in _CHANNELS:
        raise NotImplementedError(
            f"PNG subset: 8-bit non-interlaced grey/RGB/alpha only "
            f"(got depth={bitdepth} ctype={ctype} interlace={interlace})"
        )
    c = _CHANNELS[ctype]
    stride = width * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).copy()
        if f == 0:
            rec = row
        elif f == 1:  # Sub: cumulative sum over pixels, per channel lane
            rec = (
                np.cumsum(row.reshape(width, c).astype(np.uint32), axis=0)
                .astype(np.uint8).reshape(-1)
            )
        elif f == 2:  # Up
            rec = row + prev
        elif f == 3:  # Average: sequential in x (left dependency)
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - c]) if x >= c else 0
                rec[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth: sequential in x
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                rec[x] = (int(row[x]) + _paeth(a, b, cc)) & 0xFF
            # (np.uint8 arithmetic wraps mod 256, matching the spec)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
        prev = out[y]
    return out.reshape(height, width, c)
