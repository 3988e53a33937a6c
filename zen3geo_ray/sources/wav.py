"""Pure-numpy WAV (RIFF PCM) codec — the audio leg of the multimodal
column suite (stdlib struct + numpy only, like sources/png.py and
sources/jpeg.py for images).

Scope: canonical RIFF/WAVE with PCM integer samples — 16-bit signed
(the overwhelmingly common case) and 8-bit unsigned, any channel count
and sample rate; unknown chunks (LIST, fact, cue...) are skipped by the
chunk walk.  Float/ADPCM/extensible formats raise NotImplementedError.

``write_wav`` is the fixture-free round-trip twin for ``read_wav``.
"""

from __future__ import annotations

import struct

import numpy as np


def write_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Encode (n,) or (n, channels) int16 samples as a PCM16 WAV."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.dtype != np.int16:
        raise TypeError(f"samples must be int16 (got {s.dtype})")
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    out = b"RIFF"
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return out + struct.pack("<I", len(body)) + body


def read_wav(data: bytes) -> dict:
    """Decode a PCM WAV: {"rate", "channels", "samples" (n, ch) int16}.
    8-bit unsigned input is rescaled to int16."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE)")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("truncated WAV (no fmt/data chunk)")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"non-PCM WAV format {audio_fmt}")
    if bits == 16:
        s = np.frombuffer(raw, dtype="<i2")
    elif bits == 8:
        u = np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
        s = ((u - 128) << 8).astype(np.int16)
    else:
        raise NotImplementedError(f"{bits}-bit PCM unsupported")
    n = len(s) // ch
    return {"rate": int(rate), "channels": int(ch),
            "samples": s[: n * ch].reshape(n, ch).astype(np.int16)}
