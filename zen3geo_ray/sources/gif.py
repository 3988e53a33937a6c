"""GIF87a/89a codec — pure numpy/stdlib (the palette-image sibling of
``sources/png.py``; spec: GIF89a, CompuServe 1990).

Implements the real format end to end:

* logical screen descriptor + global color table;
* REAL variable-width LZW (codes start at min_code_size+1 bits, CLEAR
  and EOI codes, width bumps when the table reaches 2^width, table
  reset via CLEAR at 4096 entries, LSB-first bit packing, 255-byte
  sub-block framing);
* decoder handles extensions (graphic control / comment / application
  blocks are skipped per spec) and local color tables; interlace and
  multi-frame animation are rejected loudly (single-frame contract,
  like the baseline-JPEG codec's feature gates).

The encoder is deterministic (palette = first-appearance color order)
so golden bytes are stable.  Encoder input must have <= 256 distinct
colors — quantization is a separate concern (``resize_bilinear`` /
the raster paths), matching how real pipelines feed GIF.
"""

from __future__ import annotations

import numpy as np

_MAX_WIDTH = 12
_MAX_CODES = 1 << _MAX_WIDTH


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    bw = _BitWriter()
    width = min_code + 1
    table: dict = {}
    next_code = eoi + 1
    bw.write(clear, width)
    it = iter(indices.tolist())
    cur = next(it)
    for k in it:
        key = (cur, k)
        if key in table:
            cur = table[key]
            continue
        bw.write(cur, width)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) and width < _MAX_WIDTH:
            width += 1
        elif next_code == _MAX_CODES:
            bw.write(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code + 1
        cur = k
    bw.write(cur, width)
    bw.write(eoi, width)
    return bw.finish()


def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code
    eoi = clear + 1
    out = np.empty(n_expected, np.uint8)
    pos = 0
    acc = 0
    nbits = 0
    bi = 0
    width = min_code + 1
    table: list = []
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1
        prev = None

    reset()
    n = len(data)
    while True:
        while nbits < width:
            if bi >= n:
                raise ValueError("gif: truncated LZW stream")
            acc |= data[bi] << nbits
            bi += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):           # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: corrupt LZW code")
        # the decoder's table is ONE entry behind the encoder's when a
        # code is read, so the width bump fires at 2^W - 1 here while
        # the encoder bumps at 2^W after its own add
        if len(table) == (1 << width) - 1 and width < _MAX_WIDTH:
            width += 1
        out[pos:pos + len(entry)] = np.frombuffer(entry, np.uint8)
        pos += len(entry)
        prev = entry
        if pos >= n_expected:
            # consume until EOI for well-formedness, then stop
            continue
    if pos != n_expected:
        raise ValueError(f"gif: decoded {pos} pixels, want {n_expected}")
    return out


def write_gif(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array (<= 256 distinct colors) as a
    single-frame GIF89a."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("write_gif: (h, w, 3) input required")
    flat = arr.reshape(-1, 3)
    packed = (flat[:, 0].astype(np.int64) << 16) \
        | (flat[:, 1].astype(np.int64) << 8) | flat[:, 2]
    _, first_ix, inv = np.unique(packed, return_index=True,
                                 return_inverse=True)
    # palette in FIRST-APPEARANCE order (deterministic golden bytes)
    order = np.argsort(first_ix, kind="stable")
    rank = np.empty(len(order), np.int64)
    rank[order] = np.arange(len(order))
    indices = rank[inv].astype(np.uint8) if len(order) <= 256 else None
    if indices is None:
        raise ValueError("write_gif: more than 256 distinct colors")
    palette = flat[np.sort(first_ix)]
    n_pal = len(palette)
    bits = max(2, int(n_pal - 1).bit_length())
    table_n = 1 << bits
    min_code = bits

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | ((bits - 1) << 4) | (bits - 1))  # GCT flag+sizes
    out += b"\x00\x00"
    pal = np.zeros((table_n, 3), np.uint8)
    pal[:n_pal] = palette
    out += pal.tobytes()
    out += b"\x2c" + b"\x00\x00\x00\x00"               # image at 0,0
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0)                                       # no LCT
    out.append(min_code)
    lzw = _lzw_encode(indices, min_code)
    for i in range(0, len(lzw), 255):
        blk = lzw[i:i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"
    return bytes(out)


def read_gif(data: bytes) -> np.ndarray:
    """Decode a single-frame GIF into an (h, w, 3) uint8 array."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    pos = 6
    sw = int.from_bytes(data[pos:pos + 2], "little")
    sh = int.from_bytes(data[pos + 2:pos + 4], "little")
    packed = data[pos + 4]
    pos += 7
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            np.uint8).reshape(n, 3)
        pos += 3 * n
    while True:
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:
            raise ValueError("gif: no image block before trailer")
        if b0 == 0x21:                                  # extension
            pos += 1                                    # label
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b0:02x}")
        left = int.from_bytes(data[pos:pos + 2], "little")
        top = int.from_bytes(data[pos + 2:pos + 4], "little")
        w = int.from_bytes(data[pos + 4:pos + 6], "little")
        h = int.from_bytes(data[pos + 6:pos + 8], "little")
        ip = data[pos + 8]
        pos += 9
        if ip & 0x40:
            raise ValueError("gif: interlaced images unsupported")
        pal = gct
        if ip & 0x80:
            n = 2 << (ip & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("gif: no color table")
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        if left or top or w != sw or h != sh:
            raise ValueError("gif: partial-frame images unsupported")
        idx = _lzw_decode(b"".join(chunks), min_code, h * w)
        return pal[idx].reshape(h, w, 3)
