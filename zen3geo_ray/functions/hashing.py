"""Deterministic hashes, SQL-replicable where the oracle needs them.

Two families:

* ``knuth_hash`` — multiplicative integer hash on int64 keys, reproducible
  in DuckDB with plain arithmetic (``sql_knuth_expr``).  Used wherever the
  correctness oracle must recompute a derived value (geocode coordinates,
  salt buckets).
* ``fnv1a_bytes`` / ``fnv1a_str_array`` — FNV-1a 64-bit over raw bytes,
  vectorized over Arrow/pandas string arrays.  Used for url/content
  fingerprints inside the engine (pytest-verified, not SQL-replicated).
"""

from __future__ import annotations

import numpy as np

_KNUTH_A = 2654435761  # Knuth's 2^32 golden-ratio multiplier
_KNUTH_B = 2246822519  # xxhash prime2 — second independent stream
_M32 = 4294967296      # 2^32


def knuth_hash(key, mult: int = _KNUTH_A) -> np.ndarray:
    """(key * mult) mod 2^32 on int64 keys, vectorized.

    Exactly reproducible in SQL: ``(key * mult) % 4294967296`` (DuckDB
    BIGINT math; key is assumed non-negative and < 2^31 so the product
    fits in 63 bits on both sides).
    """
    key = np.asarray(key, dtype=np.int64)
    return (key * mult) % _M32


def sql_knuth_expr(key_expr: str, mult: int = _KNUTH_A) -> str:
    return f"((({key_expr}) * {mult}) % {_M32})"


def knuth_unit(key, mult: int = _KNUTH_A) -> np.ndarray:
    """Uniform [0, 1) double derived from ``knuth_hash`` — SQL-replicable."""
    return knuth_hash(key, mult).astype(np.float64) / _M32


def sql_knuth_unit_expr(key_expr: str, mult: int = _KNUTH_A) -> str:
    return f"(CAST({sql_knuth_expr(key_expr, mult)} AS DOUBLE) / {_M32})"


KNUTH_A = _KNUTH_A
KNUTH_B = _KNUTH_B

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a_bytes(data: bytes) -> int:
    """FNV-1a 64-bit of one bytes value (scalar reference implementation)."""
    h = _FNV_OFFSET
    with np.errstate(over="ignore"):
        for b in data:
            h = np.uint64(h ^ np.uint64(b)) * _FNV_PRIME
    return int(h)


def fnv1a_str_array(values) -> np.ndarray:
    """Vectorized FNV-1a 64-bit over an iterable of str/bytes.

    Processes byte columns position-by-position over the whole batch so the
    inner loop length is max(len) not sum(len); zero-padded tail positions
    are masked out.  Orders of magnitude faster than a per-row Python loop
    for typical url/text columns.
    """
    enc = [v.encode("utf-8") if isinstance(v, str) else bytes(v) for v in values]
    n = len(enc)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.full(n, int(_FNV_OFFSET), dtype=np.uint64)
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(enc):
        buf[i, : lens[i]] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            hj = (h ^ buf[:, j].astype(np.uint64)) * _FNV_PRIME
            h = np.where(active, hj, h)
    return h


def fnv1a_arrow_str(arr) -> np.ndarray:
    """FNV-1a 64-bit over a pyarrow String/LargeString/Binary array,
    ZERO-COPY from the Arrow buffers — no per-string Python objects.

    Same hash values as ``fnv1a_str_array`` (both run FNV-1a over the
    utf-8 bytes), but the batch never leaves numpy: string starts come
    from the Arrow offsets buffer and the inner loop is one masked
    gather per byte POSITION, so loop length is max(len) not sum(len).
    Null slots hash as the empty string (zero length).
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    wide = (pa.types.is_large_string(arr.type)
            or pa.types.is_large_binary(arr.type))
    odt = np.int64 if wide else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset:arr.offset + n + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    starts = offsets[:-1]
    lens = np.diff(offsets)
    maxlen = int(lens.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if maxlen == 0:
        return h
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            byte = data[starts[active] + j].astype(np.uint64)
            h[active] = (h[active] ^ byte) * _FNV_PRIME
    return h


def splitmix64(x) -> np.ndarray:
    """splitmix64 finalizer — cheap avalanche for derived hash streams."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


# splitmix64's multipliers exceed 2^63, so its products overflow DuckDB's
# signed INT128 — it can never be oracle-mirrored.  mulrot64 is the
# SQL-expressible sibling: multiply-add (PCG64 LCG multiplier), rotl32
# (= two disjoint-bit integer terms, no xor — DuckDB xor() is
# BIGINT-only), multiply-add (xorshift64* multiplier).  Every constant
# is < 2^63 so HUGEINT products stay < 2^127.
MULROT_K1 = 6364136223846793005
MULROT_C1 = 1442695040888963407
MULROT_K2 = 2685821657736338717
MULROT_C2 = 1181783497276652981
_W64 = 1 << 64


def mulrot64(x) -> np.ndarray:
    """SQL-mirrorable 64-bit avalanche (see ``sql_mulrot_ctes``).
    Mixing quality is pinned by the HLL accuracy-envelope tests."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = x * np.uint64(MULROT_K1) + np.uint64(MULROT_C1)
        h = (((h & np.uint64(0xFFFFFFFF)) << np.uint64(32))
             | (h >> np.uint64(32)))
        h = h * np.uint64(MULROT_K2) + np.uint64(MULROT_C2)
    return h


def sql_mulrot_ctes(src: str, cols: str, x_expr: str) -> str:
    """CTE pair mirroring ``mulrot64`` bit for bit in DuckDB HUGEINT
    arithmetic.  ``x_expr`` must already be HUGEINT-typed and in
    [0, 2^64); the final CTE ``mh`` exposes (``cols``, h)."""
    return (
        f"m1 AS (SELECT {cols}, "
        f"((({x_expr}) * {MULROT_K1} + {MULROT_C1}) % {_W64}) AS t "
        f"FROM {src}), "
        f"mh AS (SELECT {cols}, "
        f"((((t % 4294967296) * 4294967296 + t // 4294967296) "
        f"* {MULROT_K2} + {MULROT_C2}) % {_W64}) AS h FROM m1)")


# 63-bit BIJECTIVE mixer: multiply-by-odd mod 2^63, 63-bit rotate
# (= two disjoint-bit terms), multiply-by-odd mod 2^63.  Each step is a
# bijection on [0, 2^63), so DISTINCT inputs < 2^63 get DISTINCT
# priorities — the tie-free guarantee Luby-style symmetry breaking
# needs (stages/graph.py:maximal_independent_set).  Values stay below
# 2^63, so they survive pandas nullable-int padding and signed BIGINT
# columns; products stay < 2^126 in DuckDB HUGEINT.
_W63 = 1 << 63


def mulrot63(x) -> np.ndarray:
    """SQL-mirrorable 63-bit bijection (see ``sql_mulrot63_ctes``)."""
    x = np.asarray(x, dtype=np.uint64)
    m63 = np.uint64(_W63 - 1)
    with np.errstate(over="ignore"):
        h = (x * np.uint64(MULROT_K1) + np.uint64(MULROT_C1)) & m63
        h = (((h & np.uint64(0x7FFFFFFF)) << np.uint64(32))
             | (h >> np.uint64(31)))
        h = (h * np.uint64(MULROT_K2) + np.uint64(MULROT_C2)) & m63
    return h


def sql_mulrot63_ctes(src: str, cols: str, x_expr: str) -> str:
    """CTE pair mirroring ``mulrot63`` bit for bit; ``x_expr`` must be
    HUGEINT-typed and in [0, 2^63).  Final CTE ``mh63`` exposes
    (``cols``, h)."""
    return (
        f"m63a AS (SELECT {cols}, "
        f"((({x_expr}) * {MULROT_K1} + {MULROT_C1}) % {_W63}) AS t "
        f"FROM {src}), "
        f"mh63 AS (SELECT {cols}, "
        f"((((t % 2147483648) * 4294967296 + t // 2147483648) "
        f"* {MULROT_K2} + {MULROT_C2}) % {_W63}) AS h FROM m63a)")
