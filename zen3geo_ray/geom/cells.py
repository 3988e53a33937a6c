"""Hierarchical lon/lat grid-cell index (H3/S2 analog), vectorized numpy.

The engine's spatial key is a deterministic equirectangular grid cell id —
the role H3/S2 cells play in the north-star design.  At resolution ``res``
the globe is divided into ``2**(res+1)`` columns x ``2**res`` rows of
square-in-degrees cells (cell edge = ``180 / 2**res`` degrees).  A cell id
is the row-major index

    cell = ny * 2**(res+1) + nx          (fits int64 for res <= 30)

chosen over a Morton/Z-order packing because it is *expressible in plain
SQL arithmetic* (the DuckDB correctness oracle recomputes it), while
parent/child/k-ring remain O(1) bit/shift math.  For range partitioning a
Morton variant is provided (``morton_of``) whose locality is better.

API mirrors what the reference's pipelines need from h3-py: cell_of
(geo_to_h3), parent/children (cell_to_parent/children), k_ring
(grid_disk), cell_bounds / cell_center (cell_to_boundary).  zen3geo itself
has no cell index — cells replace its per-scene iteration key
(``/root/reference/zen3geo/datapipes/rioxarray.py:70-74``) with an explicit
distributed partitioning key.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 30


def _grid_dims(res: int) -> tuple[int, int]:
    """(n_cols, n_rows) of the res grid."""
    return 2 << res, 1 << res


def nxny_of(lon, lat, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (nx, ny) grid coordinates for lon/lat degrees.

    Clamps to the valid range so lon=180 / lat=90 land in the last cell
    (mirrors the SQL oracle: least(floor(...), n-1) with greatest(..., 0)).
    """
    ncols, nrows = _grid_dims(res)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    nx = np.floor((lon + 180.0) / 360.0 * ncols).astype(np.int64)
    ny = np.floor((lat + 90.0) / 180.0 * nrows).astype(np.int64)
    np.clip(nx, 0, ncols - 1, out=nx)
    np.clip(ny, 0, nrows - 1, out=ny)
    return nx, ny


def cell_of(lon, lat, res: int) -> np.ndarray:
    """lon/lat (degrees, vectorized) -> int64 cell id at ``res``."""
    ncols, _ = _grid_dims(res)
    nx, ny = nxny_of(lon, lat, res)
    return ny * ncols + nx


def cell_to_nxny(cell, res: int) -> tuple[np.ndarray, np.ndarray]:
    ncols, _ = _grid_dims(res)
    cell = np.asarray(cell, dtype=np.int64)
    return cell % ncols, cell // ncols


def parent(cell, res: int, parent_res: int | None = None) -> np.ndarray:
    """Cell id at a coarser resolution containing ``cell``."""
    if parent_res is None:
        parent_res = res - 1
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    shift = res - parent_res
    nx, ny = cell_to_nxny(cell, res)
    pcols, _ = _grid_dims(parent_res)
    return (ny >> shift) * pcols + (nx >> shift)


def children(cell: int, res: int, child_res: int | None = None) -> np.ndarray:
    """All child cell ids of one cell at a finer resolution (scalar in)."""
    if child_res is None:
        child_res = res + 1
    if child_res < res:
        raise ValueError("child_res must be >= res")
    shift = child_res - res
    nx, ny = cell_to_nxny(np.asarray([cell]), res)
    nx0, ny0 = int(nx[0]) << shift, int(ny[0]) << shift
    k = 1 << shift
    ccols, _ = _grid_dims(child_res)
    cys, cxs = np.meshgrid(np.arange(ny0, ny0 + k), np.arange(nx0, nx0 + k), indexing="ij")
    return (cys * ccols + cxs).ravel()


def k_ring(cell, res: int, k: int = 1) -> np.ndarray:
    """Grid-disk: all cells within Chebyshev distance ``k``.

    Vectorized over an array of cells; returns shape ``(n, (2k+1)**2)``.
    Longitude wraps (mod n_cols); latitude clamps at the poles, where
    out-of-range rows are replaced by the source cell itself (callers
    dedup per-row — matches h3's grid_disk returning fewer at edges).
    """
    ncols, nrows = _grid_dims(res)
    nx, ny = cell_to_nxny(cell, res)
    offs = np.arange(-k, k + 1)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    dx, dy = dx.ravel(), dy.ravel()
    rx = (nx[:, None] + dx[None, :]) % ncols
    ry = ny[:, None] + dy[None, :]
    valid = (ry >= 0) & (ry < nrows)
    ring = ry * ncols + rx
    src = (ny * ncols + nx)[:, None]
    return np.where(valid, ring, src)


def cell_bounds(cell, res: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(minlon, minlat, maxlon, maxlat) degrees, vectorized."""
    ncols, nrows = _grid_dims(res)
    nx, ny = cell_to_nxny(cell, res)
    w = 360.0 / ncols
    h = 180.0 / nrows
    minlon = nx * w - 180.0
    minlat = ny * h - 90.0
    return minlon, minlat, minlon + w, minlat + h


def cell_center(cell, res: int) -> tuple[np.ndarray, np.ndarray]:
    minlon, minlat, maxlon, maxlat = cell_bounds(cell, res)
    return (minlon + maxlon) * 0.5, (minlat + maxlat) * 0.5


def morton_of(lon, lat, res: int = 16) -> np.ndarray:
    """Z-order key for range partitioning (better locality than row-major).

    Interleaves ``res``-bit nx/ny (nx uses res+1 bits; its extra top bit is
    prepended), giving a spatial sort key; mirrored by ``sql_morton_expr``.
    """
    nx, ny = nxny_of(lon, lat, res)
    x = nx & ((1 << res) - 1)
    topx = nx >> res
    z = np.zeros_like(x)
    for i in range(res):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((ny >> i) & 1) << (2 * i + 1)
    return (topx << (2 * res)) | z


_HILBERT_MASK = np.uint32((1 << 16) - 1)


def _interleave16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each uint32 into the even bit
    positions (Morton half-interleave)."""
    v = (v | (v << np.uint32(8))) & np.uint32(0x00FF00FF)
    v = (v | (v << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    v = (v | (v << np.uint32(2))) & np.uint32(0x33333333)
    v = (v | (v << np.uint32(1))) & np.uint32(0x55555555)
    return v


def hilbert_d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hilbert-curve distance of 16-bit cell coordinates (vectorized
    port of the public-domain rawrunprotected/hilbert_curves kernel
    that flatbush — and therefore FlatGeobuf — uses for its packing
    order).  Input: uint32 arrays with values <= 0xFFFF; output:
    uint32 distances on the 2^16 x 2^16 curve.  Mirrored op for op by
    ``sql_hilbert_ctes`` so oracle queries can recompute it."""
    x = np.asarray(x, dtype=np.uint32)
    y = np.asarray(y, dtype=np.uint32)
    M = _HILBERT_MASK
    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)
    A = a | (b >> np.uint32(1))
    B = (a >> np.uint32(1)) ^ a
    C = ((c >> np.uint32(1)) ^ (b & (d >> np.uint32(1)))) ^ c
    D = ((a & (c >> np.uint32(1))) ^ (d >> np.uint32(1))) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> np.uint32(2))) ^ (b & (b >> np.uint32(2)))
    B = (a & (b >> np.uint32(2))) ^ (b & ((a ^ b) >> np.uint32(2)))
    C = C ^ ((a & (c >> np.uint32(2))) ^ (b & (d >> np.uint32(2))))
    D = D ^ ((b & (c >> np.uint32(2))) ^ ((a ^ b) & (d >> np.uint32(2))))
    a, b, c, d = A, B, C, D
    A = (a & (a >> np.uint32(4))) ^ (b & (b >> np.uint32(4)))
    B = (a & (b >> np.uint32(4))) ^ (b & ((a ^ b) >> np.uint32(4)))
    C = C ^ ((a & (c >> np.uint32(4))) ^ (b & (d >> np.uint32(4))))
    D = D ^ ((b & (c >> np.uint32(4))) ^ ((a ^ b) & (d >> np.uint32(4))))
    a, b, c, d = A, B, C, D
    C = C ^ ((a & (c >> np.uint32(8))) ^ (b & (d >> np.uint32(8))))
    D = D ^ ((b & (c >> np.uint32(8))) ^ ((a ^ b) & (d >> np.uint32(8))))
    a = C ^ (C >> np.uint32(1))
    b = D ^ (D >> np.uint32(1))
    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))
    return ((_interleave16(i1 & M) << np.uint32(1))
            | _interleave16(i0 & M))


def hilbert_of(lon, lat, res: int = 15) -> np.ndarray:
    """Hilbert locality key for lon/lat degrees: ``hilbert_d`` over the
    res grid (res <= 15 so nx's res+1 bits fit the 16-bit kernel).
    Better tail locality than ``morton_of`` — consecutive keys are
    always edge-adjacent cells, so range partitions have compact
    borders (no Z seam jumps)."""
    if res > 15:
        raise ValueError("hilbert_of needs res <= 15 (16-bit kernel)")
    nx, ny = nxny_of(lon, lat, res)
    return hilbert_d(nx.astype(np.uint32),
                     ny.astype(np.uint32)).astype(np.int64)


def sql_hilbert_ctes(src: str, id_col: str, nx_expr: str = "nx",
                     ny_expr: str = "ny") -> str:
    """CTE chain mirroring ``hilbert_d`` bit for bit in DuckDB BIGINT
    arithmetic (xor()/&/|/shifts; every intermediate < 2^33).  Input:
    CTE ``src`` exposing (id_col, nx, ny); output: CTEs ``h1..h10``
    and ``hfin`` exposing (id_col, hkey).  Paste after ``src`` in a
    WITH chain."""
    M = 65535
    r1 = (f"h1 AS (SELECT {id_col}, {nx_expr} AS x, {ny_expr} AS y, "
          f"xor({nx_expr}, {ny_expr}) AS a, "
          f"xor({M}, xor({nx_expr}, {ny_expr})) AS b, "
          f"xor({M}, ({nx_expr} | {ny_expr})) AS c, "
          f"({nx_expr} & xor({ny_expr}, {M})) AS d FROM {src})")
    r2 = (f"h2 AS (SELECT {id_col}, x, y, "
          "(a | (b >> 1)) AS a, xor(a >> 1, a) AS b, "
          "xor(xor(c >> 1, b & (d >> 1)), c) AS c, "
          "xor(xor(a & (c >> 1), d >> 1), d) AS d FROM h1)")

    def widen(tag, prev, s):
        return (f"h{tag} AS (SELECT {id_col}, x, y, "
                f"xor(a & (a >> {s}), b & (b >> {s})) AS a, "
                f"xor(a & (b >> {s}), b & (xor(a, b) >> {s})) AS b, "
                f"xor(c, xor(a & (c >> {s}), b & (d >> {s}))) AS c, "
                f"xor(d, xor(b & (c >> {s}), xor(a, b) & (d >> {s}))) AS d "
                f"FROM h{prev})")

    r3, r4 = widen(3, 2, 2), widen(4, 3, 4)
    r5 = (f"h5 AS (SELECT {id_col}, x, y, a, b, "
          "xor(c, xor(a & (c >> 8), b & (d >> 8))) AS c, "
          "xor(d, xor(b & (c >> 8), xor(a, b) & (d >> 8))) AS d FROM h4)")
    r6 = (f"h6 AS (SELECT {id_col}, xor(x, y) AS i0, "
          "(xor(d, d >> 1) | "
          f"xor({M}, xor(x, y) | xor(c, c >> 1))) AS i1 FROM h5)")
    inter = []
    for tag, (s, mask) in enumerate(
            [(8, 0x00FF00FF), (4, 0x0F0F0F0F),
             (2, 0x33333333), (1, 0x55555555)], start=7):
        inter.append(
            f"h{tag} AS (SELECT {id_col}, "
            f"((i0 | (i0 << {s})) & {mask}) AS i0, "
            f"((i1 | (i1 << {s})) & {mask}) AS i1 FROM h{tag - 1})")
    fin = f"hfin AS (SELECT {id_col}, ((i1 << 1) | i0) AS hkey FROM h10)"
    return ", ".join([r1, r2, r3, r4, r5, r6, *inter, fin])


def sql_nxny_exprs(lon_expr: str, lat_expr: str, res: int) -> tuple[str, str]:
    """DuckDB expressions computing exactly ``nxny_of``."""
    ncols, nrows = _grid_dims(res)
    nx = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon_expr}) + 180.0) / 360.0 * {ncols}) "
        f"AS BIGINT), 0), {ncols - 1})"
    )
    ny = (
        f"LEAST(GREATEST(CAST(FLOOR((({lat_expr}) + 90.0) / 180.0 * {nrows}) "
        f"AS BIGINT), 0), {nrows - 1})"
    )
    return nx, ny


def sql_cell_expr(lon_expr: str, lat_expr: str, res: int) -> str:
    """The DuckDB SQL expression computing exactly ``cell_of``.

    Keeping the oracle's cell arithmetic in one place guarantees the Ray
    pipeline and the SQL oracle can never drift.
    """
    ncols, _ = _grid_dims(res)
    nx, ny = sql_nxny_exprs(lon_expr, lat_expr, res)
    return f"({ny} * {ncols} + {nx})"


def sql_morton_expr(nx_expr: str, ny_expr: str, res: int) -> str:
    """DuckDB expression computing exactly ``morton_of`` from (cheap —
    CTE-bound) nx/ny refs: unrolled bit interleave via BIGINT shift/mask,
    disjoint bits OR-joined."""
    mask = (1 << res) - 1
    terms = []
    for i in range(res):
        terms.append(f"(((({nx_expr}) & {mask}) >> {i}) & 1) << {2 * i}")
        terms.append(f"((({ny_expr}) >> {i}) & 1) << {2 * i + 1}")
    z = " | ".join(f"({t})" for t in terms)
    return f"(((({nx_expr}) >> {res}) << {2 * res}) | {z})"


GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_of(lon, lat, precision: int = 8) -> np.ndarray:
    """Standard GEOHASH base32 strings (Niemeyer encoding, vectorized).

    Equivalent closed form of the bisection construction: quantize
    lon/lat to ``bits/2`` bits each (lon = x, lat = y), Morton-
    interleave with the LONGITUDE bit most significant, then emit
    5-bit groups through the geohash base32 alphabet.  Even precisions
    only (odd ones split a cell asymmetrically across the two axes —
    the closed form would need per-axis bit counts to differ by one).
    Mirrored bit for bit by ``sql_geohash_ctes``.
    """
    if precision % 2 != 0 or not (2 <= precision <= 12):
        raise ValueError("precision must be even, 2..12")
    half = 5 * precision // 2
    n = np.int64(1) << np.int64(half)
    x = np.clip(np.floor((np.asarray(lon, dtype=np.float64) + 180.0)
                         / 360.0 * float(n)), 0, float(int(n) - 1)
                ).astype(np.int64)
    y = np.clip(np.floor((np.asarray(lat, dtype=np.float64) + 90.0)
                         / 180.0 * float(n)), 0, float(int(n) - 1)
                ).astype(np.int64)
    code = np.zeros_like(x)
    for i in range(half):
        code |= ((x >> np.int64(i)) & 1) << np.int64(2 * i + 1)
        code |= ((y >> np.int64(i)) & 1) << np.int64(2 * i)
    lut = np.frombuffer(GEOHASH_B32.encode(), dtype=np.uint8)
    idx = np.empty((len(code), precision), dtype=np.int64)
    for c in range(precision):
        idx[:, c] = (code >> np.int64(5 * (precision - 1 - c))) & 31
    raw = np.ascontiguousarray(lut[idx]).view(f"S{precision}")[:, 0]
    return raw.astype(str)


def sql_geohash_ctes(src: str, id_col: str, lon_expr: str,
                     lat_expr: str, precision: int = 8) -> str:
    """CTE chain computing exactly ``geohash_of`` over ``src`` rows:
    quantize (shared float expression shape with sql_nxny_exprs),
    unrolled BIGINT bit interleave, base32 chars via substring lookups.
    Ends with CTE ``ghf(id_col, gh)``."""
    half = 5 * precision // 2
    n = 1 << half
    xq = (f"LEAST(GREATEST(CAST(FLOOR((({lon_expr}) + 180.0) / 360.0 "
          f"* {n}.0) AS BIGINT), 0), {n - 1})")
    yq = (f"LEAST(GREATEST(CAST(FLOOR((({lat_expr}) + 90.0) / 180.0 "
          f"* {n}.0) AS BIGINT), 0), {n - 1})")
    terms = []
    for i in range(half):
        terms.append(f"(((x >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((y >> {i}) & 1) << {2 * i})")
    code = " | ".join(terms)
    chars = " || ".join(
        f"substring('{GEOHASH_B32}', "
        f"CAST((code >> {5 * (precision - 1 - c)}) & 31 AS INTEGER) + 1, 1)"
        for c in range(precision))
    return f"""ghq AS (SELECT {id_col}, {xq} AS x, {yq} AS y FROM {src}),
ghc AS (SELECT {id_col}, {code} AS code FROM ghq),
ghf AS (SELECT {id_col}, {chars} AS gh FROM ghc)"""


# --- hexagonal binning (the H3/hexbin analog) -------------------------------
#
# Pointy-top axial hex grid over a QUANTIZED plane: lon/lat floor to
# 2^-20-degree integer units, then the axial fractions
#     q = (sqrt(3)/3 * x - y/3) / s,   r = (2/3 * y) / s
# are EXACT RATIONALS with sqrt(3) fixed at 1732051/1000000 — the grid
# is *defined* by that rational (a ~3e-7 aspect skew nobody can see),
# which buys bit-exact SQL mirrorability: cube rounding is round-half-up
# on integer numerators over one shared positive denominator, and the
# largest-residual fix compares integer absolute residuals.  Standard
# cube-round algorithm per Red Blob Games' public hex-grid reference.

HEX_S3N, HEX_S3D = 1732051, 1000000
HEX_Q = 1 << 20


def hex_axial_of(lon, lat, size_q: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (hq, hr) axial hex ids; ``size_q`` = hex circumradius
    in 2^-20-degree units (e.g. 3 degrees -> 3 * 2^20)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.floor(lon * HEX_Q).astype(np.int64)
    y = np.floor(lat * HEX_Q).astype(np.int64)
    qn = HEX_S3N * x - HEX_S3D * y
    rn = 2 * HEX_S3D * y
    yn = -qn - rn
    d = 3 * int(size_q) * HEX_S3D

    def rnd(num):
        return (2 * num + d) // (2 * d)   # round-half-up, floor div

    rx, ry, rz = rnd(qn), rnd(yn), rnd(rn)
    dx = np.abs(rx * d - qn)
    dy = np.abs(ry * d - yn)
    dz = np.abs(rz * d - rn)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    hq = np.where(fix_x, -ry - rz, rx)
    hr = np.where(fix_z, -rx - ry, rz)
    return hq.astype(np.int64), hr.astype(np.int64)


def sql_hex_ctes(src: str, cols: str, lon_expr: str, lat_expr: str,
                 size_q: int) -> str:
    """CTE chain mirroring ``hex_axial_of`` bit for bit; final CTE
    ``hexed`` exposes (``cols``, hq, hr).  Floor division of a signed
    numerator by the positive denominator m uses the nonneg-remainder
    identity (a - (((a % m) + m) % m)) / m (DuckDB // truncates)."""
    d = 3 * int(size_q) * HEX_S3D

    def fdiv(a: str, m: int) -> str:
        return f"(({a}) - (((({a}) % {m}) + {m}) % {m})) // {m}"

    def rnd(num: str) -> str:
        return fdiv(f"2 * ({num}) + {d}", 2 * d)

    return f"""hx0 AS (SELECT {cols},
  CAST(FLOOR(({lon_expr}) * {HEX_Q}) AS BIGINT) AS x,
  CAST(FLOOR(({lat_expr}) * {HEX_Q}) AS BIGINT) AS y FROM {src}),
hx1 AS (SELECT {cols}, {HEX_S3N} * x - {HEX_S3D} * y AS qn,
  2 * {HEX_S3D} * y AS rn, -({HEX_S3N} * x - {HEX_S3D} * y)
  - 2 * {HEX_S3D} * y AS yn FROM hx0),
hx2 AS (SELECT {cols}, qn, rn, yn, {rnd('qn')} AS rx,
  {rnd('yn')} AS ry, {rnd('rn')} AS rz FROM hx1),
hx3 AS (SELECT {cols}, rx, ry, rz, ABS(rx * {d} - qn) AS dx,
  ABS(ry * {d} - yn) AS dy, ABS(rz * {d} - rn) AS dz FROM hx2),
hexed AS (SELECT {cols},
  CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS hq,
  CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
       THEN -rx - ry ELSE rz END AS hr FROM hx3)"""


def quadkey_of(lon, lat, z: int) -> list[str]:
    """Bing-maps QUADKEY strings at zoom ``z`` (the public tile-key
    scheme: one base-4 digit per zoom level, digit = (x_bit) + 2*(y_bit)
    from most significant down) over the SAME equirectangular grid as
    ``cell_of`` at res z (2^z x 2^z ... note: quadkeys use a square
    tile grid, so x uses the 2^z-column HALF grid: nx // 2 of res z's
    2^(z+1) columns == floor((lon+180)/360 * 2^z)).

    Vectorized: digits assembled per level as integer arrays, joined
    through numpy unicode addition.
    """
    nq = 1 << z
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.floor((lon + 180.0) / 360.0 * nq).astype(np.int64)
    y = np.floor((lat + 90.0) / 180.0 * nq).astype(np.int64)
    np.clip(x, 0, nq - 1, out=x)
    np.clip(y, 0, nq - 1, out=y)
    # quadkey rows count from the TOP (north) — flip the row index
    ty = (nq - 1) - y
    out = np.full(len(x), "", dtype=f"<U{z}")
    for k in range(z - 1, -1, -1):
        d = ((x >> k) & 1) + 2 * ((ty >> k) & 1)
        out = np.char.add(out, d.astype("<U1"))
    return out.tolist()


def sql_quadkey_parts(lon_expr: str, lat_expr: str,
                      z: int) -> tuple[str, str, str]:
    """DuckDB fragments computing exactly ``quadkey_of``: (qx_expr,
    qy_expr, concat_expr) where the concat expression reads columns
    named ``qx``/``qy`` (compute the first two in a CTE).  Clamped
    floor bins, north-flipped row, base-4 digit concatenation."""
    nq = 1 << z
    x = (f"LEAST(GREATEST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 "
         f"* {nq}) AS BIGINT), 0), {nq - 1})")
    y = (f"{nq - 1} - LEAST(GREATEST(CAST(FLOOR(({lat_expr} + 90.0) "
         f"/ 180.0 * {nq}) AS BIGINT), 0), {nq - 1})")
    parts = []
    for k in range(z - 1, -1, -1):
        parts.append(
            f"CAST(((qx // {1 << k}) % 2) + 2 * ((qy // {1 << k}) % 2) "
            f"AS VARCHAR)")
    return x, y, " || ".join(parts)
