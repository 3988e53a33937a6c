"""Planar geometry measures: shoelace area, centroid, perimeter.

The geopandas ``.area`` / ``.centroid`` / ``.length`` summary surface
(the reference delegates it to shapely via geopandas,
``/root/reference/zen3geo/datapipes/geopandas.py``), hand-rolled over
the WKB dict form of ``geom/wkb.py`` with vectorized numpy ring passes.

Conventions:

* ``area2`` = TWICE the signed shoelace area, positive for CCW shells;
  hole rings stored CW subtract automatically (signed terms just sum).
* ``cx6`` / ``cy6`` = the centroid numerators Σ (x_i + x_{i+1}) · cross_i
  (resp. y), so centroid = (cx6 / (3·area2), cy6 / (3·area2)) — the
  standard polygon-centroid identity with ONE division per coordinate.
* ``perimeter`` sums ring edge lengths (shells and holes alike).

Exactness: every shoelace / centroid term is a product-and-sum of
coordinate doubles; when coordinates are integers with |x·y·(x+x')|
below 2^53 each term is an exact integer in float64, sums are
order-independent, and the SQL oracle matches bit-for-bit — the same
integer-fixture discipline as the rasterize goldens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import wkb


def ring_area2(ring: np.ndarray) -> float:
    """Twice the signed area of one closed ring ((n, 2), first == last)."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    xn, yn = ring[1:, 0], ring[1:, 1]
    return float(np.sum(x * yn - xn * y))


def ring_centroid6(ring: np.ndarray) -> tuple[float, float]:
    """(Σ (x+x')·cross, Σ (y+y')·cross) over the ring's edges."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    xn, yn = ring[1:, 0], ring[1:, 1]
    cross = x * yn - xn * y
    return float(np.sum((x + xn) * cross)), float(np.sum((y + yn) * cross))


def ring_length(ring: np.ndarray) -> float:
    d = np.diff(ring, axis=0)
    return float(np.sum(np.sqrt(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1])))


def polygon_measures(geom: dict) -> dict:
    """Measures for a Polygon or MultiPolygon dict (see wkb.decode).

    Returns dict(area2, cx6, cy6, perimeter, nverts) — nverts counts
    distinct ring vertices (closing repeats excluded) over all rings.
    """
    t = geom["type"]
    if t == "Polygon":
        polys = [geom["coords"]]
    elif t == "MultiPolygon":
        polys = geom["coords"]
    else:
        raise ValueError(f"polygon_measures: unsupported type {t}")
    a2 = cx6 = cy6 = perim = 0.0
    nv = 0
    for rings in polys:
        for ring in rings:
            a2 += ring_area2(ring)
            cx, cy = ring_centroid6(ring)
            cx6 += cx
            cy6 += cy
            perim += ring_length(ring)
            nv += len(ring) - 1
    return {"area2": a2, "cx6": cx6, "cy6": cy6, "perimeter": perim,
            "nverts": nv}


def measures_batch(blobs, *, as_int: bool = False) -> pa.Table:
    """Vectorized-per-ring measures for a column of WKB polygon blobs.

    ``as_int=True`` casts area2/cx6/cy6 to int64 (valid when the input
    coordinates are integers — the exactness contract above) and adds
    the derived float centroid (cx, cy) via the one mirrored division.
    """
    n = len(blobs)
    a2 = np.empty(n, dtype=np.float64)
    cx6 = np.empty(n, dtype=np.float64)
    cy6 = np.empty(n, dtype=np.float64)
    per = np.empty(n, dtype=np.float64)
    nv = np.empty(n, dtype=np.int64)
    for i, blob in enumerate(blobs):
        m = polygon_measures(wkb.loads(blob))
        a2[i], cx6[i], cy6[i] = m["area2"], m["cx6"], m["cy6"]
        per[i], nv[i] = m["perimeter"], m["nverts"]
    if not as_int:
        return pa.table({
            "area2": pa.array(a2), "cx6": pa.array(cx6),
            "cy6": pa.array(cy6), "perimeter": pa.array(per),
            "nverts": pa.array(nv),
        })
    a2i = np.rint(a2).astype(np.int64)
    cx6i = np.rint(cx6).astype(np.int64)
    cy6i = np.rint(cy6).astype(np.int64)
    return pa.table({
        "area2": pa.array(a2i), "cx6": pa.array(cx6i),
        "cy6": pa.array(cy6i), "perimeter": pa.array(per),
        "nverts": pa.array(nv),
        "cx": pa.array(cx6i.astype(np.float64)
                       / (3 * a2i).astype(np.float64)),
        "cy": pa.array(cy6i.astype(np.float64)
                       / (3 * a2i).astype(np.float64)),
    })


def geom_summary(ds, *, geom_col: str = "geometry_wkb",
                 keep_cols: list[str] | None = None,
                 as_int: bool = False):
    """Dataset stage: append shoelace measures to every polygon row —
    a pure stateless map_batches (embarrassingly parallel; nothing
    shuffles)."""
    keep = keep_cols or []

    def fn(b: pa.Table) -> pa.Table:
        blobs = b.column(geom_col).to_pylist()
        m = measures_batch(blobs, as_int=as_int)
        out = pa.table({c: b.column(c) for c in keep})
        for name in m.column_names:
            out = out.append_column(name, m.column(name))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def ring_simplify_mask(ring: np.ndarray, threshold2: float) -> np.ndarray:
    """ONE-PASS vertex filter (the non-iterative Visvalingam screen):
    keep vertex i iff twice its cyclic triangle area
    |(v_i - v_{i-1}) x (v_{i+1} - v_{i-1})| >= threshold2; the first
    vertex anchors the ring unconditionally.  Input closed ring
    ((n, 2), first == last); returns a mask over the n-1 distinct
    vertices.  One pass (not iterated), so the mask is a pure function
    of the input ring and mirrors in SQL."""
    pts = ring[:-1]
    prv = np.roll(pts, 1, axis=0)
    nxt = np.roll(pts, -1, axis=0)
    cross = ((pts[:, 0] - prv[:, 0]) * (nxt[:, 1] - prv[:, 1])
             - (nxt[:, 0] - prv[:, 0]) * (pts[:, 1] - prv[:, 1]))
    keep = np.abs(cross) >= threshold2
    keep[0] = True
    return keep


def simplify_summary(ds, *, threshold2: float,
                     geom_col: str = "geometry_wkb",
                     keep_cols: list[str] | None = None):
    """Per-polygon simplification summary over the SHELL ring:
    (nverts, nkept, area2, area2_s) — original and filtered shoelace
    (both exact integers under the integer-coordinate contract).  A
    stateless map_batches; the simplified ring may self-intersect for
    aggressive thresholds (the standard one-pass caveat) — area2_s is
    its signed shoelace either way."""
    keep_cols = keep_cols or []

    def fn(b: pa.Table) -> pa.Table:
        blobs = b.column(geom_col).to_pylist()
        nv = np.empty(len(blobs), np.int64)
        nk = np.empty(len(blobs), np.int64)
        a2 = np.empty(len(blobs), np.int64)
        a2s = np.empty(len(blobs), np.int64)
        for i, blob in enumerate(blobs):
            g = wkb.loads(blob)
            if g["type"] != "Polygon":
                raise ValueError("simplify_summary: Polygon shells only")
            ring = np.asarray(g["coords"][0], dtype=np.float64)
            mask = ring_simplify_mask(ring, threshold2)
            kept = ring[:-1][mask]
            closed = np.vstack([kept, kept[:1]])
            nv[i] = len(ring) - 1
            nk[i] = int(mask.sum())
            a2[i] = int(round(ring_area2(ring)))
            a2s[i] = int(round(ring_area2(closed)))
        out = {c: b.column(c) for c in keep_cols}
        out.update({"nverts": pa.array(nv), "nkept": pa.array(nk),
                    "area2": pa.array(a2), "area2_s": pa.array(a2s)})
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")
