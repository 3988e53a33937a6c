"""Rectangle clipping: Sutherland–Hodgman polygons, Liang–Barsky lines.

Implements the geometric core of the reference's rectangle-clip join
(``/root/reference/zen3geo/datapipes/geopandas.py:160-174`` —
``geodataframe.clip(mask=raster.rio.bounds())``): intersection of each
geometry with an axis-aligned rectangle.  Golden parity:
box(0,0,2,2) ∩ rect(-1.5,-0.5,1.5,1.5) has bounds (0,0,1.5,1.5)
(``/root/reference/zen3geo/tests/test_datapipes_geopandas.py:77-83``).
"""

from __future__ import annotations

import numpy as np


def clip_ring_rect(ring: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray:
    """Sutherland–Hodgman clip of one closed ring against a rectangle.

    Each half-plane pass is vectorized over the ring's vertices.  Returns
    the clipped closed ring, or an empty (0,2) array if nothing remains.
    """
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    for axis, bound, keep_ge in (
        (0, minx, True),
        (0, maxx, False),
        (1, miny, True),
        (1, maxy, False),
    ):
        if len(pts) == 0:
            break
        cur = pts
        nxt = np.roll(cur, -1, axis=0)
        if keep_ge:
            cur_in = cur[:, axis] >= bound
            nxt_in = nxt[:, axis] >= bound
        else:
            cur_in = cur[:, axis] <= bound
            nxt_in = nxt[:, axis] <= bound
        d = nxt[:, axis] - cur[:, axis]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (bound - cur[:, axis]) / d
        t = np.where(np.isfinite(t), t, 0.0)
        inter = cur + t[:, None] * (nxt - cur)
        inter[:, axis] = bound  # exact on the clip line
        out = []
        for i in range(len(cur)):
            if cur_in[i]:
                out.append(cur[i])
                if not nxt_in[i]:
                    out.append(inter[i])
            elif nxt_in[i]:
                out.append(inter[i])
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return np.empty((0, 2), dtype=np.float64)
    return np.vstack([pts, pts[:1]])


def clip_polygon_rect(rings, minx, miny, maxx, maxy) -> list[np.ndarray]:
    """Clip polygon-with-holes; drops rings that vanish.  Returns [] when
    the exterior is fully outside."""
    ext = clip_ring_rect(rings[0], minx, miny, maxx, maxy)
    if len(ext) == 0:
        return []
    out = [ext]
    for hole in rings[1:]:
        h = clip_ring_rect(hole, minx, miny, maxx, maxy)
        if len(h):
            out.append(h)
    return out


def clip_line_rect(coords: np.ndarray, minx, miny, maxx, maxy) -> list[np.ndarray]:
    """Liang–Barsky clip of a polyline; may split into multiple pieces."""
    pts = np.asarray(coords, dtype=np.float64)
    if len(pts) < 2:
        return []
    p0, p1 = pts[:-1], pts[1:]
    x0, y0 = p0[:, 0], p0[:, 1]
    dx, dy = p1[:, 0] - x0, p1[:, 1] - y0
    t0 = np.zeros(len(x0))
    t1 = np.ones(len(x0))
    ok = np.ones(len(x0), dtype=bool)
    for p, q in (
        (-dx, x0 - minx),
        (dx, maxx - x0),
        (-dy, y0 - miny),
        (dy, maxy - y0),
    ):
        with np.errstate(divide="ignore", invalid="ignore"):
            r = q / p
        par = p == 0
        ok &= ~(par & (q < 0))
        entering = (p < 0) & ~par
        leaving = (p > 0) & ~par
        t0 = np.where(entering & ok, np.maximum(t0, r), t0)
        t1 = np.where(leaving & ok, np.minimum(t1, r), t1)
    ok &= t0 <= t1
    pieces: list[np.ndarray] = []
    current: list[np.ndarray] = []
    for i in range(len(x0)):
        if not ok[i]:
            if len(current) > 1:
                pieces.append(np.asarray(current))
            current = []
            continue
        a = p0[i] + t0[i] * (p1[i] - p0[i])
        b = p0[i] + t1[i] * (p1[i] - p0[i])
        if current and np.allclose(current[-1], a):
            current.append(b)
        else:
            if len(current) > 1:
                pieces.append(np.asarray(current))
            current = [a, b]
    if len(current) > 1:
        pieces.append(np.asarray(current))
    return pieces


def clip_geom_rect(geom: dict, minx, miny, maxx, maxy) -> dict | None:
    """Clip any supported geometry dict; None when empty."""
    gtype = geom["type"]
    c = geom["coords"]
    if gtype == "Point":
        x, y = c[0]
        if minx <= x <= maxx and miny <= y <= maxy:
            return geom
        return None
    if gtype == "MultiPoint":
        arr = np.asarray(c)
        keep = (
            (arr[:, 0] >= minx)
            & (arr[:, 0] <= maxx)
            & (arr[:, 1] >= miny)
            & (arr[:, 1] <= maxy)
        )
        if not keep.any():
            return None
        return {"type": "MultiPoint", "coords": arr[keep]}
    if gtype == "LineString":
        pieces = clip_line_rect(c, minx, miny, maxx, maxy)
        if not pieces:
            return None
        if len(pieces) == 1:
            return {"type": "LineString", "coords": pieces[0]}
        return {"type": "MultiLineString", "coords": pieces}
    if gtype == "MultiLineString":
        pieces = [p for line in c for p in clip_line_rect(line, minx, miny, maxx, maxy)]
        if not pieces:
            return None
        return {"type": "MultiLineString", "coords": pieces}
    if gtype == "Polygon":
        rings = clip_polygon_rect(c, minx, miny, maxx, maxy)
        if not rings:
            return None
        return {"type": "Polygon", "coords": rings}
    if gtype == "MultiPolygon":
        polys = [
            r for rings in c if (r := clip_polygon_rect(rings, minx, miny, maxx, maxy))
        ]
        if not polys:
            return None
        if len(polys) == 1:
            return {"type": "Polygon", "coords": polys[0]}
        return {"type": "MultiPolygon", "coords": polys}
    raise NotImplementedError(f"Unsupported geometry type for clip: {gtype}")
