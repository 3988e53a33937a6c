"""Vectorized spatial predicates (numpy; the GEOS-free hot path).

The broadcast point-in-polygon join (SURVEY §2 op #11 recast) calls
``points_in_polygon`` with all candidate points of a batch against one
polygon at a time — O(#pairs x #edges) numpy, no Python per-point loop.
Boundary semantics are the standard even-odd ray cast (points exactly on
an edge may count either way; the engine's fixtures avoid degenerate
on-edge points, as do the reference's — e.g.
``/root/reference/zen3geo/tests/test_datapipes_datashader.py:36-44``).
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of many points vs one ring (closed (N,2))."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px = px[:, None]
    py = py[:, None]
    straddle = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xints = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossings = straddle & (px < xints)
    return crossings.sum(axis=1) % 2 == 1


def points_in_polygon(px, py, rings: list[np.ndarray]) -> np.ndarray:
    """Points vs polygon-with-holes: inside exterior, outside every hole."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = points_in_ring(px, py, np.asarray(rings[0]))
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, np.asarray(hole))
    return inside


def points_in_geom(px, py, geom: dict) -> np.ndarray:
    """Points vs Polygon or MultiPolygon dict (zen3geo_ray.geom.wkb form)."""
    if geom["type"] == "Polygon":
        return points_in_polygon(px, py, geom["coords"])
    if geom["type"] == "MultiPolygon":
        out = np.zeros(len(np.asarray(px)), dtype=bool)
        for rings in geom["coords"]:
            out |= points_in_polygon(px, py, rings)
        return out
    raise ValueError(f"points_in_geom: unsupported type {geom['type']}")


def boxes_overlap(
    aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy
) -> np.ndarray:
    """Closed-interval bbox intersection test, broadcast-friendly."""
    return (
        (aminx <= bmaxx) & (amaxx >= bminx) & (aminy <= bmaxy) & (amaxy >= bminy)
    )


def segment_crosses_box(p0, p1, minx, miny, maxx, maxy) -> np.ndarray:
    """Liang–Barsky: does each segment (p0[i]→p1[i]) intersect the box?"""
    x0, y0 = p0[:, 0], p0[:, 1]
    dx = p1[:, 0] - x0
    dy = p1[:, 1] - y0
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
        t0 = np.where(entering, np.maximum(t0, r), t0)
        t1 = np.where(leaving, np.minimum(t1, r), t1)
    return ok & (t0 <= t1)
