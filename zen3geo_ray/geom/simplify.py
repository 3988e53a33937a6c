"""Douglas-Peucker polyline/ring simplification (pure numpy, iterative).

Used to shrink traced region boundaries (stages/vectorize.py emits
pixel-exact crack-following rings whose vertex count grows with the
perimeter) before they are shipped or joined.  No reference analog — the
reference delegates geometry ops to shapely/geopandas; this is the
in-engine equivalent of ``geometry.simplify(tolerance)``.
"""

from __future__ import annotations

import numpy as np


def _seg_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Perpendicular distance of each point to the segment a-b."""
    d = b - a
    L2 = float(d @ d)
    if L2 == 0.0:
        return np.linalg.norm(pts - a, axis=1)
    t = np.clip(((pts - a) @ d) / L2, 0.0, 1.0)
    proj = a + t[:, None] * d
    return np.linalg.norm(pts - proj, axis=1)


def simplify_line(coords: np.ndarray, epsilon: float) -> np.ndarray:
    """Douglas-Peucker on an open polyline (N, 2) — iterative stack (no
    recursion-depth limit on long pixel boundaries)."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n <= 2 or epsilon <= 0:
        return coords
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        seg = coords[i + 1 : j]
        dist = _seg_dist(seg, coords[i], coords[j])
        kmax = int(np.argmax(dist))
        if dist[kmax] > epsilon:
            mid = i + 1 + kmax
            keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return coords[keep]


def simplify_ring(coords: np.ndarray, epsilon: float) -> np.ndarray:
    """Douglas-Peucker on a CLOSED ring (first == last vertex).

    The ring is split at its two mutually-farthest anchor vertices (the
    first vertex and the vertex farthest from it) so no segment of the
    simplification spans the closure; degenerate results (< 4 distinct
    vertices) fall back to the original ring, keeping polygons valid.
    """
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 5 or epsilon <= 0:
        return coords
    body = coords[:-1]
    far = int(np.argmax(np.linalg.norm(body - body[0], axis=1)))
    if far == 0:
        return coords
    part1 = simplify_line(body[: far + 1], epsilon)
    part2 = simplify_line(
        np.concatenate([body[far:], body[:1]]), epsilon
    )
    ring = np.concatenate([part1[:-1], part2[:-1], body[:1]])
    if len(ring) < 4:
        return coords
    return ring


def simplify_geom(geom: dict, epsilon: float) -> dict:
    """Simplify a geometry dict (rings for Polygon, path for LineString)."""
    gtype = geom["type"]
    if gtype == "LineString":
        return {"type": gtype, "coords": simplify_line(geom["coords"], epsilon)}
    if gtype == "Polygon":
        return {
            "type": gtype,
            "coords": [simplify_ring(np.asarray(r), epsilon) for r in geom["coords"]],
        }
    if gtype in ("MultiPolygon",):
        return {
            "type": gtype,
            "coords": [
                [simplify_ring(np.asarray(r), epsilon) for r in poly]
                for poly in geom["coords"]
            ],
        }
    return geom
