"""WKT (OGC Simple Features well-known text) codec — pure python.

Completes the CSV-with-WKT interchange the reference reads through
GDAL's CSV driver (any OGR-readable source passes through
``/root/reference/zen3geo/datapipes/pyogrio.py:87-89``).  Same geometry
dicts as :mod:`zen3geo_ray.geom.wkb` ({'type', 'coords'}), so WKT rows
flow into the POLYGONS schema and every downstream join/rasterize path
unchanged.  2-D only (Z/M raise); numbers print with %.17g so
dumps→loads round-trips every float64 exactly.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN = re.compile(r"[A-Za-z]+|\(|\)|,|[-+]?[0-9.][0-9.eE+-]*")

_TYPES = {"POINT", "MULTIPOINT", "LINESTRING", "MULTILINESTRING",
          "POLYGON", "MULTIPOLYGON", "GEOMETRYCOLLECTION"}

_EMPTY_COORDS = {
    "Point": lambda: np.empty((0, 2), dtype=np.float64),
    "MultiPoint": lambda: np.empty((0, 2), dtype=np.float64),
    "LineString": lambda: np.empty((0, 2), dtype=np.float64),
    "MultiLineString": lambda: [],
    "Polygon": lambda: [],
    "MultiPolygon": lambda: [],
    "GeometryCollection": lambda: [],
}

_CANON = {"POINT": "Point", "MULTIPOINT": "MultiPoint",
          "LINESTRING": "LineString", "MULTILINESTRING": "MultiLineString",
          "POLYGON": "Polygon", "MULTIPOLYGON": "MultiPolygon",
          "GEOMETRYCOLLECTION": "GeometryCollection"}


def _struct(toks: list[str], i: int):
    """Parse one parenthesized group into nested lists; leaves are
    lists of floats (one per coordinate tuple)."""
    if toks[i] != "(":
        raise ValueError(f"expected '(' at token {i}: {toks[i]!r}")
    out: list = []
    nums: list[float] = []
    i += 1
    while i < len(toks):
        t = toks[i]
        if t == "(":
            sub, i = _struct(toks, i)
            out.append(sub)
        elif t == ",":
            if nums:
                out.append(nums)
                nums = []
            i += 1
        elif t == ")":
            if nums:
                out.append(nums)
            return out, i + 1
        else:
            nums.append(float(t))
            i += 1
    raise ValueError("unbalanced parentheses in WKT")


def _ring(pts) -> np.ndarray:
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)


def _parse_geom(toks: list[str], i: int):
    t = toks[i].upper()
    if t not in _TYPES:
        raise ValueError(f"unknown WKT type {toks[i]!r}")
    name = _CANON[t]
    i += 1
    if i < len(toks) and toks[i].upper() in ("Z", "M", "ZM"):
        raise NotImplementedError("WKT Z/M coordinates are not supported")
    if i < len(toks) and toks[i].upper() == "EMPTY":
        return {"type": name, "coords": _EMPTY_COORDS[name]()}, i + 1
    if name == "GeometryCollection":
        if toks[i] != "(":
            raise ValueError("expected '(' after GEOMETRYCOLLECTION")
        i += 1
        subs = []
        while True:
            g, i = _parse_geom(toks, i)
            subs.append(g)
            if toks[i] == ",":
                i += 1
                continue
            if toks[i] == ")":
                return {"type": name, "coords": subs}, i + 1
            raise ValueError(f"unexpected token {toks[i]!r} in collection")
    st, i = _struct(toks, i)
    if name == "Point":
        return {"type": name, "coords": _ring(st)[:1]}, i
    if name == "MultiPoint":
        # both spellings are legal: (10 40, 40 30) and ((10 40), (40 30))
        flat = [p[0] if isinstance(p[0], list) else p for p in st]
        return {"type": name, "coords": _ring(flat)}, i
    if name == "LineString":
        return {"type": name, "coords": _ring(st)}, i
    if name == "MultiLineString":
        return {"type": name, "coords": [_ring(l) for l in st]}, i
    if name == "Polygon":
        return {"type": name, "coords": [_ring(r) for r in st]}, i
    if name == "MultiPolygon":
        return {"type": name,
                "coords": [[_ring(r) for r in poly] for poly in st]}, i
    raise AssertionError(name)


def loads(s: str) -> dict:
    """WKT string -> geometry dict (geom/wkb.py's format)."""
    toks = _TOKEN.findall(s)
    if not toks:
        raise ValueError("empty WKT string")
    geom, i = _parse_geom(toks, 0)
    if i != len(toks):
        raise ValueError(f"trailing tokens in WKT: {toks[i:]!r}")
    return geom


def _num(v: float) -> str:
    return f"{float(v):.17g}"


def _pts(arr) -> str:
    a = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
    return ", ".join(f"{_num(x)} {_num(y)}" for x, y in a)


def dumps(geom: dict) -> str:
    """Geometry dict -> WKT string (round-trips float64 exactly)."""
    t = geom["type"]
    c = geom["coords"]
    up = t.upper()
    if t == "GeometryCollection":
        if not len(c):
            return "GEOMETRYCOLLECTION EMPTY"
        return "GEOMETRYCOLLECTION (" + ", ".join(dumps(g) for g in c) + ")"
    if not len(c):
        return f"{up} EMPTY"
    if t == "Point":
        return f"POINT ({_pts(c)})"
    if t in ("MultiPoint", "LineString"):
        return f"{up} ({_pts(c)})"
    if t in ("MultiLineString", "Polygon"):
        return f"{up} (" + ", ".join(f"({_pts(r)})" for r in c) + ")"
    if t == "MultiPolygon":
        return (f"{up} ("
                + ", ".join("(" + ", ".join(f"({_pts(r)})" for r in poly)
                            + ")" for poly in c) + ")")
    raise ValueError(f"unsupported geometry type {t!r}")
