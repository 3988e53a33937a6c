"""Minimal WKB codec (no GEOS): Point/MultiPoint/LineString/Polygon/Multi*.

Geometry travels through the engine as a WKB ``binary`` Arrow column
(≅ GeoArrow-WKB) and is materialized to numpy coordinate arrays only
inside batch functions — the role shapely.from_wkb plays in the SURVEY
design.  The decoded form is a plain dict:

    {"type": "Point"|"MultiPoint"|"LineString"|"MultiLineString"
             |"Polygon"|"MultiPolygon"|"GeometryCollection",
     "coords": ...}

where coords is (N,2) float64 for point/line types, list[rings] for
Polygon (ring = (N,2) closed), list[list[rings]] for MultiPolygon, and
list[geom] for GeometryCollection.  Little-endian WKB only (what every
writer produces by default).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}
_CODES = {v: k for k, v in _TYPES.items()}


def decode(buf: bytes, offset: int = 0) -> tuple[dict, int]:
    """Decode one geometry; returns (geom, next_offset)."""
    byte_order = buf[offset]
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    (code,) = struct.unpack_from("<I", buf, offset + 1)
    code &= 0xFF  # strip 2.5D/SRID flags (not produced by this engine)
    gtype = _TYPES.get(code)
    if gtype is None:
        raise ValueError(f"unknown WKB geometry code {code}")
    off = offset + 5
    if gtype == "Point":
        xy = np.frombuffer(buf, dtype="<f8", count=2, offset=off).reshape(1, 2)
        return {"type": gtype, "coords": xy.astype(np.float64)}, off + 16
    if gtype == "LineString":
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        xy = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
        return {"type": gtype, "coords": xy.astype(np.float64)}, off + 16 * n
    if gtype == "Polygon":
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from("<I", buf, off)
            off += 4
            xy = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
            rings.append(xy.astype(np.float64))
            off += 16 * n
        return {"type": gtype, "coords": rings}, off
    # multi / collection types: count + nested full WKB geometries
    (ngeom,) = struct.unpack_from("<I", buf, off)
    off += 4
    subs = []
    for _ in range(ngeom):
        sub, off = decode(buf, off)
        subs.append(sub)
    if gtype == "MultiPoint":
        coords = np.concatenate([s["coords"] for s in subs]) if subs else np.empty((0, 2))
        return {"type": gtype, "coords": coords}, off
    if gtype == "MultiLineString":
        return {"type": gtype, "coords": [s["coords"] for s in subs]}, off
    if gtype == "MultiPolygon":
        return {"type": gtype, "coords": [s["coords"] for s in subs]}, off
    return {"type": gtype, "coords": subs}, off


def loads(buf: bytes) -> dict:
    geom, _ = decode(bytes(buf))
    return geom


def _enc_point(xy) -> bytes:
    return struct.pack("<bI2d", 1, 1, float(xy[0]), float(xy[1]))


def _enc_coords(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(np.asarray(arr, dtype="<f8"))
    return struct.pack("<I", len(arr)) + arr.tobytes()


def dumps(geom: dict) -> bytes:
    """Encode the dict form back to little-endian WKB."""
    gtype = geom["type"]
    c = geom["coords"]
    if gtype == "Point":
        return _enc_point(np.asarray(c).reshape(2))
    head = struct.pack("<bI", 1, _CODES[gtype])
    if gtype == "LineString":
        return head + _enc_coords(c)
    if gtype == "Polygon":
        return head + struct.pack("<I", len(c)) + b"".join(_enc_coords(r) for r in c)
    if gtype == "MultiPoint":
        pts = np.asarray(c).reshape(-1, 2)
        return head + struct.pack("<I", len(pts)) + b"".join(_enc_point(p) for p in pts)
    if gtype == "MultiLineString":
        return head + struct.pack("<I", len(c)) + b"".join(
            dumps({"type": "LineString", "coords": line}) for line in c
        )
    if gtype == "MultiPolygon":
        return head + struct.pack("<I", len(c)) + b"".join(
            dumps({"type": "Polygon", "coords": rings}) for rings in c
        )
    if gtype == "GeometryCollection":
        return head + struct.pack("<I", len(c)) + b"".join(dumps(s) for s in c)
    raise ValueError(f"unsupported geometry type {gtype}")


def point(x: float, y: float) -> dict:
    return {"type": "Point", "coords": np.array([[x, y]], dtype=np.float64)}


def multipoint(pts) -> dict:
    return {"type": "MultiPoint", "coords": np.asarray(pts, dtype=np.float64)}


def linestring(pts) -> dict:
    return {"type": "LineString", "coords": np.asarray(pts, dtype=np.float64)}


def polygon(shell, holes=()) -> dict:
    """Polygon from an exterior ring (auto-closed) + optional holes."""
    def close(r):
        r = np.asarray(r, dtype=np.float64)
        if len(r) and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        return r

    return {"type": "Polygon", "coords": [close(shell)] + [close(h) for h in holes]}


def box(minx: float, miny: float, maxx: float, maxy: float) -> dict:
    """Axis-aligned rectangle polygon (shapely.geometry.box vertex order)."""
    return polygon([(maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)])


def bounds(geom: dict) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of any geometry."""
    gtype = geom["type"]
    c = geom["coords"]
    if gtype in ("Point", "MultiPoint", "LineString"):
        arr = np.asarray(c)
        return (
            float(arr[:, 0].min()),
            float(arr[:, 1].min()),
            float(arr[:, 0].max()),
            float(arr[:, 1].max()),
        )
    if gtype in ("Polygon", "MultiLineString"):
        arrs = [np.asarray(r) for r in c]
    elif gtype == "MultiPolygon":
        arrs = [np.asarray(r) for rings in c for r in rings]
    elif gtype == "GeometryCollection":
        bs = [bounds(s) for s in c]
        return (
            min(b[0] for b in bs),
            min(b[1] for b in bs),
            max(b[2] for b in bs),
            max(b[3] for b in bs),
        )
    else:
        raise ValueError(gtype)
    allc = np.concatenate(arrs)
    return (
        float(allc[:, 0].min()),
        float(allc[:, 1].min()),
        float(allc[:, 0].max()),
        float(allc[:, 1].max()),
    )


def peek_types(blobs) -> list[str]:
    """Geometry type names from WKB headers WITHOUT full parsing (byte 0 =
    endianness, bytes 1-4 = type code) — the cheap kernel behind per-type
    filtering of mixed-geometry columns."""
    import struct

    out = []
    for b in blobs:
        if b is None or len(b) < 5:
            out.append(None)
            continue
        fmt = "<I" if b[0] == 1 else ">I"
        code = struct.unpack_from(fmt, b, 1)[0] % 1000  # strip Z/M flags
        out.append(_TYPES.get(code))
    return out
