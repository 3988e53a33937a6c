"""ESRI Shapefile vector source — pure struct/numpy (no GDAL).

The third vector file format of the reference's pyogrio surface
(``/root/reference/zen3geo/datapipes/pyogrio.py:87-89``).  The format
is public (ESRI Shapefile Technical Description, 1998): a 100-byte
``.shp`` header, then records of (big-endian record header, little-
endian shape payload); attributes live beside it in a dBase-III
``.dbf``.  Supported shapes: Null (skipped), Point, MultiPoint,
PolyLine, Polygon (multi-part: every part kept as a ring — the
engine's even-odd containment treats outer/hole windings uniformly).

Emits the SAME fixed POLYGONS schema as the parquet/GeoJSON/GPKG
paths; ``write_shp`` exists so tests round-trip without fixtures.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from ..geom import wkb
from ..schema import POLYGONS

_SHAPE_NULL, _SHAPE_POINT, _SHAPE_LINE, _SHAPE_POLY, _SHAPE_MPOINT = \
    0, 1, 3, 5, 8


def _parse_record(buf: bytes) -> dict | None:
    (stype,) = struct.unpack_from("<i", buf, 0)
    if stype == _SHAPE_NULL:
        return None
    if stype == _SHAPE_POINT:
        x, y = struct.unpack_from("<2d", buf, 4)
        return wkb.point(x, y)
    if stype == _SHAPE_MPOINT:
        (n,) = struct.unpack_from("<i", buf, 36)
        pts = np.frombuffer(buf, dtype="<f8", count=2 * n,
                            offset=40).reshape(n, 2)
        return {"type": "MultiPoint", "coords": pts.astype(np.float64)}
    if stype in (_SHAPE_LINE, _SHAPE_POLY):
        nparts, npts = struct.unpack_from("<2i", buf, 36)
        parts = np.frombuffer(buf, dtype="<i4", count=nparts, offset=44)
        pts = np.frombuffer(buf, dtype="<f8", count=2 * npts,
                            offset=44 + 4 * nparts).reshape(npts, 2)
        bounds = np.append(parts, npts)
        rings = [pts[bounds[i]:bounds[i + 1]].astype(np.float64)
                 for i in range(nparts)]
        if stype == _SHAPE_LINE:
            if len(rings) == 1:
                return {"type": "LineString", "coords": rings[0]}
            return {"type": "MultiLineString", "coords": rings}
        return {"type": "Polygon", "coords": rings}
    raise NotImplementedError(f"shapefile shape type {stype} unsupported")


def _read_dbf_names(path: str) -> list[str] | None:
    """'name' field values from the sidecar .dbf (dBase III), if any."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        data = f.read()
    nrec, hsize, rsize = struct.unpack_from("<iHH", data, 4)
    fields = []
    off = 32
    while data[off] != 0x0D:
        fname = data[off:off + 11].split(b"\0")[0].decode("ascii")
        flen = data[off + 16]
        fields.append((fname, flen))
        off += 32
    starts = np.cumsum([1] + [fl for _, fl in fields])  # 1 = deletion flag
    idx = next((i for i, (fn, _) in enumerate(fields)
                if fn.lower() == "name"), None)
    if idx is None:
        return None
    out = []
    for r in range(nrec):
        base = hsize + r * rsize
        if data[base:base + 1] == b"*":  # deleted record
            continue
        s, fl = starts[idx], fields[idx][1]
        out.append(data[base + s:base + s + fl].decode(
            "ascii", "replace").strip())
    return out


def read_shp(path: str) -> pa.Table:
    """Load ``.shp`` (+ sidecar ``.dbf`` names) as a POLYGONS table."""
    with open(path, "rb") as f:
        data = f.read()
    (code,) = struct.unpack_from(">i", data, 0)
    if code != 9994:
        raise ValueError("not a shapefile: bad file code")
    geoms = []
    off = 100
    while off + 8 <= len(data):
        _recno, clen = struct.unpack_from(">2i", data, off)
        content = data[off + 8:off + 8 + 2 * clen]
        off += 8 + 2 * clen
        g = _parse_record(content)
        if g is not None:
            geoms.append(g)
    names = _read_dbf_names(os.path.splitext(path)[0] + ".dbf")
    if names is not None and len(names) != len(geoms):
        names = None  # null-shape rows desynced the sidecar — fall back
    ids = list(range(len(geoms)))
    blobs = [wkb.dumps(g) for g in geoms]
    bbs = np.asarray([wkb.bounds(g) for g in geoms],
                     dtype=np.float64).reshape(-1, 4)
    return pa.table(
        {
            "poly_id": pa.array(ids, pa.int64()),
            "name": pa.array(names or [f"poly_{i}" for i in ids],
                             pa.string()),
            "geometry_wkb": pa.array(blobs, pa.binary()),
            "minx": bbs[:, 0], "miny": bbs[:, 1],
            "maxx": bbs[:, 2], "maxy": bbs[:, 3],
        },
        schema=POLYGONS,
    )


def _shape_payload(geom: dict) -> bytes:
    t = geom["type"]
    if t == "Point":
        xy = np.asarray(geom["coords"]).reshape(2)
        return struct.pack("<i2d", _SHAPE_POINT, xy[0], xy[1])
    if t == "MultiPoint":
        pts = np.asarray(geom["coords"], dtype="<f8").reshape(-1, 2)
        box = (pts[:, 0].min(), pts[:, 1].min(),
               pts[:, 0].max(), pts[:, 1].max())
        return (struct.pack("<i4d", _SHAPE_MPOINT, *box)
                + struct.pack("<i", len(pts)) + pts.tobytes())
    if t in ("LineString", "MultiLineString", "Polygon"):
        stype = _SHAPE_POLY if t == "Polygon" else _SHAPE_LINE
        rings = [geom["coords"]] if t == "LineString" else geom["coords"]
        rings = [np.asarray(r, dtype="<f8").reshape(-1, 2) for r in rings]
        allp = np.vstack(rings)
        box = (allp[:, 0].min(), allp[:, 1].min(),
               allp[:, 0].max(), allp[:, 1].max())
        parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
        return (struct.pack("<i4d", stype, *box)
                + struct.pack("<2i", len(rings), len(allp))
                + parts.tobytes() + allp.tobytes())
    raise NotImplementedError(f"cannot write shape type {t}")


def write_shp(tbl: pa.Table, path: str) -> None:
    """Test-fixture writer: .shp + .dbf (name field)."""
    payloads = []
    for i in range(tbl.num_rows):
        g = wkb.loads(tbl.column("geometry_wkb")[i].as_py())
        payloads.append(_shape_payload(g))
    body = b""
    for i, p in enumerate(payloads):
        body += struct.pack(">2i", i + 1, len(p) // 2) + p
    minx = min(tbl.column("minx").to_pylist() or [0.0])
    miny = min(tbl.column("miny").to_pylist() or [0.0])
    maxx = max(tbl.column("maxx").to_pylist() or [0.0])
    maxy = max(tbl.column("maxy").to_pylist() or [0.0])
    header = (struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
              + struct.pack(">i", (100 + len(body)) // 2)
              + struct.pack("<2i", 1000, _SHAPE_POLY)
              + struct.pack("<4d", minx, miny, maxx, maxy)
              + struct.pack("<4d", 0, 0, 0, 0))
    with open(path, "wb") as f:
        f.write(header + body)
    # dBase III sidecar with one 32-char 'name' column
    names = [str(n)[:32] for n in tbl.column("name").to_pylist()]
    dbf = os.path.splitext(path)[0] + ".dbf"
    nrec, flen = len(names), 32
    hsize, rsize = 32 + 32 + 1, 1 + flen
    head = struct.pack("<B3BiHH20x", 3, 24, 1, 1, nrec, hsize, rsize)
    fdesc = b"NAME".ljust(11, b"\0") + b"C" + b"\0" * 4 + bytes([flen]) \
        + b"\0" * 15
    recs = b"".join(b" " + n.encode("ascii", "replace").ljust(flen)
                    for n in names)
    with open(dbf, "wb") as f:
        f.write(head + fdesc + b"\x0D" + recs + b"\x1A")
