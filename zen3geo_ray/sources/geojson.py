"""Pure-python GeoJSON vector source (RFC 7946) -> POLYGONS schema.

The reference ingests vector layers from files via pyogrio/GDAL
(``/root/reference/zen3geo/datapipes/pyogrio.py:87-89``; the
segmentation walkthrough loads its polygon layer from a vector file,
``docs/vector-segmentation-masks.md:190``).  GeoJSON is the one vector
format that needs no native driver — plain JSON — so this loader
completes the ``read_vector`` surface in the engine's hand-rolled
style: features parse to the internal geometry-dict form, encode to
little-endian WKB (geom/wkb.py), and land in the SAME fixed POLYGONS
schema as the parquet path, so every downstream stage (broadcast PIP
join, clipping, rasterize) is format-agnostic.

Scale shape: vector layers are the SMALL side by contract (admin
boundaries, AOI masks — broadcast via ``ray.put`` downstream), so a
driver-side parse matches ``read_vector``'s existing parquet behavior;
a 100-TB corpus never arrives as one GeoJSON file.  Third coordinates
(GeoJSON allows [x, y, z]) are dropped; features with null geometry are
skipped, mirroring OGR's behavior.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geom import wkb
from ..schema import POLYGONS


def _ring(arr) -> np.ndarray:
    """Ring/line coords -> (n, 2) float64, closing an unclosed ring is
    left to the writer that produced it — GeoJSON rings close themselves
    per RFC 7946 §3.1.6; tolerate unclosed input by appending the first
    vertex."""
    a = np.asarray([p[:2] for p in arr], dtype=np.float64).reshape(-1, 2)
    return a


def _close(a: np.ndarray) -> np.ndarray:
    if len(a) and not np.array_equal(a[0], a[-1]):
        a = np.vstack([a, a[:1]])
    return a


def geometry_from_geojson(g: dict) -> dict:
    """One GeoJSON geometry object -> the internal geometry dict
    (geom/wkb.py's format: {'type', 'coords'})."""
    t = g["type"]
    c = g.get("coordinates")
    if t == "Point":
        return {"type": "Point",
                "coords": np.asarray([c[:2]], dtype=np.float64)}
    if t == "MultiPoint":
        return {"type": "MultiPoint", "coords": _ring(c)}
    if t == "LineString":
        return {"type": "LineString", "coords": _ring(c)}
    if t == "MultiLineString":
        return {"type": "MultiLineString", "coords": [_ring(l) for l in c]}
    if t == "Polygon":
        return {"type": "Polygon",
                "coords": [_close(_ring(r)) for r in c]}
    if t == "MultiPolygon":
        return {"type": "MultiPolygon",
                "coords": [[_close(_ring(r)) for r in poly] for poly in c]}
    if t == "GeometryCollection":
        return {"type": "GeometryCollection",
                "coords": [geometry_from_geojson(s) for s in g["geometries"]]}
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def geometry_to_geojson(geom: dict) -> dict:
    """Inverse of :func:`geometry_from_geojson` (fixture round-trips)."""
    t = geom["type"]
    c = geom["coords"]
    if t == "Point":
        return {"type": t, "coordinates": list(np.asarray(c).reshape(2))}
    if t in ("MultiPoint", "LineString"):
        return {"type": t, "coordinates": np.asarray(c).tolist()}
    if t in ("MultiLineString", "Polygon"):
        return {"type": t, "coordinates": [np.asarray(r).tolist() for r in c]}
    if t == "MultiPolygon":
        return {"type": t, "coordinates": [
            [np.asarray(r).tolist() for r in rings] for rings in c]}
    if t == "GeometryCollection":
        return {"type": t, "geometries": [geometry_to_geojson(s) for s in c]}
    raise ValueError(f"unsupported geometry type {t!r}")


def geojson_to_polygons_table(obj) -> pa.Table:
    """GeoJSON (path / JSON string / parsed dict) -> POLYGONS table.

    Accepts a FeatureCollection, a single Feature, or a bare geometry.
    ``poly_id`` comes from the feature's ``id`` (when integral) else
    ``properties.poly_id`` else the running index; ``name`` from
    ``properties.name`` else ``poly_{i}``.
    """
    if isinstance(obj, (str, bytes)):
        s = obj.decode() if isinstance(obj, bytes) else obj
        if s.lstrip().startswith(("{", "[")):
            obj = json.loads(s)
        else:
            with open(s, "rb") as f:
                obj = json.load(f)
    t = obj.get("type")
    if t == "FeatureCollection":
        feats = obj["features"]
    elif t == "Feature":
        feats = [obj]
    else:  # bare geometry
        feats = [{"type": "Feature", "geometry": obj, "properties": {}}]

    ids, names, blobs, bbs = [], [], [], []
    for i, f in enumerate(feats):
        g = f.get("geometry")
        if g is None:
            continue  # null geometry: skipped (OGR parity)
        geom = geometry_from_geojson(g)
        props = f.get("properties") or {}
        fid = f.get("id")
        if not isinstance(fid, int):
            fid = props.get("poly_id")
        ids.append(int(fid) if isinstance(fid, int) else len(ids))
        names.append(str(props.get("name", f"poly_{i}")))
        blobs.append(wkb.dumps(geom))
        bbs.append(wkb.bounds(geom))
    b = np.asarray(bbs, dtype=np.float64).reshape(-1, 4)
    return pa.table(
        {
            "poly_id": pa.array(ids, pa.int64()),
            "name": pa.array(names, pa.string()),
            "geometry_wkb": pa.array(blobs, pa.binary()),
            "minx": b[:, 0], "miny": b[:, 1],
            "maxx": b[:, 2], "maxy": b[:, 3],
        },
        schema=POLYGONS,
    )


def polygons_table_to_geojson(tbl: pa.Table) -> dict:
    """POLYGONS table -> FeatureCollection dict (fixture writer)."""
    feats = []
    for i in range(tbl.num_rows):
        geom = wkb.loads(tbl.column("geometry_wkb")[i].as_py())
        feats.append({
            "type": "Feature",
            "id": int(tbl.column("poly_id")[i].as_py()),
            "properties": {"name": tbl.column("name")[i].as_py()},
            "geometry": geometry_to_geojson(geom),
        })
    return {"type": "FeatureCollection", "features": feats}


def write_geojson(tbl: pa.Table, path: str) -> None:
    with open(path, "w") as f:
        json.dump(polygons_table_to_geojson(tbl), f)


def geojsonseq_to_polygons_table(path: str) -> pa.Table:
    """GeoJSONSeq / newline-delimited GeoJSON (RFC 8142, OGR driver
    "GeoJSONSeq", extensions .geojsonl/.geojsons/.ndjson) -> POLYGONS
    table: one Feature (or bare geometry) per line, optional RS (0x1e)
    record separators, blank lines skipped.  Reuses the
    FeatureCollection path so id/name/bounds semantics are identical
    to .geojson."""
    feats = []
    with open(path, "rb") as f:
        for line in f:
            s = line.strip().lstrip(b"\x1e").strip()
            if not s:
                continue
            obj = json.loads(s)
            if obj.get("type") == "FeatureCollection":
                feats.extend(obj["features"])
            elif obj.get("type") == "Feature":
                feats.append(obj)
            else:
                feats.append({"type": "Feature", "geometry": obj,
                              "properties": {}})
    return geojson_to_polygons_table(
        {"type": "FeatureCollection", "features": feats})


def write_geojsonseq(tbl: pa.Table, path: str, *, rs: bool = False) -> None:
    """POLYGONS table -> one Feature per line (RS-prefixed when
    ``rs=True``, the strict RFC 8142 form)."""
    fc = polygons_table_to_geojson(tbl)
    with open(path, "w") as f:
        for feat in fc["features"]:
            if rs:
                f.write("\x1e")
            json.dump(feat, f)
            f.write("\n")
