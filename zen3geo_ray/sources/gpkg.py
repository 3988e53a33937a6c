"""GeoPackage (GPKG) vector source — pure stdlib (sqlite3 + struct).

The reference reads GPKG layers via pyogrio/GDAL
(``/root/reference/zen3geo/datapipes/pyogrio.py:87-89``); a GeoPackage
is just SQLite with registered metadata tables (OGC 12-128r19):
``gpkg_contents`` lists feature tables, ``gpkg_geometry_columns`` names
each table's geometry column, and every geometry cell is a
GeoPackageBinary blob — an 8-byte ``GP`` header (+ optional envelope)
followed by standard ISO WKB.  All of that is parseable with the
stdlib, so this loader completes the ``read_vector`` surface without
GDAL, emitting the SAME fixed POLYGONS schema as the parquet/GeoJSON
paths.

Vector layers are the SMALL side by contract (broadcast downstream);
driver-side load matches ``read_vector``'s behavior.  ``write_gpkg``
exists so tests round-trip without external fixtures.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pyarrow as pa

from ..geom import wkb
from ..schema import POLYGONS

_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def parse_gpkg_blob(blob: bytes) -> bytes:
    """GeoPackageBinary -> the embedded ISO WKB bytes."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob (no GP magic)")
    flags = blob[3]
    env_code = (flags >> 1) & 0b111
    if env_code not in _ENVELOPE_DOUBLES:
        raise ValueError(f"invalid GPKG envelope code {env_code}")
    if flags & 0b100000:
        raise NotImplementedError("extended GPKG geometry blobs unsupported")
    off = 8 + 8 * _ENVELOPE_DOUBLES[env_code]
    return blob[off:]


def read_gpkg(path: str, layer: str | None = None) -> pa.Table:
    """Load one feature layer as a POLYGONS-schema table.

    ``layer=None`` auto-selects when the package has exactly one
    feature table.  ``poly_id`` = the feature's fid; ``name`` from a
    ``name`` column when present else ``poly_{fid}``."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type = 'features' ORDER BY table_name").fetchall()
        tables = [r[0] for r in rows]
        if layer is None:
            if len(tables) != 1:
                raise ValueError(
                    f"gpkg has {len(tables)} feature layers — pass layer=")
            layer = tables[0]
        elif layer not in tables:
            raise ValueError(f"layer {layer!r} not in {tables}")
        (geom_col,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns "
            "WHERE table_name = ?", (layer,)).fetchone()
        cols = [r[1] for r in con.execute(f'PRAGMA table_info("{layer}")')]
        name_col = "name" if "name" in cols else None
        sel = f'SELECT rowid, "{geom_col}"' + (
            f', "{name_col}"' if name_col else "") + f' FROM "{layer}"'
        ids, names, blobs, bbs = [], [], [], []
        for row in con.execute(sel):
            fid, gblob = row[0], row[1]
            if gblob is None:
                continue
            wkb_bytes = parse_gpkg_blob(gblob)
            geom = wkb.loads(wkb_bytes)
            ids.append(int(fid))
            names.append(str(row[2]) if name_col else f"poly_{fid}")
            # re-encode: canonical little-endian WKB, byte-identical to
            # the engine's other vector paths
            blobs.append(wkb.dumps(geom))
            bbs.append(wkb.bounds(geom))
    finally:
        con.close()
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


def write_gpkg(tbl: pa.Table, path: str, *, layer: str = "layer",
               srs_id: int = 4326) -> None:
    """Test-fixture writer: minimal spec-conformant GeoPackage."""
    con = sqlite3.connect(path)
    try:
        con.executescript("""
            PRAGMA application_id = 0x47504B47;
            PRAGMA user_version = 10300;
            CREATE TABLE gpkg_spatial_ref_sys (
              srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
              organization TEXT NOT NULL,
              organization_coordsys_id INTEGER NOT NULL,
              definition TEXT NOT NULL, description TEXT);
            CREATE TABLE gpkg_contents (
              table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
              identifier TEXT UNIQUE, description TEXT DEFAULT '',
              last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
              max_x DOUBLE, max_y DOUBLE, srs_id INTEGER);
            CREATE TABLE gpkg_geometry_columns (
              table_name TEXT NOT NULL, column_name TEXT NOT NULL,
              geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
              z TINYINT NOT NULL, m TINYINT NOT NULL,
              CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name));
        """)
        con.execute(
            "INSERT INTO gpkg_spatial_ref_sys VALUES "
            "('WGS 84', ?, 'EPSG', ?, 'GEOGCS[...]', NULL)",
            (srs_id, srs_id))
        con.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY, '
            'geom BLOB, name TEXT)')
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "srs_id) VALUES (?, 'features', ?, ?)", (layer, layer, srs_id))
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES "
            "(?, 'geom', 'GEOMETRY', ?, 0, 0)", (layer, srs_id))
        for i in range(tbl.num_rows):
            raw = tbl.column("geometry_wkb")[i].as_py()
            # GP header: magic, version 0, flags: little-endian + env 1
            g = wkb.loads(raw)
            minx, miny, maxx, maxy = wkb.bounds(g)
            header = (b"GP" + bytes([0, 0b00000011]) +
                      struct.pack("<i", srs_id) +
                      struct.pack("<4d", minx, maxx, miny, maxy))
            con.execute(
                f'INSERT INTO "{layer}" (fid, geom, name) VALUES (?, ?, ?)',
                (int(tbl.column("poly_id")[i].as_py()),
                 header + raw,
                 tbl.column("name")[i].as_py()))
        con.commit()
    finally:
        con.close()
