"""CSV-with-WKT vector source (the GDAL CSV-driver interchange).

The reference reads any OGR source through pyogrio
(``/root/reference/zen3geo/datapipes/pyogrio.py:87-89``); CSV files
with a WKT geometry column are the simplest such source and the common
hand-off from spreadsheets/SQL exports.  stdlib csv + geom/wkt.py
parser; emits the fixed POLYGONS schema like every other vector path.
"""

from __future__ import annotations

import csv

import numpy as np
import pyarrow as pa

from ..geom import wkb, wkt
from ..schema import POLYGONS

_GEOM_NAMES = ("wkt", "geometry", "geom", "the_geom", "shape")


def _geom_column(header: list[str], first_row: list[str]) -> int:
    low = [h.strip().lower() for h in header]
    for name in _GEOM_NAMES:
        if name in low:
            return low.index(name)
    # fall back to the first cell that leads with a WKT type word
    for j, cell in enumerate(first_row):
        head = cell.strip().split("(")[0].strip().upper().split()
        if head and head[0] in wkt._TYPES:
            return j
    raise ValueError(
        f"no WKT geometry column found (header {header!r}; looked for "
        f"{_GEOM_NAMES} then a parseable first row)")


def read_wkt_csv(path: str) -> pa.Table:
    """CSV with a WKT geometry column -> POLYGONS table.

    The geometry column is found by name (wkt/geometry/geom/the_geom/
    shape, case-insensitive) else by probing the first data row;
    ``name`` comes from a 'name' column when present (else poly_{i}),
    ``poly_id`` from a 'poly_id' column (else the row index).  Rows
    with an EMPTY geometry are skipped (OGR null-geometry parity)."""
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    if not rows:
        return pa.table({f.name: pa.array([], f.type) for f in POLYGONS})
    header, data = rows[0], rows[1:]
    gcol = _geom_column(header, data[0] if data else [])
    low = [h.strip().lower() for h in header]
    ncol = low.index("name") if "name" in low else None
    icol = low.index("poly_id") if "poly_id" in low else None

    ids, names, blobs, bbs = [], [], [], []
    for i, row in enumerate(data):
        geom = wkt.loads(row[gcol])
        if not len(geom["coords"]):
            continue  # EMPTY geometry: skipped like OGR null geometries
        ids.append(int(row[icol]) if icol is not None else i)
        names.append(row[ncol] if ncol is not None else f"poly_{i}")
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


def write_wkt_csv(tbl: pa.Table, path: str) -> None:
    """POLYGONS table -> CSV with (poly_id, name, wkt) columns —
    fixture writer so the round-trip pins the codec."""
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["poly_id", "name", "wkt"])
        for i in range(tbl.num_rows):
            geom = wkb.loads(tbl.column("geometry_wkb")[i].as_py())
            w.writerow([tbl.column("poly_id")[i].as_py(),
                        tbl.column("name")[i].as_py(),
                        wkt.dumps(geom)])
