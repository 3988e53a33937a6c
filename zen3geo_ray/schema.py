"""Fixed Arrow schemas for every logical table (SURVEY.md §1.2).

The reference has no schema system (schemas implicit in whatever
rioxarray/pyogrio return — ``/root/reference/zen3geo/datapipes/pyogrio.py:65-71``);
this engine is tabular-first, so every table's schema is pinned here.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)

POINTS_EXTRA = [
    pa.field("lon", pa.float64()),
    pa.field("lat", pa.float64()),
    pa.field("cell", pa.int64()),
]

POLYGONS = pa.schema(
    [
        pa.field("poly_id", pa.int64()),
        pa.field("name", pa.string()),
        pa.field("geometry_wkb", pa.binary()),
        pa.field("minx", pa.float64()),
        pa.field("miny", pa.float64()),
        pa.field("maxx", pa.float64()),
        pa.field("maxy", pa.float64()),
    ]
)

TILES = pa.schema(
    [
        pa.field("tile_id", pa.int64()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("xmin", pa.float64()),
        pa.field("ymin", pa.float64()),
        pa.field("xmax", pa.float64()),
        pa.field("ymax", pa.float64()),
        pa.field("crs", pa.string()),
    ]
)

SCENES = pa.schema(
    [
        pa.field("scene_id", pa.int64()),
        pa.field("height", pa.int32()),
        pa.field("width", pa.int32()),
        pa.field("bands", pa.int32()),
        pa.field("fill", pa.float32()),
    ]
)

CHIPS = pa.schema(
    [
        pa.field("scene_id", pa.int64()),
        pa.field("chip_id", pa.int64()),
        pa.field("chip_y", pa.int32()),
        pa.field("chip_x", pa.int32()),
        pa.field("y0", pa.int32()),
        pa.field("x0", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("width", pa.int32()),
        pa.field("bands", pa.int32()),
    ]
)
