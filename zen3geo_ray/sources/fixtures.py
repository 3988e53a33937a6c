"""Deterministic vector/tile/scene fixture tables (FIXTURES.md F2-F5).

Mirrors the reference's in-memory test geometries exactly so the golden
assertions port over (`zen3geo/tests/test_datapipes_datashader.py:36-44`,
`test_datapipes_geopandas.py:21-28`), plus a synthetic admin-polygon grid
for STRtree joins at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import wkb
from ..schema import POLYGONS


def polygons_table(geoms: list[dict], names: list[str] | None = None) -> pa.Table:
    blobs = [wkb.dumps(g) for g in geoms]
    b = np.asarray([wkb.bounds(g) for g in geoms], dtype=np.float64).reshape(-1, 4)
    return pa.table(
        {
            "poly_id": pa.array(np.arange(len(geoms)), pa.int64()),
            "name": pa.array(names or [f"poly_{i}" for i in range(len(geoms))]),
            "geometry_wkb": pa.array(blobs, pa.binary()),
            "minx": b[:, 0],
            "miny": b[:, 1],
            "maxx": b[:, 2],
            "maxy": b[:, 3],
        },
        schema=POLYGONS,
    )


def reference_geoms() -> dict[str, dict]:
    """The reference's exact test geometries."""
    return {
        "multipoint": wkb.multipoint([(4.5, 4.5), (3.5, 1), (6, 3.5)]),
        "line": wkb.linestring([(3, 5), (5, 3), (3, 2), (5, 0)]),
        "pentagon": wkb.polygon([(6, 5), (3.5, 2.5), (6, 0), (6, 2.5), (5, 2.5)]),
        "box1": wkb.box(0, 0, 2, 2),
        "box2": wkb.box(2, 2, 4, 4),
    }


def admin_grid(
    lon0: float = -180.0,
    lat0: float = -90.0,
    lon1: float = 180.0,
    lat1: float = 90.0,
    nx: int = 24,
    ny: int = 12,
) -> pa.Table:
    """Deterministic rectangular 'admin' layer covering the geocode domain.

    Rectangles so the DuckDB oracle can restate containment as range
    predicates; general polygons are covered by the golden pytest cases.
    """
    w = (lon1 - lon0) / nx
    h = (lat1 - lat0) / ny
    geoms, names = [], []
    for j in range(ny):
        for i in range(nx):
            geoms.append(
                wkb.box(lon0 + i * w, lat0 + j * h, lon0 + (i + 1) * w, lat0 + (j + 1) * h)
            )
            names.append(f"admin_{j}_{i}")
    return polygons_table(geoms, names)


def scenes_table(specs: list[tuple[int, int, int, int, float]]) -> pa.Table:
    """(scene_id, height, width, bands, fill) rows."""
    a = list(zip(*specs))
    return pa.table(
        {
            "scene_id": pa.array(a[0], pa.int64()),
            "height": pa.array(a[1], pa.int32()),
            "width": pa.array(a[2], pa.int32()),
            "bands": pa.array(a[3], pa.int32()),
            "fill": pa.array(a[4], pa.float32()),
        }
    )
