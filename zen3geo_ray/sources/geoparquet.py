"""GeoParquet (spec v1.1) write + bbox-pruned read.

The reference loads vector layers through pyogrio/GDAL, whose
``read_dataframe(..., bbox=)`` prunes a spatial window at the driver
(`/root/reference/zen3geo/datapipes/pyogrio.py:89` passes kwargs
through).  Here the format itself is implemented on pyarrow: the file
footer carries the ``geo`` metadata key (primary column, WKB encoding,
geometry types, per-file bbox) and every row carries the
minx/miny/maxx/maxy COVERING columns the POLYGONS schema already has —
the GeoParquet 1.1 "bbox covering" idea.  That covering is exactly what
makes spatial predicate pushdown work at 100 TB: a window query prunes
whole row groups from parquet column STATISTICS without decoding a
single WKB blob, and only intersecting row groups ever leave storage.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..geom import wkb

GEO_VERSION = "1.1.0"
_BBOX_COLS = ("minx", "miny", "maxx", "maxy")


def _ensure_bbox(tbl: pa.Table, geometry_col: str) -> pa.Table:
    """Append the covering columns when absent (computed from WKB)."""
    if all(c in tbl.column_names for c in _BBOX_COLS):
        return tbl
    blobs = tbl.column(geometry_col).to_pylist()
    b = np.asarray([wkb.bounds(wkb.loads(x)) for x in blobs],
                   dtype=np.float64).reshape(-1, 4)
    for i, c in enumerate(_BBOX_COLS):
        if c not in tbl.column_names:
            tbl = tbl.append_column(c, pa.array(b[:, i], pa.float64()))
    return tbl


def geo_metadata(tbl: pa.Table, geometry_col: str = "geometry_wkb") -> dict:
    """The ``geo`` footer dict for one file: spec version, primary
    column, WKB encoding, observed geometry types, file-level bbox and
    the bbox covering declaration."""
    gtypes = sorted({
        wkb.loads(x)["type"] for x in tbl.column(geometry_col).to_pylist()
    })
    bbox = None
    if tbl.num_rows:
        bbox = [
            float(np.min(tbl.column("minx").to_numpy())),
            float(np.min(tbl.column("miny").to_numpy())),
            float(np.max(tbl.column("maxx").to_numpy())),
            float(np.max(tbl.column("maxy").to_numpy())),
        ]
    col: dict = {
        "encoding": "WKB",
        "geometry_types": gtypes,
        "covering": {"bbox": {
            "xmin": ["minx"], "ymin": ["miny"],
            "xmax": ["maxx"], "ymax": ["maxy"],
        }},
    }
    if bbox is not None:
        col["bbox"] = bbox
    return {
        "version": GEO_VERSION,
        "primary_column": geometry_col,
        "columns": {geometry_col: col},
    }


def write_geoparquet(tbl: pa.Table, path: str,
                     geometry_col: str = "geometry_wkb",
                     row_group_size: int | None = None) -> None:
    """Driver-side single-file writer (small layers / one shard).

    Covering columns are appended when missing; the ``geo`` key lands in
    the footer key-value metadata so any GeoParquet reader (GDAL 3.5+,
    geopandas, DuckDB spatial) opens the file natively."""
    tbl = _ensure_bbox(tbl, geometry_col)
    meta = dict(tbl.schema.metadata or {})
    meta[b"geo"] = json.dumps(geo_metadata(tbl, geometry_col)).encode()
    pq.write_table(tbl.replace_schema_metadata(meta), path,
                   row_group_size=row_group_size)


def write_geoparquet_dataset(ds, out_dir: str, *,
                             geometry_col: str = "geometry_wkb",
                             id_col: str = "poly_id") -> None:
    """DISTRIBUTED GeoParquet sink: every block writes ITS OWN file with
    its own footer metadata and per-file bbox (per-file metadata is what
    the spec expects of multi-file datasets).

    Resumable by construction (the write_zarr_dataset convention): the
    file name derives from the block's id range + row count, so a
    re-run overwrites the same keys idempotently instead of appending
    duplicates — never one giant file.
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        name = f"part-{int(ids.min())}-{int(ids.max())}-{b.num_rows}.parquet"
        p = os.path.join(out_dir, name)
        write_geoparquet(b, p, geometry_col)
        return pa.table({"path": pa.array([p]),
                         "n": pa.array([b.num_rows], pa.int64())})

    ds.map_batches(write_block, batch_format="pyarrow").materialize()


def _bbox_filters(bbox):
    """Row-group-prunable intersection predicate on the covering
    columns: keep rows whose box intersects the query window."""
    qminx, qminy, qmaxx, qmaxy = (float(v) for v in bbox)
    return [("minx", "<=", qmaxx), ("maxx", ">=", qminx),
            ("miny", "<=", qmaxy), ("maxy", ">=", qminy)]


def read_geoparquet(path: str, columns: list[str] | None = None,
                    bbox=None) -> pa.Table:
    """Driver-side read with OPTIONAL spatial-window pushdown: the
    intersection predicate evaluates against row-group statistics of
    the covering columns first, so non-intersecting row groups never
    leave storage (pyogrio ``read_dataframe(..., bbox=)`` parity)."""
    filters = _bbox_filters(bbox) if bbox is not None else None
    return pq.read_table(path, columns=columns, filters=filters)


def read_geoparquet_dataset(paths, *, columns: list[str] | None = None,
                            bbox=None, **kwargs):
    """Distributed read: the same covering-column predicate pushes down
    through ``ray.data.read_parquet`` (fragment-level row-group
    pruning), so at cluster scale only intersecting row groups are
    scanned."""
    import pyarrow.compute as pc
    import ray.data as rd

    flt = None
    if bbox is not None:
        qminx, qminy, qmaxx, qmaxy = (float(v) for v in bbox)
        flt = ((pc.field("minx") <= pc.scalar(qmaxx))
               & (pc.field("maxx") >= pc.scalar(qminx))
               & (pc.field("miny") <= pc.scalar(qmaxy))
               & (pc.field("maxy") >= pc.scalar(qminy)))
    return rd.read_parquet(paths, columns=columns, filter=flt, **kwargs)
