"""GeoParquet (spec 1.1) write/read: footer `geo` metadata, bbox
covering columns, row-group-pruned window reads, the distributed sink,
and read_vector(bbox=) parity across every vector format."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zen3geo_ray.sources.fixtures import admin_grid
from zen3geo_ray.sources.geoparquet import (
    geo_metadata,
    read_geoparquet,
    read_geoparquet_dataset,
    write_geoparquet,
    write_geoparquet_dataset,
)
from zen3geo_ray.sources.readers import read_vector

WINDOW = (0.5, 0.5, 2.5, 2.5)


def _brute(tbl, bbox):
    qminx, qminy, qmaxx, qmaxy = bbox
    keep = ((tbl.column("minx").to_numpy() <= qmaxx)
            & (tbl.column("maxx").to_numpy() >= qminx)
            & (tbl.column("miny").to_numpy() <= qmaxy)
            & (tbl.column("maxy").to_numpy() >= qminy))
    return tbl.filter(pa.array(keep))


def test_footer_metadata_and_roundtrip(tmp_path):
    tbl = admin_grid(nx=6, ny=3)
    p = str(tmp_path / "admin.parquet")
    write_geoparquet(tbl, p)
    md = pq.read_metadata(p).metadata
    assert b"geo" in md
    geo = json.loads(md[b"geo"])
    assert geo["version"] == "1.1.0"
    assert geo["primary_column"] == "geometry_wkb"
    col = geo["columns"]["geometry_wkb"]
    assert col["encoding"] == "WKB"
    assert col["covering"]["bbox"]["xmin"] == ["minx"]
    # file-level bbox == dataset bounds
    assert col["bbox"] == [
        float(tbl.column("minx").to_numpy().min()),
        float(tbl.column("miny").to_numpy().min()),
        float(tbl.column("maxx").to_numpy().max()),
        float(tbl.column("maxy").to_numpy().max()),
    ]
    assert read_geoparquet(p).equals(tbl)


def test_bbox_read_matches_brute_force(tmp_path):
    tbl = admin_grid(nx=8, ny=4)
    p = str(tmp_path / "g.parquet")
    write_geoparquet(tbl, p, row_group_size=5)  # multiple row groups
    got = read_geoparquet(p, bbox=WINDOW)
    want = _brute(tbl, WINDOW)
    assert got.equals(want) and got.num_rows > 0
    # row-group statistics exist on the covering columns -> the filter
    # can prune groups from the footer alone
    pf = pq.ParquetFile(p)
    assert pf.metadata.num_row_groups > 1
    ix = pf.schema_arrow.names.index("minx")
    st = pf.metadata.row_group(0).column(ix).statistics
    assert st is not None and st.has_min_max


def test_bbox_appended_when_absent(tmp_path):
    tbl = admin_grid(nx=2, ny=2).drop_columns(
        ["minx", "miny", "maxx", "maxy"])
    p = str(tmp_path / "nb.parquet")
    write_geoparquet(tbl, p)
    back = read_geoparquet(p)
    full = admin_grid(nx=2, ny=2)
    for c in ("minx", "miny", "maxx", "maxy"):
        assert back.column(c).equals(full.column(c))


def test_distributed_sink_idempotent(ray_session, tmp_path):
    import ray.data as rd

    tbl = admin_grid(nx=8, ny=4)
    out = str(tmp_path / "sink")
    ds = rd.from_arrow(tbl).repartition(4)
    write_geoparquet_dataset(ds, out)
    import os

    files1 = sorted(os.listdir(out))
    assert len(files1) >= 2
    for f in files1:
        md = pq.read_metadata(os.path.join(out, f)).metadata
        assert b"geo" in md  # every shard carries its own footer
    # re-run: same deterministic file names, no duplicates
    write_geoparquet_dataset(rd.from_arrow(tbl).repartition(4), out)
    assert sorted(os.listdir(out)) == files1
    back = pq.read_table(out).sort_by("poly_id")
    assert back.equals(tbl.sort_by("poly_id"))


def test_distributed_bbox_read(ray_session, tmp_path):
    import ray.data as rd

    tbl = admin_grid(nx=8, ny=4)
    out = str(tmp_path / "sink2")
    write_geoparquet_dataset(rd.from_arrow(tbl).repartition(4), out)
    got = (read_geoparquet_dataset(out, bbox=WINDOW).to_pandas()
           .sort_values("poly_id").reset_index(drop=True))
    want = _brute(tbl, WINDOW).to_pandas().sort_values(
        "poly_id").reset_index(drop=True)
    assert got.equals(want) and len(got) > 0


def test_read_vector_bbox_all_formats(tmp_path):
    """read_vector(bbox=) returns the same feature set from parquet,
    GeoJSON, GPKG, Shapefile and FlatGeobuf."""
    from zen3geo_ray.sources.flatgeobuf import write_flatgeobuf
    from zen3geo_ray.sources.geojson import polygons_table_to_geojson
    from zen3geo_ray.sources.gpkg import write_gpkg
    from zen3geo_ray.sources.shapefile import write_shp

    tbl = admin_grid(nx=6, ny=3)
    paths = {}
    p = tmp_path / "v.parquet"
    write_geoparquet(tbl, str(p))
    paths["parquet"] = str(p)
    g = tmp_path / "v.geojson"
    with open(g, "w") as f:
        json.dump(polygons_table_to_geojson(tbl), f)
    paths["geojson"] = str(g)
    gp = tmp_path / "v.gpkg"
    write_gpkg(tbl, str(gp))
    paths["gpkg"] = str(gp)
    sh = tmp_path / "v.shp"
    write_shp(tbl, str(sh))
    paths["shp"] = str(sh)
    fg = tmp_path / "v.fgb"
    write_flatgeobuf(tbl, str(fg))
    paths["fgb"] = str(fg)

    want = sorted(_brute(tbl, WINDOW).column("name").to_pylist())
    assert len(want) > 0
    for fmt, path in paths.items():
        got = read_vector(path, bbox=WINDOW)
        assert sorted(got.column("name").to_pylist()) == want, fmt
