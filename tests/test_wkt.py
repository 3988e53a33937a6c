"""WKT codec + CSV-with-WKT vector source tests."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from zen3geo_ray.geom import wkb, wkt
from zen3geo_ray.sources.fixtures import admin_grid, polygons_table, reference_geoms
from zen3geo_ray.sources.readers import read_vector
from zen3geo_ray.sources.wktcsv import read_wkt_csv, write_wkt_csv


def test_wkt_roundtrip_all_reference_geoms():
    for name, geom in reference_geoms().items():
        s = wkt.dumps(geom)
        back = wkt.loads(s)
        # byte-identical through the shared WKB encoder
        assert wkb.dumps(back) == wkb.dumps(geom), (name, s)


def test_wkt_known_strings_parse():
    g = wkt.loads("POINT (30 10)")
    assert g["type"] == "Point" and g["coords"].tolist() == [[30.0, 10.0]]
    # both MULTIPOINT spellings
    a = wkt.loads("MULTIPOINT ((10 40), (40 30), (20 20))")
    b = wkt.loads("MULTIPOINT (10 40, 40 30, 20 20)")
    assert np.array_equal(a["coords"], b["coords"])
    p = wkt.loads(
        "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), "
        "(20 30, 35 35, 30 20, 20 30))")
    assert len(p["coords"]) == 2 and len(p["coords"][0]) == 5
    mp = wkt.loads(
        "MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)), "
        "((20 35, 10 30, 10 10, 30 5, 45 20, 20 35)))")
    assert len(mp["coords"]) == 2
    gc = wkt.loads("GEOMETRYCOLLECTION (POINT (4 6), LINESTRING (4 6, 7 10))")
    assert [g["type"] for g in gc["coords"]] == ["Point", "LineString"]


def test_wkt_empty_and_errors():
    assert wkt.loads("POLYGON EMPTY")["coords"] == []
    assert wkt.dumps({"type": "Polygon", "coords": []}) == "POLYGON EMPTY"
    with pytest.raises(NotImplementedError):
        wkt.loads("POINT Z (1 2 3)")
    with pytest.raises(ValueError):
        wkt.loads("CIRCLE (0 0, 1)")
    with pytest.raises(ValueError):
        wkt.loads("POINT (1 2) garbage")


def test_wkt_float_roundtrip_exact():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(50, 2)) * 1e7
    geom = {"type": "LineString", "coords": pts}
    back = wkt.loads(wkt.dumps(geom))
    assert np.array_equal(back["coords"], pts)


def test_wkt_csv_roundtrip_matches_parquet(tmp_path):
    tbl = admin_grid(nx=5, ny=3)
    c = tmp_path / "admin.csv"
    write_wkt_csv(tbl, str(c))
    pqf = tmp_path / "admin.parquet"
    pq.write_table(tbl, pqf)
    from_csv = read_vector(str(c))
    from_pq = read_vector(str(pqf))
    assert from_csv.schema.equals(from_pq.schema)
    assert from_csv.equals(from_pq)  # WKB byte-identical: shared encoder
    # bbox post-filter applies like the other text formats
    win = read_vector(str(c), bbox=(0.0, 0.0, 0.5, 0.5))
    assert 0 < win.num_rows < tbl.num_rows
    assert win.equals(read_vector(str(pqf), bbox=(0.0, 0.0, 0.5, 0.5)))


def test_wkt_csv_header_probing_and_empty_rows(tmp_path):
    c = tmp_path / "odd.csv"
    c.write_text(
        "label,shape_wkt\n"
        'a,"POINT (1 2)"\n'
        'b,"POLYGON EMPTY"\n'
        'c,"LINESTRING (0 0, 1 1)"\n')
    t = read_wkt_csv(str(c))
    # geometry column found by probing (header has no known name);
    # the EMPTY row is skipped
    assert t.num_rows == 2
    assert t["poly_id"].to_pylist() == [0, 2]


def test_wkt_csv_all_geometry_types(tmp_path):
    geoms = list(reference_geoms().values())
    tbl = polygons_table(geoms, names=list(reference_geoms()))
    c = tmp_path / "mixed.csv"
    write_wkt_csv(tbl, str(c))
    assert read_wkt_csv(str(c)).equals(tbl)
