"""GPKG + Shapefile vector sources: format parity with the parquet
POLYGONS path (completes the reference's pyogrio multi-format surface,
pyogrio.py:87-89; GeoJSON covered in test_geojson.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zen3geo_ray.geom import wkb
from zen3geo_ray.sources.fixtures import admin_grid, polygons_table, reference_geoms
from zen3geo_ray.sources.gpkg import parse_gpkg_blob, read_gpkg, write_gpkg
from zen3geo_ray.sources.readers import read_vector
from zen3geo_ray.sources.shapefile import read_shp, write_shp


def test_gpkg_roundtrip_matches_parquet(tmp_path):
    tbl = admin_grid(nx=6, ny=3)
    gp = tmp_path / "admin.gpkg"
    write_gpkg(tbl, str(gp))
    pqf = tmp_path / "admin.parquet"
    pq.write_table(tbl, pqf)
    from_gp = read_vector(str(gp))
    from_pq = read_vector(str(pqf))
    assert from_gp.schema.equals(from_pq.schema)
    assert from_gp.equals(from_pq)  # WKB byte-identical: same encoder


def test_gpkg_all_geometry_types(tmp_path):
    geoms = list(reference_geoms().values())
    tbl = polygons_table(geoms, names=list(reference_geoms()))
    gp = tmp_path / "mixed.gpkg"
    write_gpkg(tbl, str(gp))
    assert read_gpkg(str(gp)).equals(tbl)


def test_gpkg_blob_header_and_layer_errors(tmp_path):
    tbl = admin_grid(nx=2, ny=1)
    gp = tmp_path / "a.gpkg"
    write_gpkg(tbl, str(gp), layer="adm")
    # explicit layer works; wrong layer raises
    assert read_gpkg(str(gp), layer="adm").num_rows == 2
    with pytest.raises(ValueError, match="not in"):
        read_gpkg(str(gp), layer="nope")
    with pytest.raises(ValueError, match="GP magic"):
        parse_gpkg_blob(b"XX\0\0\0\0\0\0")
    # envelope parsed: GP header strips to clean WKB
    import sqlite3

    con = sqlite3.connect(str(gp))
    blob = con.execute('SELECT geom FROM "adm" LIMIT 1').fetchone()[0]
    con.close()
    raw = parse_gpkg_blob(blob)
    assert raw == tbl.column("geometry_wkb")[0].as_py()


def test_shp_roundtrip_matches_parquet(tmp_path):
    tbl = admin_grid(nx=6, ny=3)
    shp = tmp_path / "admin.shp"
    write_shp(tbl, str(shp))
    from_shp = read_vector(str(shp))
    assert from_shp.schema.equals(tbl.schema)
    assert from_shp.equals(tbl)


def test_shp_geometry_types(tmp_path):
    # shapefile has no mixed Multi* fidelity for points-in-one-record;
    # cover point / multipoint / line / polygon records
    geoms = [
        wkb.point(3.5, -1.25),
        wkb.multipoint([(1, 2), (3, 4)]),
        wkb.linestring([(0, 0), (2, 1), (4, 0)]),
        wkb.polygon([(0, 0), (4, 0), (4, 4), (0, 4)]),
    ]
    tbl = polygons_table(geoms, names=["pt", "mp", "ln", "pg"])
    shp = tmp_path / "mixed.shp"
    write_shp(tbl, str(shp))
    back = read_shp(str(shp))
    assert back.column("name").to_pylist() == ["pt", "mp", "ln", "pg"]
    for i in range(4):
        g0 = wkb.loads(tbl.column("geometry_wkb")[i].as_py())
        g1 = wkb.loads(back.column("geometry_wkb")[i].as_py())
        assert g0["type"] == g1["type"]
    assert back.column("minx").to_pylist() == tbl.column("minx").to_pylist()


def test_pip_join_same_results_across_all_formats(ray_session, tmp_path):
    """pip parity: geojson / gpkg / shp / parquet layers all produce
    identical point-in-polygon assignments."""
    import ray
    import ray.data as rd

    from zen3geo_ray.sources.geojson import write_geojson
    from zen3geo_ray.stages.join import PointInPolygonJoin, polygons_to_blob

    rng = np.random.default_rng(31)
    pts = pa.table({
        "doc_id": pa.array(np.arange(300), pa.int64()),
        "lon": pa.array(rng.uniform(-179, 179, 300)),
        "lat": pa.array(rng.uniform(-89, 89, 300)),
    })
    layer = admin_grid(nx=8, ny=4)
    paths = {}
    pq.write_table(layer, tmp_path / "l.parquet")
    paths["parquet"] = tmp_path / "l.parquet"
    write_geojson(layer, str(tmp_path / "l.geojson"))
    paths["geojson"] = tmp_path / "l.geojson"
    write_gpkg(layer, str(tmp_path / "l.gpkg"))
    paths["gpkg"] = tmp_path / "l.gpkg"
    write_shp(layer, str(tmp_path / "l.shp"))
    paths["shp"] = tmp_path / "l.shp"
    from zen3geo_ray.sources.flatgeobuf import write_flatgeobuf

    write_flatgeobuf(layer, str(tmp_path / "l.fgb"))
    paths["fgb"] = tmp_path / "l.fgb"

    results = {}
    for fmt, p in paths.items():
        loaded = read_vector(str(p))
        ref = ray.put(polygons_to_blob(loaded))
        ds = rd.from_arrow(pts).map_batches(
            PointInPolygonJoin, fn_constructor_args=(ref,),
            batch_format="pyarrow", concurrency=2)
        results[fmt] = ds.to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
    base = results["parquet"]
    assert len(base) == 300
    for fmt in ("geojson", "gpkg", "shp", "fgb"):
        assert results[fmt].equals(base), fmt


def test_fgb_roundtrip_matches_parquet(tmp_path):
    from zen3geo_ray.sources.flatgeobuf import read_flatgeobuf, write_flatgeobuf

    tbl = admin_grid(nx=6, ny=3)
    f = tmp_path / "admin.fgb"
    write_flatgeobuf(tbl, str(f))
    from_fgb = read_vector(str(f))
    assert from_fgb.schema.equals(tbl.schema)
    assert from_fgb.equals(tbl)


def test_fgb_geometry_types_and_holes(tmp_path):
    from zen3geo_ray.sources.flatgeobuf import read_flatgeobuf, write_flatgeobuf

    hole_poly = wkb.polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                            holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]])
    mp = {"type": "MultiPolygon", "coords": [
        wkb.box(0, 0, 1, 1)["coords"], wkb.box(5, 5, 7, 7)["coords"]]}
    geoms = [hole_poly, mp, wkb.linestring([(0, 0), (3, 4)]),
             wkb.point(-12.5, 42.0), wkb.multipoint([(1, 1), (2, 2)])]
    tbl = polygons_table(geoms, names=["hole", "mp", "ln", "pt", "mpt"])
    f = tmp_path / "mixed.fgb"
    write_flatgeobuf(tbl, str(f))
    back = read_flatgeobuf(str(f))
    assert back.equals(tbl)  # WKB byte-identical through the round trip
    g = wkb.loads(back.column("geometry_wkb")[0].as_py())
    assert len(g["coords"]) == 2  # hole ring survived the ends vector


def test_fgb_bad_magic(tmp_path):
    from zen3geo_ray.sources.flatgeobuf import read_flatgeobuf

    p = tmp_path / "bad.fgb"
    p.write_bytes(b"notfgb00" + b"\0" * 32)
    with pytest.raises(ValueError, match="magic"):
        read_flatgeobuf(str(p))


from hypothesis import given, settings, strategies as st  # noqa: E402

_coord = st.floats(min_value=-180, max_value=180, allow_nan=False,
                   width=64).map(lambda x: round(x, 6))


@st.composite
def _geom(draw):
    kind = draw(st.sampled_from(["Point", "MultiPoint", "LineString",
                                 "Polygon", "MultiPolygon"]))
    def pt():
        return (draw(_coord), draw(_coord))
    if kind == "Point":
        return wkb.point(*pt())
    if kind == "MultiPoint":
        return wkb.multipoint([pt() for _ in range(draw(
            st.integers(1, 5)))])
    if kind == "LineString":
        return wkb.linestring([pt() for _ in range(draw(
            st.integers(2, 6)))])
    if kind == "Polygon":
        n = draw(st.integers(3, 6))
        return wkb.polygon([pt() for _ in range(n)])
    rings = []
    for _ in range(draw(st.integers(1, 3))):
        n = draw(st.integers(3, 5))
        rings.append(wkb.polygon([pt() for _ in range(n)])["coords"])
    return {"type": "MultiPolygon", "coords": rings}


@settings(max_examples=25, deadline=None)
@given(st.lists(_geom(), min_size=1, max_size=6),
       st.sampled_from(["geojson", "gpkg", "fgb"]))
def test_vector_formats_roundtrip_property(tmp_path_factory, geoms, fmt):
    """Random geometry tables survive every self-describing format
    byte-for-byte (shapefile excluded: it cannot represent MultiPolygon
    vs Polygon distinctly — covered by its targeted tests)."""
    from zen3geo_ray.sources.flatgeobuf import write_flatgeobuf
    from zen3geo_ray.sources.geojson import write_geojson

    tmp = tmp_path_factory.mktemp("fmt")
    tbl = polygons_table(geoms)
    p = str(tmp / f"t.{fmt}")
    if fmt == "geojson":
        write_geojson(tbl, p)
    elif fmt == "gpkg":
        write_gpkg(tbl, p)
    else:
        write_flatgeobuf(tbl, p)
    assert read_vector(p).equals(tbl)


def test_zip_vector_reads(tmp_path):
    """/vsizip/ analog: zipped shapefile (with its .dbf sidecar),
    explicit member selection, extension priority, and error paths."""
    import zipfile

    from zen3geo_ray.sources.geojson import polygons_table_to_geojson

    tbl = admin_grid(nx=4, ny=2)
    write_shp(tbl, str(tmp_path / "admin.shp"))
    import json

    gj = tmp_path / "admin.geojson"
    gj.write_text(json.dumps(polygons_table_to_geojson(tbl)))

    z = tmp_path / "vec.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.write(tmp_path / "admin.shp", "admin.shp")
        zf.write(tmp_path / "admin.dbf", "admin.dbf")
        zf.write(gj, "admin.geojson")

    # extension priority picks the .shp (with sidecar)
    assert read_vector(str(z)).equals(tbl)
    # explicit member: the geojson
    got = read_vector(f"{z}!admin.geojson")
    assert got.num_rows == tbl.num_rows
    assert got.column("geometry_wkb").equals(tbl.column("geometry_wkb"))
    with pytest.raises(FileNotFoundError, match="not in"):
        read_vector(f"{z}!missing.shp")
    empty = tmp_path / "empty.zip"
    with zipfile.ZipFile(empty, "w") as zf:
        zf.writestr("readme.txt", "x")
    with pytest.raises(ValueError, match="no vector member"):
        read_vector(str(empty))


# --- packed Hilbert R-tree (indexed FGB write + bbox pushdown read) --------

def _fgb():
    from zen3geo_ray.sources import flatgeobuf as m
    return m


def test_fgb_hilbert_kernel_bijective_and_anchored():
    m = _fgb()
    # d(0,0) = 0 on every Hilbert curve; distinct cells -> distinct d
    assert int(m.hilbert_d(np.array([0]), np.array([0]))[0]) == 0
    xs, ys = np.meshgrid(np.arange(0, 1 << 16, 1 << 11),
                         np.arange(0, 1 << 16, 1 << 11))
    d = m.hilbert_d(xs.ravel().astype(np.uint32),
                    ys.ravel().astype(np.uint32))
    assert len(np.unique(d)) == d.size
    # neighbours along the curve are spatial neighbours for the first
    # steps: the four rank-0..3 cells of the coarse grid are mutually
    # adjacent (locality sanity, not a full spec pin)
    order = np.argsort(d)
    cx, cy = xs.ravel()[order[:4]] >> 11, ys.ravel()[order[:4]] >> 11
    assert np.abs(np.diff(cx)).max() <= 1 and np.abs(np.diff(cy)).max() <= 1


def test_fgb_indexed_roundtrip_and_size(tmp_path):
    m = _fgb()
    tbl = admin_grid(nx=9, ny=7)  # 63 features -> 63/16/4/1 at node_size 4
    plain, indexed = tmp_path / "p.fgb", tmp_path / "i.fgb"
    m.write_flatgeobuf(tbl, str(plain))
    m.write_flatgeobuf(tbl, str(indexed), index=True, node_size=4)
    assert (indexed.stat().st_size - plain.stat().st_size
            == m._index_size(63, 4))
    full = m.read_flatgeobuf(str(indexed))
    # same feature SET (order is Hilbert), ordinals re-assigned 0..n-1
    assert full.num_rows == tbl.num_rows
    assert full["poly_id"].to_pylist() == list(range(tbl.num_rows))
    got = set(zip(full["name"].to_pylist(),
                  full["geometry_wkb"].to_pylist()))
    want = set(zip(tbl["name"].to_pylist(),
                   tbl["geometry_wkb"].to_pylist()))
    assert got == want


def test_fgb_bbox_pushdown_matches_scan(tmp_path):
    m = _fgb()
    tbl = admin_grid(nx=9, ny=7)
    f = tmp_path / "i.fgb"
    m.write_flatgeobuf(tbl, str(f), index=True, node_size=4)
    full = m.read_flatgeobuf(str(f))
    for bbox in [(0.0, 0.0, 1.5, 1.5), (2.5, 2.5, 4.0, 4.0),
                 (-10.0, -10.0, -5.0, -5.0), (0.0, 0.0, 100.0, 100.0),
                 (3.0, 1.0, 3.0, 1.0)]:
        got = m.read_flatgeobuf(str(f), bbox=bbox)
        keep = ((full["minx"].to_numpy() <= bbox[2])
                & (full["maxx"].to_numpy() >= bbox[0])
                & (full["miny"].to_numpy() <= bbox[3])
                & (full["maxy"].to_numpy() >= bbox[1]))
        assert got.equals(full.filter(pa.array(keep))), bbox
    # read_vector passes the bbox down (and re-filters, harmlessly)
    rv = read_vector(str(f), bbox=(0.0, 0.0, 1.5, 1.5))
    assert rv.equals(m.read_flatgeobuf(str(f), bbox=(0.0, 0.0, 1.5, 1.5)))


def test_fgb_unindexed_bbox_read_filters(tmp_path):
    m = _fgb()
    tbl = admin_grid(nx=4, ny=4)
    f = tmp_path / "p.fgb"
    m.write_flatgeobuf(tbl, str(f))
    got = m.read_flatgeobuf(str(f), bbox=(0.0, 0.0, 0.5, 0.5))
    assert 0 < got.num_rows < tbl.num_rows
    # unindexed file keeps write order -> parquet-path parity holds
    pqf = tmp_path / "p.parquet"
    pq.write_table(tbl, pqf)
    assert got.equals(read_vector(str(pqf), bbox=(0.0, 0.0, 0.5, 0.5)))


def test_fgb_indexed_single_feature_and_empty(tmp_path):
    m = _fgb()
    one = admin_grid(nx=1, ny=1)
    f1 = tmp_path / "one.fgb"
    m.write_flatgeobuf(one, str(f1), index=True, node_size=4)
    assert m.read_flatgeobuf(str(f1)).num_rows == 1
    assert m.read_flatgeobuf(
        str(f1), bbox=(-1e9, -1e9, 1e9, 1e9)).num_rows == 1
    empty = one.slice(0, 0)
    f0 = tmp_path / "zero.fgb"
    m.write_flatgeobuf(empty, str(f0), index=True)
    assert m.read_flatgeobuf(str(f0)).num_rows == 0


def test_geojsonseq_roundtrip_and_parity(tmp_path):
    """GeoJSONSeq (.geojsonl, RFC 8142): write -> read_vector matches
    the .geojson path byte-for-byte; RS-prefixed and blank lines
    tolerated."""
    from zen3geo_ray.sources.geojson import (
        geojson_to_polygons_table,
        polygons_table_to_geojson,
        write_geojson,
        write_geojsonseq,
    )

    tbl = admin_grid(nx=4, ny=2)
    p_seq = tmp_path / "l.geojsonl"
    p_fc = tmp_path / "l.geojson"
    write_geojsonseq(tbl, str(p_seq))
    write_geojson(tbl, str(p_fc))
    from_seq = read_vector(str(p_seq))
    from_fc = read_vector(str(p_fc))
    assert from_seq.equals(from_fc)

    # strict RFC 8142 form: RS-prefixed records + a blank line
    p_rs = tmp_path / "l2.geojsons"
    write_geojsonseq(tbl, str(p_rs), rs=True)
    with open(p_rs, "a") as f:
        f.write("\n")
    assert read_vector(str(p_rs)).equals(from_fc)


def test_geojsonseq_in_zip(tmp_path):
    import zipfile

    from zen3geo_ray.sources.geojson import write_geojsonseq

    tbl = admin_grid(nx=3, ny=2)
    p = tmp_path / "l.geojsonl"
    write_geojsonseq(tbl, str(p))
    zp = tmp_path / "a.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.write(p, "l.geojsonl")
    assert read_vector(str(zp)).equals(read_vector(str(p)))


def test_arrow_ipc_roundtrip_and_parity(tmp_path):
    """Arrow IPC / Feather: write -> read_vector yields the identical
    POLYGONS table (byte-identical WKB), column pruning works, and
    .zip dispatch finds it."""
    import zipfile

    from pyarrow import feather

    tbl = admin_grid(nx=4, ny=3)
    for ext in ("arrow", "feather"):
        p = tmp_path / f"g.{ext}"
        feather.write_feather(tbl, str(p))
        got = read_vector(str(p))
        assert got.equals(tbl)
        pruned = read_vector(str(p), columns=["poly_id", "geometry_wkb"])
        assert pruned.column_names == ["poly_id", "geometry_wkb"]
        assert pruned.column("geometry_wkb").equals(
            tbl.column("geometry_wkb"))

    # bbox filter applies after the parse like the other formats
    minx = tbl.column("minx").to_numpy()
    sub = read_vector(str(tmp_path / "g.arrow"),
                      bbox=(float(minx.min()), -90.0,
                            float(minx.min()) + 1e-9, 90.0))
    assert 0 < sub.num_rows < tbl.num_rows

    zp = tmp_path / "a.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.write(tmp_path / "g.arrow", "g.arrow")
    assert read_vector(str(zp)).equals(tbl)


def test_orc_roundtrip_and_parity(tmp_path):
    """Apache ORC: write -> read_vector yields the identical POLYGONS
    table; column pruning and zip dispatch work."""
    import zipfile

    from pyarrow import orc

    tbl = admin_grid(nx=4, ny=3)
    p = tmp_path / "g.orc"
    orc.write_table(tbl, str(p))
    got = read_vector(str(p))
    assert got.equals(tbl)
    pruned = read_vector(str(p), columns=["poly_id", "geometry_wkb"])
    assert pruned.column_names == ["poly_id", "geometry_wkb"]
    assert pruned.column("geometry_wkb").equals(tbl.column("geometry_wkb"))
    zp = tmp_path / "o.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.write(p, "g.orc")
    assert read_vector(str(zp)).equals(tbl)


def test_avro_roundtrip_and_parity(tmp_path):
    """Apache Avro container (pure-stdlib codec): write -> read_vector
    yields the identical POLYGONS table under both codecs; nullable
    unions, column pruning, multi-block files and zip dispatch work;
    the writer is byte-deterministic."""
    import zipfile

    import pyarrow as pa

    from zen3geo_ray.sources.avro import read_avro, write_avro

    tbl = admin_grid(nx=4, ny=3)
    p = tmp_path / "g.avro"
    for codec in ("deflate", "null"):
        write_avro(tbl, str(p), codec=codec)
        got = read_vector(str(p))
        assert got.equals(tbl)
    pruned = read_vector(str(p), columns=["poly_id", "geometry_wkb"])
    assert pruned.column_names == ["poly_id", "geometry_wkb"]
    assert pruned.column("geometry_wkb").equals(tbl.column("geometry_wkb"))
    zp = tmp_path / "a.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.write(p, "g.avro")
    assert read_vector(str(zp)).equals(tbl)

    # every supported primitive incl. nulls, negatives, non-ASCII,
    # multi-block framing (block_rows < num_rows)
    t2 = pa.table({
        "i": pa.array([1, None, -5, 2 ** 53], pa.int64()),
        "s": pa.array(["a", "ü", None, ""], pa.string()),
        "b": pa.array([b"\x00\xff", None, b"", b"xyz"], pa.binary()),
        "d": pa.array([1.5, None, -0.0, float("inf")], pa.float64()),
        "f": pa.array([1.5, None, 2.25, -1.0], pa.float32()),
        "o": pa.array([True, False, None, True], pa.bool_()),
    })
    write_avro(t2, str(p), block_rows=2)
    assert read_avro(str(p)).equals(t2)
    write_avro(t2, str(p), block_rows=2)
    b1 = p.read_bytes()
    write_avro(t2, str(p), block_rows=2)
    assert p.read_bytes() == b1


def test_avro_container_framing_pinned(tmp_path):
    """Byte-level spec conformance of the container: magic, metadata
    map entries, 16-byte sync repeated per block, zigzag longs."""
    import json

    import pyarrow as pa

    from zen3geo_ray.sources.avro import _zigzag_encode, write_avro

    # zigzag examples straight from the Avro spec table
    assert _zigzag_encode(0) == b"\x00"
    assert _zigzag_encode(-1) == b"\x01"
    assert _zigzag_encode(1) == b"\x02"
    assert _zigzag_encode(-2) == b"\x03"
    assert _zigzag_encode(2) == b"\x04"
    assert _zigzag_encode(-64) == b"\x7f"
    assert _zigzag_encode(64) == b"\x80\x01"

    t = pa.table({"x": pa.array([7], pa.int64())})
    p = tmp_path / "one.avro"
    write_avro(t, str(p), codec="null")
    raw = p.read_bytes()
    assert raw[:4] == b"Obj\x01"
    # metadata map: 2 entries, keys avro.codec / avro.schema
    assert raw[4:5] == _zigzag_encode(2)
    pos = 5
    meta = {}
    for _ in range(2):
        klen = raw[pos] >> 1
        pos += 1
        k = raw[pos:pos + klen].decode()
        pos += klen
        vlen = 0
        shift = 0
        while True:
            byte = raw[pos]
            pos += 1
            vlen |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        vlen >>= 1
        meta[k] = raw[pos:pos + vlen]
        pos += vlen
    assert meta["avro.codec"] == b"null"
    sch = json.loads(meta["avro.schema"])
    assert sch["fields"] == [{"name": "x", "type": ["null", "long"]}]
    assert raw[pos] == 0  # map terminator
    pos += 1
    sync = raw[pos:pos + 16]
    pos += 16
    # one block: count 1, size 2 (union branch 1 + long 7), payload,
    # sync again, EOF
    assert raw[pos:pos + 2] == _zigzag_encode(1) + _zigzag_encode(2)
    assert raw[pos + 2:pos + 4] == _zigzag_encode(1) + _zigzag_encode(7)
    assert raw[pos + 4:pos + 20] == sync
    assert len(raw) == pos + 20
