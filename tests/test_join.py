"""Broadcast STRtree join tests — point-in-polygon + rectangle-clip parity.

Clip goldens from `zen3geo/tests/test_datapipes_geopandas.py:53-89`.
"""

import numpy as np
import pyarrow as pa
import pytest

from zen3geo_ray.geom import wkb
from zen3geo_ray.sources.fixtures import admin_grid, polygons_table, reference_geoms
from zen3geo_ray.stages.join import BoxClipJoin, PointInPolygonJoin, polygons_to_blob


@pytest.fixture(scope="module")
def boxes_blob():
    g = reference_geoms()
    return polygons_to_blob(polygons_table([g["box1"], g["box2"]], ["b1", "b2"]))


def test_pip_join_inner(boxes_blob):
    j = PointInPolygonJoin(boxes_blob, how="inner")
    batch = pa.table(
        {
            "id": [0, 1, 2, 3],
            "lon": [0.5, 2.5, 10.0, 1.0],
            "lat": [0.5, 2.5, 10.0, 1.0],
        }
    )
    out = j(batch)
    assert out.column("id").to_pylist() == [0, 1, 3]
    assert out.column("poly_id").to_pylist() == [0, 1, 0]
    assert out.column("poly_name").to_pylist() == ["b1", "b2", "b1"]


def test_pip_join_left_semi_anti(boxes_blob):
    batch = pa.table({"id": [0, 1], "lon": [0.5, 9.0], "lat": [0.5, 9.0]})
    left = PointInPolygonJoin(boxes_blob, how="left")(batch)
    assert left.num_rows == 2
    assert sorted(left.column("poly_id").to_pylist()) == [-1, 0]
    semi = PointInPolygonJoin(boxes_blob, how="semi")(batch)
    assert semi.column("id").to_pylist() == [0]
    anti = PointInPolygonJoin(boxes_blob, how="anti")(batch)
    assert anti.column("id").to_pylist() == [1]


def test_pip_join_matches_bruteforce_admin_grid():
    grid = admin_grid(nx=24, ny=12)
    j = PointInPolygonJoin(polygons_to_blob(grid), how="inner")
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179.9, 179.9, 2000)
    lat = rng.uniform(-89.9, 89.9, 2000)
    batch = pa.table({"i": np.arange(2000), "lon": lon, "lat": lat})
    out = j(batch)
    # every point falls in exactly one grid rectangle
    assert out.num_rows == 2000
    # brute-force expected polygon: floor arithmetic on the 15x15-degree grid
    ix = np.floor((lon + 180) / 15).astype(int)
    iy = np.floor((lat + 90) / 15).astype(int)
    expected = iy * 24 + ix
    got = np.empty(2000, dtype=int)
    got[out.column("i").to_numpy()] = out.column("poly_id").to_numpy()
    # ray-cast boundary convention can differ from floor exactly on grid
    # lines; random draws avoid them
    assert np.array_equal(got, expected)


def test_box_clip_join_reference_golden(boxes_blob):
    # raster chips from the reference test: bounds (-1.5,-0.5,1.5,1.5) and
    # (2.5,2.5,5.5,4.5); vector = box(0,0,2,2), box(2,2,4,4)
    chips = pa.table(
        {
            "chip_id": [0, 1],
            "bminx": [-1.5, 2.5],
            "bminy": [-0.5, 2.5],
            "bmaxx": [1.5, 5.5],
            "bmaxy": [1.5, 4.5],
        }
    )
    out = BoxClipJoin(boxes_blob)(chips)
    rows = out.to_pylist()
    assert len(rows) == 2  # each chip intersects exactly one box
    r0 = next(r for r in rows if r["chip_id"] == 0)
    assert (r0["cminx"], r0["cminy"], r0["cmaxx"], r0["cmaxy"]) == (0.0, 0.0, 1.5, 1.5)
    assert r0["poly_id"] == 0
    r1 = next(r for r in rows if r["chip_id"] == 1)
    assert (r1["cminx"], r1["cminy"], r1["cmaxx"], r1["cmaxy"]) == (2.5, 2.5, 4.0, 4.0)
    assert r1["poly_id"] == 1
    # clipped geometry round-trips as valid WKB polygon
    g = wkb.loads(r0["clipped_wkb"])
    assert g["type"] == "Polygon"


def test_box_clip_join_empty_result(boxes_blob):
    chips = pa.table(
        {"chip_id": [0], "bminx": [50.0], "bminy": [50.0], "bmaxx": [51.0], "bmaxy": [51.0]}
    )
    out = BoxClipJoin(boxes_blob)(chips)
    assert out.num_rows == 0
    assert "clipped_wkb" in out.column_names


def test_pip_join_in_ray_pipeline(ray_session):
    import ray
    import ray.data as rd

    grid = admin_grid(nx=24, ny=12)
    ref = ray.put(polygons_to_blob(grid))
    rng = np.random.default_rng(5)
    n = 10_000
    tbl = pa.table(
        {
            "i": np.arange(n),
            "lon": rng.uniform(-179.9, 179.9, n),
            "lat": rng.uniform(-89.9, 89.9, n),
        }
    )
    ds = rd.from_arrow(tbl)
    out = ds.map_batches(
        PointInPolygonJoin,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4096,
    )
    assert out.count() == n
    schema_names = out.schema().names
    assert "poly_id" in schema_names and "poly_name" in schema_names


def test_pip_join_large_polygon_layer():
    # 10k-rect layer: STRtree candidates + exact PIP must equal direct
    # grid arithmetic (deep-tree correctness at realistic layer sizes)
    grid = admin_grid(nx=125, ny=80)  # 10,000 rectangles
    j = PointInPolygonJoin(polygons_to_blob(grid), how="inner")
    rng = np.random.default_rng(23)
    n = 20_000
    lon = rng.uniform(-179.99, 179.99, n)
    lat = rng.uniform(-89.99, 89.99, n)
    out = j(pa.table({"i": np.arange(n), "lon": lon, "lat": lat}))
    assert out.num_rows == n
    ix = np.floor((lon + 180) / (360 / 125)).astype(int)
    iy = np.floor((lat + 90) / (180 / 80)).astype(int)
    expected = iy * 125 + ix
    got = np.empty(n, dtype=int)
    got[out.column("i").to_numpy()] = out.column("poly_id").to_numpy()
    assert np.array_equal(got, expected)


def test_box_clip_join_multi_crs(boxes_blob):
    # reference different-CRS case (test_datapipes_geopandas.py:93-156):
    # vector reprojected to each chip's CRS before clipping
    chips = pa.table(
        {
            "chip_id": [0, 1],
            "bminx": [-166979.23618991036, 444414.4114896285],
            "bminy": [-55646.75541526544, 276009.81064532325],
            "bmaxx": [166988.3675623712, 777205.5384580799],
            "bmaxy": [166998.31375292226, 497870.56195762416],
            "crs": ["EPSG:3857", "EPSG:32631"],
        }
    )
    out = BoxClipJoin(boxes_blob, crs_col="crs")(chips).to_pylist()
    assert len(out) == 2
    r0 = next(r for r in out if r["chip_id"] == 0)
    golden0 = (0.0, 0.0, 166988.3675623712, 166998.31375292226)
    for got, exp in zip((r0["cminx"], r0["cminy"], r0["cmaxx"], r0["cmaxy"]), golden0):
        assert got == pytest.approx(exp, rel=1e-9, abs=1e-3)
    r1 = next(r for r in out if r["chip_id"] == 1)
    golden1 = (444414.4114896285, 276009.81064532325, 611163.137304327, 442194.9725083875)
    for got, exp in zip((r1["cminx"], r1["cminy"], r1["cmaxx"], r1["cmaxy"]), golden1):
        assert got == pytest.approx(exp, rel=1e-9, abs=1e-3)


def test_partitioned_pip_join_matches_broadcast(ray_session):
    """Large x large partitioned spatial join == broadcast PIP join."""
    import numpy as np
    import ray
    import ray.data as rd

    from zen3geo_ray.sources.fixtures import admin_grid
    from zen3geo_ray.stages.join import (
        PointInPolygonJoin,
        partitioned_pip_join,
        polygons_to_blob,
    )

    rng = np.random.default_rng(13)
    n = 5000
    pts = pa.table(
        {
            "pid": pa.array(np.arange(n), pa.int64()),
            "lon": pa.array(rng.uniform(-179, 179, n), pa.float64()),
            "lat": pa.array(rng.uniform(-89, 89, n), pa.float64()),
        }
    )
    polys = admin_grid(nx=24, ny=12)

    ref = ray.put(polygons_to_blob(polys))
    bro = (
        rd.from_arrow(pts)
        .map_batches(PointInPolygonJoin, fn_constructor_args=(ref,),
                     batch_format="pyarrow", concurrency=2)
        .to_pandas()
    )
    part = partitioned_pip_join(
        rd.from_arrow(pts), rd.from_arrow(polys), cell_deg=30.0, n_buckets=8
    ).to_pandas()
    a = sorted(zip(bro["pid"], bro["poly_id"]))
    b = sorted(zip(part["pid"].astype(np.int64), part["poly_id"].astype(np.int64)))
    assert len(a) == n  # every point falls in exactly one admin cell
    assert a == b
    # names carried through
    assert set(part.columns) == {"pid", "lon", "lat", "poly_id", "poly_name"}


def test_grid_bbox_join_bruteforce(ray_session):
    """Pair set + exact areas vs the O(n*m) reference, with boxes that
    span multiple grid cells (report-once must fire) and pairs whose
    overlap corner falls in different cells."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.join import grid_bbox_join

    rng = np.random.default_rng(41)

    def boxes(n, seed_off, id_col):
        x0 = rng.integers(0, 500, n)
        y0 = rng.integers(0, 500, n)
        w = rng.integers(5, 220, n)
        h = rng.integers(5, 180, n)
        return pa.table({
            id_col: pa.array(np.arange(n) + seed_off, pa.int64()),
            "x0": pa.array(x0.astype(np.int64)),
            "y0": pa.array(y0.astype(np.int64)),
            "x1": pa.array((x0 + w).astype(np.int64)),
            "y1": pa.array((y0 + h).astype(np.int64)),
        })

    ta = boxes(60, 0, "a_id")
    tb = boxes(45, 1000, "b_id")
    out = grid_bbox_join(
        rd.from_arrow(ta).repartition(3),
        rd.from_arrow(tb).repartition(2),
        cell=64, n_buckets=4).to_pandas()
    got = {(int(r.a_id), int(r.b_id)): int(r.area)
           for r in out.itertuples()}
    assert len(got) == len(out)  # report-once: no duplicate pairs
    want = {}
    for ra in ta.to_pylist():
        for rb in tb.to_pylist():
            w = min(ra["x1"], rb["x1"]) - max(ra["x0"], rb["x0"])
            h = min(ra["y1"], rb["y1"]) - max(ra["y0"], rb["y0"])
            if w > 0 and h > 0:
                want[(ra["a_id"], rb["b_id"])] = w * h
    assert got == want and len(want) > 20


def test_grid_seg_join_bruteforce(ray_session):
    """Properly-crossing pair set + determinants vs the O(n*m)
    orientation-test reference; segments point in all four quadrant
    directions and span multiple cells (report-once must fire)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.join import grid_seg_join

    rng = np.random.default_rng(43)

    def segs(n, seed_off, id_col):
        x0 = rng.integers(0, 400, n)
        y0 = rng.integers(0, 400, n)
        dx = rng.integers(-150, 150, n)
        dy = rng.integers(-120, 120, n)
        return pa.table({
            id_col: pa.array(np.arange(n) + seed_off, pa.int64()),
            "x0": pa.array(x0.astype(np.int64)),
            "y0": pa.array(y0.astype(np.int64)),
            "x1": pa.array((x0 + dx).astype(np.int64)),
            "y1": pa.array((y0 + dy).astype(np.int64)),
        })

    ta = segs(60, 0, "a_id")
    tb = segs(45, 1000, "b_id")
    out = grid_seg_join(
        rd.from_arrow(ta).repartition(3),
        rd.from_arrow(tb).repartition(2),
        cell=64, n_buckets=4).to_pandas()
    got = {(int(r.a_id), int(r.b_id)): int(r.det)
           for r in out.itertuples()}
    assert len(got) == len(out)  # report-once: no duplicate pairs

    def cross(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    want = {}
    for ra in ta.to_pylist():
        for rb in tb.to_pylist():
            o1 = cross(ra["x0"], ra["y0"], ra["x1"], ra["y1"],
                       rb["x0"], rb["y0"])
            o2 = cross(ra["x0"], ra["y0"], ra["x1"], ra["y1"],
                       rb["x1"], rb["y1"])
            o3 = cross(rb["x0"], rb["y0"], rb["x1"], rb["y1"],
                       ra["x0"], ra["y0"])
            o4 = cross(rb["x0"], rb["y0"], rb["x1"], rb["y1"],
                       ra["x1"], ra["y1"])
            if o1 * o2 < 0 and o3 * o4 < 0:
                want[(ra["a_id"], rb["b_id"])] = (
                    (ra["x1"] - ra["x0"]) * (rb["y1"] - rb["y0"])
                    - (ra["y1"] - ra["y0"]) * (rb["x1"] - rb["x0"]))
    assert got == want and len(want) > 20


def test_snap_points_to_segments_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.join import SNAP_Q, snap_points_to_segments

    # seg 1: horizontal (0,0)-(10,0); seg 2: point-degenerate (5,7)
    segs = pa.table({
        "sid": pa.array([1, 2], pa.int64()),
        "x0": pa.array([0, 5], pa.int64()),
        "y0": pa.array([0, 7], pa.int64()),
        "x1": pa.array([10, 5], pa.int64()),
        "y1": pa.array([0, 7], pa.int64())})
    # p1 (3,4): foot inside seg1 -> d2=16; to seg2 d2=13 -> seg2 wins
    # p2 (-3,4): before seg1 start -> endpoint d2=25; seg2 d2=73
    # p3 (5,4): seg1 d2=16, seg2 d2=9 -> seg2
    # p4 (99,99): nothing within radius -> no row
    pts = pa.table({
        "pid": pa.array([1, 2, 3, 4], pa.int64()),
        "x": pa.array([3, -3, 5, 99], pa.int64()),
        "y": pa.array([4, 4, 4, 99], pa.int64())})
    out = snap_points_to_segments(
        rd.from_arrow(pts).repartition(2), rd.from_arrow(segs),
        radius=10, cell=8, n_buckets=2).to_pandas().set_index("pid")
    assert int(out.loc[1, "sid"]) == 2
    assert int(out.loc[1, "d2q"]) == 13 * SNAP_Q
    assert int(out.loc[2, "sid"]) == 1
    assert int(out.loc[2, "d2q"]) == 25 * SNAP_Q
    assert int(out.loc[3, "sid"]) == 2 and 4 not in out.index
    # tie at equal distance -> smaller sid: two point-segs at d2=4
    segs2 = pa.table({
        "sid": pa.array([7, 3], pa.int64()),
        "x0": pa.array([2, -2], pa.int64()),
        "y0": pa.array([0, 0], pa.int64()),
        "x1": pa.array([2, -2], pa.int64()),
        "y1": pa.array([0, 0], pa.int64())})
    p2 = pa.table({"pid": pa.array([9], pa.int64()),
                   "x": pa.array([0], pa.int64()),
                   "y": pa.array([0], pa.int64())})
    o2 = snap_points_to_segments(rd.from_arrow(p2),
                                 rd.from_arrow(segs2), radius=5,
                                 cell=4, n_buckets=2).to_pandas()
    assert int(o2.sid.iloc[0]) == 3


def test_snap_large_coordinates_exact(ray_session):
    """Coordinates far beyond the int64-product-safe window (cross ~
    2^40) must still snap exactly via the Python-int fallback lane —
    the round-4-advice silent-overflow case."""
    import ray.data as rd

    from zen3geo_ray.stages.join import SNAP_Q, snap_points_to_segments

    BIG = 50_000_000  # deltas ~5e7: cross ~ 2.5e15 >> overflow bound
    # long diagonal segment; point sits 3 units off its midpoint foot
    segs = pa.table({
        "sid": pa.array([1], pa.int64()),
        "x0": pa.array([0], pa.int64()),
        "y0": pa.array([0], pa.int64()),
        "x1": pa.array([BIG], pa.int64()),
        "y1": pa.array([0], pa.int64())})
    pts = pa.table({
        "pid": pa.array([1, 2], pa.int64()),
        "x": pa.array([BIG // 2, BIG // 2], pa.int64()),
        "y": pa.array([3, 10 ** 7], pa.int64())})
    out = snap_points_to_segments(
        rd.from_arrow(pts), rd.from_arrow(segs),
        radius=5, cell=1 << 20, n_buckets=2).to_pandas()
    # pid 1 within radius, exact d2 = 9; pid 2 far outside -> dropped
    assert len(out) == 1
    assert int(out.pid.iloc[0]) == 1
    assert int(out.d2q.iloc[0]) == 9 * SNAP_Q
