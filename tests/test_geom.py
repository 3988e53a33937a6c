"""Unit tests for the numpy geometry kernels (no Ray needed).

Golden values ported from the reference's fixtures:
- clip bounds: /root/reference/zen3geo/tests/test_datapipes_geopandas.py:77-89
- reprojected clip bounds (EPSG:3857 / EPSG:32631): same file :121-156
"""

import numpy as np
import pytest

from zen3geo_ray.geom import cells, clip, crs, predicates, strtree, wkb


# --- WKB ------------------------------------------------------------------

def test_wkb_roundtrip_all_types():
    geoms = [
        wkb.point(1.5, -2.5),
        wkb.multipoint([(4.5, 4.5), (3.5, 1), (6, 3.5)]),
        wkb.linestring([(3, 5), (5, 3), (3, 2), (5, 0)]),
        wkb.polygon([(6, 5), (3.5, 2.5), (6, 0), (6, 2.5), (5, 2.5)]),
        wkb.box(0, 0, 2, 2),
        {
            "type": "MultiPolygon",
            "coords": [wkb.box(0, 0, 1, 1)["coords"], wkb.box(2, 2, 3, 3)["coords"]],
        },
    ]
    for g in geoms:
        rt = wkb.loads(wkb.dumps(g))
        assert rt["type"] == g["type"]
        assert wkb.bounds(rt) == wkb.bounds(g)


def test_wkb_polygon_autoclose():
    g = wkb.polygon([(0, 0), (1, 0), (1, 1)])
    ring = g["coords"][0]
    assert np.array_equal(ring[0], ring[-1])
    assert len(ring) == 4


# --- clip (reference golden parity) ---------------------------------------

def test_clip_golden_crs84():
    # reference: box(0,0,2,2) clipped by raster bounds (-1.5,-0.5,1.5,1.5)
    out = clip.clip_geom_rect(wkb.box(0, 0, 2, 2), -1.5, -0.5, 1.5, 1.5)
    assert wkb.bounds(out) == (0.0, 0.0, 1.5, 1.5)
    assert out["type"] == "Polygon"
    # second chip: box(2,2,4,4) by (2.5,2.5,5.5,4.5)
    out2 = clip.clip_geom_rect(wkb.box(2, 2, 4, 4), 2.5, 2.5, 5.5, 4.5)
    assert wkb.bounds(out2) == (2.5, 2.5, 4.0, 4.0)
    # disjoint geometry drops (clipped stream keeps only intersecting geoms)
    assert clip.clip_geom_rect(wkb.box(2, 2, 4, 4), -1.5, -0.5, 1.5, 1.5) is None
    assert clip.clip_geom_rect(wkb.box(0, 0, 2, 2), 2.5, 2.5, 5.5, 4.5) is None


def test_clip_golden_epsg3857():
    # reference test_datapipes_geopandas.py:121-138 — vector box(0,0,2,2)
    # to_crs(EPSG:3857) then clipped by the reprojected raster's bounds.
    g = crs.transform_geom(wkb.box(0, 0, 2, 2), "EPSG:3857")
    mask = (-166979.23618991036, -55646.75541526544, 166988.3675623712, 166998.31375292226)
    out = clip.clip_geom_rect(g, *mask)
    b = wkb.bounds(out)
    golden = (0.0, 0.0, 166988.3675623712, 166998.31375292226)
    assert b == pytest.approx(golden, rel=1e-9, abs=1e-4)


def test_clip_golden_epsg32631():
    # reference test_datapipes_geopandas.py:140-156 — box(2,2,4,4) →
    # EPSG:32631 vertices, clipped by the reprojected raster's bounds.
    g = crs.transform_geom(wkb.box(2, 2, 4, 4), "EPSG:32631")
    mask = (444414.4114896285, 276009.81064532325, 777205.5384580799, 497870.56195762416)
    out = clip.clip_geom_rect(g, *mask)
    b = wkb.bounds(out)
    golden = (444414.4114896285, 276009.81064532325, 611163.137304327, 442194.9725083875)
    assert b == pytest.approx(golden, rel=1e-9, abs=1e-3)


def test_clip_line_and_points():
    line = wkb.linestring([(-2, 0.5), (4, 0.5)])
    out = clip.clip_geom_rect(line, 0, 0, 2, 2)
    assert wkb.bounds(out) == (0.0, 0.5, 2.0, 0.5)
    mp = wkb.multipoint([(0.5, 0.5), (9, 9)])
    out = clip.clip_geom_rect(mp, 0, 0, 2, 2)
    assert len(out["coords"]) == 1


def test_clip_unsupported_type_raises():
    gc = {"type": "GeometryCollection", "coords": [wkb.point(0, 0)]}
    with pytest.raises(NotImplementedError, match="Unsupported geometry type"):
        clip.clip_geom_rect(gc, 0, 0, 1, 1)


# --- CRS ------------------------------------------------------------------

def test_mercator_golden():
    x, y = crs.lonlat_to_mercator(1.5, 1.5)
    assert float(x) == pytest.approx(166979.23618991036, rel=1e-12)
    assert float(y) == pytest.approx(166998.31375292226, rel=1e-9)
    lon, lat = crs.mercator_to_lonlat(x, y)
    assert float(lon) == pytest.approx(1.5, abs=1e-12)
    assert float(lat) == pytest.approx(1.5, abs=1e-12)


def test_utm_golden():
    # corners of the reference's EPSG:32631 clip case
    x, y = crs.lonlat_to_utm(4.0, 4.0, zone=31)
    assert float(y) == pytest.approx(442194.9725083875, rel=1e-12)
    x2, y2 = crs.lonlat_to_utm(2.5, 2.5, zone=31)
    assert float(x2) == pytest.approx(444414.4114896285, rel=1e-11)


# --- predicates -----------------------------------------------------------

def test_points_in_polygon_pentagon():
    poly = wkb.polygon([(6, 5), (3.5, 2.5), (6, 0), (6, 2.5), (5, 2.5)])
    px = np.array([5.5, 0.0, 5.9, 5.5])
    py = np.array([4.0, 0.0, 1.0, 2.4])
    got = predicates.points_in_polygon(px, py, poly["coords"])
    assert got.tolist() == [True, False, True, True]


def test_points_in_polygon_with_hole():
    outer = wkb.box(0, 0, 10, 10)["coords"][0]
    hole = wkb.box(4, 4, 6, 6)["coords"][0]
    got = predicates.points_in_polygon(
        np.array([5.0, 1.0]), np.array([5.0, 1.0]), [outer, hole]
    )
    assert got.tolist() == [False, True]


def test_points_in_multipolygon():
    mp = {
        "type": "MultiPolygon",
        "coords": [wkb.box(0, 0, 1, 1)["coords"], wkb.box(5, 5, 6, 6)["coords"]],
    }
    got = predicates.points_in_geom(
        np.array([0.5, 5.5, 3.0]), np.array([0.5, 5.5, 3.0]), mp
    )
    assert got.tolist() == [True, True, False]


# --- STRtree --------------------------------------------------------------

def test_strtree_matches_bruteforce():
    rng = np.random.default_rng(7)
    n = 3000
    bx, by = rng.uniform(0, 100, n), rng.uniform(0, 100, n)
    w, h = rng.uniform(0, 3, n), rng.uniform(0, 3, n)
    tree = strtree.STRtree(bx, by, bx + w, by + h)
    qx, qy = rng.uniform(-5, 105, 500), rng.uniform(-5, 105, 500)
    qi, ii = tree.query_boxes(qx, qy, qx + 2, qy + 2)
    brute = (
        (qx[:, None] <= bx[None, :] + w[None, :])
        & (qx[:, None] + 2 >= bx[None, :])
        & (qy[:, None] <= by[None, :] + h[None, :])
        & (qy[:, None] + 2 >= by[None, :])
    )
    assert set(zip(qi.tolist(), ii.tolist())) == set(zip(*np.nonzero(brute)))


def test_strtree_empty_and_single():
    t = strtree.STRtree(np.empty(0), np.empty(0), np.empty(0), np.empty(0))
    qi, ii = t.query_points(np.array([1.0]), np.array([1.0]))
    assert len(qi) == 0
    t1 = strtree.STRtree(
        np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([1.0])
    )
    qi, ii = t1.query_points(np.array([0.5, 5.0]), np.array([0.5, 5.0]))
    assert qi.tolist() == [0] and ii.tolist() == [0]


# --- cells ----------------------------------------------------------------

def test_cell_roundtrip_and_parent():
    lon = np.array([-98.0, 10.0, 179.9999, -180.0, 0.0])
    lat = np.array([39.0, 51.0, 89.9999, -90.0, 0.0])
    res = 10
    c = cells.cell_of(lon, lat, res)
    minlon, minlat, maxlon, maxlat = cells.cell_bounds(c, res)
    assert np.all((lon >= minlon) & (lon <= maxlon))
    assert np.all((lat >= minlat) & (lat <= maxlat))
    p = cells.parent(c, res, 8)
    pm = cells.cell_of(*cells.cell_center(c, res), 8)
    assert np.array_equal(p, pm)
    ch = cells.children(int(p[0]), 8, 10)
    assert len(ch) == 16
    assert c[0] in ch


def test_k_ring():
    c = cells.cell_of(np.array([0.0]), np.array([0.0]), 5)
    ring = cells.k_ring(c, 5, 1)
    assert ring.shape == (1, 9)
    assert len(np.unique(ring)) == 9
    # pole clamping: out-of-range rows replaced by the source cell
    cp = cells.cell_of(np.array([0.0]), np.array([89.9]), 5)
    ringp = np.unique(cells.k_ring(cp, 5, 1))
    assert len(ringp) < 9
    assert int(cp[0]) in ringp


def test_cell_sql_parity():
    import duckdb

    lon = np.linspace(-180, 180, 101)
    lat = np.linspace(-90, 90, 101)
    got = cells.cell_of(lon, lat, 7)
    expr = cells.sql_cell_expr("lon", "lat", 7)
    q = duckdb.sql(
        f"SELECT {expr} AS c FROM (SELECT -180 + 3.6*i AS lon, -90 + 1.8*i AS lat "
        f"FROM (SELECT unnest(range(101)) AS i))"
    ).fetchnumpy()["c"]
    # identical arithmetic mod float formatting of the linspace inputs
    lon2 = -180 + 3.6 * np.arange(101)
    lat2 = -90 + 1.8 * np.arange(101)
    assert np.array_equal(q.astype(np.int64), cells.cell_of(lon2, lat2, 7))


def test_morton_locality():
    lon = np.array([0.0, 0.01, 90.0])
    lat = np.array([0.0, 0.01, 45.0])
    m = cells.morton_of(lon, lat, 16)
    assert abs(int(m[0]) - int(m[1])) < abs(int(m[0]) - int(m[2]))


def test_utm_south_hemisphere():
    # EPSG:327xx adds the 10,000 km false northing
    xn, yn = crs.lonlat_to_utm(173.0, -41.0, zone=59, north=False)
    assert 0 < float(xn) < 1_000_000
    assert 5_000_000 < float(yn) < 10_000_000
    # transform() dispatch for the southern EPSG code
    x2, y2 = crs.transform(173.0, -41.0, "EPSG:32759")
    assert float(x2) == float(xn) and float(y2) == float(yn)


# --- Douglas-Peucker simplification ---------------------------------------


def test_simplify_line_collinear():
    from zen3geo_ray.geom.simplify import simplify_line

    pts = np.array([[0.0, 0], [1, 0.001], [2, -0.001], [3, 0], [3, 3]])
    out = simplify_line(pts, 0.01)
    assert [tuple(p) for p in out] == [(0.0, 0.0), (3.0, 0.0), (3.0, 3.0)]
    # below tolerance nothing is dropped
    assert len(simplify_line(pts, 0.0001)) == 5


def test_simplify_ring_square():
    from zen3geo_ray.geom.simplify import simplify_ring

    # unit square traced with collinear edge points (closed ring)
    ring = np.array(
        [[0.0, 0], [0.5, 0], [1, 0], [1, 0.5], [1, 1], [0.5, 1],
         [0, 1], [0, 0.5], [0, 0]]
    )
    out = simplify_ring(ring, 0.01)
    assert (out[0] == out[-1]).all()
    assert len(out) == 5  # 4 corners + closure
    corners = {tuple(p) for p in out[:-1]}
    assert corners == {(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)}


def test_raster_to_regions_simplified_area_preserved():
    import pyarrow as pa

    from zen3geo_ray.geom import wkb as wkbmod
    from zen3geo_ray.stages.vectorize import raster_to_regions

    H = W = 16
    grid = np.zeros((H, W))
    grid[2:14, 3:12] = 1.0  # solid rectangle -> boundary has collinear runs
    batch = pa.table(
        {"tile_id": pa.array([0], pa.int64()),
         "height": pa.array([H], pa.int32()),
         "width": pa.array([W], pa.int32()),
         "data": pa.array([grid.reshape(-1)], pa.list_(pa.float64())),
         "xmin": pa.array([0.0]), "ymin": pa.array([0.0]),
         "xmax": pa.array([16.0]), "ymax": pa.array([16.0])}
    )
    full = raster_to_regions(batch)
    simp = raster_to_regions(batch, simplify_eps=0.25)
    g_full = wkbmod.loads(full.column("region_wkb")[0].as_py())
    g_simp = wkbmod.loads(simp.column("region_wkb")[0].as_py())
    assert len(g_simp["coords"][0]) < len(g_full["coords"][0])
    assert len(g_simp["coords"][0]) == 5  # rectangle -> 4 corners + closure

    def shoelace(ring):
        r = np.asarray(ring)
        return 0.5 * abs(
            np.sum(r[:-1, 0] * r[1:, 1]) - np.sum(r[1:, 0] * r[:-1, 1])
        )

    assert shoelace(g_simp["coords"][0]) == shoelace(g_full["coords"][0])


def test_clip_polygons_rect_multi_matches_single():
    """Vectorized multi-pair S-H == the per-ring reference, bit for bit,
    over random convex-ish and star polygons with holes and varied boxes
    (including fully-inside, fully-outside and sliver overlaps)."""
    from zen3geo_ray.geom.clip import clip_polygon_rect, clip_polygons_rect_multi

    rng = np.random.default_rng(17)
    polys, boxes = [], []
    for i in range(120):
        cx, cy = rng.uniform(-5, 5, 2)
        nv = rng.integers(3, 12)
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.5, 3.0, nv)
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], 1)
        rings = [np.vstack([ring, ring[:1]])]
        if i % 3 == 0:  # add a hole
            hr = rad.min() * 0.3
            hang = np.linspace(0, 2 * np.pi, 6)[::-1]
            hole = np.stack([cx + hr * np.cos(hang), cy + hr * np.sin(hang)], 1)
            rings.append(hole)
        polys.append(rings)
        bx = rng.uniform(-7, 5)
        by = rng.uniform(-7, 5)
        boxes.append((bx, by, bx + rng.uniform(0.2, 6), by + rng.uniform(0.2, 6)))
    multi = clip_polygons_rect_multi(polys, np.asarray(boxes))
    n_nonempty = 0
    for rings, (x0, y0, x1, y1), got in zip(polys, boxes, multi):
        exp = clip_polygon_rect(rings, x0, y0, x1, y1)
        assert len(got) == len(exp)
        n_nonempty += bool(exp)
        for a, b in zip(got, exp):
            assert np.array_equal(a, b)  # bit-identical vertices
    assert n_nonempty > 20  # the sample actually exercised real clips


def test_sql_morton_expr_matches_numpy():
    # the unrolled DuckDB bit-interleave == morton_of, including the
    # prepended nx top bit, across the whole lon/lat range
    import duckdb

    rng = np.random.default_rng(17)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    lon[:3] = [-180.0, 180.0, 0.0]
    lat[:3] = [-90.0, 90.0, 0.0]
    res = 8
    exp = cells.morton_of(lon, lat, res)
    nx_e, ny_e = cells.sql_nxny_exprs("lon", "lat", res)
    z_e = cells.sql_morton_expr("nx", "ny", res)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
    got = con.execute(
        f"WITH xy AS (SELECT {nx_e} AS nx, {ny_e} AS ny FROM pts) "
        f"SELECT {z_e} AS z FROM xy"
    ).df()["z"].to_numpy()
    assert np.array_equal(got, exp)


class TestMeasure:
    def test_unit_square(self):
        from zen3geo_ray.geom import wkb
        from zen3geo_ray.geom.measure import polygon_measures

        g = wkb.box(0, 0, 2, 2)
        m = polygon_measures(g)
        assert m["area2"] == 8.0          # area 4
        assert m["perimeter"] == 8.0
        assert m["nverts"] == 4
        # centroid = (1, 1): cx6/(3*area2) = 24/24
        assert m["cx6"] / (3 * m["area2"]) == 1.0
        assert m["cy6"] / (3 * m["area2"]) == 1.0

    def test_345_triangle_perimeter(self):
        from zen3geo_ray.geom import wkb
        from zen3geo_ray.geom.measure import polygon_measures

        g = wkb.polygon([(0, 0), (3, 0), (0, 4)])
        m = polygon_measures(g)
        assert m["area2"] == 12.0         # area 6
        assert m["perimeter"] == 12.0     # 3 + 4 + 5
        assert m["cx6"] / (3 * m["area2"]) == 1.0
        assert abs(m["cy6"] / (3 * m["area2"]) - 4.0 / 3.0) < 1e-12

    def test_hole_subtracts(self):
        """4x4 shell CCW with a CW 2x2 hole: area 16 - 4 = 12; the
        centroid stays at the shared center (2, 2)."""
        from zen3geo_ray.geom import wkb
        from zen3geo_ray.geom.measure import polygon_measures

        shell = [(0, 0), (4, 0), (4, 4), (0, 4)]
        hole = [(1, 1), (1, 3), (3, 3), (3, 1)]  # clockwise
        g = wkb.polygon(shell, holes=[hole])
        m = polygon_measures(g)
        assert m["area2"] == 24.0
        assert m["cx6"] / (3 * m["area2"]) == 2.0
        assert m["cy6"] / (3 * m["area2"]) == 2.0
        assert m["perimeter"] == 16.0 + 8.0
        assert m["nverts"] == 8

    def test_multipolygon_sums(self):
        from zen3geo_ray.geom import wkb
        from zen3geo_ray.geom.measure import polygon_measures

        a = wkb.box(0, 0, 1, 1)
        b = wkb.box(10, 0, 12, 1)
        g = {"type": "MultiPolygon", "coords": [a["coords"], b["coords"]]}
        m = polygon_measures(g)
        assert m["area2"] == 2.0 + 4.0
        assert m["nverts"] == 8

    def test_measures_batch_roundtrip(self):
        from zen3geo_ray.geom import wkb
        from zen3geo_ray.geom.measure import measures_batch

        blobs = [wkb.dumps(wkb.box(0, 0, 2, 2)),
                 wkb.dumps(wkb.polygon([(0, 0), (3, 0), (0, 4)]))]
        t = measures_batch(blobs, as_int=True)
        assert t.column("area2").to_pylist() == [8, 12]
        assert t.column("cx").to_pylist()[0] == 1.0


def test_hex_axial_centers_and_nearest():
    import numpy as np

    from zen3geo_ray.geom.cells import HEX_Q, HEX_S3D, HEX_S3N, hex_axial_of

    s_q = 3 * HEX_Q
    s = 3.0
    s3 = HEX_S3N / HEX_S3D
    for q in range(-4, 5):
        for r in range(-4, 5):
            cx = s * s3 * (q + r / 2.0)
            cy = s * 1.5 * r
            hq, hr = hex_axial_of(np.array([cx]), np.array([cy]), s_q)
            assert (int(hq[0]), int(hr[0])) == (q, r)
    # random points fall in their planar-nearest hex under the
    # quantized-sqrt3 metric (exactness of the cube rounding)
    rng = np.random.default_rng(3)
    lon = rng.uniform(-20, 20, 500)
    lat = rng.uniform(-20, 20, 500)
    hq, hr = hex_axial_of(lon, lat, s_q)

    def center(q, r):
        return s * s3 * (q + r / 2.0), s * 1.5 * r

    for i in range(500):
        cx, cy = center(hq[i], hr[i])
        d0 = (lon[i] - cx) ** 2 + (lat[i] - cy) ** 2
        for dq, dr in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
            nx, ny = center(hq[i] + dq, hr[i] + dr)
            assert (lon[i] - nx) ** 2 + (lat[i] - ny) ** 2 >= d0 - 1e-9


def test_ring_simplify_mask_and_summary(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.geom import wkb
    from zen3geo_ray.geom.measure import (
        ring_area2,
        ring_simplify_mask,
        simplify_summary,
    )

    # square with one tiny notch vertex (area-2 triangle) at (5, 0.?):
    # integer version — notch vertex (5, 1): triangle (0,0)-(5,1)-(10,0)
    # has 2A = |(5,1)x(10,0)| = 10 >= 8 kept; shallower notch (5, 0)?
    ring = np.array([[0, 0], [5, 1], [10, 0], [10, 10], [0, 10], [0, 0]],
                    dtype=np.float64)
    m = ring_simplify_mask(ring, 8)
    assert m.tolist() == [True, True, True, True, True]
    m2 = ring_simplify_mask(ring, 11)   # notch removed at T2 = 11
    assert m2.tolist() == [True, False, True, True, True]

    t = pa.table({"poly_id": pa.array([1], pa.int64()),
                  "geometry_wkb": pa.array(
        [wkb.dumps({"type": "Polygon", "coords": [ring]})], pa.binary())})
    out = simplify_summary(rd.from_arrow(t), threshold2=11,
                           keep_cols=["poly_id"]).to_pandas().iloc[0]
    assert (int(out.nverts), int(out.nkept)) == (5, 4)
    assert int(out.area2) == int(round(ring_area2(ring)))
    assert int(out.area2_s) == 200   # clean 10x10 square


def test_quadkey_published_vectors():
    """Bing tile-system doc example: tile (x=3, y=5) at level 3 has
    quadkey '213'; plus structural invariants (prefix = parent,
    length = zoom)."""
    import numpy as np

    from zen3geo_ray.geom import cells

    lon = [-180 + (3 + 0.5) * 360 / 8]
    lat = [90 - (5 + 0.5) * 180 / 8]
    assert cells.quadkey_of(lon, lat, 3) == ["213"]
    # parent-prefix property at a few random points
    rng = np.random.default_rng(3)
    lons = rng.uniform(-179, 179, 50)
    lats = rng.uniform(-89, 89, 50)
    q5 = cells.quadkey_of(lons, lats, 5)
    q3 = cells.quadkey_of(lons, lats, 3)
    assert all(len(a) == 5 and len(b) == 3 and a.startswith(b)
               for a, b in zip(q5, q3))
