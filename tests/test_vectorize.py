"""Raster → vector conversion tests (round trip with rasterize)."""

import numpy as np
import pyarrow as pa

from zen3geo_ray.geom import wkb
from zen3geo_ray.stages import rasterize as rz
from zen3geo_ray.stages import vectorize as vz


def _tile_row(grid: np.ndarray, bounds=(1.0, 0.0, 8.0, 5.0), tile_id=0):
    H, W = grid.shape
    return pa.table(
        {
            "tile_id": pa.array([tile_id], pa.int64()),
            "height": pa.array([H], pa.int32()),
            "width": pa.array([W], pa.int32()),
            "xmin": [bounds[0]],
            "ymin": [bounds[1]],
            "xmax": [bounds[2]],
            "ymax": [bounds[3]],
            "data": pa.array([grid.ravel().astype(np.uint32)], pa.list_(pa.uint32())),
        }
    )


def test_label_components():
    mask = np.array(
        [
            [1, 1, 0, 0, 1],
            [0, 1, 0, 1, 1],
            [0, 0, 0, 0, 0],
            [1, 0, 1, 1, 0],
        ],
        dtype=bool,
    )
    labels, n = vz.label_components(mask)
    assert n == 4
    assert labels[0, 0] == labels[1, 1]  # L-shape joined
    assert labels[0, 4] == labels[1, 3]  # top-right pair joined
    assert labels[3, 0] not in (labels[3, 2], 0)
    # U-shape merge case (equivalence across a row)
    u = np.array([[1, 0, 1], [1, 0, 1], [1, 1, 1]], dtype=bool)
    labels_u, n_u = vz.label_components(u)
    assert n_u == 1


def test_raster_to_points_roundtrip():
    # rasterize the golden pentagon, vectorize back to pixel points
    pent = wkb.polygon([(6, 5), (3.5, 2.5), (6, 0), (6, 2.5), (5, 2.5)])
    grid, _ = rz.rasterize_geoms([pent], 14, 10, (1, 0, 8, 5))
    pts = vz.raster_to_points(_tile_row(grid)).to_pandas()
    assert len(pts) == 15  # golden sum
    # pixel centers lie within the canvas
    assert pts.lon.between(1, 8).all() and pts.lat.between(0, 5).all()
    # re-rasterizing the points reproduces the mask
    back = rz.raster_points(pts.lon.to_numpy(), pts.lat.to_numpy(), 14, 10,
                            (1, 0, 8, 5), agg="any")[::-1]
    assert np.array_equal(back, (grid > 0).astype(np.uint8))


def test_raster_to_regions():
    grid = np.zeros((10, 14), dtype=np.uint32)
    grid[1:3, 1:4] = 2   # region A: 2x3 block, value 2
    grid[7:9, 10:12] = 1  # region B: 2x2 block
    out = vz.raster_to_regions(_tile_row(grid)).to_pandas()
    assert len(out) == 2
    a = out[out.pixel_count == 6].iloc[0]
    assert a.value_sum == 12.0
    # bbox: cols 1..3 of 0.5-wide pixels from xmin=1
    assert a.rminx == 1.5 and a.rmaxx == 3.0
    # rows 1..2 from the top (ymax=5): maxy = 5-0.5, miny = 5-1.5
    assert a.rmaxy == 4.5 and a.rminy == 3.5
    g = wkb.loads(a.region_wkb)
    assert g["type"] == "Polygon"
    assert wkb.bounds(g) == (1.5, 3.5, 3.0, 4.5)


def test_vectorize_in_pipeline(ray_session):
    import ray.data as rd

    pent = wkb.polygon([(6, 5), (3.5, 2.5), (6, 0), (6, 2.5), (5, 2.5)])
    grid, _ = rz.rasterize_geoms([pent], 14, 10, (1, 0, 8, 5))
    ds = rd.from_arrow(_tile_row(grid))
    regions = ds.map_batches(
        lambda b: vz.raster_to_regions(b), batch_format="pyarrow"
    ).to_pandas()
    assert regions["pixel_count"].sum() == 15


def test_trace_boundary_exact_area():
    # pentagon mask: traced outer polygon area == pixel count (no holes)
    pent = wkb.polygon([(6, 5), (3.5, 2.5), (6, 0), (6, 2.5), (5, 2.5)])
    grid, _ = rz.rasterize_geoms([pent], 14, 10, (1, 0, 8, 5))
    regions = vz.raster_to_regions(_tile_row(grid)).to_pandas()
    total_pixels = regions["pixel_count"].sum()
    assert total_pixels == 15
    for _, r in regions.iterrows():
        ring = wkb.loads(r.region_wkb)["coords"][0]
        x, y = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        area = abs(0.5 * np.sum(x * y2 - x2 * y))
        pixel_area = 0.5 * 0.5
        assert area == r.pixel_count * pixel_area
        # boundary ring matches the region bbox
        b = wkb.bounds({"type": "Polygon", "coords": [ring]})
        assert b == (r.rminx, r.rminy, r.rmaxx, r.rmaxy)


def test_trace_boundary_concave():
    m = np.array(
        [[1, 0, 0], [1, 0, 0], [1, 1, 1]], dtype=bool
    )  # L-shape, concave
    ring = vz.trace_boundary(m)
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    assert abs(0.5 * np.sum(x * y2 - x2 * y)) == 5.0  # exact pixel area


def test_region_with_hole():
    # donut: 6x6 block with a 2x2 hole
    grid = np.zeros((10, 14), dtype=np.uint32)
    grid[2:8, 3:9] = 1
    grid[4:6, 5:7] = 0
    out = vz.raster_to_regions(_tile_row(grid)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.pixel_count == 36 - 4
    g = wkb.loads(r.region_wkb)
    assert g["type"] == "Polygon" and len(g["coords"]) == 2  # outer + hole
    # even-odd PIP: a point inside the hole is NOT in the polygon
    from zen3geo_ray.geom.predicates import points_in_polygon

    # hole pixels rows 4-5, cols 5-6 -> geo center of hole
    hx = 1 + 6 * 0.5  # col 6 * 0.5 + xmin 1 => 4.0
    hy = 5 - 5 * 0.5  # row 5 -> 2.5
    inside_hole = points_in_polygon(
        np.array([hx]), np.array([hy]), g["coords"]
    )
    assert not inside_hole[0]
    # a point on the ring solid part IS inside
    sx = 1 + 3.5 * 0.5
    sy = 5 - 2.5 * 0.5
    assert points_in_polygon(np.array([sx]), np.array([sy]), g["coords"])[0]
    # shoelace: outer - hole == pixel count * pixel area
    def area(ring):
        x, y = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        return abs(0.5 * np.sum(x * y2 - x2 * y))

    assert area(g["coords"][0]) - area(g["coords"][1]) == 32 * 0.25


def test_filter_geom_types():
    import pyarrow as pa

    from zen3geo_ray.geom import wkb
    from zen3geo_ray.stages.vectorize import filter_geom_types

    blobs = [
        wkb.dumps(wkb.point(1.0, 2.0)),
        wkb.dumps(wkb.linestring([(0.0, 0.0), (1.0, 1.0)])),
        wkb.dumps(wkb.box(0.0, 0.0, 2.0, 2.0)),
        wkb.dumps(wkb.multipoint([(0.0, 0.0), (3.0, 3.0)])),
    ]
    t = pa.table({"gid": pa.array([0, 1, 2, 3], pa.int64()),
                  "geometry_wkb": pa.array(blobs, pa.binary())})
    pts = filter_geom_types(t, wkb_col="geometry_wkb",
                            keep=("Point", "MultiPoint"))
    assert pts.column("gid").to_pylist() == [0, 3]
    polys = filter_geom_types(t, wkb_col="geometry_wkb", keep=("Polygon",))
    assert polys.column("gid").to_pylist() == [2]
