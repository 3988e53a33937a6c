"""Rasterization golden-parity tests.

Goldens from the reference (`zen3geo/tests/test_datapipes_datashader.py:77-104`):
on a 14x10 canvas over x∈(1,8), y∈(0,5) the fixtures rasterize to
sum 3 (MultiPoint, count), 13 (LineString, any), 15 (Polygon, any);
output shape (10, 14); y-resolution -0.5 (North→South).
"""

import numpy as np
import pytest

from zen3geo_ray.geom import wkb
from zen3geo_ray.stages import rasterize as rz

CANVAS = dict(width=14, height=10, bounds=(1.0, 0.0, 8.0, 5.0))

MULTIPOINT = wkb.multipoint([(4.5, 4.5), (3.5, 1), (6, 3.5)])
LINE = wkb.linestring([(3, 5), (5, 3), (3, 2), (5, 0)])
PENTAGON = wkb.polygon([(6, 5), (3.5, 2.5), (6, 0), (6, 2.5), (5, 2.5)])


@pytest.mark.parametrize(
    ("geom", "agg", "total"),
    [(MULTIPOINT, None, 3), (LINE, None, 13), (PENTAGON, None, 15)],
)
def test_rasterize_golden_sums(geom, agg, total):
    grid, used_agg = rz.rasterize_geoms(
        [geom], CANVAS["width"], CANVAS["height"], CANVAS["bounds"], agg=agg
    )
    assert grid.shape == (10, 14)
    assert int(grid.sum()) == total
    assert used_agg == ("count" if geom["type"] == "MultiPoint" else "any")


def test_rasterize_y_flip_north_up():
    # a single point near the top (y=4.9) must land in row 0 after the flip
    grid, _ = rz.rasterize_geoms(
        [wkb.point(4.0, 4.9)], CANVAS["width"], CANVAS["height"], CANVAS["bounds"]
    )
    assert grid[0].sum() == 1 and grid.sum() == 1
    # y-resolution: (ymax-ymin)/height = 0.5, negative northward (e == -0.5)
    assert (CANVAS["bounds"][3] - CANVAS["bounds"][1]) / CANVAS["height"] == 0.5


def test_rasterize_edge_inclusion():
    # points exactly on the max edges land in the last bin (datashader rule)
    g = rz.raster_points(
        np.array([8.0, 1.0]), np.array([5.0, 0.0]), 14, 10, CANVAS["bounds"]
    )
    assert g[9, 13] == 1 and g[0, 0] == 1


def test_rasterize_point_aggs():
    px = np.array([1.1, 1.1, 7.9])
    py = np.array([0.1, 0.1, 4.9])
    w = np.array([2.0, 3.0, 7.0])
    s = rz.raster_points(px, py, 14, 10, CANVAS["bounds"], weights=w, agg="sum")
    assert s[0, 0] == 5.0 and s[9, 13] == 7.0
    m = rz.raster_points(px, py, 14, 10, CANVAS["bounds"], weights=w, agg="max")
    assert m[0, 0] == 3.0
    a = rz.raster_points(px, py, 14, 10, CANVAS["bounds"], agg="any")
    assert a.sum() == 2


def test_rasterize_errors_match_reference():
    # empty vector -> ValueError (reference: "Cannot infer spatialpandas
    # geometry type", test_datapipes_datashader.py:176-194)
    with pytest.raises(ValueError, match="Cannot infer"):
        rz.rasterize_geoms([], 14, 10, CANVAS["bounds"])
    # mixed / collection -> NotImplementedError ("Unsupported geometry
    # type", test_datapipes_datashader.py:155-173)
    with pytest.raises(NotImplementedError, match="Unsupported geometry type"):
        rz.rasterize_geoms([MULTIPOINT, LINE], 14, 10, CANVAS["bounds"])


def test_polygon_with_hole_fill():
    outer = wkb.polygon([(1.5, 0.5), (7.5, 0.5), (7.5, 4.5), (1.5, 4.5)])
    donut = {"type": "Polygon", "coords": outer["coords"] + [
        wkb.polygon([(3, 1.5), (6, 1.5), (6, 3.5), (3, 3.5)])["coords"][0]
    ]}
    full, _ = rz.rasterize_geoms([outer], 14, 10, CANVAS["bounds"])
    holed, _ = rz.rasterize_geoms([donut], 14, 10, CANVAS["bounds"])
    assert holed.sum() < full.sum()
    assert holed[5, 7] == 0  # center of hole empty


def test_tile_grid_and_assign():
    import pyarrow as pa

    tiles = rz.tile_grid_table(-180, -90, 180, 90, 4, 2, 64, 64)
    assert tiles.num_rows == 8
    batch = pa.table({"lon": [-170.0, 170.0, 0.0], "lat": [-80.0, 80.0, 0.1]})
    out = rz.assign_tiles(
        batch, lon0=-180, lat0=-90, lon1=180, lat1=90, nx=4, ny=2
    )
    assert out.column("tile_id").to_pylist() == [0, 7, 6]


def test_partial_histogram_matches_dense():
    rng = np.random.default_rng(3)
    import pyarrow as pa

    lon = rng.uniform(1, 8, 5000)
    lat = rng.uniform(0, 5, 5000)
    specs = {0: dict(width=14, height=10, xmin=1.0, ymin=0.0, xmax=8.0, ymax=5.0)}
    batch = pa.table({"lon": lon, "lat": lat,
                      "tile_id": np.zeros(len(lon), dtype=np.int64)})
    sparse = rz.partial_histogram(batch, tile_specs=specs)
    dense = rz.raster_points(lon, lat, 14, 10, (1, 0, 8, 5))[::-1]
    got = np.zeros((10, 14), dtype=np.int64)
    got[sparse.column("py").to_numpy(), sparse.column("px").to_numpy()] = (
        sparse.column("n").to_numpy()
    )
    assert np.array_equal(got, dense)


def test_weighted_histogram_matches_tile_rasterizer(ray_session):
    """Scale-path weighted sum == per-tile TileRasterizer agg='sum'."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray import api
    from zen3geo_ray.stages.rasterize import tile_grid_table

    rng = np.random.default_rng(19)
    n = 3000
    pts = pa.table({
        "lon": pa.array(rng.uniform(-179, 179, n), pa.float64()),
        "lat": pa.array(rng.uniform(-89, 89, n), pa.float64()),
        "w": pa.array(rng.integers(1, 10, n).astype(np.float64), pa.float64()),
    })
    specs = tile_grid_table(-180, -90, 180, 90, 4, 2, 8, 8)
    scale = (
        api.from_arrow(pts).assign_tiles(nx=4, ny=2)
        .rasterize_tiles(specs, agg="sum", value_col="w")
        .to_pandas()
    )
    small = (
        api.from_arrow(pts).assign_tiles(nx=4, ny=2)
        .rasterize_tiles(specs, agg="sum", value_col="w", small_grid=True)
        .to_pandas()
    )
    total_w = float(np.sum(pts.column("w").to_numpy()))
    got = {int(t): np.asarray(d, dtype=np.float64)
           for t, d in zip(scale["tile_id"], scale["data"])}
    exp = {int(t): np.asarray(d, dtype=np.float64)
           for t, d in zip(small["tile_id"], small["data"])}
    assert set(got) == set(exp)
    assert sum(g.sum() for g in got.values()) == total_w
    for t in got:
        assert (got[t] == exp[t]).all(), t


def test_rasterize_moment_aggs_dense():
    """mean/var/std dense kernels: population moments, NaN on empty
    pixels, exact values on a hand-checked layout."""
    px = np.array([1.1, 1.1, 1.1, 7.9])
    py = np.array([0.1, 0.1, 0.1, 4.9])
    w = np.array([2.0, 4.0, 6.0, 7.0])
    m = rz.raster_points(px, py, 14, 10, CANVAS["bounds"], weights=w, agg="mean")
    v = rz.raster_points(px, py, 14, 10, CANVAS["bounds"], weights=w, agg="var")
    s = rz.raster_points(px, py, 14, 10, CANVAS["bounds"], weights=w, agg="std")
    assert m[0, 0] == 4.0 and m[9, 13] == 7.0
    assert v[0, 0] == pytest.approx(8 / 3) and v[9, 13] == 0.0
    assert s[0, 0] == pytest.approx(np.sqrt(8 / 3)) and s[9, 13] == 0.0
    assert np.isnan(m[5, 5]) and np.isnan(v[5, 5]) and np.isnan(s[5, 5])


def test_moment_rasters_scale_path_matches_dense(ray_session):
    """partial moments + groupby-sum + finalize == the dense mean/var/std
    kernels, pixel for pixel (including the N-up flip)."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 4000
    lon = rng.uniform(1, 8, n)
    lat = rng.uniform(0, 5, n)
    w = rng.integers(1, 1000, n).astype(np.int64)
    specs = {0: dict(width=14, height=10, xmin=1.0, ymin=0.0, xmax=8.0, ymax=5.0)}
    tbl = pa.table({"lon": lon, "lat": lat, "w": w,
                    "tile_id": np.zeros(n, dtype=np.int64)})
    out = rz.moment_rasters(
        rd.from_arrow(tbl).repartition(5), specs, value_col="w"
    ).to_pandas()
    for stat in ("mean", "var", "std"):
        dense = rz.raster_points(
            lon, lat, 14, 10, (1, 0, 8, 5), weights=w.astype(np.float64),
            agg=stat,
        )[::-1]  # N-up
        got = np.full((10, 14), np.nan)
        got[out["py"].to_numpy(), out["px"].to_numpy()] = out[stat].to_numpy()
        both_nan = np.isnan(got) & np.isnan(dense)
        assert (both_nan | np.isclose(got, dense, rtol=1e-12, equal_nan=False)).all(), stat

    # dense assembler returns the same grid as the sparse finalize
    sparse = rd.from_arrow(tbl).map_batches(
        lambda b: rz.partial_moment_histogram(b, tile_specs=specs, value_col="w"),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Sum

    summed = sparse.groupby(["tile_id", "py", "px"]).aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s"),
        Sum("ss", alias_name="ss"),
    )
    specs_tbl = rz.tile_grid_table(1, 0, 8, 5, 1, 1, 14, 10)
    dense_rows = rz.assemble_moment_rasters(summed, specs_tbl, stat="mean").to_pandas()
    grid = np.asarray(dense_rows["data"].iloc[0], dtype=np.float64).reshape(10, 14)
    exp = rz.raster_points(lon, lat, 14, 10, (1, 0, 8, 5),
                           weights=w.astype(np.float64), agg="mean")[::-1]
    bn = np.isnan(grid) & np.isnan(exp)
    assert (bn | np.isclose(grid, exp, rtol=1e-12)).all()


def test_first_last_rasters_match_pandas(ray_session):
    """Per-pixel first/last winners (explicit order key) == a pandas
    groupby idxmin/idxmax reference."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(29)
    n = 3000
    df = pd.DataFrame({
        "lon": rng.uniform(1, 8, n),
        "lat": rng.uniform(0, 5, n),
        "ord": rng.permutation(n).astype(np.int64),
        "val": rng.integers(0, 100, n).astype(np.int64),
        "tile_id": np.zeros(n, dtype=np.int64),
    })
    specs = {0: dict(width=14, height=10, xmin=1.0, ymin=0.0, xmax=8.0, ymax=5.0)}
    for agg, keep in (("first", "first"), ("last", "last")):
        got = rz.first_last_rasters(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(5), specs,
            order_cols=["ord"], keep_cols=["val"], agg=agg,
        ).to_pandas().sort_values(["py", "px"]).reset_index(drop=True)
        ref = df.copy()
        ix = rz._bin(ref["lon"].to_numpy(), 1, 8, 14)
        iy = rz._bin(ref["lat"].to_numpy(), 0, 5, 10)
        ref["py"] = 10 - 1 - iy
        ref["px"] = ix
        exp = (
            ref.sort_values("ord", kind="mergesort")
            .drop_duplicates(["py", "px"], keep=keep)
            .sort_values(["py", "px"]).reset_index(drop=True)
        )
        assert got["val"].tolist() == exp["val"].tolist(), agg
        assert got["ord"].tolist() == exp["ord"].tolist(), agg


# --- regrid / warp ----------------------------------------------------------

def _sparse(rows):
    """rows: (tile_id, py, px, n) -> one-block sparse Dataset."""
    import pyarrow as pa
    import ray.data as rd

    t, p, x, n = (np.array([r[i] for r in rows], dtype=np.int64)
                  for i in range(4))
    return rd.from_arrow(pa.table({"tile_id": t, "py": p, "px": x, "n": n}))


SRC = {"x0": -180.0, "y0": -90.0, "x1": 180.0, "y1": 90.0,
       "nx": 8, "ny": 4, "px": 16}


def test_regrid_identity(ray_session):
    """Warping onto the source's own global grid reproduces every
    populated pixel (ty == global row-from-top, tx == global col)."""
    rows = [(0, 15, 0, 3), (7, 0, 15, 9), (29, 7, 3, 4), (12, 1, 14, 2)]
    dst = {"x0": -180.0, "y0": -90.0, "x1": 180.0, "y1": 90.0,
           "w": 8 * 16, "h": 4 * 16}
    out = (rz.regrid_nearest(_sparse(rows), src=SRC, dst=dst)
           .to_pandas().sort_values(["ty", "tx"]).reset_index(drop=True))
    exp = sorted(
        (((4 - 1 - t // 8) * 16 + p, (t % 8) * 16 + x, n)
         for t, p, x, n in rows))
    assert [tuple(r) for r in out[["ty", "tx", "n"]].to_numpy()] == exp


def test_regrid_coarsen_and_crop(ray_session):
    """2x-coarser target: each target pixel center samples exactly one
    source pixel; a crop window drops pixels outside it."""
    # tile 0 is the SW tile; pixel (py=15, px=0) is its SW corner pixel
    # covering lon [-180,-177.1875), lat [-90,-87.1875)
    rows = [(0, 15, 0, 7), (0, 15, 1, 5)]
    dst = {"x0": -180.0, "y0": -90.0, "x1": 180.0, "y1": 90.0,
           "w": 64, "h": 32}  # 2x coarser: centers at odd src-pixel mids
    out = (rz.regrid_nearest(_sparse(rows), src=SRC, dst=dst)
           .to_pandas().sort_values(["ty", "tx"]).reset_index(drop=True))
    # coarse pixel (ty=31, tx=0) center = (-177.1875, -88.59375):
    # lands in src gx=1 (value 5) — px0's value is skipped by nearest
    assert [tuple(r) for r in out[["ty", "tx", "n"]].to_numpy()] == [
        (31, 0, 5)]
    crop = {"x0": 0.0, "y0": 0.0, "x1": 180.0, "y1": 90.0, "w": 8, "h": 4}
    out2 = rz.regrid_nearest(_sparse(rows), src=SRC, dst=crop).to_pandas()
    assert len(out2) == 0  # sources are in the SW hemisphere


def test_regrid_cross_crs_bruteforce(ray_session):
    """EPSG:3857 target grid: every emitted pixel matches an
    independent per-center brute-force lookup (inverse mercator +
    plain-python source binning), and nothing is missing."""
    from zen3geo_ray.geom import crs

    rows = [(0, 15, 0, 3), (11, 4, 9, 8), (31, 0, 15, 6), (17, 8, 2, 1)]
    ext = 20037508.342789244
    # fine mercator grid (~1.4 deg pixels) so mid-latitude source pixels
    # catch several centers; the polar rows land outside +-66.5 lat and
    # drop — the brute force reproduces both behaviors
    dst = {"x0": -ext, "y0": -ext / 2, "x1": ext, "y1": ext / 2,
           "w": 256, "h": 128}
    out = (rz.regrid_nearest(
        _sparse(rows), src=SRC, dst=dst,
        inv_transform=lambda x, y: crs.transform_inverse(
            x, y, "EPSG:3857"))
        .to_pandas().sort_values(["ty", "tx"]).reset_index(drop=True))

    vals = {}
    for t, p, x, n in rows:
        vals[((t % 8) * 16 + x, (4 - 1 - t // 8) * 16 + p)] = n
    exp = []
    for ty in range(dst["h"]):
        for tx in range(dst["w"]):
            cx = dst["x0"] + (tx + 0.5) * (dst["x1"] - dst["x0"]) / dst["w"]
            cy = dst["y1"] - (ty + 0.5) * (dst["y1"] - dst["y0"]) / dst["h"]
            lon, lat = crs.transform_inverse(
                np.array([cx]), np.array([cy]), "EPSG:3857")
            gx = int(np.floor((lon[0] + 180.0) / (360.0 / 128)))
            gyt = int(np.floor((90.0 - lat[0]) / (180.0 / 64)))
            if (gx, gyt) in vals:
                exp.append((ty, tx, vals[(gx, gyt)]))
    assert [tuple(r) for r in out[["ty", "tx", "n"]].to_numpy()] == exp
    assert len(exp) > 0  # the golden actually exercises hits


def test_regrid_bilinear_constant_field(ray_session):
    """Bilinear over a CONSTANT fully-populated source region
    reproduces the constant at every interior target pixel (weights sum
    to 1), and a half-shifted grid interpolates exact midpoints."""
    # populate tile 0 (SW tile) entirely with value 10
    rows = [(0, py, px, 10) for py in range(16) for px in range(16)]
    # target = source grid shifted half a pixel: centers sit at source
    # pixel CORNERS -> every interior value is the average of 4 tens
    shift = 2.8125 / 2
    dst = {"x0": -180.0 + shift, "y0": -90.0 + shift,
           "x1": -135.0 + shift, "y1": -45.0 + shift, "w": 16, "h": 16}
    out = (rz.regrid_bilinear(_sparse(rows), src=SRC, dst=dst)
           .to_pandas())
    interior = out[(out["ty"] > 0) & (out["ty"] < 15)
                   & (out["tx"] < 15)]
    assert len(interior) > 100
    assert np.allclose(interior["val"].to_numpy(), 10.0)


def test_regrid_bilinear_single_pixel_weights(ray_session):
    """One populated source pixel: the 4 covering target pixels carry
    exactly the hand-computed bilinear weights."""
    # source pixel gx=1, gyt=62 (tile 0, px=1, py=14): lon center
    # -180 + 1.5*2.8125 = -175.78125, lat center = 90 - 62.5*2.8125
    rows = [(0, 14, 1, 8)]
    # target grid = source grid shifted a quarter pixel east/north
    q = 2.8125 / 4
    dst = {"x0": -180.0 + q, "y0": -90.0 + q,
           "x1": 180.0 + q, "y1": 90.0 + q, "w": 128, "h": 64}
    out = (rz.regrid_bilinear(_sparse(rows), src=SRC, dst=dst)
           .to_pandas().sort_values(["ty", "tx"]).reset_index(drop=True))
    # fractional offset: dx = 0.75, dy = 0.25 for the SW-covering target
    got = {(r.ty, r.tx): r.val for r in out.itertuples()}
    v = 8.0
    # target centers at source-fractional (дx, dy): four hits around
    # (gx=1, gyt=62); weights (1-dx)(1-dy) etc. with dx=.75, dy=.25
    assert len(got) == 4
    tot = sum(got.values())
    assert abs(tot - v) < 1e-12  # weights over the 4 targets sum to 1
    vals = sorted(got.values())
    exp = sorted([v * 0.75 * 0.25, v * 0.25 * 0.25,
                  v * 0.75 * 0.75, v * 0.25 * 0.75])
    assert np.allclose(vals, exp)


def test_regrid_average_blocks(ray_session):
    """4x4 downsample: each coarse cell averages exactly its present
    source pixels; empty cells emit nothing; npix counts contributors."""
    # tile 0 pixels (py=15..12, px=0..3) tile the SW-most 4x4 source
    # block (global gyt 60..63, gx 0..3) -> ONE 16x-coarser target cell
    rows = [(0, 15, 0, 8), (0, 15, 1, 4), (0, 14, 0, 1), (0, 12, 3, 7),
            # a second populated cell: tile 29 pixel -> lone contributor
            (29, 7, 3, 9)]
    dst = {"x0": -180.0, "y0": -90.0, "x1": 180.0, "y1": 90.0,
           "w": 32, "h": 16}  # 4x4 source pixels per target cell
    out = (rz.regrid_average(_sparse(rows), src=SRC, dst=dst)
           .to_pandas().sort_values(["ty", "tx"]).reset_index(drop=True))
    # tile 29 = row 3 from S (ty-block top), col 5: gx=5*16+3=83,
    # gyt=(4-1-3)*16+7=7 -> cell (ty=7//4=1, tx=83//4=20)
    got = [tuple(r) for r in out[["ty", "tx", "npix", "val"]].to_numpy()]
    assert got == [(1.0, 20.0, 1.0, 9.0),
                   (15.0, 0.0, 4.0, (8 + 4 + 1 + 7) / 4.0)]


def test_regrid_average_crop_drops_outside(ray_session):
    rows = [(0, 15, 0, 7)]  # SW corner pixel
    crop = {"x0": 0.0, "y0": 0.0, "x1": 180.0, "y1": 90.0, "w": 8, "h": 4}
    out = rz.regrid_average(_sparse(rows), src=SRC, dst=crop).to_pandas()
    assert len(out) == 0


def test_regrid_average_cross_crs_forward(ray_session):
    """fwd_transform projects SOURCE centers into the dst CRS before
    binning — brute-force per-pixel check on a mercator target."""
    from zen3geo_ray.geom import crs

    rows = [(11, 4, 9, 8), (17, 8, 2, 1), (12, 1, 14, 2)]
    ext = 20037508.342789244
    dst = {"x0": -ext, "y0": -ext / 2, "x1": ext, "y1": ext / 2,
           "w": 64, "h": 32}
    fwd = lambda lon, lat: crs.transform(lon, lat, "EPSG:3857")
    out = (rz.regrid_average(_sparse(rows), src=SRC, dst=dst,
                             fwd_transform=fwd)
           .to_pandas().sort_values(["ty", "tx"]).reset_index(drop=True))
    cells = {}
    for t, p, x, n in rows:
        gx, gyt = (t % 8) * 16 + x, (4 - 1 - t // 8) * 16 + p
        lon = -180.0 + (gx + 0.5) * (360.0 / 128)
        lat = 90.0 - (gyt + 0.5) * (180.0 / 64)
        X, Y = crs.transform(np.array([lon]), np.array([lat]),
                             "EPSG:3857")
        tx = int(np.floor((X[0] - dst["x0"]) / ((2 * ext) / 64)))
        ty = int(np.floor((dst["y1"] - Y[0]) / (ext / 32)))
        if 0 <= tx < 64 and 0 <= ty < 32:
            s, c = cells.get((ty, tx), (0, 0))
            cells[(ty, tx)] = (s + n, c + 1)
    exp = sorted((ty, tx, c, s / c) for (ty, tx), (s, c) in cells.items())
    got = [(int(r.ty), int(r.tx), int(r.npix), float(r.val))
           for r in out.itertuples()]
    assert got == exp and len(exp) > 0


def test_focal_stats_golden(ray_session):
    """Hand-checked 3x3 focal window on a 4x4 tile with three touched
    pixels (0,0)=5, (1,1)=7, (3,3)=2: the corner sees {5,7}, the center
    sees {5,7}, (3,3) is isolated; a second tile must NOT bleed in."""
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.rasterize import focal_stats

    sparse = rd.from_arrow(pa.table({
        "tile_id": pa.array([0, 0, 0, 1], pa.int64()),
        "py": pa.array([0, 1, 3, 0], pa.int64()),
        "px": pa.array([0, 1, 3, 0], pa.int64()),
        "n": pa.array([5, 7, 2, 9], pa.int64()),
    }))
    out = focal_stats(sparse, px_size=4, radius=1, n_buckets=2) \
        .to_pandas().sort_values(["tile_id", "py", "px"]) \
        .reset_index(drop=True)
    rows = {(int(r.tile_id), int(r.py), int(r.px)):
            (int(r.n), int(r.focal_n), int(r.focal_cnt),
             int(r.focal_max), float(r.focal_mean))
            for r in out.itertuples()}
    assert len(rows) == 4
    assert rows[(0, 0, 0)] == (5, 12, 2, 7, 6.0)
    assert rows[(0, 1, 1)] == (7, 12, 2, 7, 6.0)
    assert rows[(0, 3, 3)] == (2, 2, 1, 2, 2.0)
    assert rows[(1, 0, 0)] == (9, 9, 1, 9, 9.0)


def test_focal_stats_radius2(ray_session):
    """radius=2: (0,0) now reaches (1,1) AND (2,2)."""
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.rasterize import focal_stats

    sparse = rd.from_arrow(pa.table({
        "tile_id": pa.array([0, 0, 0], pa.int64()),
        "py": pa.array([0, 1, 2], pa.int64()),
        "px": pa.array([0, 1, 2], pa.int64()),
        "n": pa.array([1, 10, 100], pa.int64()),
    }))
    out = focal_stats(sparse, px_size=8, radius=2, n_buckets=2).to_pandas()
    rows = {(int(r.py), int(r.px)): (int(r.focal_n), int(r.focal_cnt))
            for r in out.itertuples()}
    assert rows[(0, 0)] == (111, 3)
    assert rows[(1, 1)] == (111, 3)
    assert rows[(2, 2)] == (111, 3)


def test_focal_conv_sobel_golden(ray_session):
    """Single pixel v=1 at (2,2): Sobel responses at its neighbors are
    the (negated-offset) kernel weights; the center reads 0 on both
    axes.  Convention: conv(p) = sum w * v(p + off), so the response
    appears at p = src - off."""
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.rasterize import focal_conv

    gx = {(-1, -1): -1, (0, -1): -2, (1, -1): -1,
          (-1, 1): 1, (0, 1): 2, (1, 1): 1}
    sparse = rd.from_arrow(pa.table({
        "tile_id": pa.array([0], pa.int64()),
        "py": pa.array([2], pa.int64()),
        "px": pa.array([2], pa.int64()),
        "n": pa.array([1], pa.int64()),
    }))
    out = focal_conv(sparse, px_size=5, kernels={"gx": gx},
                     n_buckets=2).to_pandas()
    # only the touched pixel itself remains after the marker filter
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.py), int(r.px), int(r.n), int(r.gx)) == (2, 2, 1, 0)


def test_focal_conv_two_kernels_one_pass(ray_session):
    """A 2-pixel ramp: identity kernel returns the pixel, shift kernel
    returns the right neighbor; both from one scatter pass."""
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.rasterize import focal_conv

    sparse = rd.from_arrow(pa.table({
        "tile_id": pa.array([0, 0], pa.int64()),
        "py": pa.array([0, 0], pa.int64()),
        "px": pa.array([0, 1], pa.int64()),
        "n": pa.array([3, 5], pa.int64()),
    }))
    out = focal_conv(
        sparse, px_size=4,
        kernels={"ident": {(0, 0): 1}, "right": {(0, 1): 1}},
        n_buckets=2).to_pandas().sort_values("px").reset_index(drop=True)
    assert out["ident"].tolist() == [3, 5]
    assert out["right"].tolist() == [5, 0]


def test_band_normalized_diff_golden(ray_session):
    """Two bands in one pixel: ndi = (a-b)/(a+b); single-band pixels
    hit ±1; untouched pixels never emit."""
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.rasterize import band_normalized_diff

    spec = {0: {"width": 4, "height": 4, "xmin": 0.0, "xmax": 4.0,
                "ymin": 0.0, "ymax": 4.0}}
    rows = (
        [(0.5, 0.5, "en")] * 3 + [(0.5, 0.5, "de")] * 1   # pixel (0,0)
        + [(2.5, 2.5, "de")] * 2                          # de only
        + [(3.5, 3.5, "fr")] * 5                          # ignored band
    )
    t = pa.table({
        "tile_id": pa.array([0] * len(rows), pa.int64()),
        "lon": pa.array([r[0] for r in rows], pa.float64()),
        "lat": pa.array([r[1] for r in rows], pa.float64()),
        "lang": pa.array([r[2] for r in rows]),
    })
    out = band_normalized_diff(rd.from_arrow(t).repartition(3), spec,
                               band_col="lang", band_a="en",
                               band_b="de", n_buckets=2).to_pandas()
    out = out.set_index(["py", "px"]).sort_index()
    # (0.5,0.5) -> ix=0, iy=0 -> py = 3
    assert (int(out.loc[(3, 0), "a"]), int(out.loc[(3, 0), "b"])) == (3, 1)
    assert out.loc[(3, 0), "ndi"] == 0.5
    assert out.loc[(1, 2), "ndi"] == -1.0
    assert len(out) == 2  # fr-only pixel absent


def test_histogram_equalize_golden(ray_session):
    """Textbook remap: values {1:4px, 2:2px, 3:2px} -> cdf {4,6,8},
    cmin=4, eq = (cdf-4)*255 // 4 -> {0, 127, 255}."""
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.rasterize import histogram_equalize

    n = [1, 1, 1, 1, 2, 2, 3, 3]
    t = pa.table({
        "tile_id": pa.array([0] * 8, pa.int64()),
        "py": pa.array(list(range(8)), pa.int64()),
        "px": pa.array([0] * 8, pa.int64()),
        "n": pa.array(n, pa.int64()),
    })
    out = histogram_equalize(rd.from_arrow(t).repartition(3),
                             n_buckets=2).to_pandas()
    got = dict(zip(out["n"], out["eq"]))
    assert got == {1: 0, 2: 127, 3: 255}

    # degenerate single value -> all zeros
    t1 = pa.table({"tile_id": pa.array([0, 0], pa.int64()),
                   "py": pa.array([0, 1], pa.int64()),
                   "px": pa.array([0, 0], pa.int64()),
                   "n": pa.array([7, 7], pa.int64())})
    out1 = histogram_equalize(rd.from_arrow(t1)).to_pandas()
    assert (out1["eq"] == 0).all()


def test_write_density_tiles(ray_session, tmp_path):
    """Slippy-tile PNG pyramid sink: per-pixel counts round-trip
    through the PNG codec, North-up rows, multi-level totals conserved,
    re-run byte-identical (idempotent heal)."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.geom import cells
    from zen3geo_ray.sources.png import read_png
    from zen3geo_ray.stages.rasterize import write_density_tiles

    rng = np.random.default_rng(9)
    lon = rng.uniform(-170, 170, 3000)
    lat = rng.uniform(-80, 80, 3000)
    res = 6
    t = pa.table({"cell": pa.array(cells.cell_of(lon, lat, res),
                                   pa.int64())})
    out = str(tmp_path / "tiles")
    man = write_density_tiles(
        rd.from_arrow(t).repartition(4), out, res=res, deltas=[0, 3],
        tile_px=64, cap=4, n_buckets=4).to_pandas()
    assert sorted(man["level"].unique()) == [3, 6]
    assert int(man[man.level == 6]["total"].sum()) == 3000
    assert int(man[man.level == 3]["total"].sum()) == 3000

    # pixel-exact check on one level-6 tile
    row = man[man.level == 6].iloc[0]
    img = read_png(open(row["path"], "rb").read())
    img = img[:, :, 0] if img.ndim == 3 else img
    c = cells.cell_of(lon, lat, res)
    ncols = 2 << res
    py, px = c // ncols, c % ncols
    in_tile = ((px // 64 == row["tx"]) & (py // 64 == row["ty"]))
    import collections
    want = collections.Counter(
        zip(px[in_tile].tolist(), py[in_tile].tolist()))
    for (qx, qy), n in want.items():
        r = 64 - 1 - (qy - row["ty"] * 64)
        assert img[r, qx - row["tx"] * 64] == min(n, 4) * 255 // 4
    assert int((img > 0).sum()) == len(want)

    # idempotent heal: re-run rewrites byte-identical files
    before = {p: open(p, "rb").read() for p in man["path"]}
    write_density_tiles(
        rd.from_arrow(t).repartition(2), out, res=res, deltas=[0, 3],
        tile_px=64, cap=4, n_buckets=2).materialize()
    for p, by in before.items():
        assert open(p, "rb").read() == by
