"""Per-record raster math + TileRasterizer parity tests."""

import numpy as np
import pyarrow as pa
import pytest

from zen3geo_ray.functions import raster_math as rm
from zen3geo_ray.pipelines.walkthroughs import geobox_to_imgbox
from zen3geo_ray.stages import rasterize as rz


def test_linear_to_decibel_masks_nonpositive():
    out = rm.linear_to_decibel([100.0, 1.0, 0.0, -5.0])
    assert out[0] == pytest.approx(20.0)
    assert out[1] == pytest.approx(0.0)
    assert np.isnan(out[2]) and np.isnan(out[3])


def test_normalize_lon():
    out = rm.normalize_lon([0.0, 180.0, 359.0, 360.0, 45.0])
    assert out.tolist() == [0.0, -180.0, -1.0, 0.0, 45.0]


def test_imgbox_geobox_roundtrip():
    batch = pa.table(
        {
            "bminx": [10.0],
            "bminy": [18.0],
            "bmaxx": [42.0],
            "bmaxy": [50.0],
            "width": pa.array([128], pa.int32()),
            "height": pa.array([128], pa.int32()),
            "cminx": [12.0],
            "cminy": [40.0],
            "cmaxx": [20.0],
            "cmaxy": [46.0],
        }
    )
    img = geobox_to_imgbox(batch)
    geo = rm.imgbox_to_geobox(img)
    r = geo.to_pylist()[0]
    assert r["gminx"] == pytest.approx(12.0)
    assert r["gminy"] == pytest.approx(40.0)
    assert r["gmaxx"] == pytest.approx(20.0)
    assert r["gmaxy"] == pytest.approx(46.0)


def test_tile_rasterizer_matches_sparse_assembly():
    rng = np.random.default_rng(9)
    n = 3000
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    specs = rz.tile_grid_table(-180, -90, 180, 90, 4, 2, 16, 16)
    batch = pa.table({"lon": lon, "lat": lat})
    tiled = rz.assign_tiles(batch, lon0=-180, lat0=-90, lon1=180, lat1=90, nx=4, ny=2)
    rasterizer = rz.TileRasterizer(tile_specs=specs)
    lookup = {int(r["tile_id"]): r for r in specs.to_pylist()}
    sparse = rz.partial_histogram(tiled, tile_specs=lookup)
    # dense per tile from both paths must agree
    sp = sparse.to_pandas()
    for tid in range(8):
        grp = tiled.filter(pa.array(tiled.column("tile_id").to_numpy(zero_copy_only=False) == tid))
        dense = np.asarray(rasterizer(grp).column("data").to_pylist()[0]).reshape(16, 16)
        got = np.zeros((16, 16), dtype=np.int64)
        sel = sp[sp.tile_id == tid]
        got[sel.py.to_numpy(), sel.px.to_numpy()] = sel.n.to_numpy()
        assert np.array_equal(got, dense)


def test_tile_rasterizer_weighted_sum():
    specs = rz.tile_grid_table(-180, -90, 180, 90, 1, 1, 8, 8)
    batch = pa.table(
        {
            "lon": [-170.0, -170.0, 100.0],
            "lat": [-85.0, -85.0, 80.0],
            "tile_id": pa.array([0, 0, 0], pa.int64()),
            "v": [1.5, 2.5, 7.0],
        }
    )
    r = rz.TileRasterizer(tile_specs=specs, agg="sum", value_col="v")
    grid = np.asarray(r(batch).column("data").to_pylist()[0]).reshape(8, 8)
    assert grid.sum() == pytest.approx(11.0)
    assert grid[7, 0] == pytest.approx(4.0)  # south-west after N-up flip
    with pytest.raises(ValueError, match="needs value_col"):
        rz.TileRasterizer(tile_specs=specs, agg="sum")
