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


def test_ahash_groups_golden(ray_session):
    """Two identical tiles group together; hash bits land in the right
    int64 halves (cross-multiplied mean predicate, no division)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.multimodal import ahash_groups

    # tile 0 and tile 7: single hot 2x2 cell at cell (py<2, px<2) ->
    # cell index 0; total = 40, cell sum = 40 -> 40*64 > 40 -> bit 0
    # tile 3: hot cell at py=2..3,px=0..1 -> cell index 8 (row 1)
    rows = []
    for t in (0, 7):
        rows += [(t, 0, 0, 10), (t, 0, 1, 10), (t, 1, 0, 10), (t, 1, 1, 10)]
    rows += [(3, 2, 0, 10), (3, 3, 1, 30)]
    # tile 5: uniform across two cells -> both bits 0 (equal means,
    # strict > fails: s*64 = 32*64 ... total 64 -> 32*64>64 true!)
    # pick: two cells each sum 32, total 64 -> 32*64 > 64 -> both set
    rows += [(5, 0, 4, 32), (5, 0, 6, 32)]
    t = pa.table({
        "tile_id": pa.array([r[0] for r in rows], pa.int64()),
        "py": pa.array([r[1] for r in rows], pa.int64()),
        "px": pa.array([r[2] for r in rows], pa.int64()),
        "n": pa.array([r[3] for r in rows], pa.int64()),
    })
    out = ahash_groups(rd.from_arrow(t).repartition(3), px_size=16,
                       grid=8, n_buckets=4).to_pandas() \
        .set_index("tile_id").sort_index()
    # tiles 0 and 7: bit 0 set -> hash_lo = 1, hash_hi = 0, same group
    assert out.loc[0, "hash_lo"] == 1 and out.loc[0, "hash_hi"] == 0
    assert out.loc[7, "hash_lo"] == 1
    assert out.loc[0, "rep_tile"] == 0 and out.loc[7, "rep_tile"] == 0
    assert out.loc[0, "n_same"] == 2 and out.loc[7, "n_same"] == 2
    # tile 3: cell 8 -> hash_lo = 1 << 8 = 256, alone
    assert out.loc[3, "hash_lo"] == 256 and out.loc[3, "n_same"] == 1
    # tile 5: cells 2 and 3 (px 4..5 -> cell 2, px 6..7 -> cell 3)
    assert out.loc[5, "hash_lo"] == (1 << 2) + (1 << 3)
    assert out.loc[5, "n_same"] == 1
