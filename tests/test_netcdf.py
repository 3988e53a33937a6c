"""NetCDF classic (CDF-1) reader — the other half of the
XpySTACAssetReader datacube pair (zarr covered in test_zarrlite.py)."""

import numpy as np
import pytest

from zen3geo_ray.sources import netcdf as nc


def _store(tmp_path, dtype=np.float32):
    rng = np.random.default_rng(29)
    temp = rng.integers(200, 320, (6, 4, 5)).astype(dtype)  # (time, y, x)
    lat = np.linspace(-30, 30, 4).astype(np.float64)
    lon = np.linspace(0, 40, 5).astype(np.float64)
    p = str(tmp_path / "cube.nc")
    nc.write_netcdf(
        p,
        dims={"time": None, "y": 4, "x": 5},
        variables={
            "lat": (["y"], lat),
            "lon": (["x"], lon),
            "temp": (["time", "y", "x"], temp),
        },
        attrs={"crs": "EPSG:4326"},
    )
    return p, temp, lat, lon


def test_netcdf_header_and_fixed_vars(tmp_path):
    p, temp, lat, lon = _store(tmp_path)
    data = open(p, "rb").read()
    meta = nc.netcdf_meta(data)
    assert meta["numrecs"] == 6
    assert dict(meta["dims"]) == {"time": 0, "y": 4, "x": 5}
    assert meta["attrs"]["crs"] == "EPSG:4326"
    assert meta["vars"]["temp"]["record"] is True
    assert meta["vars"]["temp"]["shape"] == [6, 4, 5]
    assert np.array_equal(nc.read_netcdf_var(data, "lat"), lat)
    assert np.array_equal(nc.read_netcdf_var(data, "lon"), lon)


def test_netcdf_record_var_roundtrip(tmp_path):
    p, temp, _, _ = _store(tmp_path)
    data = open(p, "rb").read()
    got = nc.read_netcdf_var(data, "temp")
    assert got.shape == (6, 4, 5)
    assert np.array_equal(got, temp)
    sl = nc.read_netcdf_var(data, "temp", (2, 5))
    assert np.array_equal(sl, temp[2:5])


def test_netcdf_slab_dataset_stacking(ray_session, tmp_path):
    """Distributed record slabs reassemble the cube and feed
    stack_series exactly like the zarr datacube leg."""
    p, temp, _, _ = _store(tmp_path, dtype=np.float64)
    ds = nc.netcdf_slab_dataset(p, "temp", recs_per_slab=2)
    out = np.full((6, 4, 5), np.nan)
    import pyarrow as pa

    for b in ds.iter_batches(batch_format="pyarrow"):
        b = pa.table(b) if not isinstance(b, pa.Table) else b
        for r in range(b.num_rows):
            r0 = b.column("rec0")[r].as_py()
            n = b.column("nrec")[r].as_py()
            vals = np.asarray(b.column("data")[r].as_py()).reshape(n, 4, 5)
            out[r0:r0 + n] = vals
    assert np.array_equal(out, temp)


def test_netcdf_error_paths(tmp_path):
    with pytest.raises(ValueError, match="CDF magic"):
        nc.netcdf_meta(b"NOPE" + b"\0" * 64)
    with pytest.raises(NotImplementedError, match="HDF5"):
        nc.netcdf_meta(b"\x89HDF\r\n\x1a\n" + b"\0" * 64)
    p, _, _, _ = _store(tmp_path)
    with pytest.raises(ValueError, match="fixed variable"):
        nc.netcdf_slab_dataset(p, "lat")


# --- NetCDF-4 / HDF5-lite (sources/hdf5lite.py, round-4 verdict 7) --------


def _h5_store(tmp_path, **kw):
    from zen3geo_ray.sources.hdf5lite import write_hdf5

    rng = np.random.default_rng(17)
    temp = rng.normal(280.0, 8.0, size=(11, 4, 5))
    lat = np.linspace(-60, 60, 4)
    p = str(tmp_path / "cube.h5")
    write_hdf5(p, {
        "temp": (temp, {"units": "K", "scale_factor": 0.5,
                        "valid_range": [200, 320]}),
        "lat": lat.astype(np.float64),
        "count": rng.integers(0, 9, size=(4, 5)).astype(np.int32),
    }, **kw)
    return p, temp, lat


@pytest.mark.parametrize("kw", [
    {},                                               # all contiguous
    {"chunks": {"temp": (3, 4, 5)}},                  # chunked raw
    {"chunks": {"temp": (4, 2, 3)}, "compress": True},
    {"chunks": {"temp": (5, 4, 5)}, "compress": True, "shuffle": True},
])
def test_hdf5_roundtrip_layouts(tmp_path, kw):
    from zen3geo_ray.sources.hdf5lite import read_hdf5_meta, read_hdf5_var

    p, temp, lat = _h5_store(tmp_path, **kw)
    data = open(p, "rb").read()
    m = read_hdf5_meta(data)
    assert set(m["datasets"]) == {"temp", "lat", "count"}
    a = m["datasets"]["temp"]["attrs"]
    assert a["units"] == "K" and a["scale_factor"] == 0.5
    assert a["valid_range"] == [200, 320]
    np.testing.assert_array_equal(read_hdf5_var(data, m, "temp"), temp)
    np.testing.assert_array_equal(read_hdf5_var(data, m, "lat"), lat)
    np.testing.assert_array_equal(
        read_hdf5_var(data, m, "temp", rec_range=(2, 8)), temp[2:8])


def test_netcdf4_slab_dataset_dispatch(ray_session, tmp_path):
    """netcdf_slab_dataset auto-dispatches on the HDF5 magic and
    yields the identical (rec0, nrec, data) slab contract; chunked
    tasks read only their slab's chunks."""
    p, temp, _ = _h5_store(tmp_path,
                           chunks={"temp": (3, 4, 5)}, compress=True)
    ds = nc.netcdf_slab_dataset(p, "temp", recs_per_slab=4)
    out = np.zeros_like(temp)
    for b in ds.iter_batches(batch_format="pyarrow"):
        for r in range(b.num_rows):
            r0 = b.column("rec0")[r].as_py()
            n = b.column("nrec")[r].as_py()
            out[r0:r0 + n] = np.asarray(
                b.column("data")[r].as_py()).reshape(n, 4, 5)
    np.testing.assert_array_equal(out, temp)


def test_hdf5_loud_rejections(tmp_path):
    from zen3geo_ray.sources import hdf5lite as h5

    with pytest.raises(ValueError, match="bad signature"):
        h5.read_hdf5_meta(b"NOPE" + b"\0" * 64)
    # unsupported superblock version fails loudly
    bad = bytearray(h5._SIG) + bytes([7]) + b"\0" * 80
    with pytest.raises(NotImplementedError, match="superblock"):
        h5.read_hdf5_meta(bytes(bad))
    # unsupported filter id fails loudly
    p, _, _ = _h5_store(tmp_path, chunks={"temp": (3, 4, 5)})
    data = bytearray(open(p, "rb").read())
    # no filters in this file; fabricate a filter message check directly
    with pytest.raises(NotImplementedError, match="filters"):
        h5._parse_filters(bytes([1, 1]) + b"\0" * 6
                          + np.uint16(32000).tobytes()
                          + b"\0\0" + b"\0\0" + np.uint16(0).tobytes())
