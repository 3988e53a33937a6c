"""Zarr-v2-lite datacube source (round-3 verdict #9 — the
XpySTACAssetReader engine='zarr' analog, xpystac.py:135-139)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from zen3geo_ray.sources import zarrlite as z


def _cube(t=5, h=7, w=11, dtype=np.float32, seed=2):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 99, (t, h, w)).astype(dtype)


def _reassemble(ds, shape):
    out = np.full(shape, np.nan)
    for b in ds.iter_batches(batch_format="pyarrow"):
        b = pa.table(b) if not isinstance(b, pa.Table) else b
        for r in range(b.num_rows):
            o = [b.column(f"o{d}")[r].as_py() for d in range(len(shape))]
            n = [b.column(f"n{d}")[r].as_py() for d in range(len(shape))]
            v = np.asarray(b.column("data")[r].as_py()).reshape(n)
            out[tuple(slice(o[d], o[d] + n[d]) for d in range(len(shape)))] = v
    return out


@pytest.mark.parametrize("compressor", ["zlib", None])
def test_zarr_roundtrip_chunks(ray_session, tmp_path, compressor):
    arr = _cube(dtype=np.float32)
    store = str(tmp_path / "cube.zarr")
    z.write_zarr(store, arr, chunks=[2, 4, 4], compressor=compressor)
    meta = z.read_zarr_meta(store)
    assert meta["shape"] == [5, 7, 11] and meta["chunks"] == [2, 4, 4]
    got = _reassemble(z.zarr_chunk_dataset(store), arr.shape)
    assert np.array_equal(got, arr.astype(np.float64))


def test_zarr_missing_chunk_is_fill_value(ray_session, tmp_path):
    arr = _cube(t=2, h=4, w=4, dtype=np.int16)
    arr[:, 2:, 2:] = 0  # one all-zero chunk gets skipped by the writer
    store = str(tmp_path / "sparse.zarr")
    z.write_zarr(store, arr, chunks=[2, 2, 2], skip_fill_chunks=True)
    got = _reassemble(z.zarr_chunk_dataset(store), arr.shape)
    assert np.array_equal(got, arr.astype(np.float64))


def test_zarr_group_and_attrs(ray_session, tmp_path):
    arr = _cube(t=2, h=3, w=3)
    store = str(tmp_path / "grp.zarr")
    z.write_zarr(store, arr, chunks=[1, 3, 3], array="ndvi",
                 attrs={"res": 10.0, "crs": "EPSG:32631"})
    meta = z.read_zarr_meta(store)  # single array: auto-discovered
    assert meta["attrs"]["crs"] == "EPSG:32631"
    got = _reassemble(z.zarr_chunk_dataset(store, "ndvi"), arr.shape)
    assert np.array_equal(got, arr.astype(np.float64))
    with pytest.raises(NotImplementedError, match="compressor"):
        bad = str(tmp_path / "bad.zarr")
        z.write_zarr(bad, arr, chunks=[1, 3, 3])
        m = json.load(open(bad + "/.zarray"))
        m["compressor"] = {"id": "blosc"}
        json.dump(m, open(bad + "/.zarray", "w"))
        z.read_zarr_meta(bad)


def test_zarr_stacking_pipeline(ray_session, tmp_path):
    """The stacking-walkthrough shape from a zarr store: datacube ->
    per-timestep tile rows -> stack_series rebuilds each tile's time
    series in t order (StackSTACStacker recast)."""
    from zen3geo_ray.stages.stack import stack_series

    arr = _cube(t=4, h=6, w=6, dtype=np.float64, seed=7)
    store = str(tmp_path / "stack.zarr")
    z.write_zarr(store, arr, chunks=[2, 3, 3])

    slices = z.datacube_slices(store)
    stacked = stack_series(slices, ["y0", "x0"], ["t"], "values",
                           n_buckets=4).to_pandas()
    assert len(stacked) == 4  # 2x2 tile grid
    assert set(stacked["n_layers"]) == {4}
    row = stacked[(stacked.y0 == 0) & (stacked.x0 == 3)].iloc[0]
    series = np.asarray([np.asarray(v) for v in row["values_stack"]])
    want = arr[:, 0:3, 3:6].reshape(4, -1)
    assert np.array_equal(series, want)  # t-ordered, content-exact


def test_write_zarr_dataset_roundtrip_and_resume(ray_session, tmp_path):
    """Distributed sink: chunk rows from store A write store B; B reads
    back identical.  Resumability: delete one chunk file, re-run the
    write, the store heals (idempotent per-chunk files)."""
    import os

    arr = _cube(t=4, h=6, w=10, dtype=np.float64, seed=21)
    src = str(tmp_path / "src.zarr")
    z.write_zarr(src, arr, chunks=[2, 3, 5])
    dst = str(tmp_path / "dst.zarr")
    tiles = z.zarr_chunk_dataset(src)
    z.write_zarr_dataset(tiles, dst, shape=[4, 6, 10], chunks=[2, 3, 5],
                         attrs={"crs": "EPSG:4326"})
    got = _reassemble(z.zarr_chunk_dataset(dst), arr.shape)
    assert np.array_equal(got, arr)
    assert z.read_zarr_meta(dst)["attrs"]["crs"] == "EPSG:4326"

    os.remove(os.path.join(dst, "0.0.0"))
    z.write_zarr_dataset(z.zarr_chunk_dataset(src), dst,
                         shape=[4, 6, 10], chunks=[2, 3, 5])
    got = _reassemble(z.zarr_chunk_dataset(dst), arr.shape)
    assert np.array_equal(got, arr)

    # misaligned offsets fail loudly
    import pyarrow as _pa
    import ray.data as rd

    bad = rd.from_arrow(_pa.table({
        "o0": [1], "o1": [0], "o2": [0],
        "n0": [1], "n1": [3], "n2": [5],
        "data": [np.zeros(15)],
    }))
    with pytest.raises(Exception, match="chunk-aligned"):
        z.write_zarr_dataset(bad, str(tmp_path / "bad.zarr"),
                             shape=[4, 6, 10], chunks=[2, 3, 5])
