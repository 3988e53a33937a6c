"""Pure-numpy GeoTIFF codec round-trips + real-decode pipeline."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from zen3geo_ray.sources import geotiff as gt
from zen3geo_ray.sources.geotiff import (
    read_geotiff,
    scene_tensor_from_geotiff,
    write_geotiff,
)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.float32])
@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_strips(dtype, compress):
    rng = np.random.default_rng(3)
    if np.issubdtype(dtype, np.floating):
        arr = rng.standard_normal((2, 13, 17)).astype(dtype)
    else:
        arr = rng.integers(0, 100, (2, 13, 17)).astype(dtype)
    blob = write_geotiff(arr, minx=10.5, maxy=50.25, res=0.25,
                         compress=compress)
    g = read_geotiff(blob)
    assert (g["bands"], g["height"], g["width"]) == (2, 13, 17)
    assert g["data"].dtype == dtype
    assert (g["data"] == arr).all()
    assert (g["minx"], g["maxy"], g["res"]) == (10.5, 50.25, 0.25)


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_tiled_cog_layout(compress):
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, (3, 33, 47)).astype(np.uint8)
    blob = write_geotiff(arr, minx=-1.0, maxy=2.0, res=0.1,
                         compress=compress, tiled=True, tile=16)
    g = read_geotiff(blob)
    assert (g["data"] == arr).all()
    assert g["bands"] == 3


def test_single_band_2d_and_errors():
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    g = read_geotiff(write_geotiff(arr))
    assert (g["data"][0] == arr).all()
    with pytest.raises(ValueError):
        read_geotiff(b"PK\x03\x04 not a tiff")


def test_scene_tensor_from_geotiff_to_chips(ray_session):
    """REAL decode -> real chip tensors: GeoTIFF payloads through the
    decode stage into slice_chip_tensors (reference op #1 -> op #12)."""
    from zen3geo_ray.stages.chips import slice_chip_tensors

    rng = np.random.default_rng(5)
    scenes = []
    for sid in range(2):
        arr = rng.integers(0, 1000, (1, 32, 32)).astype(np.uint16)
        scenes.append({"scene_id": sid,
                       "tiff": write_geotiff(arr, minx=0.0, maxy=3.2,
                                             res=0.1, compress=True),
                       "arr": arr})
    tbl = pa.table({
        "scene_id": pa.array([s["scene_id"] for s in scenes], pa.int64()),
        "tiff": pa.array([s["tiff"] for s in scenes], pa.binary()),
    })
    tensors = rd.from_arrow(tbl).map_batches(
        scene_tensor_from_geotiff, batch_format="pyarrow", batch_size=1
    )
    chips = tensors.map_batches(
        lambda b: slice_chip_tensors(b, chip_h=16, chip_w=16),
        batch_format="pyarrow",
    ).to_pandas()
    assert len(chips) == 2 * 4  # two 32x32 scenes -> four 16x16 chips each
    row = chips[(chips.scene_id == 1) & (chips.chip_y == 1)
                & (chips.chip_x == 0)].iloc[0]
    got = np.asarray(row["data"], dtype=np.float32).reshape(16, 16)
    exp = scenes[1]["arr"][0, 16:32, 0:16].astype(np.float32)
    assert (got == exp).all()


def test_writer_bytes_follow_tiff_spec():
    """Structural check against the TIFF 6.0 spec (not a mirror of the
    reader): byte-order mark, magic 42, pixel bytes verbatim at their
    strip offset, and the little-endian IFD entry encoding of ImageWidth."""
    import struct

    arr = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    blob = write_geotiff(arr, minx=0.0, maxy=2.0, res=1.0)
    assert blob[:2] == b"II"
    magic, ifd_off = struct.unpack("<HI", blob[2:8])
    assert magic == 42
    # single uncompressed strip directly after the 8-byte header
    assert blob[8:12] == bytes([1, 2, 3, 4])
    (n_entries,) = struct.unpack("<H", blob[ifd_off:ifd_off + 2])
    entries = {}
    for i in range(n_entries):
        e = blob[ifd_off + 2 + 12 * i: ifd_off + 2 + 12 * (i + 1)]
        tag, typ, count = struct.unpack("<HHI", e[:8])
        entries[tag] = (typ, count, e[8:12])
    # ImageWidth: tag 256, LONG(4), count 1, value 2 inline
    assert entries[256] == (4, 1, struct.pack("<I", 2))
    # ImageLength 2; StripOffsets points at the pixel bytes
    assert entries[257][2] == struct.pack("<I", 2)
    assert entries[273][2] == struct.pack("<I", 8)
    # BitsPerSample SHORT 8; Compression none; SampleFormat uint
    assert entries[258][2][:2] == struct.pack("<H", 8)
    assert entries[259][2][:2] == struct.pack("<H", 1)
    assert entries[339][2][:2] == struct.pack("<H", 1)
    # tags must be ascending per spec
    tags = []
    for i in range(n_entries):
        e = blob[ifd_off + 2 + 12 * i: ifd_off + 2 + 12 * (i + 1)]
        tags.append(struct.unpack("<H", e[:2])[0])
    assert tags == sorted(tags)


def test_image_decoder_tiff_mode(ray_session):
    """Multimodal ImageDecoder mode='tiff': REAL decode through the
    actor-pool stage, then the resize + feature kernels downstream."""
    from zen3geo_ray.stages.multimodal import ImageDecoder, image_features, resize_nearest

    rng = np.random.default_rng(6)
    imgs = [rng.integers(0, 255, (3, 8, 8)).astype(np.uint8) for _ in range(5)]
    tbl = pa.table({
        "img_id": pa.array(np.arange(5), pa.int64()),
        "payload": pa.array([write_geotiff(a) for a in imgs], pa.binary()),
    })
    out = (
        rd.from_arrow(tbl)
        .map_batches(ImageDecoder, fn_constructor_kwargs={"mode": "tiff"},
                     batch_format="pyarrow", concurrency=2)
        .map_batches(lambda b: resize_nearest(b, out_h=4, out_w=4),
                     batch_format="pyarrow")
        .map_batches(image_features, batch_format="pyarrow")
        .to_pandas()
    )
    assert len(out) == 5
    row = out[out.img_id == 2].iloc[0]
    assert len(row["image"]) == 4 * 4 * 3
    # decoded pixels are the real payload pixels (check one resize sample:
    # nearest with 8->4 picks rows/cols 0,2,4,6)
    exp = imgs[2].transpose(1, 2, 0)[::2, ::2]
    got = np.asarray(row["image"], dtype=np.uint8).reshape(4, 4, 3)
    assert (got == exp).all()


def test_overview_chain_roundtrip():
    """Overview IFDs: next-IFD chain, nearest decimation, res scaling,
    unchanged origin; full-res decode unaffected."""
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 255, (2, 64, 96), dtype=np.uint8)
    blob = gt.write_geotiff(arr, minx=10.0, maxy=20.0, res=0.5,
                            overviews=[2, 4], tiled=True, tile=16)
    full = gt.read_geotiff(blob)
    assert np.array_equal(full["data"], arr)
    assert full["res"] == 0.5 and full["minx"] == 10.0

    ov0 = gt.read_geotiff(blob, overview_level=0)
    assert np.array_equal(ov0["data"], arr[:, ::2, ::2])
    assert ov0["res"] == 1.0 and (ov0["height"], ov0["width"]) == (32, 48)
    assert (ov0["minx"], ov0["maxy"]) == (10.0, 20.0)

    ov1 = gt.read_geotiff(blob, overview_level=1)
    assert np.array_equal(ov1["data"], arr[:, ::4, ::4])
    assert ov1["res"] == 2.0 and (ov1["height"], ov1["width"]) == (16, 24)

    with pytest.raises(ValueError, match="out of range"):
        gt.read_geotiff(blob, overview_level=2)
    # a file with no overviews still reads at full res
    plain = gt.write_geotiff(arr[0])
    assert np.array_equal(gt.read_geotiff(plain)["data"][0], arr[0])
    with pytest.raises(ValueError, match="out of range"):
        gt.read_geotiff(plain, overview_level=0)


def test_overview_chip_accounting_matches_reference():
    """The chipping walkthrough reads overview_level (docs/chipping.md:
    104-110) and slices 512-pixel chips: two overview-decoded scenes
    must reproduce the reference's 12 / 30 chip accounting
    (docs/chipping.md:125-148)."""
    from zen3geo_ray.sources.fixtures import scenes_table
    from zen3geo_ray.stages import chips as ch

    rng = np.random.default_rng(10)
    blobs = [gt.write_geotiff(
        rng.integers(0, 9, (1, 4096, 6144), dtype=np.uint8),
        overviews=[2, 4], compress=True) for _ in range(2)]
    dims = [gt.read_geotiff(b, overview_level=1) for b in blobs]
    assert [(d["height"], d["width"]) for d in dims] == [(1024, 1536)] * 2

    s = scenes_table([(i, d["height"], d["width"], 1, 1.0)
                      for i, d in enumerate(dims)])
    assert ch.enumerate_chips(s, chip_h=512, chip_w=512).num_rows == 12
    assert ch.enumerate_chips(s, chip_h=512, chip_w=512,
                              overlap_h=256, overlap_w=256).num_rows == 30
