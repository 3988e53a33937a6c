"""Pure-numpy PNG codec tests: round-trips, filter decoding, real-mode
multimodal decode."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from zen3geo_ray.sources.png import _chunk, _SIG, read_png, write_png


@pytest.mark.parametrize("shape", [(7, 5), (7, 5, 3), (4, 4, 4), (3, 9, 2)])
def test_roundtrip(shape):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, shape).astype(np.uint8)
    got = read_png(write_png(arr))
    exp = arr if arr.ndim == 3 else arr[:, :, None]
    assert (got == exp).all()


def _png_from_filtered(width, height, ctype, rows):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(r) for f, r in rows)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


def test_filters_sub_up_average_paeth():
    # grey 3x3; hand-computed filter reconstructions per the PNG spec
    # row0 filter 0 (None): 10 20 30
    # row1 filter 1 (Sub):  5  6  7  -> 5, 11, 18
    # row2 filter 2 (Up):   1  2  3  -> 6, 13, 21
    blob = _png_from_filtered(3, 3, 0, [
        (0, [10, 20, 30]),
        (1, [5, 6, 7]),
        (2, [1, 2, 3]),
    ])
    got = read_png(blob)[:, :, 0]
    assert got.tolist() == [[10, 20, 30], [5, 11, 18], [6, 13, 21]]

    # Average (3): recon = raw + floor((left + up)/2)
    # row0 None: 10 20; row1 Avg raw 4 6: x0: 4+(0+10)/2=9; x1: 6+(9+20)/2=20
    blob = _png_from_filtered(2, 2, 0, [(0, [10, 20]), (3, [4, 6])])
    assert read_png(blob)[:, :, 0].tolist() == [[10, 20], [9, 20]]

    # Paeth (4): predictors a(left), b(up), c(up-left)
    # row0 None: 1 2; row1 Paeth raw 3 4:
    #  x0: a=0 b=1 c=0 -> p=1 -> pred=b=1 -> 4
    #  x1: a=4 b=2 c=1 -> p=5; pa=1 pb=3 pc=4 -> pred=a=4 -> 8
    blob = _png_from_filtered(2, 2, 0, [(0, [1, 2]), (4, [3, 4])])
    assert read_png(blob)[:, :, 0].tolist() == [[1, 2], [4, 8]]


def test_errors():
    with pytest.raises(ValueError):
        read_png(b"nope")
    # 16-bit depth is out of subset
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    blob = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        read_png(blob)


def test_image_decoder_real_mode_all_formats(ray_session):
    """mode='real' decodes PNG (lossless), TIFF (lossless) and baseline
    JPEG (lossy, bounded error) in ONE pipeline — the last stub is gone."""
    from zen3geo_ray.sources.geotiff import write_geotiff
    from zen3geo_ray.sources.jpeg import write_jpeg
    from zen3geo_ray.stages.multimodal import ImageDecoder

    rng = np.random.default_rng(2)
    png_img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    tif_img = rng.integers(0, 255, (3, 8, 8)).astype(np.uint8)
    jpg_img = np.full((8, 8, 3), 0, np.uint8)
    jpg_img[:, :, 0] = 200  # flat color block: decodes near-exactly
    tbl = pa.table({
        "img_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array(
            [write_png(png_img), write_geotiff(tif_img),
             write_jpeg(jpg_img, quality=95)], pa.binary()
        ),
    })
    out = (
        rd.from_arrow(tbl)
        .map_batches(ImageDecoder, fn_constructor_kwargs={"mode": "real"},
                     batch_format="pyarrow", concurrency=2)
        .to_pandas().sort_values("img_id")
    )
    got_png = np.asarray(out.iloc[0]["image"], np.uint8).reshape(8, 8, 3)
    got_tif = np.asarray(out.iloc[1]["image"], np.uint8).reshape(8, 8, 3)
    got_jpg = np.asarray(out.iloc[2]["image"], np.uint8).reshape(8, 8, 3)
    assert (got_png == png_img).all()
    assert (got_tif == tif_img.transpose(1, 2, 0)).all()
    assert np.abs(got_jpg.astype(int) - jpg_img.astype(int)).max() <= 3
