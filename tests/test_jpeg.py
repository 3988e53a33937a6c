"""Baseline JPEG codec round trips (fixture-free — write_jpeg is the
test generator for read_jpeg, the sources/png.py pattern)."""

import numpy as np
import pytest

from zen3geo_ray.sources.jpeg import (
    _canonical_codes,
    _category,
    _zigzag_order,
    read_jpeg,
    write_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 / max(w - 1, 1)), (yy * 255 / max(h - 1, 1)),
         ((xx + yy) * 255 / max(h + w - 2, 1))], axis=-1
    ).astype(np.uint8)


def test_zigzag_is_the_spec_order():
    zz = _zigzag_order()
    # the canonical first/last entries of the T.81 zigzag
    assert zz[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert zz[-3:].tolist() == [61, 54, 62] or zz[-1] == 63
    assert sorted(zz.tolist()) == list(range(64))


def test_canonical_codes_prefix_free():
    bits = [0, 0, 0, 12] + [0] * 12
    codes = _canonical_codes(bits, list(range(12)))
    assert len(codes) == 12
    lens = {ln for _, ln in codes.values()}
    assert lens == {4}
    vals = [c for c, _ in codes.values()]
    assert len(set(vals)) == 12 and 0b1111 not in vals  # no all-ones code


def test_category():
    assert [_category(v) for v in (0, 1, -1, 2, 3, -3, 255, -255, 1023)] == \
        [0, 1, 1, 2, 2, 2, 8, 8, 10]


@pytest.mark.parametrize("shape", [(8, 8), (40, 52), (33, 41), (1, 1), (9, 3)])
def test_roundtrip_rgb_shapes(shape):
    img = _gradient(*shape)
    dec = read_jpeg(write_jpeg(img, quality=92))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 3


def test_roundtrip_grayscale():
    g = _gradient(24, 24)[:, :, 0]
    dec = read_jpeg(write_jpeg(g, quality=92))
    assert dec.shape == (24, 24, 3)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 4
    assert (dec[:, :, 0] == dec[:, :, 1]).all()


def test_roundtrip_solid_exact():
    solid = np.full((16, 16, 3), 77, np.uint8)
    dec = read_jpeg(write_jpeg(solid, quality=95))
    assert np.abs(dec.astype(int) - 77).max() <= 1


def test_roundtrip_420_subsampling():
    img = _gradient(40, 52)
    enc444 = write_jpeg(img, 90, subsampling="444")
    enc420 = write_jpeg(img, 90, subsampling="420")
    assert len(enc420) < len(enc444)  # chroma really was subsampled
    dec = read_jpeg(enc420)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 20 and err.mean() < 4


def test_roundtrip_restart_markers():
    img = _gradient(48, 64)
    enc = write_jpeg(img, 90, restart_interval=2)
    assert b"\xff\xdd" in enc          # DRI present
    assert b"\xff\xd0" in enc          # at least one RST0
    dec = read_jpeg(enc)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12


def test_roundtrip_noise_quality_ladder():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    e_hi = np.abs(read_jpeg(write_jpeg(img, 95)).astype(int) - img).mean()
    e_lo = np.abs(read_jpeg(write_jpeg(img, 30)).astype(int) - img).mean()
    assert e_hi < e_lo  # quality knob does what it says
    assert e_hi < 6


def test_errors():
    with pytest.raises(ValueError, match="SOI"):
        read_jpeg(b"not a jpeg")
    with pytest.raises(ValueError, match="empty"):
        write_jpeg(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        write_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="422")
    # progressive SOF marker is detected and rejected, not mis-decoded
    img = write_jpeg(np.zeros((8, 8, 3), np.uint8))
    prog = img.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        read_jpeg(prog)


def test_fill_bytes_before_restart_marker():
    """T.81 allows 0xFF fill bytes before any marker — splice one before
    each RST and the decode must be unchanged."""
    img = _gradient(48, 64)
    enc = write_jpeg(img, 90, restart_interval=2)
    ref = read_jpeg(enc)
    filled = enc.replace(b"\xff\xd0", b"\xff\xff\xd0").replace(
        b"\xff\xd1", b"\xff\xff\xd1"
    )
    assert filled != enc
    dec = read_jpeg(filled)
    assert np.array_equal(dec, ref)
