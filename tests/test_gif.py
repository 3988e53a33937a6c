"""GIF codec (sources/gif.py): real variable-width LZW, container
framing, decoder hardening, and the ImageDecoder integration."""

import numpy as np
import pyarrow as pa
import pytest

from zen3geo_ray.sources.gif import (_lzw_decode, _lzw_encode, read_gif,
                                     write_gif)


def test_roundtrip_shapes_and_palettes():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (7, 3)).astype(np.uint8)
    for shape in [(1, 1), (4, 5), (31, 17), (100, 120)]:
        img = pal[rng.integers(0, len(pal), shape)]
        assert np.array_equal(read_gif(write_gif(img)), img)


def test_roundtrip_full_palette_dict_reset():
    """300x400 with ~256 colors drives the code width to 12 bits and
    through at least one CLEAR-triggered dictionary reset."""
    rng = np.random.default_rng(11)
    pal = np.unique(rng.integers(0, 256, (256, 3)).astype(np.uint8),
                    axis=0)
    img = pal[rng.integers(0, len(pal), (300, 400))]
    enc = write_gif(img)
    assert np.array_equal(read_gif(enc), img)
    assert write_gif(img) == enc          # deterministic bytes


def test_kwkwk_and_solid():
    """Solid images hit the KwKwK (code == next_code) decode case."""
    img = np.zeros((9, 9, 3), np.uint8)
    assert np.array_equal(read_gif(write_gif(img)), img)
    rng = np.random.default_rng(3)
    g = (rng.integers(0, 2, (64, 64)) * 255).astype(np.uint8)
    img2 = np.repeat(g[:, :, None], 3, 2)
    assert np.array_equal(read_gif(write_gif(img2)), img2)


def test_container_framing_pinned():
    img = np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8)   # 1x2, 2 colors
    raw = write_gif(img)
    assert raw[:6] == b"GIF89a"
    assert int.from_bytes(raw[6:8], "little") == 2       # width
    assert int.from_bytes(raw[8:10], "little") == 1      # height
    assert raw[10] & 0x80                                # GCT present
    n_pal = 2 << (raw[10] & 0x07)
    assert n_pal == 4                                    # 2-bit table
    pal = np.frombuffer(raw[13:13 + 12], np.uint8).reshape(4, 3)
    assert pal[0].tolist() == [1, 2, 3]                  # first-appearance
    assert pal[1].tolist() == [4, 5, 6]
    assert raw[13 + 12] == 0x2C                          # image block
    assert raw[-1] == 0x3B and raw[-2] == 0x00           # trailer


def test_decoder_skips_extensions():
    img = np.array([[[9, 9, 9], [0, 0, 0]]], np.uint8)
    raw = bytearray(write_gif(img))
    # splice a Graphic Control Extension before the image descriptor
    i = raw.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(raw[:i]) + gce + bytes(raw[i:])
    assert np.array_equal(read_gif(patched), img)


def test_reject_bad_inputs():
    with pytest.raises(ValueError, match="not a GIF"):
        read_gif(b"PNG garbage")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    if len(np.unique(img.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError, match="256 distinct"):
            write_gif(img)


def test_lzw_kernel_spec_vectors():
    """The LZW kernel round-trips every min_code and begins with the
    CLEAR code as the spec requires."""
    rng = np.random.default_rng(7)
    for min_code in (2, 3, 5, 8):
        n_sym = 1 << min_code
        data = rng.integers(0, n_sym, 5000).astype(np.uint8)
        enc = _lzw_encode(data, min_code)
        dec = _lzw_decode(enc, min_code, len(data))
        assert np.array_equal(dec, data)
        # first code emitted is CLEAR (LSB-first in the first bytes)
        width = min_code + 1
        first = int.from_bytes(enc[:2], "little") & ((1 << width) - 1)
        assert first == (1 << min_code)


def test_image_decoder_sniffs_gif(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.multimodal import ImageDecoder

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (5, 3)).astype(np.uint8)
    imgs = [pal[rng.integers(0, 5, (6, 8))] for _ in range(4)]
    t = pa.table({"payload": pa.array([write_gif(i) for i in imgs],
                                      pa.binary())})
    out = rd.from_arrow(t).map_batches(
        ImageDecoder(mode="real"), batch_format="pyarrow",
        batch_size=None).to_pandas()
    assert (out.img_h == 6).all() and (out.img_w == 8).all()
    got = np.asarray(out.image.iloc[0]).reshape(6, 8, 3)
    assert np.array_equal(got, imgs[0])
