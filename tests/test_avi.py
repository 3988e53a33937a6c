"""MJPEG-AVI container + real video pipeline tests (fixture-free)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from zen3geo_ray.sources.avi import read_avi_mjpeg, write_avi_mjpeg
from zen3geo_ray.sources.jpeg import read_jpeg
from zen3geo_ray.stages.multimodal import (
    ImageDecoder,
    VideoFrameExtractor,
    frame_sample,
    image_features,
)


def _frames(n, h=16, w=24):
    out = []
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, 0] = 20 * i  # distinguishable flat frames: decode ~exactly
        f[:, :, 1] = 100
        out.append(f)
    return out


def test_avi_roundtrip():
    frames = _frames(6)
    blob = write_avi_mjpeg(frames, fps=10, quality=95)
    v = read_avi_mjpeg(blob)
    assert (v["fps"], v["width"], v["height"], v["n_frames"]) == (10, 24, 16, 6)
    for i, jb in enumerate(v["frames"]):
        dec = read_jpeg(jb)
        assert dec.shape == (16, 24, 3)
        assert abs(int(dec[0, 0, 0]) - 20 * i) <= 3


def test_avi_errors():
    with pytest.raises(ValueError, match="RIFF"):
        read_avi_mjpeg(b"nope")
    with pytest.raises(ValueError, match="no frames"):
        write_avi_mjpeg([])
    blob = bytearray(write_avi_mjpeg(_frames(1)))
    i = blob.index(b"MJPG")  # strh handler comes first
    blob[i:i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="non-MJPEG"):
        read_avi_mjpeg(bytes(blob))


def test_real_video_pipeline_end_to_end(ray_session):
    """Video -> frames -> sample every 2nd -> REAL JPEG decode ->
    features: every stage real, no stubs."""
    tbl = pa.table({
        "video_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array(
            [write_avi_mjpeg(_frames(6), fps=10, quality=95),
             write_avi_mjpeg(_frames(4), fps=5, quality=95)], pa.binary()
        ),
    })
    out = (
        rd.from_arrow(tbl)
        .map_batches(VideoFrameExtractor, fn_constructor_kwargs={"mode": "real"},
                     batch_format="pyarrow", concurrency=2)
        .map_batches(lambda b: frame_sample(b, every_n=2), batch_format="pyarrow")
        .map_batches(ImageDecoder, fn_constructor_kwargs={"mode": "real"},
                     batch_format="pyarrow", concurrency=2)
        .map_batches(image_features, batch_format="pyarrow")
        .to_pandas().sort_values(["video_id", "frame_idx"])
    )
    assert out["frame_idx"].tolist() == [0, 2, 4, 0, 2]  # every 2nd frame
    assert out["fps"].tolist() == [10, 10, 10, 5, 5]
    assert (out["img_h"] == 16).all() and (out["img_w"] == 24).all()
    # red channel tracks the frame index (mean feature col 0)
    red = np.array([f[0] for f in out["features"]])
    assert abs(red[0] - 0) < 4 and abs(red[1] - 40) < 4 and abs(red[2] - 80) < 4


def test_video_extractor_zero_frame_batch():
    """A batch of videos with no frames must yield an EMPTY typed table,
    not crash in take()."""
    import struct

    # valid RIFF/AVI container with no movi chunks
    body = b"AVI "
    empty_avi = b"RIFF" + struct.pack("<I", len(body)) + body
    tbl = pa.table({"vid": pa.array([0], pa.int64()),
                    "payload": pa.array([empty_avi], pa.binary())})
    out = VideoFrameExtractor(mode="real")(tbl)
    assert out.num_rows == 0
    assert set(out.column_names) == {"vid", "frame_idx", "fps", "payload"}
