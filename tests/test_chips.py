"""Chip-enumeration parity tests (xbatcher floor-division arithmetic).

Goldens: 128²→64² = 4 chips (`zen3geo/tests/test_datapipes_xbatcher.py:31`);
32²→16² = 4 (`:45-59`); two scenes → 12 chips of 512² without overlap and
30 with 256 overlap (`docs/chipping.md:125-148`).
"""

import numpy as np
import pyarrow as pa

from zen3geo_ray.sources.fixtures import scenes_table
from zen3geo_ray.stages import chips as ch


def test_chip_counts_golden():
    assert ch.chips_per_dim(128, 64).tolist() == 2 * 1  # scalar array
    s = scenes_table([(0, 128, 128, 3, 1.0)])
    out = ch.enumerate_chips(s, chip_h=64, chip_w=64)
    assert out.num_rows == 4
    s2 = scenes_table([(0, 32, 32, 1, 15.0)])
    assert ch.enumerate_chips(s2, chip_h=16, chip_w=16).num_rows == 4


def test_chip_counts_two_scenes_overlap_golden():
    # two scenes sized so that 512² slicing gives 6 chips each (12 total)
    # and 256-overlap gives 15 each (30 total) — docs/chipping.md:125-148
    s = scenes_table([(0, 1024, 1536, 1, 1.0), (1, 1024, 1536, 1, 1.0)])
    no_overlap = ch.enumerate_chips(s, chip_h=512, chip_w=512)
    assert no_overlap.num_rows == 12
    overlap = ch.enumerate_chips(
        s, chip_h=512, chip_w=512, overlap_h=256, overlap_w=256
    )
    assert overlap.num_rows == 30


def test_chip_rowmajor_ids_and_offsets():
    s = scenes_table([(7, 128, 192, 1, 1.0)])
    out = ch.enumerate_chips(s, chip_h=64, chip_w=64)
    assert out.num_rows == 6
    assert out.column("chip_id").to_pylist() == [0, 1, 2, 3, 4, 5]
    assert out.column("chip_y").to_pylist() == [0, 0, 0, 1, 1, 1]
    assert out.column("chip_x").to_pylist() == [0, 1, 2, 0, 1, 2]
    assert out.column("y0").to_pylist() == [0, 0, 0, 64, 64, 64]
    assert out.column("x0").to_pylist() == [0, 64, 128, 0, 64, 128]
    # deterministic identity: same result regardless of batch split
    part = ch.enumerate_chips(s.slice(0, 1), chip_h=64, chip_w=64)
    assert part.equals(out)


def test_chip_overlap_strides():
    s = scenes_table([(0, 128, 128, 1, 1.0)])
    out = ch.enumerate_chips(s, chip_h=64, chip_w=64, overlap_h=32, overlap_w=32)
    # (128-32)//32 = 3 per dim -> 9 chips, stride 32
    assert out.num_rows == 9
    assert out.column("y0").to_pylist()[:4] == [0, 0, 0, 32]


def test_chip_bboxes():
    s = scenes_table([(0, 128, 128, 1, 1.0)])
    chips = ch.enumerate_chips(s, chip_h=64, chip_w=64)
    out = ch.chip_bboxes(chips, scene_transforms={0: (10.0, 50.0, 0.25)})
    # chip (0,0): NW corner at (10, 50), 64 px of 0.25 deg
    assert out.column("bminx").to_pylist()[0] == 10.0
    assert out.column("bmaxy").to_pylist()[0] == 50.0
    assert out.column("bminy").to_pylist()[0] == 50.0 - 16.0
    # chip (1,1) offsets south-east
    row3 = out.to_pylist()[3]
    assert row3["bminx"] == 10.0 + 16.0 and row3["bmaxy"] == 50.0 - 16.0


def test_chips_as_ray_flatmap(ray_session):
    import ray.data as rd

    s = scenes_table([(0, 1024, 1536, 1, 1.0), (1, 1024, 1536, 1, 1.0)])
    ds = rd.from_arrow(s)
    out = ds.map_batches(
        lambda b: ch.enumerate_chips(b, chip_h=512, chip_w=512),
        batch_format="pyarrow",
    )
    assert out.count() == 12


# --- real chip DATA slicing (xbatcher.py:105-110 window contents) ---------


def _ramp_scene(scene_id, bands, h, w):
    """Scene-tensor row whose value at (b, y, x) is b*1e6 + y*1000 + x."""
    b_, y, x = np.meshgrid(
        np.arange(bands), np.arange(h), np.arange(w), indexing="ij"
    )
    data = (b_ * 1e6 + y * 1000 + x).astype(np.float32)
    return pa.table(
        {
            "scene_id": pa.array([scene_id], pa.int64()),
            "height": pa.array([h], pa.int32()),
            "width": pa.array([w], pa.int32()),
            "bands": pa.array([bands], pa.int64()),
            "data": pa.array([data.reshape(-1)], pa.list_(pa.float32())),
        }
    )


def test_slice_chip_tensors_all_ones_golden():
    # the reference fixture: all-ones 3x128x128 -> 4 chips of REAL data
    # (test_datapipes_xbatcher.py:21-31)
    from zen3geo_ray.sources.readers import scene_tensor_batch

    s = scenes_table([(0, 128, 128, 3, 1.0)])
    tensors = scene_tensor_batch(s)
    out = ch.slice_chip_tensors(tensors, chip_h=64, chip_w=64)
    assert out.num_rows == 4
    for i in range(4):
        vals = np.asarray(out.column("data")[i].values, dtype=np.float32)
        assert vals.shape == (3 * 64 * 64,)
        assert (vals == 1.0).all()
    assert out.column("chip_id").to_pylist() == [0, 1, 2, 3]


def test_slice_chip_tensors_window_contents():
    # ramp scene: each chip's window must hold exactly the source region
    t = _ramp_scene(5, 2, 4, 6)
    out = ch.slice_chip_tensors(t, chip_h=2, chip_w=3)
    assert out.num_rows == 4  # 2x2 grid
    full = np.asarray(t.column("data")[0].values, dtype=np.float32).reshape(2, 4, 6)
    for r in range(out.num_rows):
        cy = out.column("chip_y")[r].as_py()
        cx = out.column("chip_x")[r].as_py()
        got = np.asarray(out.column("data")[r].values, dtype=np.float32).reshape(
            2, 2, 3
        )
        exp = full[:, cy * 2 : cy * 2 + 2, cx * 3 : cx * 3 + 3]
        assert (got == exp).all(), (cy, cx)


def test_slice_chip_tensors_overlap():
    t = _ramp_scene(1, 1, 6, 6)
    out = ch.slice_chip_tensors(t, chip_h=4, chip_w=4, overlap_h=2, overlap_w=2)
    # (6-2)//(4-2) = 2 per dim -> 4 chips, stride 2
    assert out.num_rows == 4
    full = np.asarray(t.column("data")[0].values, dtype=np.float32).reshape(6, 6)
    last = np.asarray(out.column("data")[3].values, dtype=np.float32).reshape(4, 4)
    assert (last == full[2:6, 2:6]).all()


def test_detection_pipeline_with_data(ray_session):
    import ray.data as rd

    from zen3geo_ray.geom import wkb
    from zen3geo_ray.pipelines.walkthroughs import detection_pipeline
    from zen3geo_ray.sources.fixtures import polygons_table

    s = scenes_table([(0, 128, 128, 1, 2.0)])
    polys = polygons_table([wkb.box(0.1, 0.9, 0.3, 1.1)], ["p"])
    out = detection_pipeline(
        rd.from_arrow(s),
        polys,
        scene_transforms={0: (0.0, 1.28, 0.01)},
        chip_h=64,
        chip_w=64,
        with_data=True,
    ).to_pandas()
    assert len(out) > 0
    assert "data" in out.columns and "x1" in out.columns
    first = np.asarray(out["data"].iloc[0], dtype=np.float32)
    assert first.shape == (64 * 64,)
    assert (first == 2.0).all()
