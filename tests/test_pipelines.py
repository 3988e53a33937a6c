"""End-to-end walkthrough-pipeline, lineage, and multimodal tests."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from zen3geo_ray.geom import wkb
from zen3geo_ray.pipelines import walkthroughs as wt
from zen3geo_ray.sources.corpus import pages_table
from zen3geo_ray.sources.fixtures import polygons_table, scenes_table
from zen3geo_ray.stages import multimodal as mm
from zen3geo_ray.state import lineage


def test_segmentation_pipeline_end_to_end(ray_session):
    pages = pages_table(400)
    points, rasters = wt.segmentation_pipeline(
        rd.from_arrow(pages), res=8, tile_nx=12, tile_ny=6, tile_px=32
    )
    pts = points.to_pandas()
    assert len(pts) == 400  # admin grid covers the globe -> every point joins
    assert {"poly_id", "tile_id", "cell", "lon", "lat"} <= set(pts.columns)
    ras = rasters.to_pandas()
    assert ras["tile_id"].is_unique
    # mass conservation: every point lands in exactly one tile pixel
    assert sum(np.sum(d) for d in ras["data"]) == 400
    assert (ras["height"] == 32).all() and (ras["width"] == 32).all()


def test_detection_pipeline_reference_semantics(ray_session):
    # one 256x256 scene at origin (10, 50), 0.25 deg pixels, 128px chips
    scenes = scenes_table([(0, 256, 256, 3, 1.0)])
    # a polygon inside chip (0,0): chip bounds lon [10,42], lat [18,50]
    poly = wkb.box(12.0, 40.0, 20.0, 46.0)
    out = wt.detection_pipeline(
        rd.from_arrow(scenes),
        polygons_table([poly], ["bldg"]),
        scene_transforms={0: (10.0, 50.0, 0.25)},
        chip_h=128,
        chip_w=128,
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.chip_y, r.chip_x) == (0, 0)
    # geographic clip = the polygon itself (fully inside)
    assert (r.cminx, r.cminy, r.cmaxx, r.cmaxy) == (12.0, 40.0, 20.0, 46.0)
    # image coords: x = (gx-left)/res, y = (top-gy)/res (y flipped)
    assert r.x1 == pytest.approx((12.0 - 10.0) / 0.25)
    assert r.y1 == pytest.approx((50.0 - 46.0) / 0.25)
    assert r.x2 == pytest.approx((20.0 - 10.0) / 0.25)
    assert r.y2 == pytest.approx((50.0 - 40.0) / 0.25)
    assert r.x2 > r.x1 and r.y2 > r.y1  # reference asserts these


def test_detection_pipeline_chip_straddle(ray_session):
    scenes = scenes_table([(0, 256, 256, 1, 1.0)])
    # polygon straddling chips (0,0) and (0,1): lon range crosses 42
    poly = wkb.box(40.0, 40.0, 44.0, 44.0)
    out = wt.detection_pipeline(
        rd.from_arrow(scenes),
        polygons_table([poly]),
        scene_transforms={0: (10.0, 50.0, 0.25)},
        chip_h=128,
        chip_w=128,
    ).to_pandas()
    assert len(out) == 2
    # each chip keeps its clipped share; x-bounds butt at the chip edge 42
    a = out.sort_values("chip_x").reset_index(drop=True)
    assert a.loc[0, "cmaxx"] == 42.0 and a.loc[1, "cminx"] == 42.0


def test_resumable_write_and_resume(ray_session, tmp_path):
    out_dir = str(tmp_path / "out")
    tbl = pa.table({"part": [1, 1, 2, 2, 3], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    m1 = lineage.resumable_write(rd.from_arrow(tbl), out_dir, "part").to_pandas()
    assert sorted(m1["partition"]) == [1, 2, 3]
    assert lineage.completed_partitions(out_dir) == {1, 2, 3}
    back = lineage.read_partitioned(out_dir).to_pandas()
    assert len(back) == 5 and back["v"].sum() == 15.0
    # resume: everything complete -> nothing rewritten
    m2 = lineage.resumable_write(rd.from_arrow(tbl), out_dir, "part").to_pandas()
    assert len(m2) == 0
    # partial resume: drop partition 2's manifest -> only 2 rewritten
    os.remove(os.path.join(out_dir, "_manifest", "2.json"))
    m3 = lineage.resumable_write(rd.from_arrow(tbl), out_dir, "part").to_pandas()
    assert m3["partition"].tolist() == [2]
    manifest = lineage.load_manifest(out_dir)
    assert set(manifest.columns) >= {"partition", "rows", "content_hash", "wall_s"}


def test_multimodal_plumbing(ray_session):
    payloads = [f"payload-{i}".encode() for i in range(20)]
    tbl = pa.table(
        {"item_id": list(range(20)), "payload": pa.array(payloads, pa.binary()),
         "frame_idx": list(range(20))}
    )
    ds = rd.from_arrow(tbl)
    sampled = ds.map_batches(
        lambda b: mm.frame_sample(b, every_n=4), batch_format="pyarrow"
    )
    decoded = sampled.map_batches(
        mm.ImageDecoder,
        fn_constructor_kwargs={"mode": "fake", "out_h": 8, "out_w": 8},
        batch_format="pyarrow",
        concurrency=2,
    )
    resized = decoded.map_batches(
        lambda b: mm.resize_nearest(b, out_h=4, out_w=4), batch_format="pyarrow"
    )
    feat = resized.map_batches(mm.image_features, batch_format="pyarrow")
    out = feat.to_pandas()
    assert len(out) == 5  # every 4th frame
    assert len(out["image"].iloc[0]) == 4 * 4 * 3
    assert len(out["features"].iloc[0]) == 6
    # determinism: same payload -> same tensor
    d2 = rd.from_arrow(tbl).map_batches(
        lambda b: mm.frame_sample(b, every_n=4), batch_format="pyarrow"
    ).map_batches(
        mm.ImageDecoder,
        fn_constructor_kwargs={"mode": "fake", "out_h": 8, "out_w": 8},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    i0 = out.sort_values("item_id")["item_id"].iloc[0]


def test_image_decoder_real_mode_jpeg():
    # real mode now decodes baseline JPEG via the in-engine pure-numpy
    # codec; unknown signatures raise a clear error
    import numpy as np
    import pyarrow as pa

    from zen3geo_ray.sources.jpeg import write_jpeg

    img = np.full((8, 8, 3), 120, np.uint8)
    dec = mm.ImageDecoder(mode="real")
    out = dec(pa.table({"payload": pa.array([write_jpeg(img, 95)],
                                            pa.binary())}))
    got = np.asarray(out.column("image")[0].as_py(), np.uint8).reshape(8, 8, 3)
    assert np.abs(got.astype(int) - 120).max() <= 2
    with pytest.raises(ValueError, match="signature"):
        dec(pa.table({"payload": pa.array([b"not an image"], pa.binary())}))


def test_incremental_write_skips_unchanged(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.state.lineage import incremental_write, load_manifest

    out = str(tmp_path / "inc")

    def table(vals_for_p1):
        return pa.table(
            {
                "part": pa.array([0, 0, 1, 1], pa.int64()),
                "fp": pa.array([11, 22, 33, vals_for_p1], pa.int64()),
                "v": pa.array([1.0, 2.0, 3.0, 4.0]),
            }
        )

    # first run: both partitions written
    res, todo = incremental_write(rd.from_arrow(table(44)), out, "part", "fp")
    res.materialize()
    assert todo == {0, 1}
    man = load_manifest(out)
    assert sorted(man["partition"]) == [0, 1]
    assert man["input_fp"].notna().all()

    # unchanged inputs: nothing re-runs
    res2, todo2 = incremental_write(rd.from_arrow(table(44)), out, "part", "fp")
    assert todo2 == set()

    # partition 1's input changed: only it re-runs
    res3, todo3 = incremental_write(rd.from_arrow(table(99)), out, "part", "fp")
    res3.materialize()
    assert todo3 == {1}


def test_multimodal_features_to_ann(ray_session):
    """Composition: fake-decode images -> feature extraction -> ANN over
    the feature column (the multimodal embedding-pipeline shape)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages import ann
    from zen3geo_ray.stages.multimodal import ImageDecoder, image_features

    n = 200
    payloads = [f"img-{i}".encode() for i in range(n)]
    tbl = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                    "payload": pa.array(payloads, pa.binary())})
    feats = (
        rd.from_arrow(tbl)
        .map_batches(ImageDecoder, fn_constructor_kwargs={"mode": "fake"},
                     batch_format="pyarrow", concurrency=2)
        .map_batches(image_features, batch_format="pyarrow")
        .map_batches(lambda b: b.select(["vec_id", "features"]),
                     batch_format="pyarrow")
    )
    # query with vec 0's own feature vector: it must retrieve itself
    import pandas as pd
    f0 = feats.to_pandas()
    q = np.asarray(f0.sort_values("vec_id")["features"].iloc[0], dtype=np.float32)
    blob = {"query_id": np.array([0]), "matrix": q[None, :]}
    out = ann.brute_force_knn(
        rd.from_arrow(pa.Table.from_pandas(f0, preserve_index=False)),
        blob, k=3, vec_col="features",
    ).to_pandas()
    assert 0 in set(out["vec_id"])
    assert out.sort_values("rank")["vec_id"].iloc[0] == 0


def test_streaming_exact_dedup_registry(ray_session):
    """Online dedup via the sharded registry: exactly one survivor per
    distinct key across batches, whatever the arrival order."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.state.registry import make_registry, streaming_exact_dedup

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 300, 2000)
    tbl = pa.table({"k": pa.array(keys, pa.int64()),
                    "row": pa.array(np.arange(2000), pa.int64())})
    reg = make_registry(n_shards=4)
    out = streaming_exact_dedup(
        rd.from_arrow(tbl).repartition(8), reg, "k"
    ).to_pandas()
    assert sorted(out["k"].unique()) == sorted(set(keys.tolist()))
    assert len(out) == len(set(keys.tolist()))  # exactly one per key
    # a SECOND stream against the same live registry drops everything
    out2 = streaming_exact_dedup(rd.from_arrow(tbl), reg, "k").to_pandas()
    assert len(out2) == 0


def test_batch_scorer_inference_stage(ray_session):
    """Model-inference stage shape: actor pool, model loaded once per
    actor (ray.put ref), int64 logits match a direct numpy compute."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from zen3geo_ray.stages.scoring import (
        BatchScorer,
        make_linear_model,
        score_embeddings,
    )

    rng = np.random.default_rng(9)
    n, d = 500, 64
    m = rng.uniform(-0.3, 0.3, (n, d)).astype(np.float32)
    tbl = pa.table({
        "vec_id": np.arange(n),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
    })
    model = make_linear_model(4, d)
    out = score_embeddings(
        rd.from_arrow(tbl).repartition(4), ray.put(model), batch_size=128
    ).to_pandas().sort_values("vec_id")
    qx = np.rint(m.astype(np.float64) * 1000).astype(np.int64)
    logits = qx @ model["W"].T
    assert out["cls"].to_numpy().tolist() == np.argmax(logits, axis=1).tolist()
    assert out["logit"].to_numpy().tolist() == logits.max(axis=1).tolist()
    # direct-call form works without ray (blob instead of ref)
    one = BatchScorer(model)(tbl.slice(0, 10))
    assert one.num_rows == 10


def test_resize_bilinear_properties(ray_session):
    """Bilinear resize: flat images stay flat (interpolation exactness),
    a 2x downscale of a checkerboard averages to mid-gray, identity
    resize returns the image unchanged."""
    import numpy as np
    import pyarrow as pa

    flat = np.full((8, 8, 3), 200, np.uint8)
    checker = np.zeros((8, 8, 3), np.uint8)
    checker[::2, 1::2] = 255
    checker[1::2, ::2] = 255

    def to_tbl(img):
        return pa.table({
            "image": pa.FixedSizeListArray.from_arrays(
                pa.array(img.reshape(-1), pa.uint8()), img.size
            ),
            "img_h": pa.array([img.shape[0]], pa.int32()),
            "img_w": pa.array([img.shape[1]], pa.int32()),
        })

    out = mm.resize_bilinear(to_tbl(flat), out_h=5, out_w=3)
    got = np.asarray(out.column("image")[0].as_py(), np.uint8)
    assert (got == 200).all()

    ident = mm.resize_bilinear(to_tbl(checker), out_h=8, out_w=8)
    gi = np.asarray(ident.column("image")[0].as_py(), np.uint8).reshape(8, 8, 3)
    assert (gi == checker).all()

    half = mm.resize_bilinear(to_tbl(checker), out_h=4, out_w=4)
    gh = np.asarray(half.column("image")[0].as_py(), np.uint8).reshape(4, 4, 3)
    assert np.abs(gh.astype(int) - 128).max() <= 1  # 2x2 box avg of 0/255


def test_resize_rejects_mixed_sizes():
    import numpy as np
    import pyarrow as pa

    a = np.zeros((4, 6, 3), np.uint8)
    b = np.zeros((6, 4, 3), np.uint8)  # same element count, transposed
    tbl = pa.table({
        "image": pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate([a.reshape(-1), b.reshape(-1)]),
                     pa.uint8()), a.size),
        "img_h": pa.array([4, 6], pa.int32()),
        "img_w": pa.array([6, 4], pa.int32()),
    })
    for fn in (mm.resize_nearest, mm.resize_bilinear):
        with pytest.raises(ValueError, match="mixed image sizes"):
            fn(tbl, out_h=2, out_w=2)
