"""Adaptive (growing-ring) kNN + resumable corpus-points write tests."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from zen3geo_ray.geom import cells
from zen3geo_ray.sources.corpus import pages_table
from zen3geo_ray.stages.extract import pages_to_points
from zen3geo_ray.stages.knn import adaptive_knn, haversine_km
from zen3geo_ray.state import lineage


def test_adaptive_knn_grows_ring_for_sparse_regions(ray_session):
    rng = np.random.default_rng(5)
    lon = np.concatenate([rng.uniform(-5, 5, 2000), rng.uniform(85, 95, 8)])
    lat = np.concatenate([rng.uniform(40, 50, 2000), rng.uniform(-45, -35, 8)])
    res = 6
    tbl = pa.table(
        {
            "pid": np.arange(len(lon)),
            "lon": lon,
            "lat": lat,
            "cell": cells.cell_of(lon, lat, res),
        }
    )
    queries = {
        "query_id": np.array([0, 1]),
        "lon": np.array([0.0, 90.0]),
        "lat": np.array([45.0, -40.0]),
    }
    out = adaptive_knn(
        rd.from_arrow(tbl), queries, res=res, k=5, ring_k=1, max_ring=16
    ).to_pandas()
    # both the dense and the sparse query reach full k
    assert (out.groupby("query_id").size() == 5).all()
    for qid, (qlon, qlat) in enumerate(zip(queries["lon"], queries["lat"])):
        d = haversine_km(qlon, qlat, lon, lat)
        exp = set(np.argsort(d, kind="stable")[:5].tolist())
        assert set(out[out.query_id == qid]["pid"]) == exp


def test_resumable_points_write_by_coarse_cell(ray_session, tmp_path):
    out_dir = str(tmp_path / "points")
    pages = pages_table(500)

    def run():
        pts = pages_to_points(rd.from_arrow(pages), res=10)
        parted = pts.map_batches(
            lambda b: b.append_column(
                "part_cell",
                pa.array(
                    cells.parent(
                        b.column("cell").to_numpy(zero_copy_only=False), 10, 2
                    )
                ),
            ),
            batch_format="pyarrow",
        )
        return lineage.resumable_write(parted, out_dir, "part_cell").to_pandas()

    m1 = run()
    assert m1["rows"].sum() == 500
    back = lineage.read_partitioned(out_dir)
    assert back.count() == 500
    # resume skips everything
    m2 = run()
    assert len(m2) == 0
    # manifest doubles as metrics: per-partition rows + wall time
    man = lineage.load_manifest(out_dir)
    assert man["rows"].sum() == 500 and (man["wall_s"] >= 0).all()


def test_lsh_knn_multiprobe_recall(ray_session):
    """Multi-probe recall target: >= 0.9 vs brute force at 8 planes,
    probe=2 (the stated recall knob for the scale path)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages import ann

    rng = np.random.default_rng(11)
    n, d, Q, k = 4000, 32, 8, 10
    # clustered data — the regime LSH serves: true neighbors are ANGULARLY
    # close (isotropic gaussians make top-k near-orthogonal, where no
    # sign-pattern scheme can work)
    centers = rng.standard_normal((50, d)).astype(np.float32) * 3.0
    assign = rng.integers(0, 50, n)
    m = (centers[assign] + 0.3 * rng.standard_normal((n, d))).astype(np.float32)
    tbl = pa.table(
        {"vec_id": np.arange(n),
         "embedding": pa.array(list(m), pa.list_(pa.float32()))}
    )
    q = m[rng.choice(n, Q, replace=False)] + 0.1 * rng.standard_normal(
        (Q, d)
    ).astype(np.float32)
    blob = {"query_id": np.arange(Q), "matrix": q}
    exact = ann.brute_force_knn(rd.from_arrow(tbl), blob, k=k).to_pandas()
    approx = ann.lsh_knn(
        rd.from_arrow(tbl), blob, k=k, n_planes=8, probe=2
    ).to_pandas()
    recalls = []
    for qi in range(Q):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / k)
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_knn_recall(ray_session):
    """IVF recall target: >= 0.9 vs brute force at 32 lists, probe=4 on
    clustered embeddings."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages import ann

    rng = np.random.default_rng(21)
    n, d, Q, k = 4000, 32, 8, 10
    centers = rng.standard_normal((50, d)).astype(np.float32) * 3.0
    assign = rng.integers(0, 50, n)
    m = (centers[assign] + 0.3 * rng.standard_normal((n, d))).astype(np.float32)
    tbl = pa.table(
        {"vec_id": np.arange(n),
         "embedding": pa.array(list(m), pa.list_(pa.float32()))}
    )
    q = m[rng.choice(n, Q, replace=False)] + 0.1 * rng.standard_normal(
        (Q, d)
    ).astype(np.float32)
    blob = {"query_id": np.arange(Q), "matrix": q}
    exact = ann.brute_force_knn(rd.from_arrow(tbl), blob, k=k).to_pandas()
    approx = ann.ivf_knn(
        rd.from_arrow(tbl), blob, k=k, n_centroids=32, n_probe=4
    ).to_pandas()
    recalls = []
    for qi in range(Q):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / k)
    assert np.mean(recalls) >= 0.9, recalls


def _clustered(seed, n=4000, d=32, Q=8):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((50, d)).astype(np.float32) * 3.0
    assign = rng.integers(0, 50, n)
    m = (centers[assign] + 0.3 * rng.standard_normal((n, d))).astype(np.float32)
    q = m[rng.choice(n, Q, replace=False)] + 0.1 * rng.standard_normal(
        (Q, d)
    ).astype(np.float32)
    tbl = pa.table(
        {"vec_id": np.arange(n),
         "embedding": pa.array(list(m), pa.list_(pa.float32()))}
    )
    return tbl, {"query_id": np.arange(Q), "matrix": q}


def _mean_recall(exact, approx, Q, k):
    recalls = []
    for qi in range(Q):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / k)
    return float(np.mean(recalls))


def test_auto_lsh_knn_hits_recall_target_without_knobs(ray_session):
    """Recall-targeted auto-tuning: the sampled estimator picks a probe
    radius that actually delivers >= target recall on the full run —
    no hand-picked knob."""
    from zen3geo_ray.stages import ann

    tbl, blob = _clustered(31)
    ds = rd.from_arrow(tbl)
    exact = ann.brute_force_knn(ds, blob, k=10).to_pandas()
    out, probe, est = ann.auto_lsh_knn(
        rd.from_arrow(tbl), blob, k=10, n_planes=8, target_recall=0.9
    )
    assert est >= 0.9
    assert 0 <= probe < 8          # tuner found a real pruning level
    got = _mean_recall(exact, out.to_pandas(), 8, 10)
    assert got >= 0.85, (probe, est, got)  # sampled estimate tracks reality


def test_auto_ivf_knn_hits_recall_target_without_knobs(ray_session):
    from zen3geo_ray.stages import ann

    tbl, blob = _clustered(41)
    ds = rd.from_arrow(tbl)
    exact = ann.brute_force_knn(ds, blob, k=10).to_pandas()
    out, n_probe, est = ann.auto_ivf_knn(
        rd.from_arrow(tbl), blob, k=10, n_centroids=32, target_recall=0.9
    )
    assert est >= 0.9
    assert 1 <= n_probe < 32
    got = _mean_recall(exact, out.to_pandas(), 8, 10)
    assert got >= 0.85, (n_probe, est, got)


def test_tuner_monotone_and_loose_target_prunes_harder(ray_session):
    """A looser recall target must never pick a LARGER probe radius."""
    from zen3geo_ray.stages import ann

    tbl, blob = _clustered(51)
    p_tight, _ = ann.tune_lsh_probe(
        rd.from_arrow(tbl), blob, 10, n_planes=8, target_recall=0.95
    )
    p_loose, _ = ann.tune_lsh_probe(
        rd.from_arrow(tbl), blob, 10, n_planes=8, target_recall=0.5
    )
    assert p_loose <= p_tight


def test_upsert_store_scd1(ray_session, tmp_path):
    """SCD-1 upsert: later runs overwrite per key by (ver, uid) desc;
    unknown keys insert; prior parts are never rewritten."""
    import pyarrow as pa
    import ray.data as rd

    store = str(tmp_path / "upsert")

    def tbl(rows):
        return rd.from_arrow(pa.table({
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "ver": pa.array([r[1] for r in rows], pa.int64()),
            "uid": pa.array([r[2] for r in rows], pa.int64()),
            "v": pa.array([r[3] for r in rows]),
        }))

    v1 = lineage.upsert_store(tbl([(1, 10, 100, "a"), (2, 10, 101, "b")]),
                              store, key_cols=["k"],
                              order_cols=["ver", "uid"]).to_pandas()
    assert dict(zip(v1.k, v1.v)) == {1: "a", 2: "b"}
    # run 2: newer ver for k=1, OLDER ver for k=2 (ignored), new k=3,
    # and a ver tie on k=3 broken by uid desc
    v2 = lineage.upsert_store(
        tbl([(1, 20, 102, "a2"), (2, 5, 103, "old"),
             (3, 7, 104, "c1"), (3, 7, 105, "c2")]),
        store, key_cols=["k"], order_cols=["ver", "uid"]).to_pandas()
    assert dict(zip(v2.k, v2.v)) == {1: "a2", 2: "b", 3: "c2"}
    assert len(v2) == 3
