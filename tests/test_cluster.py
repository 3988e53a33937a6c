"""Distributed exact k-means + SemDeDup (stages/cluster.py).

The oracle parity tests live in test_oracles.py (kmeans / semdedup); here
are the kernel-level invariants: exact quantization, tie-breaks, empty-
cluster semantics, and the blocked pairwise scan vs a naive reference.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from zen3geo_ray.stages.cluster import (
    _OFF, SCALE_BITS, _assign, _quant_matrix, kmeans_assign, semdedup,
)


def _emb_table(ids, mat):
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })


def test_quantize_is_exact_floor():
    # float32 values quantize by exponent shift: floor(x * 2^20) + OFF
    vals = np.array([[0.5, -0.5, 0.25, -1.0]], dtype=np.float32)
    q = _quant_matrix(_emb_table([1], vals), "embedding")
    exp = np.floor(vals.astype(np.float64) * (1 << SCALE_BITS)).astype(np.int64) + _OFF
    assert (q == exp).all()
    assert (q >= 0).all()  # non-negative: truncating // == floor //


def test_assign_tie_breaks_to_smallest_cluster():
    q = np.array([[10, 10]], dtype=np.int64)
    cents = np.array([[12, 10], [8, 10], [10, 12]], dtype=np.int64)  # all dist 4
    assert _assign(q, cents)[0] == 0


def test_assign_exact_at_large_magnitudes():
    # distances up to dim * 2^42 stay exact int64 — no float rounding
    q = np.array([[_OFF * 2 - 1] * 64], dtype=np.int64)
    c = np.array([[0] * 64, [_OFF * 2 - 2] * 64], dtype=np.int64)
    assert _assign(q, c)[0] == 1


def test_kmeans_two_blobs(ray_session):
    rng = np.random.default_rng(7)
    a = rng.normal(0.5, 0.01, size=(40, 8))
    b = rng.normal(-0.5, 0.01, size=(40, 8))
    mat = np.vstack([a, b]).astype(np.float32)
    ids = np.arange(80)
    ds = ray.data.from_arrow(_emb_table(ids, mat))
    cents, asg = kmeans_assign(ds, k=2, iters=3)
    df = asg.to_pandas().sort_values("vec_id")
    lab = df["cluster"].to_numpy()
    # each blob lands in one cluster (seeds are ids 0,1 — both in blob a,
    # but one Lloyd update separates the blobs)
    assert len(set(lab[:40])) == 1 and len(set(lab[40:])) == 1
    assert lab[0] != lab[40]
    assert cents.shape == (2, 8)


def test_kmeans_empty_cluster_keeps_seed(ray_session):
    # two identical points, k=2: cluster 1 goes empty after round 1 and
    # must keep its previous centroid (the COALESCE the oracle mirrors)
    mat = np.array([[0.5] * 4, [0.5] * 4], dtype=np.float32)
    ds = ray.data.from_arrow(_emb_table([0, 1], mat))
    cents, asg = kmeans_assign(ds, k=2, iters=2)
    df = asg.to_pandas().sort_values("vec_id")
    assert (df["cluster"].to_numpy() == 0).all()  # ties -> smallest index
    q = _quant_matrix(_emb_table([0], mat[:1]), "embedding")[0]
    assert (cents[1] == q).all()  # seed centroid survived both rounds


def test_semdedup_drops_smaller_id_neighbors(ray_session):
    # 3 near-identical vectors + 1 far one: ids 11,12 drop against 10
    base = np.full(8, 0.3, dtype=np.float32)
    far = -base
    mat = np.vstack([base, base + 1e-6, base + 2e-6, far]).astype(np.float32)
    ds = ray.data.from_arrow(_emb_table([10, 11, 12, 99], mat))
    out = semdedup(ds, k=1, iters=1, cos_tau=0.9).to_pandas()
    kept = dict(zip(out["vec_id"], out["kept"]))
    assert kept == {10: True, 11: False, 12: False, 99: True}


def test_semdedup_dropped_rows_still_chain(ray_session):
    # a -- b within eps, b -- c within eps, a -- c outside: the EXISTS-
    # smaller-id rule drops BOTH b and c (b counts as c's neighbor even
    # though b itself dropped) — chain semantics the oracle mirrors
    eps = 0.04  # |q-dist| threshold via cos_tau chosen below
    a = np.zeros(4, dtype=np.float32); a[0] = 1.0
    th = 0.25
    b = np.array([np.cos(th), np.sin(th), 0, 0], dtype=np.float32)
    c = np.array([np.cos(2 * th), np.sin(2 * th), 0, 0], dtype=np.float32)
    ds = ray.data.from_arrow(_emb_table([1, 2, 3], np.vstack([a, b, c])))
    # cos(0.25) ~ 0.9689, cos(0.5) ~ 0.8776: tau=0.95 separates them
    out = semdedup(ds, k=1, iters=1, cos_tau=0.95).to_pandas()
    kept = dict(zip(out["vec_id"], out["kept"]))
    assert kept == {1: True, 2: False, 3: False}
    del eps


def test_semdedup_blocked_scan_matches_naive(ray_session):
    rng = np.random.default_rng(3)
    mat = rng.normal(0, 1, size=(300, 16)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    # plant duplicates
    mat[50] = mat[10] + 1e-7
    mat[299] = mat[0]
    ids = np.arange(300)
    ds = ray.data.from_arrow(_emb_table(ids, mat))
    out = semdedup(ds, k=1, iters=1, cos_tau=0.99).to_pandas().sort_values("vec_id")
    q = _quant_matrix(_emb_table(ids, mat), "embedding")
    eps2 = int(np.floor((2.0 - 2.0 * 0.99) * float(1 << (2 * SCALE_BITS))))
    kept_ref = np.ones(300, dtype=bool)
    for i in range(1, 300):
        d = q[:i] - q[i]
        kept_ref[i] = not (np.einsum("ij,ij->i", d, d) <= eps2).any()
    assert (out["kept"].to_numpy() == kept_ref).all()
    assert not kept_ref[50] and not kept_ref[299]


def test_grid_dbscan_reference(ray_session):
    """Grid DBSCAN vs a straight-line reference (core cells, 8-neighbor
    components, border adoption, noise drop) + broadcast/bucketed point
    labeling parity."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.cluster import grid_dbscan

    rng = np.random.default_rng(11)
    lon = np.concatenate([rng.uniform(8, 14, 60), rng.uniform(60, 64, 40),
                          rng.uniform(-170, 170, 30)])
    lat = np.concatenate([rng.uniform(8, 14, 60), rng.uniform(-32, -28, 40),
                          rng.uniform(-80, 80, 30)])
    ids = np.arange(len(lon), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "lon": pa.array(lon),
                  "lat": pa.array(lat)})

    deg, minp, mul = 5.0, 8, 1024
    ix = np.floor((lon + 180.0) / deg).astype(np.int64)
    iy = np.floor((lat + 90.0) / deg).astype(np.int64)
    counts = pd.DataFrame({"ix": ix, "iy": iy}).groupby(
        ["ix", "iy"]).size()
    core = set(counts[counts >= minp].index)
    # union-find over core cells with 8-adjacency
    parent = {c: c for c in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (cx, cy) in core:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in core:
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for c in core:
        members = [k for k in core if find(k) == find(c)]
        comp[c] = min(kx * mul + ky for kx, ky in members)
    expected = {}
    for i, (cx, cy) in enumerate(zip(ix, iy)):
        labels = [comp[(cx + dx, cy + dy)]
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                  if (cx + dx, cy + dy) in core]
        if labels:
            expected[int(ids[i])] = min(labels)

    for thr in (2_000_000, 0):   # broadcast and bucketed point paths
        out = grid_dbscan(rd.from_arrow(t).repartition(4), cell_deg=deg,
                          min_pts=minp, key_mul=mul, n_buckets=8,
                          broadcast_threshold=thr).to_pandas()
        got = dict(zip(out["doc_id"].astype(int),
                       out["cluster"].astype(int)))
        assert got == expected


# --- product quantization ---------------------------------------------------

def _emb_dataset(vecs, ids, blocks):
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    return rd.from_arrow(t).repartition(blocks)


def test_pq_codes_block_invariant_and_reference(ray_session):
    from zen3geo_ray.stages.cluster import (_OFF, SCALE_BITS, _assign,
                                            pq_codes)

    rng = np.random.default_rng(17)
    n, dim, n_sub, k = 240, 32, 4, 8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)

    books1, codes1 = pq_codes(_emb_dataset(vecs, ids, 1),
                              n_sub=n_sub, k=k, iters=2)
    books7, codes7 = pq_codes(_emb_dataset(vecs, ids, 7),
                              n_sub=n_sub, k=k, iters=2)
    # training partials are integer sums -> block-split invariant
    for a, b in zip(books1, books7):
        assert np.array_equal(a, b)
    c1 = codes1.to_pandas().sort_values(["vec_id", "sub"]).reset_index(drop=True)
    c7 = codes7.to_pandas().sort_values(["vec_id", "sub"]).reset_index(drop=True)
    assert c1.equals(c7)
    # codes match a direct assignment against the trained books
    q = (np.floor(vecs.astype(np.float64) * (1 << SCALE_BITS))
         .astype(np.int64) + _OFF)
    sd = dim // n_sub
    for s in range(n_sub):
        want = _assign(q[:, s * sd:(s + 1) * sd], books1[s])
        got = c1[c1["sub"] == s].set_index("vec_id")["code"]
        assert np.array_equal(got.loc[ids].to_numpy(), want)


def test_pq_adc_topk_reference_and_sanity(ray_session):
    from zen3geo_ray.stages.cluster import (_OFF, SCALE_BITS, _assign,
                                            pq_adc_topk, pq_train)

    rng = np.random.default_rng(19)
    n, dim, n_sub, k, top = 300, 32, 4, 8, 12
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = np.arange(n, dtype=np.int64)
    qv = vecs[5].copy()
    out = pq_adc_topk(_emb_dataset(vecs, ids, 6), qv, n_sub=n_sub,
                      k=k, iters=2, top=top).to_pandas()
    # reference: train the same books, full-table ADC, lexsorted top
    books = pq_train(_emb_dataset(vecs, ids, 6), n_sub=n_sub, k=k, iters=2)
    q = (np.floor(vecs.astype(np.float64) * (1 << SCALE_BITS))
         .astype(np.int64) + _OFF)
    qq = (np.floor(qv.astype(np.float64) * (1 << SCALE_BITS))
          .astype(np.int64) + _OFF)
    sd = dim // n_sub
    dist = np.zeros(n, dtype=np.int64)
    for s in range(n_sub):
        d = books[s] - qq[s * sd:(s + 1) * sd]
        tab = np.einsum("ij,ij->i", d, d)
        dist += tab[_assign(q[:, s * sd:(s + 1) * sd], books[s])]
    order = np.lexsort((ids, dist))[:top]
    assert list(out["vec_id"]) == list(ids[order])
    assert list(out["dist"]) == list(dist[order])
    assert list(out["rank"]) == list(range(1, top + 1))
    # ADC sanity: the query's own vector quantizes to its cell -> its
    # ADC distance is among the smallest; it must appear in the top set
    assert 5 in set(out["vec_id"])


def test_pq_train_dim_divisibility_guard(ray_session):
    from zen3geo_ray.stages.cluster import pq_train

    vecs = np.eye(3, 10, dtype=np.float32)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(_emb_dataset(vecs, np.arange(3, dtype=np.int64), 1),
                 n_sub=4, k=2, iters=1)


def test_ivfpq_full_probe_equals_pq_and_partial_probe_recall(ray_session):
    from zen3geo_ray.stages.cluster import ivfpq_topk, pq_adc_topk

    rng = np.random.default_rng(23)
    n, dim = 400, 32
    # clustered data so coarse lists are meaningful
    centers = rng.normal(size=(8, dim)).astype(np.float32) * 3
    lab = rng.integers(0, 8, n)
    vecs = (centers[lab] + rng.normal(size=(n, dim)).astype(np.float32)
            * 0.3).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    qv = vecs[7].copy()
    kw = dict(n_sub=4, k=8, iters=2, top=10)

    # probing EVERY list degenerates to plain PQ ADC — bit-identical
    full = ivfpq_topk(_emb_dataset(vecs, ids, 5), qv, n_lists=8,
                      n_probe=8, **kw)
    plain = pq_adc_topk(_emb_dataset(vecs, ids, 5), qv, **kw)
    assert full.equals(plain)

    # partial probe: the query's own vector survives (its list is the
    # nearest by construction) and results overlap the full-probe top
    part = ivfpq_topk(_emb_dataset(vecs, ids, 5), qv, n_lists=8,
                      n_probe=2, **kw).to_pandas()
    assert 7 in set(part["vec_id"])
    overlap = len(set(part["vec_id"]) & set(full["vec_id"].to_pylist()))
    assert overlap >= 6  # clustered data: 2/8 lists hold the neighborhood
    # block invariance
    part9 = ivfpq_topk(_emb_dataset(vecs, ids, 9), qv, n_lists=8,
                       n_probe=2, **kw).to_pandas()
    assert part.equals(part9)


def test_cluster_purity_reference(ray_session):
    """Purity vs a straight-line recomputation from kmeans_assign's own
    (reference-pinned) assignment plus the truth labels."""
    import pandas as pd
    import ray.data as rd

    from zen3geo_ray.stages.cluster import cluster_purity, kmeans_assign

    rng = np.random.default_rng(11)
    n, dim, k = 240, 8, 4
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    truth = rng.integers(0, 5, n).astype(np.int64)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(truth),
    })
    ds = rd.from_arrow(t).repartition(4)
    _, asg = kmeans_assign(ds, k=k, iters=2)
    ref = pd.DataFrame({"cluster": asg.to_pandas()["cluster"],
                        "truth": truth[asg.to_pandas()["vec_id"]]})
    want = {}
    for c, g in ref.groupby("cluster"):
        vc = g.groupby("truth").size().reset_index(name="c") \
            .sort_values(["c", "truth"], ascending=[False, True])
        want[int(c)] = (len(g), int(vc.iloc[0]["truth"]),
                        int(vc.iloc[0]["c"]))
    out = cluster_purity(ds, k=k, iters=2, n_buckets=4).to_pandas()
    got = {int(r.cluster): (int(r.n), int(r.top_truth), int(r.top_n))
           for r in out.itertuples()}
    assert got == want


def test_cluster_purity_rejects_bad_truth(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.cluster import cluster_purity

    t = pa.table({
        "vec_id": pa.array(np.arange(8, dtype=np.int64)),
        "embedding": pa.array([[0.0] * 4] * 8, pa.list_(pa.float32())),
        "label": pa.array([-1] * 8, pa.int64()),
    })
    with pytest.raises(Exception):
        cluster_purity(rd.from_arrow(t), k=2, iters=1).to_pandas()


def test_knn_label_agreement_planted(ray_session):
    """Two well-separated clusters with consistent labels plus one
    mislabeled point inside cluster A: only the plant is noisy, and a
    brute-force recomputation agrees row for row."""
    import ray.data as rd

    from zen3geo_ray.stages.cluster import knn_label_agreement

    rng = np.random.default_rng(33)
    a = rng.normal(0.0, 0.05, size=(30, 8)).astype(np.float32)
    b = rng.normal(3.0, 0.05, size=(30, 8)).astype(np.float32)
    vecs = np.concatenate([a, b])
    labels = np.array([0] * 30 + [1] * 30, dtype=np.int64)
    labels[7] = 1  # the plant: cluster-A geometry, cluster-B label
    t = pa.table({
        "vec_id": pa.array(np.arange(60, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels),
    })
    out = knn_label_agreement(rd.from_arrow(t).repartition(3), k=5) \
        .to_pandas().set_index("vec_id").sort_index()
    assert bool(out.loc[7, "noisy"])
    assert int(out.loc[7, "agree"]) == 0
    clean = out.drop(index=7)
    assert not clean["noisy"].any()
    assert (clean["k_used"] == 5).all()

    # brute-force parity on agree counts
    q = np.floor(vecs.astype(np.float64) * (1 << 20)).astype(np.int64)
    for vid in (0, 7, 45):
        d = ((q - q[vid]) ** 2).sum(axis=1)
        d[vid] = np.iinfo(np.int64).max
        order = np.lexsort((np.arange(60), d))[:5]
        want = int((labels[order] == labels[vid]).sum())
        assert int(out.loc[vid, "agree"]) == want


def test_label_centroids(ray_session):
    """Quantized centroid means match the direct numpy mean within
    quantization error; partials merge across blocks exactly."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.cluster import label_centroids

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(300, 8)).astype(np.float32)
    labs = rng.integers(0, 3, 300).astype(np.int32)
    t = pa.table({"embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32())),
                  "label": pa.array(labs)})
    out = label_centroids(rd.from_arrow(t).repartition(5), dim=8,
                          scale=1 << 20, n_buckets=2).to_pandas()
    assert len(out) == 24
    for r in out.itertuples():
        col = vecs[labs == r.label][:, r.d].astype(np.float64)
        s = sum(math.floor(float(v) * float(1 << 20)) for v in col)
        assert (int(r.n), int(r.s)) == (len(col), s)
        assert r.mean == s / (float(len(col)) * float(1 << 20))
        assert abs(r.mean - col.mean()) < 1e-5


def test_centroid_cosine_pairs(ray_session):
    """Self-similar labels give cos ~1; orthogonal prototypes ~0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.cluster import centroid_cosine_pairs

    rng = np.random.default_rng(9)
    # label 0/1: same direction e0 (+noise); label 2: direction e1
    base = np.zeros((3, 8), dtype=np.float64)
    base[0, 0] = base[1, 0] = 1.0
    base[2, 1] = 1.0
    vecs, labs = [], []
    for lab in range(3):
        for _ in range(50):
            vecs.append((base[lab] + rng.normal(scale=0.01, size=8))
                        .astype(np.float32))
            labs.append(lab)
    t = pa.table({"embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array(np.array(labs, dtype=np.int32))})
    out = centroid_cosine_pairs(rd.from_arrow(t).repartition(4),
                                dim=8, n_buckets=2).to_pandas()
    got = {(int(r.la), int(r.lb)): float(r.cos)
           for r in out.itertuples()}
    assert got[(0, 1)] > 0.999
    assert abs(got[(0, 2)]) < 0.05 and abs(got[(1, 2)]) < 0.05


def test_gram_matrix(ray_session):
    """Quantized Gram entries equal the numpy int64 matmul exactly,
    regardless of block split."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.cluster import gram_matrix

    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(120, 8)).astype(np.float32)
    t = pa.table({"embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    scale = 1 << 10
    out = gram_matrix(rd.from_arrow(t).repartition(5), dim=8,
                      scale=scale, n_buckets=2).to_pandas()
    assert len(out) == 8 * 9 // 2
    q = np.floor(vecs.astype(np.float64) * float(scale)).astype(np.int64)
    g = q.T @ q
    for r in out.itertuples():
        assert int(r.n) == len(vecs)
        assert int(r.s) == g[int(r.i), int(r.j)]
        assert r.gram == (float(int(r.s))
                          / (float(len(vecs)) * float(scale)
                             * float(scale)))


def test_gram_power_iteration_top_pc(ray_session):
    """The iterated direction matches numpy's top eigenvector of the
    same quantized Gram (up to sign/max-normalization) and the
    Rayleigh quotient approaches the top eigenvalue."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.cluster import gram_power_iteration

    rng = np.random.default_rng(17)
    # strong first axis, weak noise elsewhere
    n, dim, scale = 200, 8, 1 << 10
    vecs = rng.normal(size=(n, dim)).astype(np.float32) * 0.05
    vecs[:, 0] += rng.normal(size=n).astype(np.float32) * 1.0
    t = pa.table({"embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    out = gram_power_iteration(rd.from_arrow(t).repartition(4),
                               dim=dim, scale=scale, rounds=8,
                               n_buckets=2).to_pandas()
    q = np.floor(vecs.astype(np.float64) * scale).astype(np.int64)
    g = (q.T @ q).astype(np.float64)
    evals, evecs = np.linalg.eigh(g)
    top = evecs[:, -1] * np.sign(evecs[np.abs(evecs[:, -1]).argmax(), -1])
    v = out["v"].to_numpy().astype(np.float64)
    v = v / np.abs(v).max() * np.sign(v[np.abs(v).argmax()])
    cos = abs(np.dot(v, top)) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999
    assert out["eig"].iloc[0] == pytest.approx(
        evals[-1] / (scale * scale), rel=1e-3)


def test_silhouette_separated_vs_merged(ray_session):
    """Two tight well-separated blobs with k=2 -> sil near 1 for both
    clusters; per-point values match the brute quantized formula."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.cluster import (SIL_SCALE, _quant_matrix,
                                            silhouette_score)

    rng = np.random.default_rng(7)
    dim = 8
    a = rng.normal(0.0, 0.01, (30, dim)) + 0.5
    b = rng.normal(0.0, 0.01, (30, dim)) - 0.5
    vecs = np.concatenate([a, b]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(60, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})
    out = silhouette_score(rd.from_arrow(t).repartition(3), k=2,
                           iters=2, n_buckets=2).to_pandas()
    assert len(out) == 2
    assert int(out.n.sum()) == 60
    assert (out.sil > 0.9).all()
    # identical blobs collapse: every point equidistant-ish -> sil ~ 0
    t2 = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([[0.25] * dim] * 40, pa.list_(pa.float32()))})
    o2 = silhouette_score(rd.from_arrow(t2), k=2, iters=1,
                          n_buckets=2).to_pandas()
    # all points identical: a2 = b2 = 0 -> s_q = 0 exactly
    assert (o2.s_sum == 0).all() and (o2.sil == 0.0).all()


def test_knn_confusion_separable_and_ties(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.cluster import knn_confusion

    # two tight blobs, labels 0/1; even ids train, odd ids test ->
    # perfect diagonal
    rng = np.random.default_rng(17)
    dim = 4
    vecs, labs = [], []
    for i in range(40):
        lab = i % 2 == 0  # interleave so both halves see both labels
        base = 0.8 if (i // 2) % 2 == 0 else -0.8
        vecs.append((rng.normal(0, 0.02, dim) + base).tolist())
        labs.append(0 if base > 0 else 1)
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labs, pa.int64())})
    out = knn_confusion(rd.from_arrow(t).repartition(3),
                        k=3).to_pandas()
    got = {(int(r.true_label), int(r.pred_label)): int(r.n)
           for r in out.itertuples()}
    assert got == {(0, 0): 10, (1, 1): 10}

    # vote tie (k=2, one neighbor each label equidistant) -> label 0
    t2 = pa.table({
        "vec_id": pa.array([0, 2, 1], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 0.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([7, 3, 9], pa.int64())})
    o2 = knn_confusion(rd.from_arrow(t2), k=2).to_pandas()
    assert [(int(r.true_label), int(r.pred_label), int(r.n))
            for r in o2.itertuples()] == [(9, 3, 1)]
