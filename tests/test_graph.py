"""Iterative graph operators (stages/graph.py): exact fixed-point
PageRank and bounded-hop multi-source BFS vs driver-side references."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from zen3geo_ray.stages.graph import (
    bfs_hops,
    distinct_tuples,
    node_degrees,
    pagerank,
)

SCALE, DN, DD = 10 ** 12, 85, 100


def _random_graph(seed=7, n_nodes=200, n_edges=1500):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([src[m], dst[m]], 1), axis=0)
    src, dst = pairs[:, 0].copy(), pairs[:, 1].copy()
    # a dangling node (500: in-edges only) exercises outdeg=0 handling
    src = np.append(src, [3])
    dst = np.append(dst, [500])
    return src, dst


def _ref_pagerank(src, dst, iters):
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n, np.int64)
    for s in src:
        outdeg[idx[int(s)]] += 1
    base = ((DD - DN) * SCALE) // (DD * n)
    pr = np.full(n, SCALE // n, np.int64)
    si = np.array([idx[int(s)] for s in src])
    di = np.array([idx[int(d)] for d in dst])
    for _ in range(iters):
        contrib = pr[si] // outdeg[si]
        acc = np.zeros(n, np.int64)
        np.add.at(acc, di, contrib)
        pr = base + (DN * acc) // DD
    return dict(zip(nodes.tolist(), pr.tolist()))


import pytest


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_pagerank_matches_integer_reference(ray_session, bt):
    src, dst = _random_graph()
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(6)
    out = pagerank(edges, iters=3, scale=SCALE, d_num=DN, d_den=DD,
                   n_buckets=8, broadcast_threshold=bt).to_pandas()
    ref = _ref_pagerank(src, dst, 3)
    got = dict(zip(out["node"], out["pr"]))
    assert got == ref  # exact int equality, every node present


def test_pagerank_two_node_cycle(ray_session):
    # A<->B symmetric: stationary by symmetry; one round must already
    # produce base + (85 * (scale//2)) // 100 for both nodes
    edges = rd.from_arrow(pa.table({"src": [0, 1], "dst": [1, 0]}))
    out = pagerank(edges, iters=1, scale=SCALE, n_buckets=8).to_pandas()
    base = ((DD - DN) * SCALE) // (DD * 2)
    want = base + (DN * (SCALE // 2)) // DD
    assert sorted(out["node"]) == [0, 1]
    assert set(out["pr"]) == {want}


def test_node_degrees_covers_dst_only_nodes(ray_session):
    edges = rd.from_arrow(pa.table({"src": [1, 1, 2], "dst": [2, 3, 9]}))
    out = node_degrees(edges, n_buckets=8).to_pandas()
    got = dict(zip(out["node"], out["outdeg"]))
    assert got == {1: 2, 2: 1, 3: 0, 9: 0}


def test_distinct_tuples(ray_session):
    t = pa.table({"a": [1, 1, 2, 2, 1], "b": [5, 5, 6, 6, 7]})
    out = distinct_tuples(rd.from_arrow(t).repartition(3), ["a", "b"])
    got = sorted(map(tuple, out.to_pandas().itertuples(index=False)))
    assert got == [(1, 5), (1, 7), (2, 6)]


def test_bfs_hops_matches_reference(ray_session):
    src, dst = _random_graph(seed=11, n_nodes=120, n_edges=500)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(5)
    seed_nodes = np.unique(src[src % 10 == 0]).astype(np.int64)
    seeds = rd.from_arrow(pa.table({"node": seed_nodes}))

    dist = {int(v): 0 for v in seed_nodes}
    for _ in range(3):
        new = dict(dist)
        for s, d in zip(src, dst):
            if int(s) in dist:
                cand = dist[int(s)] + 1
                if cand < new.get(int(d), 1 << 30):
                    new[int(d)] = cand
        dist = new

    for bt in (0, 2_000_000):  # bucketed AND broadcast paths
        out = bfs_hops(edges, seeds, max_hops=3, n_buckets=8,
                       broadcast_threshold=bt).to_pandas()
        assert dict(zip(out["node"], out["dist"])) == dist


def test_bfs_unreachable_nodes_absent(ray_session):
    # chain 0->1->2->3->4, seed {0}, 2 hops: node 3/4 must NOT appear
    edges = rd.from_arrow(pa.table({"src": [0, 1, 2, 3],
                                    "dst": [1, 2, 3, 4]}))
    seeds = rd.from_arrow(pa.table({"node": pa.array([0], pa.int64())}))
    out = bfs_hops(edges, seeds, max_hops=2, n_buckets=8).to_pandas()
    assert dict(zip(out["node"], out["dist"])) == {0: 0, 1: 1, 2: 2}


def _ref_components(src, dst):
    # union-find
    nodes = np.unique(np.concatenate([src, dst]))
    parent = {int(v): int(v) for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(src, dst):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {int(v): find(int(v)) for v in nodes}


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_connected_components_random(ray_session, bt):
    from zen3geo_ray.stages.graph import connected_components

    rng = np.random.default_rng(3)
    src = rng.integers(0, 80, 120).astype(np.int64)
    dst = rng.integers(0, 80, 120).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    out = connected_components(edges, n_buckets=8,
                               broadcast_threshold=bt).to_pandas()
    assert dict(zip(out["node"], out["comp"])) == _ref_components(src, dst)


def test_connected_components_long_chain_log_rounds(ray_session):
    from zen3geo_ray.stages.graph import connected_components

    # a 30-deep chain: relax+jump halves depth per round, so 7 rounds
    # (not 30) suffice — pins the pointer-jump interleave
    n = 30
    src = np.arange(1, n, dtype=np.int64)
    dst = np.arange(0, n - 1, dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    out = connected_components(edges, max_rounds=7, n_buckets=8).to_pandas()
    assert sorted(out["node"]) == list(range(n))
    assert set(out["comp"]) == {0}


def test_connected_components_round_budget_raises(ray_session):
    import pytest

    from zen3geo_ray.stages.graph import connected_components

    n = 30
    src = np.arange(1, n, dtype=np.int64)
    dst = np.arange(0, n - 1, dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    for bt in (0, 2_000_000):
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, max_rounds=2, n_buckets=8,
                                 broadcast_threshold=bt)


def test_connected_components_self_loop_singleton(ray_session):
    from zen3geo_ray.stages.graph import connected_components

    edges = rd.from_arrow(pa.table({"src": [7, 1], "dst": [7, 2]}))
    out = connected_components(edges, n_buckets=8).to_pandas()
    assert dict(zip(out["node"], out["comp"])) == {7: 7, 1: 1, 2: 1}


def _ref_triangles(src, dst):
    import itertools
    adj = {}
    for s, d in zip(src, dst):
        if s == d:
            continue
        u, v = int(min(s, d)), int(max(s, d))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n = 0
    for v, nbrs in adj.items():
        for a, b in itertools.combinations(sorted(nbrs), 2):
            if v < a and b in adj.get(a, ()):  # count at min vertex
                n += 1
    return n


def test_triangle_count_random(ray_session):
    from zen3geo_ray.stages.graph import triangle_count

    rng = np.random.default_rng(5)
    src = rng.integers(0, 40, 300).astype(np.int64)
    dst = rng.integers(0, 40, 300).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    for bt in (0, 2_000_000):  # bucketed AND broadcast orientation
        out = triangle_count(edges, n_buckets=8,
                             broadcast_threshold=bt).to_pandas()
        assert len(out) == 1
        assert out["n_tri"][0] == _ref_triangles(src, dst)


def test_triangle_count_k4(ray_session):
    from zen3geo_ray.stages.graph import triangle_count

    # K4 has exactly 4 triangles; feed edges in mixed orientation + dups
    src = np.array([0, 0, 0, 1, 2, 3, 1], np.int64)
    dst = np.array([1, 2, 3, 2, 3, 1, 0], np.int64)
    out = triangle_count(rd.from_arrow(pa.table({"src": src, "dst": dst})),
                         n_buckets=8).to_pandas()
    assert out["n_tri"][0] == 4


def test_triangle_count_triangle_free(ray_session):
    from zen3geo_ray.stages.graph import triangle_count

    # a star (bipartite) has zero triangles
    src = np.zeros(5, np.int64)
    dst = np.arange(1, 6, dtype=np.int64)
    out = triangle_count(rd.from_arrow(pa.table({"src": src, "dst": dst})),
                         n_buckets=8).to_pandas()
    assert out["n_tri"][0] == 0


def _ref_kcore(src, dst, k, rounds):
    edges = set()
    for s, d in zip(src, dst):
        if s != d:
            edges.add((int(min(s, d)), int(max(s, d))))
    alive = None
    deg = {}
    for _ in range(rounds):
        deg = {}
        for u, v in edges:
            if alive is None or (u in alive and v in alive):
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        deg = {n: d for n, d in deg.items() if d >= k}
    return deg


def test_kcore_matches_reference(ray_session):
    from zen3geo_ray.stages.graph import kcore

    rng = np.random.default_rng(9)
    src = rng.integers(0, 30, 150).astype(np.int64)
    dst = rng.integers(0, 30, 150).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    for bt in (0, 2_000_000):  # bucketed AND broadcast paths
        out = kcore(edges, k=3, rounds=4, n_buckets=8,
                    broadcast_threshold=bt).to_pandas()
        assert dict(zip(out["node"], out["deg"])) == _ref_kcore(src, dst, 3, 4)


def test_kcore_k4_with_pendant(ray_session):
    from zen3geo_ray.stages.graph import kcore

    # K4 (nodes 0-3) + pendant 4-0: 3-core keeps exactly the K4 at deg 3
    src = np.array([0, 0, 0, 1, 1, 2, 4], np.int64)
    dst = np.array([1, 2, 3, 2, 3, 3, 0], np.int64)
    out = kcore(rd.from_arrow(pa.table({"src": src, "dst": dst})),
                k=3, rounds=3, n_buckets=8).to_pandas()
    assert dict(zip(out["node"], out["deg"])) == {0: 3, 1: 3, 2: 3, 3: 3}


def _ref_ppr(src, dst, iters, seed_pred):
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n, np.int64)
    for s in src:
        outdeg[idx[int(s)]] += 1
    flags = np.array([1 if seed_pred(int(v)) else 0 for v in nodes], np.int64)
    ns = int(flags.sum())
    base = ((DD - DN) * SCALE) // (DD * ns)
    pr = flags * (SCALE // ns)
    si = np.array([idx[int(s)] for s in src])
    di = np.array([idx[int(d)] for d in dst])
    for _ in range(iters):
        contrib = np.where(outdeg[si] > 0, pr[si] // np.maximum(outdeg[si], 1), 0)
        acc = np.zeros(n, np.int64)
        np.add.at(acc, di, contrib)
        pr = flags * base + (DN * acc) // DD
    return dict(zip(nodes.tolist(), pr.tolist()))


def test_personalized_pagerank_both_paths(ray_session):
    src, dst = _random_graph(seed=13, n_nodes=100, n_edges=400)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    seed_nodes = np.unique(np.concatenate([src, dst]))
    seed_nodes = seed_nodes[seed_nodes % 7 == 0].astype(np.int64)
    seeds = rd.from_arrow(pa.table({"node": seed_nodes}))
    ref = _ref_ppr(src, dst, 3, lambda v: v % 7 == 0)
    for bt in (0, 2_000_000):
        out = pagerank(edges, iters=3, scale=SCALE, d_num=DN, d_den=DD,
                       n_buckets=8, seeds=seeds,
                       broadcast_threshold=bt).to_pandas()
        assert dict(zip(out["node"], out["pr"])) == ref
        assert list(out.columns) == ["node", "outdeg", "pr"]


def test_weighted_pagerank_both_paths(ray_session):
    rng = np.random.default_rng(21)
    src = rng.integers(0, 60, 250).astype(np.int64)
    dst = rng.integers(0, 60, 250).astype(np.int64)
    w = rng.integers(1, 6, 250).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w})
                          ).repartition(4)

    # integer reference with out-weights
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw = np.zeros(n, np.int64)
    for s, ww in zip(src, w):
        outw[idx[int(s)]] += ww
    base = ((DD - DN) * SCALE) // (DD * n)
    pr = np.full(n, SCALE // n, np.int64)
    si = np.array([idx[int(s)] for s in src])
    di = np.array([idx[int(d)] for d in dst])
    for _ in range(3):
        contrib = (pr[si] * w) // outw[si]
        acc = np.zeros(n, np.int64)
        np.add.at(acc, di, contrib)
        pr = base + (DN * acc) // DD
    ref = dict(zip(nodes.tolist(), pr.tolist()))

    for bt in (0, 2_000_000):
        out = pagerank(edges, iters=3, scale=SCALE, d_num=DN, d_den=DD,
                       n_buckets=8, weight_col="w",
                       broadcast_threshold=bt).to_pandas()
        assert dict(zip(out["node"], out["pr"])) == ref


def test_pinned_pagerank_parity_and_empty(ray_session):
    from zen3geo_ray.stages.pregel import pinned_pagerank

    src, dst = _random_graph(seed=29, n_nodes=150, n_edges=900)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(5)
    want = pagerank(edges, iters=4, n_buckets=8,
                    broadcast_threshold=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    got = pinned_pagerank(edges, iters=4, n_shards=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    # bit-identical to the Dataset BSP path (same integer recurrence)
    assert want["node"].equals(got["node"])
    assert want["outdeg"].equals(got["outdeg"])
    assert want["pr"].equals(got["pr"])

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    out = pinned_pagerank(empty, iters=2, n_shards=2).to_pandas()
    assert len(out) == 0


def test_pinned_pagerank_single_shard(ray_session):
    from zen3geo_ray.stages.pregel import pinned_pagerank

    edges = rd.from_arrow(pa.table({"src": [0, 1], "dst": [1, 0]}))
    out = pinned_pagerank(edges, iters=1, n_shards=1).to_pandas()
    base = ((DD - DN) * SCALE) // (DD * 2)
    want = base + (DN * (SCALE // 2)) // DD
    assert set(out["pr"]) == {want}


def test_pinned_components_parity(ray_session):
    from zen3geo_ray.stages.graph import connected_components
    from zen3geo_ray.stages.pregel import pinned_components

    rng = np.random.default_rng(31)
    src = rng.integers(0, 90, 140).astype(np.int64)
    dst = rng.integers(0, 90, 140).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    want = connected_components(edges, n_buckets=8).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    got = pinned_components(edges, n_shards=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert want["node"].equals(got["node"])
    assert want["comp"].equals(got["comp"])


def test_pinned_components_round_budget(ray_session):
    import pytest

    from zen3geo_ray.stages.pregel import pinned_components

    n = 20  # chain of diameter 19; 3 relax rounds can't finish
    edges = rd.from_arrow(pa.table({"src": np.arange(1, n, dtype=np.int64),
                                    "dst": np.arange(0, n - 1, dtype=np.int64)}))
    with pytest.raises(RuntimeError, match="did not converge"):
        pinned_components(edges, max_rounds=3, n_shards=2)


def test_common_neighbors_reference(ray_session):
    from zen3geo_ray.stages.graph import common_neighbors

    rng = np.random.default_rng(41)
    src = rng.integers(0, 40, 200).astype(np.int64)
    dst = rng.integers(0, 40, 200).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)

    # brute reference with the same degree cap
    adj = {}
    for s, d in zip(src, dst):
        if s == d:
            continue
        u, v = int(min(s, d)), int(max(s, d))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    ref = {}
    for z, nbrs in adj.items():
        if len(nbrs) > 6:
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                ref[(ns[i], ns[j])] = ref.get((ns[i], ns[j]), 0) + 1
    ref = {k: n for k, n in ref.items() if n >= 2}

    out = common_neighbors(edges, max_degree=6, min_common=2,
                           n_buckets=8).to_pandas()
    got = {(int(r.u), int(r.v)): int(r.n_common)
           for r in out.itertuples(index=False)}
    assert got == ref


def test_common_neighbors_hub_guard_excludes_center(ray_session):
    from zen3geo_ray.stages.graph import common_neighbors

    # star center 0 with 5 leaves: cap 4 excludes it -> no pairs at all
    src = np.zeros(5, np.int64)
    dst = np.arange(1, 6, dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    out = common_neighbors(edges, max_degree=4, min_common=1,
                           n_buckets=8).to_pandas()
    assert len(out) == 0
    # cap 5 admits it: C(5,2)=10 pairs, each with exactly 1 common nbr
    out2 = common_neighbors(edges, max_degree=5, min_common=1,
                            n_buckets=8).to_pandas()
    assert len(out2) == 10
    assert set(out2["n_common"]) == {1}


def test_link_prediction_scores_golden(ray_session):
    from zen3geo_ray.stages.graph import common_neighbors

    # square 1-2-3-4-1 plus diagonal 1-3: known degrees/overlaps
    src = np.array([1, 2, 3, 4, 1], np.int64)
    dst = np.array([2, 3, 4, 1, 3], np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    out = common_neighbors(edges, max_degree=16, min_common=1,
                           n_buckets=8, scores=True).to_pandas()
    got = {(int(r.u), int(r.v)): (int(r.n_common), float(r.jaccard),
                                  int(r.pa_score))
           for r in out.itertuples(index=False)}
    # deg: 1->3 (2,4,3), 2->2 (1,3), 3->3 (2,4,1), 4->2 (3,1)
    assert got[(2, 4)] == (2, 2 / (2 + 2 - 2), 4)   # common {1,3}
    assert got[(1, 3)] == (2, 2 / (3 + 3 - 2), 9)   # common {2,4}
    assert got[(1, 2)] == (1, 1 / (3 + 2 - 1), 6)   # common {3}
    # both execution paths agree
    out2 = common_neighbors(edges, max_degree=16, min_common=1,
                            n_buckets=8, scores=True,
                            broadcast_threshold=0).to_pandas()
    a = out.sort_values(["u", "v"]).reset_index(drop=True)
    b = out2.sort_values(["u", "v"]).reset_index(drop=True)
    assert a[["u", "v", "n_common", "pa_score"]].equals(
        b[["u", "v", "n_common", "pa_score"]])
    assert np.array_equal(a["jaccard"].to_numpy(), b["jaccard"].to_numpy())


def test_adamic_adar_golden_and_parity(ray_session):
    import math

    from zen3geo_ray.stages.graph import common_neighbors

    # square 1-2-3-4-1 plus diagonal 1-3: deg 1->3, 2->2, 3->3, 4->2
    src = np.array([1, 2, 3, 4, 1], np.int64)
    dst = np.array([2, 3, 4, 1, 3], np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    out = common_neighbors(edges, max_degree=16, min_common=1,
                           n_buckets=8, aa=True).to_pandas()
    w = {d: int((1 << 16) / math.log(d)) for d in (2, 3)}
    r = {d: (1 << 16) // d for d in (2, 3)}
    got = {(int(x.u), int(x.v)): (int(x.aa_q), int(x.ra_q))
           for x in out.itertuples(index=False)}
    assert got[(2, 4)] == (2 * w[3], 2 * r[3])      # common {1,3}, deg 3
    assert got[(1, 3)] == (2 * w[2], 2 * r[2])      # common {2,4}, deg 2
    assert got[(1, 2)] == (w[3], r[3])              # common {3}
    assert got[(3, 4)] == (w[3], r[3])              # common {1}
    # float columns are the exact /65536 rescale
    assert np.array_equal(out["aa"].to_numpy(),
                          out["aa_q"].to_numpy() / 65536.0)
    # bucketed path agrees bit-for-bit
    out2 = common_neighbors(edges, max_degree=16, min_common=1,
                            n_buckets=8, aa=True,
                            broadcast_threshold=0).to_pandas()
    cols = ["u", "v", "n_common", "aa_q", "ra_q", "aa", "ra"]
    a = out.sort_values(["u", "v"]).reset_index(drop=True)[cols]
    b = out2.sort_values(["u", "v"]).reset_index(drop=True)[cols]
    assert a.equals(b)
    # hub guard interacts: cap 2 keeps only deg-2 centers (2 and 4)
    out3 = common_neighbors(edges, max_degree=2, min_common=1,
                            n_buckets=8, aa=True).to_pandas()
    got3 = {(int(x.u), int(x.v)): int(x.aa_q)
            for x in out3.itertuples(index=False)}
    assert got3 == {(1, 3): 2 * w[2]}


def test_stress_centrality_goldens(ray_session):
    from zen3geo_ray.stages.graph import stress_centrality

    # path 1-2-3-4-5, seeds {1, 5}: within 4 hops every interior node
    # carries the single shortest path -> stress 1 each
    edges = rd.from_arrow(pa.table({"src": np.array([1, 2, 3, 4], np.int64),
                                    "dst": np.array([2, 3, 4, 5], np.int64)}))
    seeds = rd.from_arrow(pa.table({"node": np.array([1, 5], np.int64)}))
    out = stress_centrality(edges, seeds, max_hops=4).to_pandas()
    got = dict(zip(out["node"].astype(int), out["stress"].astype(int)))
    assert got == {2: 1, 3: 1, 4: 1}
    # bounded hops: d(1,5)=4 > 3 -> pair unreachable, empty result
    out2 = stress_centrality(edges, seeds, max_hops=3).to_pandas()
    assert len(out2) == 0

    # diamond 1-2-4, 1-3-4, seeds {1, 4}: sigma_14 = 2 via 2 and 3
    dm = rd.from_arrow(pa.table({"src": np.array([1, 1, 2, 3], np.int64),
                                 "dst": np.array([2, 3, 4, 4], np.int64)}))
    sd = rd.from_arrow(pa.table({"node": np.array([1, 4], np.int64)}))
    out3 = stress_centrality(dm, sd, max_hops=3).to_pandas()
    got3 = dict(zip(out3["node"].astype(int), out3["stress"].astype(int)))
    assert got3 == {2: 1, 3: 1}


def test_stress_centrality_reference_and_parity(ray_session):
    """Random graph vs a brute BFS reference; broadcast == bucketed,
    including the internal top-degree seed derivation."""
    from zen3geo_ray.stages.graph import stress_centrality

    rng = np.random.default_rng(47)
    src = rng.integers(0, 60, 300).astype(np.int64)
    dst = rng.integers(0, 60, 300).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)

    adj = {}
    for a, b in zip(src, dst):
        if a == b:
            continue
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    seeds = sorted(adj, key=lambda n: (-len(adj[n]), n))[:5]

    def bfs(s, D):
        dist, sig, frontier = {s: 0}, {s: 1}, [s]
        for h in range(1, D + 1):
            new = {}
            for x in frontier:
                for y in adj.get(x, ()):
                    if y not in dist:
                        new[y] = new.get(y, 0) + sig[x]
            for y, g in new.items():
                dist[y], sig[y] = h, g
            frontier = list(new)
        return dist, sig

    R = {s: bfs(s, 3) for s in seeds}
    ref = {}
    for i, s in enumerate(seeds):
        for t in seeds[i + 1:]:
            ds_, gs_ = R[s]
            dt_, gt_ = R[t]
            if t not in ds_:
                continue
            for v in set(ds_) & set(dt_):
                if v in (s, t):
                    continue
                if ds_[v] + dt_[v] == ds_[t]:
                    ref[v] = ref.get(v, 0) + gs_[v] * gt_[v]

    out = stress_centrality(edges, n_seeds=5, max_hops=3).to_pandas()
    got = dict(zip(out["node"].astype(int), out["stress"].astype(int)))
    assert got == ref and len(ref) > 0

    out2 = stress_centrality(edges, n_seeds=5, max_hops=3,
                             broadcast_threshold=0).to_pandas()
    got2 = dict(zip(out2["node"].astype(int), out2["stress"].astype(int)))
    assert got2 == ref


def test_seed_reach_golden_and_parity(ray_session):
    from zen3geo_ray.stages.graph import seed_reach

    # path 1-2-3-4-5, seeds {1, 5}, 3 hops: each end reaches 3 others
    edges = rd.from_arrow(pa.table({"src": np.array([1, 2, 3, 4], np.int64),
                                    "dst": np.array([2, 3, 4, 5], np.int64)}))
    seeds = rd.from_arrow(pa.table({"node": np.array([1, 5], np.int64)}))
    out = seed_reach(edges, seeds, max_hops=3).to_pandas() \
        .sort_values("seed").reset_index(drop=True)
    assert out["seed"].tolist() == [1, 5]
    assert out["ecc"].tolist() == [3, 3]
    assert out["n_reached"].tolist() == [4, 4]   # seed + 3 reached
    assert out["n_paths"].tolist() == [4, 4]     # sigma = 1 each

    # diamond: from 1, sigma(4) = 2 -> n_paths = 1 + 1 + 1 + 2 = 5
    dm = rd.from_arrow(pa.table({"src": np.array([1, 1, 2, 3], np.int64),
                                 "dst": np.array([2, 3, 4, 4], np.int64)}))
    sd = rd.from_arrow(pa.table({"node": np.array([1], np.int64)}))
    out2 = seed_reach(dm, sd, max_hops=2).to_pandas()
    assert out2["n_paths"].tolist() == [5]
    assert out2["ecc"].tolist() == [2]

    # bucketed path parity (internal top-degree seed pick on both)
    rng = np.random.default_rng(53)
    src = rng.integers(0, 50, 250).astype(np.int64)
    dst = rng.integers(0, 50, 250).astype(np.int64)
    g = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    a = seed_reach(g, n_seeds=4, max_hops=3).to_pandas() \
        .sort_values("seed").reset_index(drop=True)
    b = seed_reach(g, n_seeds=4, max_hops=3,
                   broadcast_threshold=0).to_pandas() \
        .sort_values("seed").reset_index(drop=True)
    cols = ["seed", "ecc", "n_reached", "n_paths"]
    assert a[cols].astype("int64").equals(b[cols].astype("int64"))


def test_pinned_pagerank_weighted_and_personalized_parity(ray_session):
    from zen3geo_ray.stages.pregel import pinned_pagerank

    rng = np.random.default_rng(41)
    src = rng.integers(0, 80, 400).astype(np.int64)
    dst = rng.integers(0, 80, 400).astype(np.int64)
    w = rng.integers(1, 9, 400).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst,
                                    "w": w})).repartition(4)

    # weighted: bit-parity vs the Dataset path
    want = pagerank(edges, iters=3, n_buckets=8, weight_col="w",
                    broadcast_threshold=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    got = pinned_pagerank(edges, iters=3, n_shards=3,
                          weight_col="w").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert want["node"].equals(got["node"])
    assert want["outdeg"].equals(got["outdeg"])
    assert want["pr"].equals(got["pr"])

    # personalized: bit-parity vs the Dataset path
    seeds = rd.from_arrow(pa.table({"node": pa.array([3, 7, 11], pa.int64())}))
    want = pagerank(edges, iters=3, n_buckets=8, seeds=seeds,
                    broadcast_threshold=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)[["node", "outdeg", "pr"]]
    got = pinned_pagerank(edges, iters=3, n_shards=3,
                          seeds=seeds).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert want["node"].equals(got["node"])
    assert want["pr"].equals(got["pr"])


def test_pinned_kcore_parity(ray_session):
    from zen3geo_ray.stages.graph import kcore
    from zen3geo_ray.stages.pregel import pinned_kcore

    rng = np.random.default_rng(43)
    src = rng.integers(0, 60, 300).astype(np.int64)
    dst = rng.integers(0, 60, 300).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    for k, rounds in ((3, 4), (5, 3)):
        want = kcore(edges, k=k, rounds=rounds, n_buckets=8).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        got = pinned_kcore(edges, k=k, rounds=rounds,
                           n_shards=3).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        assert want["node"].equals(got["node"])
        assert want["deg"].equals(got["deg"])

    # empty-core graph: 5-node path, k=3 (the ADVICE crash shape)
    path = rd.from_arrow(pa.table({"src": pa.array([1, 2, 3, 4], pa.int64()),
                                   "dst": pa.array([2, 3, 4, 5], pa.int64())}))
    out = pinned_kcore(path, k=3, rounds=3, n_shards=2).to_pandas()
    assert len(out) == 0


@pytest.mark.parametrize("threshold", [0, 10 ** 9])
def test_ktruss_k4_golden(ray_session, threshold):
    """K4 + pendant + disjoint triangle: the 3-truss keeps K4 (support
    2 per edge) and the triangle (support 1); the 4-truss keeps only
    K4; the 5-truss is empty (typed empty result).  Both execution
    paths (broadcast rounds / distributed join rounds)."""
    from zen3geo_ray.stages.graph import ktruss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tri = [(10, 11), (10, 12), (11, 12)]
    ed = k4 + [(4, 9)] + tri
    edges = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in ed], pa.int64()),
        "dst": pa.array([b for _, b in ed], pa.int64())}))

    out3 = ktruss(edges, k=3, rounds=3, n_buckets=4,
                  broadcast_threshold=threshold).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    assert list(zip(out3.u, out3.v, out3.support)) == [
        (1, 2, 2), (1, 3, 2), (1, 4, 2), (2, 3, 2), (2, 4, 2), (3, 4, 2),
        (10, 11, 1), (10, 12, 1), (11, 12, 1)]

    out4 = ktruss(edges, k=4, rounds=3, n_buckets=4,
                  broadcast_threshold=threshold).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    assert list(zip(out4.u, out4.v)) == k4
    assert set(out4.support) == {2}

    out5 = ktruss(edges, k=5, rounds=3, n_buckets=4,
                  broadcast_threshold=threshold)
    assert out5.count() == 0
    assert set(out5.schema().names) == {"u", "v", "support"}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k >= 3"):
        ktruss(edges, k=2, rounds=1)


def test_ktruss_paths_parity_random(ray_session):
    from zen3geo_ray.stages.graph import ktruss

    rng = np.random.default_rng(53)
    src = rng.integers(0, 50, 400).astype(np.int64)
    dst = rng.integers(0, 50, 400).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    a = ktruss(edges, k=4, rounds=2, n_buckets=8).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    b = ktruss(edges, k=4, rounds=2, n_buckets=8,
               broadcast_threshold=0).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0


def test_pinned_bfs_parity(ray_session):
    from zen3geo_ray.stages.graph import bfs_hops
    from zen3geo_ray.stages.pregel import pinned_bfs

    rng = np.random.default_rng(47)
    src = rng.integers(0, 70, 250).astype(np.int64)
    dst = rng.integers(0, 70, 250).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    seeds = rd.from_arrow(pa.table({"node": pa.array([0, 13], pa.int64())}))
    for hops in (1, 3):
        want = bfs_hops(edges, seeds, max_hops=hops,
                        n_buckets=8).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        got = pinned_bfs(edges, seeds, max_hops=hops,
                         n_shards=3).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        assert want["node"].equals(got["node"])
        assert want["dist"].equals(got["dist"])
    # unreachable seeds only: result is exactly the seed set at dist 0
    lone = rd.from_arrow(pa.table({"node": pa.array([999], pa.int64())}))
    out = pinned_bfs(edges, lone, max_hops=2, n_shards=2).to_pandas()
    assert out["node"].tolist() == [999] and out["dist"].tolist() == [0]


def test_pinned_triangles_parity(ray_session):
    from zen3geo_ray.stages.graph import triangle_count
    from zen3geo_ray.stages.pregel import pinned_triangles

    rng = np.random.default_rng(59)
    src = rng.integers(0, 60, 350).astype(np.int64)
    dst = rng.integers(0, 60, 350).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    want = triangle_count(edges, n_buckets=8).to_pandas()["n_tri"].iloc[0]
    got = pinned_triangles(edges, n_shards=3).to_pandas()["n_tri"].iloc[0]
    assert int(want) == int(got) and int(got) > 0

    # K4: exactly 4 triangles; single shard path
    k4 = rd.from_arrow(pa.table({
        "src": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "dst": pa.array([2, 3, 4, 3, 4, 4], pa.int64())}))
    assert pinned_triangles(k4, n_shards=1).to_pandas()["n_tri"].iloc[0] == 4
    # triangle-free graph
    path = rd.from_arrow(pa.table({"src": pa.array([1, 2, 3], pa.int64()),
                                   "dst": pa.array([2, 3, 4], pa.int64())}))
    assert pinned_triangles(path, n_shards=2).to_pandas()["n_tri"].iloc[0] == 0


def test_truss_decrement_matches_recount():
    """_truss_decrement (the broadcast path's round-2+ kernel) vs a
    brute-force recount over the surviving set, randomized — including
    triangles with 2-3 dropped edges (must decrement survivors exactly
    once) and the chunked-expansion path."""
    from zen3geo_ray.stages.graph import _truss_decrement

    def supports(edges):
        es = set(map(tuple, edges))
        adj = {}
        for u, v in es:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        return {(u, v): len(adj[u] & adj[v]) for u, v in es}

    rng = np.random.default_rng(11)
    for trial in range(60):
        n = int(rng.integers(6, 30))
        m = int(min(rng.integers(6, 80), n * (n - 1) // 2))
        e = set()
        while len(e) < m:
            a, b = rng.integers(0, n, 2)
            if a != b:
                e.add((min(a, b) + 1000, max(a, b) + 1000))
        e = sorted(e)
        sup = supports(e)
        nd = int(rng.integers(1, max(2, len(e) // 2)))
        didx = rng.choice(len(e), size=nd, replace=False)
        dset = set(e[i] for i in didx)
        keep = [x for x in e if x not in dset]
        if not keep:
            continue
        ku = np.array([a for a, _ in keep], np.int64)
        kv = np.array([b for _, b in keep], np.int64)
        ks = np.array([sup[x] for x in keep], np.int64)
        du = np.array([a for a, _ in dset], np.int64)
        dv = np.array([b for _, b in dset], np.int64)
        got = _truss_decrement(ku, kv, ks, du, dv, chunk_expansion=7)
        ref_sup = supports(keep)
        ref = np.array([ref_sup[x] for x in keep], np.int64)
        assert (got == ref).all(), f"trial {trial}"


def test_ktruss_deep_peel_parity(ray_session):
    """Multi-round peels (4 rounds) must stay bit-identical between the
    decremental broadcast path and the distributed recount path."""
    from zen3geo_ray.stages.graph import ktruss

    rng = np.random.default_rng(61)
    src = rng.integers(0, 40, 500).astype(np.int64)
    dst = rng.integers(0, 40, 500).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    for k in (3, 5):
        a = ktruss(edges, k=k, rounds=4, n_buckets=8).to_pandas() \
            .sort_values(["u", "v"]).reset_index(drop=True)
        b = ktruss(edges, k=k, rounds=4, n_buckets=8,
                   broadcast_threshold=0).to_pandas() \
            .sort_values(["u", "v"]).reset_index(drop=True)
        assert a.equals(b)


def test_pinned_common_neighbors_parity(ray_session):
    from zen3geo_ray.stages.graph import common_neighbors
    from zen3geo_ray.stages.pregel import pinned_common_neighbors

    rng = np.random.default_rng(67)
    src = rng.integers(0, 60, 350).astype(np.int64)
    dst = rng.integers(0, 60, 350).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    for md, mc in ((16, 2), (8, 1)):
        want = common_neighbors(edges, max_degree=md, min_common=mc,
                                n_buckets=8).to_pandas() \
            .sort_values(["u", "v"]).reset_index(drop=True)
        got = pinned_common_neighbors(edges, max_degree=md, min_common=mc,
                                      n_shards=3).to_pandas() \
            .sort_values(["u", "v"]).reset_index(drop=True)
        assert want[["u", "v", "n_common"]].equals(
            got[["u", "v", "n_common"]]), (md, mc)
    # empty result shape (threshold nothing can reach)
    out = pinned_common_neighbors(edges, max_degree=2, min_common=99,
                                  n_shards=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"u", "v", "n_common"}


def _ref_lpa(src, dst, rounds):
    """Straight-line synchronous LPA: most frequent neighbor label,
    ties -> smallest label."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            c = Counter(lab[m] for m in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new
    return lab


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_label_propagation_matches_reference(ray_session, bt):
    from zen3geo_ray.stages.graph import label_propagation

    src, dst = _random_graph()
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(6)
    out = label_propagation(edges, rounds=2, n_buckets=8,
                            broadcast_threshold=bt).to_pandas()
    got = dict(zip(out["node"].tolist(), out["lab"].tolist()))
    assert got == _ref_lpa(src, dst, 2)


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_label_propagation_two_communities(ray_session, bt):
    """Two triangles bridged by one edge, hand-checkable: with
    all-distinct initial labels every vote is a tie, so the min-label
    rule drives both rounds — triangle A settles to 0 and label 2
    leaks across the bridge into B (the documented deterministic
    tie-break, matched exactly by the straight-line reference)."""
    from zen3geo_ray.stages.graph import label_propagation

    #  0-1-2 triangle, 10-11-12 triangle, bridge 2-10
    src = np.array([0, 1, 2, 10, 11, 12, 2], dtype=np.int64)
    dst = np.array([1, 2, 0, 11, 12, 10, 10], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    out = label_propagation(edges, rounds=2, n_buckets=4,
                            broadcast_threshold=bt).to_pandas()
    got = dict(zip(out["node"].tolist(), out["lab"].tolist()))
    assert got == _ref_lpa(src, dst, 2)
    assert got[0] == 0 and got[1] == 0


@pytest.mark.parametrize("n_shards", [1, 3])
def test_pinned_lpa_parity(ray_session, n_shards):
    """pinned_lpa is bit-identical to label_propagation (which is
    itself reference-pinned) — including with duplicate and reversed
    input edges, which the shards must dedup after symmetrizing."""
    from zen3geo_ray.stages.graph import label_propagation
    from zen3geo_ray.stages.pregel import pinned_lpa

    src, dst = _random_graph()
    # adversarial input: duplicates + reversed copies + self loops
    src2 = np.concatenate([src, dst, src[:50], [7]])
    dst2 = np.concatenate([dst, src, dst[:50], [7]])
    edges = rd.from_arrow(pa.table({"src": src2, "dst": dst2})) \
        .repartition(5)
    want = label_propagation(
        rd.from_arrow(pa.table({"src": src, "dst": dst})),
        rounds=2, n_buckets=8).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    got = pinned_lpa(edges, rounds=2, n_shards=n_shards).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == want["node"].tolist()
    assert got["lab"].tolist() == want["lab"].tolist()


@pytest.mark.parametrize("n_shards", [1, 3])
def test_pinned_ktruss_parity(ray_session, n_shards):
    """pinned_ktruss is bit-identical to graph.ktruss — same surviving
    canonical edges, same final-round supports — on random graphs with
    duplicate/reversed/self-loop edges, for both the single-shard and
    multi-shard exchanges."""
    from zen3geo_ray.stages.graph import ktruss
    from zen3geo_ray.stages.pregel import pinned_ktruss

    rng = np.random.default_rng(67 + n_shards)
    src = rng.integers(0, 40, 400).astype(np.int64)
    dst = rng.integers(0, 40, 400).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    for k in (3, 4):
        want = (ktruss(edges, k=k, rounds=4).to_pandas()
                .sort_values(["u", "v"]).reset_index(drop=True))
        got = (pinned_ktruss(edges, k=k, rounds=4, n_shards=n_shards)
               .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
        assert list(want.columns) == ["u", "v", "support"]
        assert want[["u", "v", "support"]].equals(
            got[["u", "v", "support"]]), (k, n_shards)


def test_pinned_ktruss_goldens(ray_session):
    """K4 + pendant edge: the 3-truss is exactly the K4 (support 2 on
    every surviving edge); k=5 empties the graph."""
    from zen3geo_ray.stages.pregel import pinned_ktruss

    k4p = rd.from_arrow(pa.table({
        "src": pa.array([1, 1, 1, 2, 2, 3, 4], pa.int64()),
        "dst": pa.array([2, 3, 4, 3, 4, 4, 9], pa.int64())}))
    out = (pinned_ktruss(k4p, k=3, rounds=3, n_shards=2).to_pandas()
           .sort_values(["u", "v"]).reset_index(drop=True))
    assert [tuple(r) for r in out.to_numpy()] == [
        (1, 2, 2), (1, 3, 2), (1, 4, 2), (2, 3, 2), (2, 4, 2), (3, 4, 2)]
    empty = pinned_ktruss(k4p, k=5, rounds=3, n_shards=2).to_pandas()
    assert len(empty) == 0


# ---------------------------------------------------------------- warm/delta


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_pagerank_warm_state_matches_manual_init(ray_session, bt):
    """warm_state overrides the start vector: 0 warm rounds must return
    the stored ranks for stored nodes and scale//S for new ones; 2 warm
    rounds must equal the driver recurrence from that exact vector."""
    src, dst = _random_graph()
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(6)
    warm = rd.from_arrow(pa.table({
        "node": np.array([0, 1, 2], np.int64),
        "pr": np.array([111, 222, 2 ** 60 + 3], np.int64),
    }))
    out0 = pagerank(edges, iters=0, scale=SCALE, n_buckets=8,
                    warm_state=warm, broadcast_threshold=bt).to_pandas()
    got0 = dict(zip(out0["node"], out0["pr"]))
    n = len(got0)
    for v, p in got0.items():
        if v in (0, 1, 2):
            assert p == {0: 111, 1: 222, 2: 2 ** 60 + 3}[v]
        else:
            assert p == SCALE // n

    # 2 warm rounds vs the driver recurrence from the same vector
    out2 = pagerank(edges, iters=2, scale=SCALE, n_buckets=8,
                    warm_state=warm, broadcast_threshold=bt).to_pandas()
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    outdeg = np.zeros(len(nodes), np.int64)
    for s in src:
        outdeg[idx[int(s)]] += 1
    pr = np.full(len(nodes), SCALE // len(nodes), np.int64)
    for v, p in {0: 111, 1: 222, 2: 2 ** 60 + 3}.items():
        pr[idx[v]] = p
    base = ((DD - DN) * SCALE) // (DD * len(nodes))
    si = np.array([idx[int(s)] for s in src])
    di = np.array([idx[int(d)] for d in dst])
    for _ in range(2):
        contrib = pr[si] // outdeg[si]
        acc = np.zeros(len(nodes), np.int64)
        np.add.at(acc, di, contrib)
        pr = base + (DN * acc) // DD
    want = dict(zip(nodes.tolist(), pr.tolist()))
    assert dict(zip(out2["node"], out2["pr"])) == want


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_incremental_pagerank_two_runs(ray_session, tmp_path, bt):
    """Run 1 == cold pagerank on its half; run 2 == 2 warm rounds over
    the distinct union, started from run 1's ranks — and re-sending
    already-stored edges must not change the union graph."""
    from zen3geo_ray.stages.graph import incremental_pagerank

    src, dst = _random_graph()
    half = ((src + dst) % 2 == 0)
    e1 = rd.from_arrow(pa.table({"src": src[half], "dst": dst[half]}))
    # run 2 re-sends some stored edges: the log dedup must absorb them
    e2 = rd.from_arrow(pa.table({
        "src": np.concatenate([src[~half], src[half][:5]]),
        "dst": np.concatenate([dst[~half], dst[half][:5]]),
    }))
    store = str(tmp_path / "prstore")

    r1 = incremental_pagerank(e1, store, boot_iters=3, delta_iters=2,
                              scale=SCALE, n_buckets=8,
                              broadcast_threshold=bt).to_pandas()
    ref1 = _ref_pagerank(src[half], dst[half], 3)
    assert dict(zip(r1["node"], r1["pr"])) == ref1

    r2 = incremental_pagerank(e2, store, boot_iters=3, delta_iters=2,
                              scale=SCALE, n_buckets=8,
                              broadcast_threshold=bt).to_pandas()
    warm = rd.from_arrow(pa.table({
        "node": r1["node"].to_numpy().astype(np.int64),
        "pr": r1["pr"].to_numpy().astype(np.int64)}))
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    want = pagerank(edges, iters=2, scale=SCALE, n_buckets=8,
                    warm_state=warm,
                    broadcast_threshold=bt).to_pandas()
    assert (dict(zip(r2["node"], r2["pr"]))
            == dict(zip(want["node"], want["pr"])))


def test_pinned_pagerank_warm_state_parity(ray_session):
    """warm_state on the pinned path == graph.pagerank(warm_state=)
    bit for bit, including an unknown node in the warm vector."""
    from zen3geo_ray.stages.pregel import pinned_pagerank

    src, dst = _random_graph()
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(5)
    warm = rd.from_arrow(pa.table({
        "node": np.array([0, 1, 2, 10 ** 9], np.int64),  # 1e9 not in graph
        "pr": np.array([111, 222, 2 ** 60 + 3, 7], np.int64),
    }))
    got = pinned_pagerank(edges, iters=3, n_shards=3,
                          warm_state=warm).to_pandas()
    want = pagerank(edges, iters=3, scale=SCALE, n_buckets=8,
                    warm_state=warm).to_pandas()
    assert (dict(zip(got["node"], got["pr"]))
            == dict(zip(want["node"], want["pr"])))


def _ref_hits(src, dst, iters, scale=10 ** 6):
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    n = len(nodes)
    si = np.array([idx[int(s)] for s in src])
    di = np.array([idx[int(d)] for d in dst])
    h = np.full(n, scale, np.int64)
    a = np.full(n, scale, np.int64)
    for _ in range(iters):
        raw = np.zeros(n, np.int64)
        np.add.at(raw, di, h[si])
        m = raw.max() if n else 0
        a = (raw * scale) // m if m > 0 else np.zeros(n, np.int64)
        raw = np.zeros(n, np.int64)
        np.add.at(raw, si, a[di])
        m = raw.max() if n else 0
        h = (raw * scale) // m if m > 0 else np.zeros(n, np.int64)
    return {int(v): (int(h[i]), int(a[i])) for v, i in idx.items()}


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_hits_matches_integer_reference(ray_session, bt):
    from zen3geo_ray.stages.graph import hits

    src, dst = _random_graph()
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(6)
    out = hits(edges, iters=3, scale=10 ** 6, n_buckets=8,
               broadcast_threshold=bt).to_pandas()
    ref = _ref_hits(src, dst, 3)
    got = {int(r.node): (int(r.hub), int(r.auth))
           for r in out.itertuples()}
    assert got == ref
    # the dangling sink (500) authors but never hubs
    assert got[500][0] == 0 and got[500][1] > 0


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_assortativity_matches_numpy(ray_session, bt):
    from zen3geo_ray.stages.graph import degree_assortativity

    src, dst = _random_graph()
    # symmetrize like the trade graph so degree == undirected degree
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    edges = rd.from_arrow(pa.table({"src": s, "dst": d})).repartition(6)
    out = degree_assortativity(edges, n_buckets=8,
                               broadcast_threshold=bt).to_pandas()

    deg = {}
    for u in s:
        deg[int(u)] = deg.get(int(u), 0) + 1
    x = np.array([deg[int(u)] for u in s], np.int64)
    y = np.array([deg.get(int(v), 0) for v in d], np.int64)
    m = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy, sxy = int((x * x).sum()), int((y * y).sum()), int((x * y).sum())
    assert out.iloc[0][["m", "sx", "sy", "sxx", "syy", "sxy"]].tolist() == \
        [m, sx, sy, sxx, syy, sxy]
    import math
    want = (float(m * sxy - sx * sy)
            / (math.sqrt(float(m * sxx - sx * sx))
               * math.sqrt(float(m * syy - sy * sy))))
    assert out.iloc[0]["assort"] == want
    # np.corrcoef agreement to float tolerance (sanity, not parity)
    assert abs(out.iloc[0]["assort"] - np.corrcoef(x, y)[0, 1]) < 1e-9


def _ref_community_stats(src, dst, labels: dict):
    """Straight-line modularity stats reference."""
    pairs = set()
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            pairs.add((min(s, d), max(s, d)))
    m = len(pairs)
    from collections import defaultdict
    e_in, deg, nn = defaultdict(int), defaultdict(int), defaultdict(int)
    for n, l in labels.items():
        nn[l] += 1
    for u, v in pairs:
        deg[labels[u]] += 1
        deg[labels[v]] += 1
        if labels[u] == labels[v]:
            e_in[labels[u]] += 1
    return {
        l: (nn[l], e_in[l], deg[l], deg[l] - 2 * e_in[l],
            4 * m * e_in[l] - deg[l] * deg[l])
        for l in nn
    }


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_community_stats_matches_reference(ray_session, bt):
    from zen3geo_ray.stages.graph import community_stats, label_propagation

    src, dst = _random_graph()
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(6)
    labs = label_propagation(edges, rounds=2, n_buckets=8)
    out = community_stats(edges, labs, n_buckets=8,
                          broadcast_threshold=bt).to_pandas()
    lab_map = _ref_lpa(src, dst, 2)
    want = _ref_community_stats(src, dst, lab_map)
    got = {int(r.lab): (int(r.n_nodes), int(r.e_in), int(r.deg_sum),
                        int(r.cut), int(r.q_num))
           for r in out.itertuples()}
    assert got == want
    # global modularity identity: sum(deg_sum) == 2m and Q in [-1, 1]
    m = len({(min(s, d), max(s, d))
             for s, d in zip(src.tolist(), dst.tolist()) if s != d})
    assert int(out["deg_sum"].sum()) == 2 * m
    q = float(out["q_num"].sum()) / (4.0 * m * m)
    assert -1.0 <= q <= 1.0


def test_community_stats_two_triangles(ray_session):
    """Two disjoint triangles with their own labels: e_in=3, deg_sum=6,
    cut=0 each; m=6 so q_num = 4*6*3 - 36 = 36 per community and
    Q = 72/144 = 0.5 — the textbook two-clique value."""
    from zen3geo_ray.stages.graph import community_stats

    src = np.array([0, 1, 2, 10, 11, 12], dtype=np.int64)
    dst = np.array([1, 2, 0, 11, 12, 10], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    labs = rd.from_arrow(pa.table({
        "node": pa.array([0, 1, 2, 10, 11, 12], pa.int64()),
        "lab": pa.array([0, 0, 0, 1, 1, 1], pa.int64())}))
    out = community_stats(edges, labs, n_buckets=4).to_pandas() \
        .sort_values("lab").reset_index(drop=True)
    assert out["e_in"].tolist() == [3, 3]
    assert out["deg_sum"].tolist() == [6, 6]
    assert out["cut"].tolist() == [0, 0]
    assert out["q_num"].tolist() == [36, 36]


def test_community_stats_unlabeled_raises(ray_session):
    from zen3geo_ray.stages.graph import community_stats

    edges = rd.from_arrow(pa.table({"src": pa.array([0], pa.int64()),
                                    "dst": pa.array([1], pa.int64())}))
    labs = rd.from_arrow(pa.table({"node": pa.array([0], pa.int64()),
                                   "lab": pa.array([0], pa.int64())}))
    with pytest.raises(Exception):
        community_stats(edges, labs).to_pandas()


def _ref_walks(src, dst, seeds, steps):
    from zen3geo_ray.functions.hashing import knuth_hash
    from zen3geo_ray.stages.graph import WALK_C

    adj = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    adj = {k: sorted(v) for k, v in adj.items()}
    rows = set()
    for seed in seeds:
        cur = seed
        rows.add((seed, 0, seed))
        for t in range(1, steps + 1):
            nbrs = adj[cur]
            j = int(knuth_hash(np.array([cur + t * WALK_C]))[0]) % len(nbrs)
            cur = nbrs[j]
            rows.add((seed, t, cur))
    return rows


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_hash_walks_matches_reference(ray_session, bt):
    from zen3geo_ray.stages.graph import hash_walks

    src, dst = _random_graph()
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(5)
    seed_nodes = sorted({int(s) for s in src.tolist()[:20]})
    seeds = rd.from_arrow(pa.table({"node": pa.array(seed_nodes,
                                                     pa.int64())}))
    out = hash_walks(edges, seeds, steps=3, n_buckets=8,
                     broadcast_threshold=bt).to_pandas()
    got = {(int(r.walk_id), int(r.step), int(r.node))
           for r in out.itertuples()}
    assert got == _ref_walks(src, dst, seed_nodes, 3)
    # every walk emits exactly steps+1 positions
    assert len(out) == 4 * len(seed_nodes)


def test_hash_walks_id_bound(ray_session):
    from zen3geo_ray.stages.graph import hash_walks

    big = np.int64(1) << 40
    edges = rd.from_arrow(pa.table({"src": pa.array([big], pa.int64()),
                                    "dst": pa.array([1], pa.int64())}))
    seeds = rd.from_arrow(pa.table({"node": pa.array([1], pa.int64())}))
    with pytest.raises(Exception):
        hash_walks(edges, seeds, steps=2).to_pandas()


def test_incremental_pagerank_pinned_engine_parity(ray_session, tmp_path):
    """engine='pinned' produces bit-identical store contents and ranks
    to the Dataset engine across a boot run + a delta run."""
    from zen3geo_ray.stages.graph import incremental_pagerank

    src, dst = _random_graph()
    half = ((src + dst) % 2 == 0)
    batches = [
        pa.table({"src": src[half], "dst": dst[half]}),
        pa.table({"src": np.concatenate([src[~half], src[half][:5]]),
                  "dst": np.concatenate([dst[~half], dst[half][:5]])}),
    ]
    results = {}
    for engine in ("dataset", "pinned"):
        store = str(tmp_path / f"store_{engine}")
        for i, t in enumerate(batches):
            r = incremental_pagerank(
                rd.from_arrow(t).repartition(3), store,
                boot_iters=3, delta_iters=2, scale=SCALE,
                n_buckets=8, engine=engine).to_pandas()
            results[(engine, i)] = dict(zip(r["node"], r["pr"]))
    for i in range(len(batches)):
        assert results[("dataset", i)] == results[("pinned", i)]


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_sssp_bounded_bruteforce(ray_session, bt):
    """Weighted bounded-round distances vs a numpy Bellman-Ford
    reference, both execution paths; a longer-hop cheaper path must
    beat a shorter expensive one within the round budget."""
    from zen3geo_ray.stages.graph import sssp_bounded

    rng = np.random.default_rng(17)
    n, m = 60, 400
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(1, 9, m).astype(np.int64)
    # planted: 0 -> 50 direct cost 100, 0 -> 49 -> 50 cost 2
    src = np.concatenate([src, [0, 0, 49]])
    dst = np.concatenate([dst, [50, 49, 50]])
    w = np.concatenate([w, [100, 1, 1]])
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w})
                          ).repartition(4)
    seeds = rd.from_arrow(pa.table({"node": np.array([0, 7], np.int64)}))
    rounds = 3
    out = sssp_bounded(edges, seeds, max_rounds=rounds,
                       broadcast_threshold=bt).to_pandas()
    got = dict(zip(out["node"].astype(np.int64),
                   out["dist"].astype(np.int64)))

    INF = 1 << 60
    ref = {0: 0, 7: 0}
    for _ in range(rounds):
        new = dict(ref)
        for s, d, ww in zip(src.tolist(), dst.tolist(), w.tolist()):
            if s in ref and ref[s] + ww < new.get(d, INF):
                new[d] = ref[s] + ww
        ref = new
    assert got == ref
    assert got[50] == 2


@pytest.mark.parametrize("n_shards", [1, 3])
def test_pinned_sssp_parity(ray_session, n_shards):
    """pinned_sssp == sssp_bounded bit for bit, including the planted
    cheap-long-path case, duplicate edges, and early exit."""
    from zen3geo_ray.stages.graph import sssp_bounded
    from zen3geo_ray.stages.pregel import pinned_sssp

    rng = np.random.default_rng(19)
    n, m = 80, 500
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(1, 9, m).astype(np.int64)
    src = np.concatenate([src, [0, 0, 49]])
    dst = np.concatenate([dst, [50, 49, 50]])
    w = np.concatenate([w, [100, 1, 1]])
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w})
                          ).repartition(4)
    seeds = rd.from_arrow(pa.table({"node": np.array([0, 7], np.int64)}))
    want = sssp_bounded(edges, seeds, max_rounds=3,
                        broadcast_threshold=0).to_pandas()
    got = pinned_sssp(edges, seeds, max_rounds=3,
                      n_shards=n_shards).to_pandas()
    assert (dict(zip(got["node"].astype(np.int64),
                     got["dist"].astype(np.int64)))
            == dict(zip(want["node"].astype(np.int64),
                        want["dist"].astype(np.int64))))


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_temporal_reachability_bruteforce(ray_session, bt):
    """Earliest time-respecting arrivals vs a reference relaxation;
    a path that goes back in time must NOT be taken."""
    from zen3geo_ray.stages.graph import temporal_reachability

    rng = np.random.default_rng(41)
    n, m = 50, 300
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    ts = rng.integers(0, 100, m).astype(np.int64)
    # planted: 0 -(t=10)-> 40 -(t=5)-> 41 is time-DISrespecting;
    # 0 -(t=10)-> 40 -(t=20)-> 41 is fine
    src = np.concatenate([src, [0, 40, 40]])
    dst = np.concatenate([dst, [40, 41, 41]])
    ts = np.concatenate([ts, [10, 5, 20]])
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst, "ts": ts})
                          ).repartition(4)
    seeds = rd.from_arrow(pa.table({"node": np.array([0], np.int64)}))
    rounds, start = 3, 3
    out = temporal_reachability(edges, seeds, start=start,
                                max_rounds=rounds,
                                broadcast_threshold=bt).to_pandas()
    got = dict(zip(out["node"].astype(np.int64),
                   out["t"].astype(np.int64)))

    ref = {0: start}
    for _ in range(rounds):
        new = dict(ref)
        for s, d, t in zip(src.tolist(), dst.tolist(), ts.tolist()):
            if s in ref and t >= ref[s] and t < new.get(d, 1 << 60):
                new[d] = t
        ref = new
    assert got == ref


def test_local_clustering_brute(ray_session):
    """Per-node (deg, tri, cc) vs a brute-force adjacency scan."""
    import itertools

    import ray.data as rd

    from zen3geo_ray.stages.graph import local_clustering

    rng = np.random.default_rng(5)
    edges = set()
    while len(edges) < 60:
        a, b = rng.integers(0, 20, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    t = pa.table({
        "src": pa.array([a for a, _ in sorted(edges)], pa.int64()),
        "dst": pa.array([b for _, b in sorted(edges)], pa.int64()),
    })
    out = local_clustering(rd.from_arrow(t).repartition(4),
                           n_buckets=4).to_pandas().set_index("node")
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert len(out) == len(adj)
    for v, nb in adj.items():
        tri = sum(1 for x, y in itertools.combinations(sorted(nb), 2)
                  if y in adj[x])
        d = len(nb)
        row = out.loc[v]
        assert (int(row.deg), int(row.tri)) == (d, tri)
        if d >= 2:
            assert row.cc == float(2 * tri) / float(d * (d - 1))
        else:
            assert np.isnan(row.cc)


def test_local_clustering_k4(ray_session):
    """K4: every node has deg 3, tri 3, cc exactly 1.0."""
    import ray.data as rd

    from zen3geo_ray.stages.graph import local_clustering

    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    t = pa.table({"src": pa.array([a for a, _ in pairs], pa.int64()),
                  "dst": pa.array([b for _, b in pairs], pa.int64())})
    out = local_clustering(rd.from_arrow(t), n_buckets=2).to_pandas()
    assert len(out) == 4
    assert (out.deg == 3).all() and (out.tri == 3).all()
    assert (out.cc == 1.0).all()


def test_rich_club_golden(ray_session):
    """K4 plus a pendant: deg(K4 nodes)=3 (one has 4), pendant=1."""
    import ray.data as rd

    from zen3geo_ray.stages.graph import rich_club

    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    pairs.append((0, 9))  # pendant on node 0 -> deg(0)=4
    t = pa.table({"src": pa.array([a for a, _ in pairs], pa.int64()),
                  "dst": pa.array([b for _, b in pairs], pa.int64())})
    out = rich_club(rd.from_arrow(t).repartition(2), ks=[1, 2, 3],
                    n_buckets=2).to_pandas().set_index("k")
    # k=1: all K4 nodes (deg>=3) qualify, pendant (deg 1) doesn't
    assert (int(out.loc[1, "n_k"]), int(out.loc[1, "e_k"])) == (4, 6)
    assert out.loc[1, "phi"] == 1.0
    # k=2: same four nodes
    assert (int(out.loc[2, "n_k"]), int(out.loc[2, "e_k"])) == (4, 6)
    # k=3: only node 0 (deg 4); no edges among a single node
    assert (int(out.loc[3, "n_k"]), int(out.loc[3, "e_k"])) == (1, 0)
    assert np.isnan(out.loc[3, "phi"])


def test_powerlaw_alpha_reference(ray_session):
    """alpha matches the straight quantized-ln formula."""
    import math

    import ray.data as rd

    from zen3geo_ray.stages.graph import powerlaw_alpha

    rng = np.random.default_rng(13)
    # a hub-and-spoke mix: node 0 connects to 1..20, plus random pairs
    pairs = {(0, i) for i in range(1, 21)}
    while len(pairs) < 50:
        a, b = rng.integers(1, 30, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    t = pa.table({"src": pa.array([a for a, _ in sorted(pairs)],
                                  pa.int64()),
                  "dst": pa.array([b for _, b in sorted(pairs)],
                                  pa.int64())})
    out = powerlaw_alpha(rd.from_arrow(t).repartition(3), dmin=2,
                         n_buckets=2).to_pandas().iloc[0]
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ds_ = [d for d in deg.values() if d >= 2]
    sc = float(1 << 16)
    lqmin = math.floor(math.log(2.0) * sc)
    denom = sum(math.floor(math.log(float(d)) * sc) - lqmin
                for d in ds_)
    assert (int(out["m"]), int(out["denom"])) == (len(ds_), denom)
    assert out["alpha"] == 1.0 + (float(len(ds_)) * sc) / float(denom)


def test_diameter_double_sweep_path_and_star(ray_session):
    """Exact on trees: a path graph's double sweep finds the true
    diameter; a star's is 2."""
    import ray.data as rd

    from zen3geo_ray.stages.graph import diameter_double_sweep

    path = pa.table({"src": pa.array(list(range(6)), pa.int64()),
                     "dst": pa.array(list(range(1, 7)), pa.int64())})
    out = diameter_double_sweep(rd.from_arrow(path).repartition(2),
                                max_hops=10).to_pandas().iloc[0]
    assert (int(out.start), int(out.ecc1)) == (0, 6)
    assert int(out.diameter_lb) == 6

    star = pa.table({"src": pa.array([0] * 5, pa.int64()),
                     "dst": pa.array(list(range(1, 6)), pa.int64())})
    out = diameter_double_sweep(rd.from_arrow(star),
                                max_hops=10).to_pandas().iloc[0]
    # start = node 0 (the hub): ecc1 = 1, far = 1, ecc2 = 2
    assert (int(out.ecc1), int(out.ecc2), int(out.diameter_lb)) \
        == (1, 2, 2)


def _symm(src, dst):
    return (np.concatenate([src, dst]), np.concatenate([dst, src]))


def test_mis_independent_and_maximal(ray_session):
    from zen3geo_ray.stages.graph import maximal_independent_set

    src, dst = _random_graph(seed=11)
    s, d = _symm(src, dst)
    ds = rd.from_arrow(pa.table({"src": pa.array(s), "dst": pa.array(d)}))
    out = maximal_independent_set(ds, rounds=8).to_pandas()
    mis = set(out.node.tolist())
    adj = {}
    for a, b in zip(s.tolist(), d.tolist()):
        adj.setdefault(a, set()).add(b)
    # independence: no two MIS nodes adjacent
    for v in mis:
        assert not (adj.get(v, set()) & mis)
    # maximality: every non-MIS node has an MIS neighbor
    for v in adj:
        if v not in mis:
            assert adj[v] & mis, f"node {v} uncovered"


def test_mis_paths_bit_parity(ray_session):
    from zen3geo_ray.stages.graph import maximal_independent_set

    src, dst = _random_graph(seed=13, n_nodes=80, n_edges=300)
    s, d = _symm(src, dst)
    ds = rd.from_arrow(pa.table({"src": pa.array(s),
                                 "dst": pa.array(d)})).repartition(3)
    a = maximal_independent_set(ds, rounds=8).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    b = maximal_independent_set(ds, rounds=8,
                                broadcast_threshold=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert a.node.tolist() == b.node.tolist()
    assert a["round"].tolist() == b["round"].tolist()


def test_butterfly_k22_golden(ray_session):
    from zen3geo_ray.stages.graph import butterfly_count

    # K_{2,2}: exactly one butterfly; caterpillars = 4 edges x 1 x 1
    t = pa.table({"src": pa.array([0, 0, 2, 2], pa.int64()),
                  "dst": pa.array([1, 3, 1, 3], pa.int64())})
    out = butterfly_count(rd.from_arrow(t)).to_pandas().iloc[0]
    assert int(out.butterflies) == 1
    assert int(out.caterpillars) == 4
    assert out.bf_cc == 1.0


def test_butterfly_paths_and_sides_agree(ray_session):
    from zen3geo_ray.stages.graph import butterfly_count

    rng = np.random.default_rng(17)
    a = rng.integers(0, 40, 400).astype(np.int64) * 2
    b = rng.integers(0, 12, 400).astype(np.int64) * 2 + 1
    ds = rd.from_arrow(pa.table({"src": pa.array(a),
                                 "dst": pa.array(b)})).repartition(3)
    ref = butterfly_count(ds).to_pandas().iloc[0]
    # brute force: codegree over the left side
    import itertools
    pairs = set(zip(a.tolist(), b.tolist()))
    nb = {}
    for x, y in pairs:
        nb.setdefault(x, set()).add(y)
    bf = 0
    for x, y in itertools.combinations(sorted(nb), 2):
        c = len(nb[x] & nb[y])
        bf += c * (c - 1) // 2
    assert int(ref.butterflies) == bf
    # bucketed degree-attach path agrees
    alt = butterfly_count(ds, broadcast_threshold=0).to_pandas().iloc[0]
    assert int(alt.butterflies) == bf
    assert int(alt.caterpillars) == int(ref.caterpillars)


def test_harmonic_path_graph_golden(ray_session):
    from zen3geo_ray.stages.graph import harmonic_centrality

    # path 0-1-2-3-4, seed node 0: d = 1,2,3,4 but max_hops=3
    e = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                  "dst": pa.array([1, 2, 3, 4], pa.int64())})
    seeds = rd.from_arrow(pa.table({"node": pa.array([0], pa.int64())}))
    out = harmonic_centrality(rd.from_arrow(e), seeds,
                              max_hops=3).to_pandas().iloc[0]
    q = 1 << 16
    want = q // 1 + q // 2 + q // 3
    assert int(out.n_reached) == 3
    assert int(out.h_q) == want
    assert out.harmonic == float(want) / float(q)


def test_harmonic_paths_bit_parity(ray_session):
    from zen3geo_ray.stages.graph import harmonic_centrality

    src, dst = _random_graph(seed=23, n_nodes=60, n_edges=240)
    ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                 "dst": pa.array(dst)})).repartition(3)
    a = harmonic_centrality(ds, n_seeds=4, max_hops=3).to_pandas() \
        .sort_values("seed").reset_index(drop=True)
    b = harmonic_centrality(ds, n_seeds=4, max_hops=3,
                            broadcast_threshold=0).to_pandas() \
        .sort_values("seed").reset_index(drop=True)
    assert a.seed.tolist() == b.seed.tolist()
    assert a.h_q.tolist() == b.h_q.tolist()
    assert a.n_reached.tolist() == b.n_reached.tolist()
    assert a.harmonic.tolist() == b.harmonic.tolist()


def test_closeness_path_graph_golden(ray_session):
    from zen3geo_ray.stages.graph import closeness_centrality

    # path 0-1-2-3-4, seed node 0: d = 1,2,3 within max_hops=3
    e = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                  "dst": pa.array([1, 2, 3, 4], pa.int64())})
    seeds = rd.from_arrow(pa.table({"node": pa.array([0], pa.int64())}))
    out = closeness_centrality(rd.from_arrow(e), seeds,
                               max_hops=3).to_pandas().iloc[0]
    assert int(out.n_reached) == 3
    assert int(out.d_sum) == 1 + 2 + 3
    assert out.closeness == 3.0 / 6.0


def test_closeness_isolated_seed(ray_session):
    from zen3geo_ray.stages.graph import closeness_centrality

    e = pa.table({"src": pa.array([0, 1], pa.int64()),
                  "dst": pa.array([1, 0], pa.int64())})
    seeds = rd.from_arrow(pa.table({"node": pa.array([7], pa.int64())}))
    out = closeness_centrality(rd.from_arrow(e), seeds,
                               max_hops=2).to_pandas().iloc[0]
    assert int(out.n_reached) == 0
    assert int(out.d_sum) == 0
    assert out.closeness == 0.0


def test_closeness_paths_bit_parity(ray_session):
    from zen3geo_ray.stages.graph import closeness_centrality

    src, dst = _random_graph(seed=29, n_nodes=60, n_edges=240)
    ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                 "dst": pa.array(dst)})).repartition(3)
    a = closeness_centrality(ds, n_seeds=4, max_hops=3).to_pandas() \
        .sort_values("seed").reset_index(drop=True)
    b = closeness_centrality(ds, n_seeds=4, max_hops=3,
                             broadcast_threshold=0).to_pandas() \
        .sort_values("seed").reset_index(drop=True)
    assert a.seed.tolist() == b.seed.tolist()
    assert a.d_sum.tolist() == b.d_sum.tolist()
    assert a.n_reached.tolist() == b.n_reached.tolist()
    assert a.closeness.tolist() == b.closeness.tolist()


def _kruskal(u, v, w):
    """Reference MSF under the (w, u, v) total order."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for wi, ui, vi in sorted(zip(w, u, v)):
        ru, rv = find(ui), find(vi)
        if ru != rv:
            parent[ru] = rv
            forest.append((ui, vi, wi))
    return sorted(forest)


def test_msf_matches_kruskal_random(ray_session):
    from zen3geo_ray.stages.graph import minimum_spanning_forest

    rng = np.random.default_rng(41)
    n = 120
    s = rng.integers(0, n, 900).astype(np.int64)
    d = rng.integers(0, n, 900).astype(np.int64)
    w = rng.integers(1, 50, 900).astype(np.int64)
    m = s != d
    ds = rd.from_arrow(pa.table({"src": pa.array(s[m]),
                                 "dst": pa.array(d[m]),
                                 "w": pa.array(w[m])})).repartition(4)
    out = minimum_spanning_forest(ds, rounds=10).to_pandas()
    got = sorted(zip(out.u.tolist(), out.v.tolist(), out.w.tolist()))
    # reference over the NORMALIZED edge set (u<v, min w per pair)
    import pandas as pd
    df = pd.DataFrame({"u": np.minimum(s[m], d[m]),
                       "v": np.maximum(s[m], d[m]), "w": w[m]})
    df = df.groupby(["u", "v"], as_index=False)["w"].min()
    want = [(u, v, wi) for u, v, wi in
            _kruskal(df.u.tolist(), df.v.tolist(), df.w.tolist())]
    assert got == sorted((min(a, b), max(a, b), c) for a, b, c in want)


def test_msf_disconnected_forest(ray_session):
    from zen3geo_ray.stages.graph import minimum_spanning_forest

    # two triangles, disjoint: forest = 2 edges per component (min 2)
    t = pa.table({"src": pa.array([0, 1, 2, 10, 11, 12], pa.int64()),
                  "dst": pa.array([1, 2, 0, 11, 12, 10], pa.int64()),
                  "w": pa.array([1, 2, 3, 5, 4, 6], pa.int64())})
    out = minimum_spanning_forest(rd.from_arrow(t)).to_pandas()
    got = sorted(zip(out.u.tolist(), out.v.tolist(), out.w.tolist()))
    assert got == [(0, 1, 1), (1, 2, 2), (10, 11, 5), (11, 12, 4)]


def test_betweenness_goldens_and_parity(ray_session):
    from zen3geo_ray.stages.graph import betweenness_centrality

    Q = 1 << 20
    # path 1-2-3-4-5, seeds {1,5}: sigma_st=1 -> bw_q = Q per interior
    edges = rd.from_arrow(pa.table({"src": np.array([1, 2, 3, 4], np.int64),
                                    "dst": np.array([2, 3, 4, 5], np.int64)}))
    seeds = rd.from_arrow(pa.table({"node": np.array([1, 5], np.int64)}))
    out = betweenness_centrality(edges, seeds, max_hops=4).to_pandas()
    got = dict(zip(out["node"].astype(int), out["bw_q"].astype(int)))
    assert got == {2: Q, 3: Q, 4: Q}

    # diamond 1-2-4 / 1-3-4, seeds {1,4}: sigma_14=2 -> each middle Q//2
    dm = rd.from_arrow(pa.table({"src": np.array([1, 1, 2, 3], np.int64),
                                 "dst": np.array([2, 3, 4, 4], np.int64)}))
    sd = rd.from_arrow(pa.table({"node": np.array([1, 4], np.int64)}))
    out3 = betweenness_centrality(dm, sd, max_hops=3).to_pandas()
    got3 = dict(zip(out3["node"].astype(int), out3["bw_q"].astype(int)))
    assert got3 == {2: Q // 2, 3: Q // 2}

    # random graph: broadcast path == bucketed path bit-for-bit
    rng = np.random.default_rng(11)
    src = rng.integers(0, 60, 300).astype(np.int64)
    dst = rng.integers(0, 60, 300).astype(np.int64)
    re = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    a = betweenness_centrality(re, n_seeds=5, max_hops=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    b = betweenness_centrality(re, n_seeds=5, max_hops=3,
                               broadcast_threshold=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert a.equals(b) and len(a) > 0


def _ref_scc(src, dst):
    """Kosaraju reference: DFS finish order on G, then DFS on G^T;
    comp = min node id per SCC."""
    import collections

    nodes = np.unique(np.concatenate([src, dst])).tolist()
    fwd = collections.defaultdict(list)
    rev = collections.defaultdict(list)
    for a, b in zip(src.tolist(), dst.tolist()):
        fwd[a].append(b)
        rev[b].append(a)
    seen, order = set(), []
    for s in nodes:
        if s in seen:
            continue
        stack = [(s, iter(fwd[s]))]
        seen.add(s)
        while stack:
            v, it = stack[-1]
            adv = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(fwd[w])))
                    adv = True
                    break
            if not adv:
                order.append(v)
                stack.pop()
    comp = {}
    for s in reversed(order):
        if s in comp:
            continue
        members = [s]
        comp[s] = None
        stack = [s]
        while stack:
            v = stack.pop()
            for w in rev[v]:
                if w not in comp:
                    comp[w] = None
                    members.append(w)
                    stack.append(w)
        label = min(members)
        for m in members:
            comp[m] = label
    return comp


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_scc_matches_kosaraju(ray_session, bt):
    from zen3geo_ray.stages.graph import strongly_connected_components

    # two 3-cycles bridged by ONE directed edge (cycles stay separate
    # SCCs), plus a directed chain of singletons and a dangling sink
    src = np.array([1, 2, 3, 3, 10, 11, 12, 20, 21, 22, 5],
                   dtype=np.int64)
    dst = np.array([2, 3, 1, 10, 11, 12, 10, 21, 22, 23, 500],
                   dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})) \
        .repartition(4)
    out = strongly_connected_components(
        edges, n_buckets=8, broadcast_threshold=bt).to_pandas()
    got = dict(zip(out["node"].astype(int), out["comp"].astype(int)))
    assert got == _ref_scc(src, dst)


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_scc_random_matches_kosaraju(ray_session, bt):
    from zen3geo_ray.stages.graph import strongly_connected_components

    # random sparse digraph: many nontrivial SCCs + singleton debris
    rng = np.random.default_rng(11)
    src = rng.integers(0, 60, 130).astype(np.int64)
    dst = rng.integers(0, 60, 130).astype(np.int64)
    m = src != dst
    src, dst = src[m], dst[m]
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})) \
        .repartition(5)
    out = strongly_connected_components(
        edges, max_rounds=20, n_buckets=8,
        broadcast_threshold=bt).to_pandas()
    got = dict(zip(out["node"].astype(int), out["comp"].astype(int)))
    ref = _ref_scc(src, dst)
    assert got == ref
    # sanity: the instance is nontrivial (some multi-node SCC exists)
    assert len(set(ref.values())) < len(ref)


def test_bfs_hops_sink_frontier(ray_session):
    """Regression: a frontier of pure sinks used to crash the
    broadcast path (empty relax frame has no columns)."""
    edges = rd.from_arrow(pa.table({"src": pa.array([1], pa.int64()),
                                    "dst": pa.array([2], pa.int64())}))
    seeds = rd.from_arrow(pa.table({"node": pa.array([2], pa.int64())}))
    out = bfs_hops(edges, seeds, max_hops=10, n_buckets=2).to_pandas()
    assert dict(zip(out["node"], out["dist"])) == {2: 0}


@pytest.mark.parametrize("bt", [0, 2_000_000], ids=["bucketed", "broadcast"])
def test_bowtie_golden(ray_session, bt):
    from zen3geo_ray.stages.graph import bowtie_decomposition

    # IN: 50 -> cycle; SCC: {1,2,3}; OUT: cycle -> 60 -> 61;
    # tendril off IN: 50 -> 70 (reaches SCC? no: 70 is a sink off the
    # IN node -> OTHER); disconnected: 80 -> 81 (both OTHER)
    src = np.array([1, 2, 3, 50, 3, 60, 50, 80], dtype=np.int64)
    dst = np.array([2, 3, 1, 1, 60, 61, 70, 81], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})) \
        .repartition(3)
    out = bowtie_decomposition(edges, n_buckets=8,
                               broadcast_threshold=bt).to_pandas().iloc[0]
    assert int(out.n_nodes) == 9
    assert int(out.giant_comp) == 1 and int(out.n_scc) == 3
    assert int(out.n_in) == 1 and int(out.n_out) == 2
    assert int(out.n_other) == 3


def test_pinned_scc_parity(ray_session):
    """pinned_scc is bit-identical to the Dataset-path SCC on the
    bridged-cycles golden and a random digraph."""
    from zen3geo_ray.stages.pregel import pinned_scc

    src = np.array([1, 2, 3, 3, 10, 11, 12, 20, 21, 22, 5],
                   dtype=np.int64)
    dst = np.array([2, 3, 1, 10, 11, 12, 10, 21, 22, 23, 500],
                   dtype=np.int64)
    out = pinned_scc(rd.from_arrow(pa.table({"src": src, "dst": dst}))
                     .repartition(3), n_shards=3).to_pandas()
    got = dict(zip(out["node"].astype(int), out["comp"].astype(int)))
    assert got == _ref_scc(src, dst)

    rng = np.random.default_rng(23)
    src = rng.integers(0, 80, 200).astype(np.int64)
    dst = rng.integers(0, 80, 200).astype(np.int64)
    m = src != dst
    src, dst = src[m], dst[m]
    out = pinned_scc(rd.from_arrow(pa.table({"src": src, "dst": dst}))
                     .repartition(4), max_rounds=20,
                     n_shards=4).to_pandas()
    got = dict(zip(out["node"].astype(int), out["comp"].astype(int)))
    ref = _ref_scc(src, dst)
    assert got == ref
    assert len(set(ref.values())) < len(ref)   # nontrivial instance


def test_negative_edge_sample_properties(ray_session):
    from zen3geo_ray.stages.graph import negative_edge_sample

    src = np.array([1, 2, 3, 4, 1], dtype=np.int64)
    dst = np.array([2, 3, 4, 1, 3], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})) \
        .repartition(2)
    out = negative_edge_sample(edges, k=2, slack=2,
                               n_buckets=4).to_pandas()
    real = set(zip(src.tolist(), dst.tolist()))
    for r in out.itertuples():
        assert (int(r.src), int(r.neg)) not in real   # true non-edges
        assert int(r.src) != int(r.neg)               # no self pairs
    assert (out.groupby("src").size() <= 2).all()     # k cap
    # deterministic: a second run reproduces the identical sample
    out2 = negative_edge_sample(edges, k=2, slack=2,
                                n_buckets=4).to_pandas()
    a = sorted(map(tuple, out[["src", "neg", "j"]].to_numpy()))
    b = sorted(map(tuple, out2[["src", "neg", "j"]].to_numpy()))
    assert a == b


def test_engine_auto_routes_to_pinned(ray_session, monkeypatch):
    """engine='auto' routes to the pinned actor engine above
    PINNED_EDGE_THRESHOLD with bit-identical results (round-4 verdict
    item 8); engine='dataset' pins the SQL-mirrored path; bad engine
    values fail loudly."""
    import zen3geo_ray.stages.graph as G

    src, dst = _random_graph(seed=31, n_nodes=120, n_edges=700)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    seeds = rd.from_arrow(pa.table({"node": pa.array([int(src[0])],
                                                     pa.int64())}))

    cases = [
        ("pagerank", lambda e: G.pagerank(edges, iters=3, n_buckets=8,
                                          engine=e), ["node"]),
        ("components", lambda e: G.connected_components(
            edges, n_buckets=8, engine=e), ["node"]),
        ("kcore", lambda e: G.kcore(edges, k=3, rounds=4, n_buckets=8,
                                    engine=e), ["node"]),
        ("bfs", lambda e: G.bfs_hops(edges, seeds, max_hops=3,
                                     n_buckets=8, engine=e), ["node"]),
        ("ktruss", lambda e: G.ktruss(edges, k=3, rounds=3, n_buckets=8,
                                      engine=e), ["u", "v"]),
        ("scc", lambda e: G.strongly_connected_components(
            edges, n_buckets=8, engine=e), ["node"]),
    ]
    for name, fn, keys in cases:
        want = fn("dataset").to_pandas().sort_values(keys) \
            .reset_index(drop=True)
        monkeypatch.setattr(G, "PINNED_EDGE_THRESHOLD", 1)
        got = fn("auto").to_pandas().sort_values(keys) \
            .reset_index(drop=True)
        monkeypatch.setattr(G, "PINNED_EDGE_THRESHOLD", 2_000_000)
        still = fn("auto").to_pandas().sort_values(keys) \
            .reset_index(drop=True)
        for g2 in (got, still):
            assert list(g2.columns) == list(want.columns), name
            assert g2.equals(want), name

    with pytest.raises(ValueError, match="engine"):
        G.pagerank(edges, engine="bogus")


def test_engine_auto_routes_second_family(ray_session, monkeypatch):
    """Auto-routing parity for the remaining pinned pairs: triangles,
    common_neighbors, label_propagation, sssp_bounded."""
    import zen3geo_ray.stages.graph as G

    src, dst = _random_graph(seed=37, n_nodes=120, n_edges=700)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    w = ((src * 7 + dst * 3) % 9 + 1).astype(np.int64)
    wedges = rd.from_arrow(pa.table({"src": src, "dst": dst,
                                     "w": w})).repartition(4)
    seeds = rd.from_arrow(pa.table({"node": pa.array([int(src[0])],
                                                     pa.int64())}))

    cases = [
        ("triangles", lambda e: G.triangle_count(edges, n_buckets=8,
                                                 engine=e), ["n_tri"]),
        ("cn", lambda e: G.common_neighbors(edges, n_buckets=8,
                                            engine=e), ["u", "v"]),
        ("lpa", lambda e: G.label_propagation(edges, rounds=3,
                                              n_buckets=8, engine=e),
         ["node"]),
        ("sssp", lambda e: G.sssp_bounded(wedges, seeds, max_rounds=3,
                                          n_buckets=8, engine=e),
         ["node"]),
    ]
    for name, fn, keys in cases:
        want = fn("dataset").to_pandas().sort_values(keys) \
            .reset_index(drop=True)
        monkeypatch.setattr(G, "PINNED_EDGE_THRESHOLD", 1)
        got = fn("auto").to_pandas().sort_values(keys) \
            .reset_index(drop=True)
        monkeypatch.setattr(G, "PINNED_EDGE_THRESHOLD", 2_000_000)
        assert list(got.columns) == list(want.columns), name
        assert got.equals(want), name
    # scores/aa variants stay on the Dataset path (pinned lacks them)
    monkeypatch.setattr(G, "PINNED_EDGE_THRESHOLD", 1)
    out = G.common_neighbors(edges, n_buckets=8, scores=True,
                             engine="auto").to_pandas()
    assert "jaccard" in "".join(out.columns) or len(out.columns) > 3
