"""Scale soaks for the closing-session operators: grid_bbox_join,
hash_walks and focal_conv at inputs ~100-1000x the sf0.1 suite, with
synthetic deterministic data generated IN PARALLEL (range ->
map_batches — nothing driver-side).  Prints one JSON line per soak.

Usage: python tools/soak_new_ops.py [bbox|walks|focal|all]
"""

import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")


def _init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)


def soak_bbox(n_a: int = 2_000_000, n_b: int = 2_000_000,
              dom: int = 200_000):
    """2M x 2M integer boxes over a 200k^2 domain (expected pair count
    ~ n_a * n_b * (avg_w + avg_w)^2 / dom^2 — kept in the tens of
    millions)."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.join import grid_bbox_join

    def boxes(id_col, salt):
        def fn(b: pa.Table) -> pa.Table:
            i = b.column("id").to_numpy(zero_copy_only=False)
            h1 = splitmix64(i.astype(np.uint64) + np.uint64(salt))
            h2 = splitmix64(i.astype(np.uint64) + np.uint64(salt + 1))
            x0 = (h1 % np.uint64(dom)).astype(np.int64)
            y0 = (h2 % np.uint64(dom)).astype(np.int64)
            w = 8 + (h1 >> np.uint64(32)).astype(np.int64) % 120
            h = 8 + (h2 >> np.uint64(32)).astype(np.int64) % 96
            return pa.table({
                id_col: pa.array(i.astype(np.int64)),
                "x0": pa.array(x0), "y0": pa.array(y0),
                "x1": pa.array(x0 + w), "y1": pa.array(y0 + h),
            })
        return fn

    a = rd.range(n_a, override_num_blocks=64).map_batches(
        boxes("a_id", 11), batch_format="pyarrow")
    b = rd.range(n_b, override_num_blocks=64).map_batches(
        boxes("b_id", 977), batch_format="pyarrow")
    t0 = time.perf_counter()
    out = grid_bbox_join(a, b, cell=512, n_buckets=64)
    n_pairs = out.count()
    wall = time.perf_counter() - t0
    return {"soak": "bbox_join", "n_a": n_a, "n_b": n_b,
            "pairs": n_pairs, "sec": round(wall, 2),
            "boxes_per_sec": round((n_a + n_b) / wall)}


def soak_walks(n_edges: int = 10_000_000, n_nodes: int = 1_000_000,
               n_seeds: int = 100_000, steps: int = 4):
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.graph import hash_walks

    def edges(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h1 = splitmix64(i.astype(np.uint64) + np.uint64(3))
        h2 = splitmix64(i.astype(np.uint64) + np.uint64(7))
        return pa.table({
            "src": pa.array((h1 % np.uint64(n_nodes)).astype(np.int64)),
            "dst": pa.array((h2 % np.uint64(n_nodes)).astype(np.int64)),
        })

    e = rd.range(n_edges, override_num_blocks=64).map_batches(
        edges, batch_format="pyarrow")
    seeds = rd.range(n_seeds).map_batches(
        lambda b: pa.table({"node": pa.array(
            (splitmix64(b.column("id").to_numpy(
                zero_copy_only=False).astype(np.uint64))
             % np.uint64(n_nodes)).astype(np.int64))}),
        batch_format="pyarrow")
    # dedup seeds (hash collisions) so walk_id stays unique
    from zen3geo_ray.stages.graph import distinct_tuples

    seeds = distinct_tuples(seeds, ["node"])
    t0 = time.perf_counter()
    out = hash_walks(e, seeds, steps=steps)
    rows = out.count()
    wall = time.perf_counter() - t0
    return {"soak": "hash_walks", "n_edges": n_edges,
            "n_seeds": n_seeds, "steps": steps, "rows": rows,
            "sec": round(wall, 2),
            "hops_per_sec": round(rows / wall)}


def soak_focal(n_pixels: int = 10_000_000, n_tiles: int = 4096,
               px: int = 256):
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.rasterize import focal_conv

    def sparse(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h = splitmix64(i.astype(np.uint64) + np.uint64(5))
        return pa.table({
            "tile_id": pa.array((h % np.uint64(n_tiles)).astype(np.int64)),
            "py": pa.array(((h >> np.uint64(16))
                            % np.uint64(px)).astype(np.int64)),
            "px": pa.array(((h >> np.uint64(32))
                            % np.uint64(px)).astype(np.int64)),
            "n": pa.array((1 + (h >> np.uint64(48))
                           % np.uint64(100)).astype(np.int64)),
        })

    sp = rd.range(n_pixels, override_num_blocks=64).map_batches(
        sparse, batch_format="pyarrow")
    gx = {(-1, -1): -1, (0, -1): -2, (1, -1): -1,
          (-1, 1): 1, (0, 1): 2, (1, 1): 1}
    gy = {(-1, -1): -1, (-1, 0): -2, (-1, 1): -1,
          (1, -1): 1, (1, 0): 2, (1, 1): 1}
    t0 = time.perf_counter()
    out = focal_conv(sp, px_size=px, kernels={"gx": gx, "gy": gy},
                     n_buckets=64)
    rows = out.count()
    wall = time.perf_counter() - t0
    return {"soak": "focal_conv", "n_input_rows": n_pixels,
            "touched_pixels": rows, "sec": round(wall, 2),
            "pixels_per_sec": round(n_pixels / wall)}


def soak_hull(n_pts: int = 10_000_000, n_groups: int = 64,
              dom: int = 1_000_000):
    """10M points, 64 groups over a 1M^2 integer domain: the block-
    local pruning must collapse each block to its tiny local hulls
    before the one survivor shuffle."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.hull import hull_boundary

    def pts(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h1 = splitmix64(i.astype(np.uint64) + np.uint64(21))
        h2 = splitmix64(i.astype(np.uint64) + np.uint64(77))
        return pa.table({
            "g": pa.array((h1 % np.uint64(n_groups)).astype(np.int64)),
            "x": pa.array((h2 % np.uint64(dom)).astype(np.int64)),
            "y": pa.array(((h2 >> np.uint64(20))
                           % np.uint64(dom)).astype(np.int64)),
        })

    ds = rd.range(n_pts, override_num_blocks=64).map_batches(
        pts, batch_format="pyarrow")
    t0 = time.perf_counter()
    rows = hull_boundary(ds, group_col="g", x_col="x", y_col="y",
                         n_buckets=32).count()
    wall = time.perf_counter() - t0
    return {"soak": "hull", "n_pts": n_pts, "groups": n_groups,
            "boundary_pts": rows, "sec": round(wall, 2),
            "pts_per_sec": round(n_pts / wall)}


def soak_pinned_sssp(n_edges: int = 10_000_000, n_nodes: int = 1_000_000,
                     n_seeds: int = 1000, rounds: int = 4):
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.pregel import pinned_sssp

    def edges(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h1 = splitmix64(i.astype(np.uint64) + np.uint64(3))
        h2 = splitmix64(i.astype(np.uint64) + np.uint64(7))
        return pa.table({
            "src": pa.array((h1 % np.uint64(n_nodes)).astype(np.int64)),
            "dst": pa.array((h2 % np.uint64(n_nodes)).astype(np.int64)),
            "w": pa.array((1 + (h1 >> np.uint64(40))
                           % np.uint64(15)).astype(np.int64)),
        })

    e = rd.range(n_edges, override_num_blocks=64).map_batches(
        edges, batch_format="pyarrow")
    seeds = rd.range(n_seeds).map_batches(
        lambda b: pa.table({"node": pa.array(
            (b.column("id").to_numpy(zero_copy_only=False)
             * 997 % n_nodes).astype(np.int64))}),
        batch_format="pyarrow")
    t0 = time.perf_counter()
    out = pinned_sssp(e, seeds, max_rounds=rounds)
    rows = out.count()
    wall = time.perf_counter() - t0
    return {"soak": "pinned_sssp", "n_edges": n_edges,
            "n_seeds": n_seeds, "rounds": rounds, "reached": rows,
            "sec": round(wall, 2),
            "edge_relax_per_sec": round(n_edges * rounds / wall)}


def soak_sim_join(n_docs: int = 1_000_000, doc_len: int = 40,
                  vocab: int = 100_000):
    """1M synthetic docs over a 100k-word vocab with ~10% planted
    near-dup pairs (4 of 40 tokens changed): the PREFIX filter must
    keep candidates near the true pair count.  order='hash' — at this
    vocab the df table outgrows a broadcast blob, which is exactly the
    regime the stateless order exists for."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.dedup import jaccard_sim_join

    def docs(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        # doc 10k+9 clones doc 10k+8 except 4 hash-picked positions
        base = np.where(i % 10 == 9, i - 1, i)
        texts = []
        for bi, oi in zip(base.tolist(), i.tolist()):
            pos = splitmix64(np.uint64(bi) * np.uint64(doc_len)
                             + np.arange(doc_len, dtype=np.uint64))
            w = pos % np.uint64(vocab)
            if oi != bi:  # the near-dup: perturb 4 positions
                w = w.copy()
                w[::10] = (w[::10] + np.uint64(1)) % np.uint64(vocab)
            texts.append(" ".join("w%d" % t for t in w.tolist()))
        return pa.table({"doc_id": pa.array(i), "text": texts})

    ds = rd.range(n_docs, override_num_blocks=64).map_batches(
        docs, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = jaccard_sim_join(ds, k=3, tau_num=1, tau_den=2,
                           n_buckets=64, order="hash")
    pairs = out.count()
    wall = time.perf_counter() - t0
    return {"soak": "sim_join", "n_docs": n_docs, "vocab": vocab,
            "pairs": pairs, "sec": round(wall, 2),
            "docs_per_sec": round(n_docs / wall)}



def soak_spatial_stats(n_pts: int = 20_000_000, res: int = 10):
    """20M points -> res-10 grid (2048x1024 = 2M cells): the histogram
    reduce is the distributed cost, the exact-int finales run over the
    bounded grid.  Times morans_i (+geary), gi_star and ripley on the
    SAME input."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.spatial_stats import (
        getis_ord_g,
        morans_i,
        ripley_k,
    )

    ncells = (2 << res) * (1 << res)

    def pts(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h = splitmix64(i.astype(np.uint64) + np.uint64(31))
        # clustered: half the mass in 1% of cells
        hot = (h % np.uint64(100)) < np.uint64(50)
        cell = np.where(
            hot,
            (h >> np.uint64(8)) % np.uint64(ncells // 100),
            (h >> np.uint64(8)) % np.uint64(ncells),
        ).astype(np.int64)
        return pa.table({"cell": pa.array(cell)})

    ds = rd.range(n_pts, override_num_blocks=64).map_batches(
        pts, batch_format="pyarrow")
    out = {"soak": "spatial_stats", "n_pts": n_pts, "res": res}
    t0 = time.perf_counter()
    m = morans_i(ds, res=res, n_buckets=32).to_pandas()
    out["moran_sec"] = round(time.perf_counter() - t0, 2)
    out["moran_i"] = round(float(m.moran_i.iloc[0]), 6)
    out["n_cells"] = int(m.n_cells.iloc[0])
    t0 = time.perf_counter()
    g = getis_ord_g(ds, res=res, n_buckets=32)
    out["gi_sec"] = round(time.perf_counter() - t0, 2)
    out["gi_rows"] = g.num_rows
    t0 = time.perf_counter()
    ripley_k(ds, res=res, max_lag=2, n_buckets=32)
    out["ripley_sec"] = round(time.perf_counter() - t0, 2)
    out["pts_per_sec"] = round(
        3 * n_pts / (out["moran_sec"] + out["gi_sec"]
                     + out["ripley_sec"]))
    return out


def soak_tarshards(n_samples: int = 1_000_000, payload: int = 256):
    """1M (key, img, txt) samples -> WebDataset tar shards -> read
    back; measures sink and source throughput (disk-bound)."""
    import shutil
    import tempfile

    import ray.data as rd

    from zen3geo_ray.sources.tarshards import (
        read_tar_shards,
        write_tar_shards,
    )

    def gen(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        keys = [f"{v:09d}" for v in i.tolist()]
        imgs = [bytes([v % 256]) * payload for v in i.tolist()]
        txts = [f"caption {v}" for v in i.tolist()]
        return pa.table({"key": pa.array(keys),
                         "img": pa.array(imgs, pa.binary()),
                         "txt": pa.array(txts)})

    ds = rd.range(n_samples, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow")
    out = tempfile.mkdtemp(prefix="wds_soak_")
    try:
        t0 = time.perf_counter()
        paths = write_tar_shards(ds, out, key_col="key")
        w = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_back = read_tar_shards(out).count()
        r = time.perf_counter() - t0
        return {"soak": "tarshards", "n_samples": n_samples,
                "shards": len(paths), "write_sec": round(w, 2),
                "read_sec": round(r, 2), "n_back": n_back,
                "write_samples_per_sec": round(n_samples / w),
                "read_samples_per_sec": round(n_samples / r)}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    _init()
    fns = {"bbox": soak_bbox, "walks": soak_walks, "focal": soak_focal,
           "hull": soak_hull, "sssp": soak_pinned_sssp,
           "sim": soak_sim_join, "spatial": soak_spatial_stats,
           "tarshards": soak_tarshards, "mst": soak_mst,
           "butterfly": soak_butterfly, "mis": soak_mis,
           "edit": soak_edit_join, "funnel": soak_funnel,
           "kaplan": soak_kaplan, "scc": soak_scc,
           "scc_pinned": lambda: soak_scc(engine="pinned"),
           "autoroute": soak_auto_route, "pyramid": soak_pyramid,
           "densify": soak_densify, "harmonic": soak_harmonic}
    todo = fns.values() if which == "all" else [fns[which]]
    for fn in todo:
        print(json.dumps(fn()), flush=True)
    import ray

    ray.shutdown()




def soak_mst(n_edges: int = 10_000_000, n_nodes: int = 1_000_000):
    """Boruvka MSF on a 10M-edge random graph (weights hashed)."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.graph import minimum_spanning_forest

    def edges(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h1 = splitmix64(i.astype(np.uint64) + np.uint64(3))
        h2 = splitmix64(i.astype(np.uint64) + np.uint64(7))
        h3 = splitmix64(i.astype(np.uint64) + np.uint64(11))
        return pa.table({
            "src": pa.array((h1 % np.uint64(n_nodes)).astype(np.int64)),
            "dst": pa.array((h2 % np.uint64(n_nodes)).astype(np.int64)),
            "w": pa.array((h3 % np.uint64(1 << 30)).astype(np.int64)),
        })

    e = rd.range(n_edges, override_num_blocks=64).map_batches(
        edges, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = minimum_spanning_forest(e, rounds=22)
    rows = out.count()
    wall = time.perf_counter() - t0
    return {"soak": "mst", "n_edges": n_edges, "n_nodes": n_nodes,
            "forest_edges": rows, "sec": round(wall, 2),
            "edges_per_sec": round(n_edges / wall)}


def soak_butterfly(n_edges: int = 5_000_000, n_left: int = 500_000,
                   n_right: int = 20_000):
    """Bipartite butterfly census at 5M edges (Zipf-free uniform)."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.graph import butterfly_count

    def edges(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h1 = splitmix64(i.astype(np.uint64) + np.uint64(3))
        h2 = splitmix64(i.astype(np.uint64) + np.uint64(7))
        return pa.table({
            "src": pa.array((h1 % np.uint64(n_left)).astype(np.int64)),
            "dst": pa.array((h2 % np.uint64(n_right)).astype(np.int64)),
        })

    e = rd.range(n_edges, override_num_blocks=64).map_batches(
        edges, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = butterfly_count(e).to_pandas().iloc[0]
    wall = time.perf_counter() - t0
    return {"soak": "butterfly", "n_edges": n_edges,
            "butterflies": int(out.butterflies),
            "caterpillars": int(out.caterpillars),
            "sec": round(wall, 2),
            "edges_per_sec": round(n_edges / wall)}


def soak_mis(n_edges: int = 10_000_000, n_nodes: int = 2_000_000):
    """Luby MIS on a symmetric 10M-edge graph."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.graph import maximal_independent_set

    def edges(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h1 = splitmix64(i.astype(np.uint64) + np.uint64(3))
        h2 = splitmix64(i.astype(np.uint64) + np.uint64(7))
        s = (h1 % np.uint64(n_nodes)).astype(np.int64)
        d = (h2 % np.uint64(n_nodes)).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([s, d])),
            "dst": pa.array(np.concatenate([d, s])),
        })

    e = rd.range(n_edges // 2, override_num_blocks=64).map_batches(
        edges, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = maximal_independent_set(e, rounds=12)
    rows = out.count()
    wall = time.perf_counter() - t0
    return {"soak": "mis", "n_edges": n_edges, "mis_size": rows,
            "sec": round(wall, 2),
            "edges_per_sec": round(n_edges / wall)}


def soak_edit_join(n_strings: int = 1_000_000, n_blocks: int = 10_000):
    """Blocked Levenshtein self-join: 1M length-4..8 strings over a
    4-letter alphabet in 10k blocking keys (~100/block -> ~50M
    candidate pairs through the vectorized DP)."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.fuzzy import edit_distance_join

    alpha = np.frombuffer(b"abcd", np.uint8)

    def strings(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h = splitmix64(i.astype(np.uint64) + np.uint64(17))
        ln = (4 + (h % np.uint64(5))).astype(np.int64)
        chars = np.empty((len(i), 8), np.uint8)
        hh = h
        for j in range(8):
            chars[:, j] = alpha[(hh % np.uint64(4)).astype(np.int64)]
            hh = hh >> np.uint64(2)
        names = [bytes(chars[r, :ln[r]]).decode() for r in range(len(i))]
        return pa.table({
            "pid": pa.array(i.astype(np.int64)),
            "nm": pa.array(names, pa.string()),
            "blk": pa.array((splitmix64(i.astype(np.uint64))
                             % np.uint64(n_blocks)).astype(np.int64)),
        })

    ds = rd.range(n_strings, override_num_blocks=64).map_batches(
        strings, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = edit_distance_join(ds, id_col="pid", text_col="nm",
                             block_col="blk", max_dist=1, n_buckets=64)
    rows = out.count()
    wall = time.perf_counter() - t0
    return {"soak": "edit_join", "n_strings": n_strings,
            "n_blocks": n_blocks, "pairs_matched": rows,
            "sec": round(wall, 2),
            "strings_per_sec": round(n_strings / wall)}


def soak_funnel(n_events: int = 20_000_000, n_users: int = 1_000_000):
    """3-step ordered funnel over 20M events / 1M users."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.sequence import funnel_depth

    types = np.array(["view", "click", "purchase", "scroll", "error"])

    def events(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h = splitmix64(i.astype(np.uint64) + np.uint64(23))
        h2 = splitmix64(i.astype(np.uint64) + np.uint64(10**9 + 7))
        return pa.table({
            "u": pa.array((h % np.uint64(n_users)).astype(np.int64)),
            "tu": pa.array(((h >> np.uint64(20))
                            % np.uint64(10**9)).astype(np.int64)),
            "eid": pa.array(i.astype(np.int64)),
            "typ": pa.array(types[(h2 % np.uint64(5)).astype(np.int64)]),
        })

    ds = rd.range(n_events, override_num_blocks=64).map_batches(
        events, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = funnel_depth(ds, key_col="u", ts_col="tu", id_col="eid",
                       type_col="typ",
                       steps=["view", "click", "purchase"],
                       n_buckets=64).to_pandas()
    wall = time.perf_counter() - t0
    return {"soak": "funnel", "n_events": n_events,
            "depths": {int(r.depth): int(r.n_users)
                       for r in out.itertuples()},
            "sec": round(wall, 2),
            "events_per_sec": round(n_events / wall)}


def soak_kaplan(n_events: int = 50_000_000, n_users: int = 5_000_000):
    """KM survival over 50M events / 5M users (per-key min/max reduce
    + day-bounded finale)."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.sequence import KM_DAY_US, kaplan_meier

    def events(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h = splitmix64(i.astype(np.uint64) + np.uint64(29))
        u = (h % np.uint64(n_users)).astype(np.int64)
        day = ((h >> np.uint64(24)) % np.uint64(90)).astype(np.int64)
        off = ((h >> np.uint64(32))
               % np.uint64(KM_DAY_US)).astype(np.int64)
        return pa.table({
            "u": pa.array(u),
            "tu": pa.array(day * KM_DAY_US + off),
        })

    ds = rd.range(n_events, override_num_blocks=64).map_batches(
        events, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = kaplan_meier(ds, key_col="u", ts_col="tu", censor_days=1,
                       n_buckets=64)
    wall = time.perf_counter() - t0
    return {"soak": "kaplan", "n_events": n_events,
            "death_days": out.num_rows, "sec": round(wall, 2),
            "events_per_sec": round(n_events / wall)}


def soak_scc(n_edges: int = 10_000_000, n_nodes: int = 2_000_000,
             ring: int = 128, levels: int = 8, engine: str = "dataset"):
    """SCC on a ~10M-edge digraph with PLANTED structure and BOUNDED
    diameter: n_nodes/ring directed rings (each a 128-node SCC) with
    one random WITHIN-ring chord per node (ring diameter ~ log ring),
    plus random BETWEEN-ring edges oriented by a hashed ring level
    (<= `levels` DAG depth; equal-level pairs dropped) — so the rings
    are exactly the SCCs and the inner propagations converge in ~20
    passes (directed min propagation is O(diameter), see the operator
    docstring).  Verifies the recovered component count and sizes."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.graph import strongly_connected_components

    n_rings = n_nodes // ring

    def ring_edges(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        nxt = np.where(i % ring == ring - 1, i - (ring - 1), i + 1)
        hc = splitmix64(i.astype(np.uint64) + np.uint64(5))
        chord = ((i // ring) * ring
                 + (hc % np.uint64(ring)).astype(np.int64))
        return pa.table({
            "src": pa.array(np.concatenate([i, i]).astype(np.int64)),
            "dst": pa.array(np.concatenate([nxt, chord])
                            .astype(np.int64))})

    def dag_edges(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h1 = splitmix64(i.astype(np.uint64) + np.uint64(11))
        h2 = splitmix64(i.astype(np.uint64) + np.uint64(13))
        u = (h1 % np.uint64(n_nodes)).astype(np.int64)
        v = (h2 % np.uint64(n_nodes)).astype(np.int64)
        lu = (splitmix64((u // ring).astype(np.uint64))
              % np.uint64(levels)).astype(np.int64)
        lv = (splitmix64((v // ring).astype(np.uint64))
              % np.uint64(levels)).astype(np.int64)
        keep = lu != lv
        s = np.where(lu < lv, u, v)[keep]
        d = np.where(lu < lv, v, u)[keep]
        return pa.table({"src": pa.array(s), "dst": pa.array(d)})

    rings = rd.range(n_nodes, override_num_blocks=64).map_batches(
        ring_edges, batch_format="pyarrow")
    dag = rd.range(n_edges - 2 * n_nodes, override_num_blocks=64) \
        .map_batches(dag_edges, batch_format="pyarrow")
    e = rings.union(dag)
    t0 = time.perf_counter()
    if engine == "pinned":
        from zen3geo_ray.stages.pregel import pinned_scc

        out = pinned_scc(e, max_rounds=12)
    else:
        out = strongly_connected_components(e, max_rounds=12,
                                            engine=engine)
    comp = out.to_pandas()
    wall = time.perf_counter() - t0
    sizes = comp.groupby("comp").size()
    ok = (len(sizes) == n_rings and int(sizes.min()) == ring
          and int(sizes.max()) == ring)
    return {"soak": "scc", "engine": engine,
            "n_edges": n_edges, "n_nodes": n_nodes,
            "planted_sccs": n_rings, "found_sccs": int(len(sizes)),
            "structure_ok": bool(ok), "sec": round(wall, 2),
            "edges_per_sec": round(n_edges / wall)}


def soak_auto_route(n_edges: int = 4_000_000,
                    n_nodes: int = 800_000):
    """Round-5 verdict item 8 evidence: the graph family at soak scale
    with engine='auto' (routes to the pinned actor engine above
    PINNED_EDGE_THRESHOLD) vs the explicit Dataset path — BIT-IDENTICAL
    results, wall times for both.  One random digraph shared by every
    op; components/kcore symmetrize internally."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages import graph as G

    def mk(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h1 = splitmix64(i.astype(np.uint64) + np.uint64(3))
        h2 = splitmix64(i.astype(np.uint64) + np.uint64(7))
        return pa.table({
            "src": pa.array((h1 % np.uint64(n_nodes)).astype(np.int64)),
            "dst": pa.array((h2 % np.uint64(n_nodes)).astype(np.int64))})

    e = rd.range(n_edges, override_num_blocks=64).map_batches(
        mk, batch_format="pyarrow").materialize()
    seeds = rd.from_arrow(pa.table({"node": pa.array([0], pa.int64())}))

    ops = {
        "pagerank": lambda eng: G.pagerank(e, iters=3, engine=eng),
        "components": lambda eng: G.connected_components(e, engine=eng),
        "kcore": lambda eng: G.kcore(e, k=8, rounds=4, engine=eng),
        "bfs": lambda eng: G.bfs_hops(e, seeds, max_hops=3, engine=eng),
        "scc": lambda eng: G.strongly_connected_components(
            e, max_rounds=12, engine=eng),
    }
    out = {"soak": "autoroute", "n_edges": n_edges, "n_nodes": n_nodes,
           "ops": {}}
    for name, fn in ops.items():
        t0 = time.perf_counter()
        auto = fn("auto").to_pandas()
        t_auto = time.perf_counter() - t0
        t0 = time.perf_counter()
        ds = fn("dataset").to_pandas()
        t_ds = time.perf_counter() - t0
        keys = list(auto.columns)
        a = auto.sort_values(keys).reset_index(drop=True)
        d = ds.sort_values(keys).reset_index(drop=True)
        out["ops"][name] = {
            "bit_identical": bool(a.equals(d)),
            "rows": int(len(a)),
            "auto_sec": round(t_auto, 2),
            "dataset_sec": round(t_ds, 2),
            "speedup": round(t_ds / max(t_auto, 1e-9), 2)}
    return out


def soak_pyramid(n_pts: int = 50_000_000, res: int = 12):
    """One-pass multi-level density pyramid at 50M points: the
    combiner emits 4 levels per block, one (level, cell) shuffle."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.spatial_stats import pyramid_counts

    ncols = 2 << res
    nrows = 1 << res

    def mk(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        hx = splitmix64(i.astype(np.uint64) + np.uint64(3))
        hy = splitmix64(i.astype(np.uint64) + np.uint64(9))
        nx = (hx % np.uint64(ncols)).astype(np.int64)
        ny = (hy % np.uint64(nrows)).astype(np.int64)
        return pa.table({"cell": pa.array(ny * ncols + nx)})

    pts = rd.range(n_pts, override_num_blocks=64).map_batches(
        mk, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = pyramid_counts(pts, res=res, deltas=[0, 4, 8, 10],
                         n_buckets=64).materialize()
    wall = time.perf_counter() - t0
    import pandas as pd  # noqa: F401
    tot = out.to_pandas().groupby("level")["n"].sum()
    ok = bool((tot == n_pts).all())
    return {"soak": "pyramid", "n_pts": n_pts, "levels": 4,
            "rows_out": out.count(), "totals_ok": ok,
            "sec": round(wall, 2),
            "pts_per_sec": round(n_pts / wall)}


def soak_densify(n_segs: int = 10_000_000, k: int = 8):
    """Flat-map densification at 10M segments -> 90M points."""
    import ray.data as rd

    from zen3geo_ray.stages.join import densify_segments

    def mk(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "sid": pa.array(i),
            "x0": pa.array((i * 173) % 100_000),
            "y0": pa.array((i * 179) % 100_000),
            "x1": pa.array((i * 173) % 100_000 + i % 240 - 120),
            "y1": pa.array((i * 179) % 100_000 + i % 192 - 96)})

    segs = rd.range(n_segs, override_num_blocks=64).map_batches(
        mk, batch_format="pyarrow")
    t0 = time.perf_counter()
    n = densify_segments(segs, k=k).count()
    wall = time.perf_counter() - t0
    return {"soak": "densify", "n_segs": n_segs, "k": k,
            "points_out": n, "ok": n == n_segs * (k + 1),
            "sec": round(wall, 2),
            "pts_per_sec": round(n / wall)}


def soak_harmonic(n_edges: int = 10_000_000, n_nodes: int = 2_000_000):
    """Harmonic centrality (4 seeds x 3 hops) on a 10M-edge digraph —
    each seed BFS auto-routes to the pinned engine."""
    import ray.data as rd

    from zen3geo_ray.functions.hashing import splitmix64
    from zen3geo_ray.stages.graph import seed_harmonic_centrality

    def mk(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        h1 = splitmix64(i.astype(np.uint64) + np.uint64(3))
        h2 = splitmix64(i.astype(np.uint64) + np.uint64(7))
        return pa.table({
            "src": pa.array((h1 % np.uint64(n_nodes)).astype(np.int64)),
            "dst": pa.array((h2 % np.uint64(n_nodes)).astype(np.int64))})

    e = rd.range(n_edges, override_num_blocks=64).map_batches(
        mk, batch_format="pyarrow").materialize()
    seeds = rd.from_arrow(pa.table({"node": pa.array([0, 1, 2, 3],
                                                     pa.int64())}))
    t0 = time.perf_counter()
    out = seed_harmonic_centrality(e, seeds, max_hops=3).materialize()
    wall = time.perf_counter() - t0
    return {"soak": "harmonic", "n_edges": n_edges, "seeds": 4,
            "rows_out": out.count(), "sec": round(wall, 2),
            "edge_traversals_per_sec": round(4 * 3 * n_edges / wall)}


if __name__ == "__main__":
    main()
