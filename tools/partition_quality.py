"""Graph-partitioning quality study: edge-cut of the engine's
splitmix64 hash sharding vs a capacity-bounded label-propagation
refinement pass (the cheap METIS-style improvement).

The pinned Pregel path (stages/pregel.py) shards nodes by
``splitmix64(node) % S``.  Hash sharding is balance-perfect and
stateless (any worker can route any edge without a lookup table), but
it ignores topology: the expected edge-cut fraction is (S-1)/S.  This
tool measures how much a one-shot refinement could recover on the
engine's own co-purchase graphs, to justify (or reject) adding a
partition-map indirection to the shard pool.

Usage: python tools/partition_quality.py [sf_dir] [S] [passes]
Writes one human-readable block; record results in BASELINE.md.
"""

from __future__ import annotations

import sys

import numpy as np


def load_copurchase_edges(sf_dir: str, qty_min: int = 35) -> np.ndarray:
    import duckdb

    con = duckdb.connect()
    df = con.execute(f"""
        WITH lines AS (SELECT DISTINCT l_orderkey ok, l_partkey pk
                       FROM read_parquet('{sf_dir}/lineitem.parquet')
                       WHERE l_quantity >= {qty_min})
        SELECT a.pk u, b.pk v FROM lines a
        JOIN lines b ON a.ok = b.ok AND a.pk < b.pk""").df()
    return df.to_numpy().astype(np.int64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def edge_cut(part: np.ndarray, eu: np.ndarray, ev: np.ndarray) -> float:
    return float((part[eu] != part[ev]).mean())


def refine(part: np.ndarray, eu: np.ndarray, ev: np.ndarray, S: int,
           passes: int, slack: float = 1.05) -> np.ndarray:
    """Capacity-bounded label propagation (one-shot LDG-style): each
    pass visits nodes in a fixed order and moves a node to the shard
    holding the plurality of its neighbors, unless that shard is at
    capacity.  Deterministic (no RNG)."""
    n = len(part)
    cap = int(slack * n / S) + 1
    # CSR adjacency (symmetric)
    deg = np.bincount(eu, minlength=n) + np.bincount(ev, minlength=n)
    idx = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=idx[1:])
    adj = np.empty(idx[-1], dtype=np.int64)
    cur = idx[:-1].copy()
    order = np.argsort(eu, kind="stable")
    _scatter(adj, cur, eu[order], ev[order])
    order = np.argsort(ev, kind="stable")
    _scatter(adj, cur, ev[order], eu[order])

    part = part.copy()
    sizes = np.bincount(part, minlength=S)
    for _ in range(passes):
        moved = 0
        for v in range(n):
            s0, e0 = idx[v], idx[v + 1]
            if e0 == s0:
                continue
            counts = np.bincount(part[adj[s0:e0]], minlength=S)
            best = int(np.argmax(counts))
            if best != part[v] and counts[best] > counts[part[v]] \
                    and sizes[best] < cap:
                sizes[part[v]] -= 1
                sizes[best] += 1
                part[v] = best
                moved += 1
        if moved == 0:
            break
    return part


def _scatter(adj, cur, src_sorted, dst_sorted):
    # positions: for each sorted src run, consecutive slots
    u, start = np.unique(src_sorted, return_index=True)
    counts = np.diff(np.append(start, len(src_sorted)))
    pos = (np.arange(len(src_sorted))
           - np.repeat(start, counts)
           + np.repeat(cur[u], counts))
    adj[pos] = dst_sorted
    cur[u] += counts


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    e = load_copurchase_edges(sf_dir)
    nodes, inv = np.unique(e.reshape(-1), return_inverse=True)
    eu, ev = inv[0::2].copy(), inv[1::2].copy()
    n = len(nodes)
    print(f"graph: {sf_dir} co-purchase  nodes={n}  edges={len(eu)}  S={S}")

    hash_part = (splitmix64(nodes) % np.uint64(S)).astype(np.int64)
    c0 = edge_cut(hash_part, eu, ev)
    print(f"splitmix64 hash sharding : edge-cut {c0:.4f} "
          f"(expected random (S-1)/S = {(S - 1) / S:.4f}); "
          f"balance max/mean = "
          f"{np.bincount(hash_part, minlength=S).max() / (n / S):.3f}")

    ref = refine(hash_part, eu, ev, S, passes)
    c1 = edge_cut(ref, eu, ev)
    print(f"+{passes} LP refinement pass : edge-cut {c1:.4f} "
          f"({(1 - c1 / c0) * 100:.1f}% fewer cut edges); "
          f"balance max/mean = "
          f"{np.bincount(ref, minlength=S).max() / (n / S):.3f}")


if __name__ == "__main__":
    main()
