"""Pregel-style actor-sharded graph ops: edge shards PINNED in actors
(PageRank + min-label connected components).

The Dataset BSP path (stages/graph.py:pagerank) re-shuffles the edge
table once per round inside its bucketed join — the documented cost of
expressing iteration over Ray Data, which has no notion of a persistent
partitioning.  This module is the engine's documented RAW-ACTOR LAST
RESORT (the brief's case (c)): a pool of ``GraphShard`` actors each
holds one hash(src) edge shard AND the matching hash(node) rank shard,
so after one ingestion pass THE EDGES NEVER MOVE AGAIN.  Each round:

  1. every shard computes its local edges' contributions from its LOCAL
     rank shard (edge shard i's sources are exactly rank shard i's
     nodes — the co-partitioning invariant) and pre-sums them per
     destination, split into S per-destination-shard tables returned as
     S SEPARATE ObjectRefs (``num_returns``);
  2. the driver routes ONLY REFS: shard j applies the S incoming
     partial tables (object-store peer-to-peer, never through the
     driver) + its teleport base to produce its next rank shard.

Per-round data movement is therefore O(S² ref plumbing + per-shard
node partials) — at 100 TB this is the difference between re-shipping
the (dominant) edge table every round and shipping only rank deltas.

Partitioning assumption (documented per the brief): shard(x) =
``splitmix64(x) % n_shards`` on BOTH edge sources and rank nodes; any
skewed hub node concentrates its out-edges in one shard — salt hot
sources upstream if a single node's edges exceed one machine.

Arithmetic is IDENTICAL to stages/graph.py:pagerank (same exact-integer
recurrence), pinned by a bit-equality parity test — so this path needs
no oracle of its own.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64
from .graph import NODE, node_degrees


def _shard_of(x: np.ndarray, n_shards: int) -> np.ndarray:
    return (splitmix64(x.astype(np.uint64)) % np.uint64(n_shards)).astype(np.int64)


def _make_shard_cls():
    import ray

    @ray.remote
    class GraphShard:
        """One edge shard + the co-partitioned rank shard."""

        def __init__(self, shard_id: int, n_shards: int):
            self.shard_id = shard_id
            self.n = n_shards
            self._src_parts: list[np.ndarray] = []
            self._dst_parts: list[np.ndarray] = []
            self._node_parts: list[np.ndarray] = []
            self._deg_parts: list[np.ndarray] = []
            self.nodes = np.empty(0, dtype=np.int64)
            self.outdeg = np.empty(0, dtype=np.int64)
            self.pr = np.empty(0, dtype=np.int64)

        def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
            self._src_parts.append(np.asarray(src, dtype=np.int64))
            self._dst_parts.append(np.asarray(dst, dtype=np.int64))
            return len(src)

        def seal(self) -> int:
            """Sort edges by src once so each round's rank gather is one
            searchsorted pass."""
            src = (np.concatenate(self._src_parts)
                   if self._src_parts else np.empty(0, np.int64))
            dst = (np.concatenate(self._dst_parts)
                   if self._dst_parts else np.empty(0, np.int64))
            self._src_parts = self._dst_parts = []
            order = np.argsort(src, kind="mergesort")
            self.src = src[order]
            self.dst = dst[order]
            # pre-split destinations by owner shard (static across rounds)
            self.dst_shard = _shard_of(self.dst, self.n)
            return len(self.src)

        def add_nodes(self, nodes: np.ndarray, outdeg: np.ndarray) -> int:
            # ACCUMULATE (never replace): callers may deliver the node
            # table in several batches
            self._node_parts.append(np.asarray(nodes, np.int64))
            self._deg_parts.append(np.asarray(outdeg, np.int64))
            return len(nodes)

        def init_rank(self, r0: int) -> None:
            nodes = (np.concatenate(self._node_parts)
                     if self._node_parts else np.empty(0, np.int64))
            outdeg = (np.concatenate(self._deg_parts)
                      if self._deg_parts else np.empty(0, np.int64))
            self._node_parts = self._deg_parts = []
            order = np.argsort(nodes, kind="mergesort")
            self.nodes = nodes[order]
            self.outdeg = outdeg[order]
            self.pr = np.full(len(self.nodes), int(r0), dtype=np.int64)

        def contribs(self) -> list:
            """S per-destination-shard (node, sum) partial tables."""
            if len(self.src) == 0:
                empty = pa.table({NODE: pa.array([], pa.int64()),
                                  "_s": pa.array([], pa.int64())})
                return [empty] * self.n
            ix = np.searchsorted(self.nodes, self.src)
            c = self.pr[ix] // self.outdeg[ix]  # outdeg >= 1 for sources
            out = []
            for j in range(self.n):
                m = self.dst_shard == j
                d = self.dst[m]
                u, inv = np.unique(d, return_inverse=True)
                s = np.zeros(len(u), dtype=np.int64)
                np.add.at(s, inv, c[m])
                out.append(pa.table({NODE: pa.array(u), "_s": pa.array(s)}))
            return out

        def apply(self, base: int, d_num: int, d_den: int,
                  *incoming) -> int:
            s = np.zeros(len(self.nodes), dtype=np.int64)
            # with num_returns=1 (S == 1) the single ref resolves to the
            # whole list returned by contribs — flatten it
            flat = []
            for t in incoming:
                flat.extend(t) if isinstance(t, list) else flat.append(t)
            for t in flat:
                nd = t.column(NODE).to_numpy(zero_copy_only=False)
                if len(nd) == 0:
                    continue
                ix = np.searchsorted(self.nodes, nd)
                s[ix] += t.column("_s").to_numpy(zero_copy_only=False)
            self.pr = int(base) + (int(d_num) * s) // int(d_den)
            return len(self.pr)

        def rank_table(self) -> pa.Table:
            return pa.table({NODE: pa.array(self.nodes),
                             "outdeg": pa.array(self.outdeg),
                             "pr": pa.array(self.pr)})

        # --- min-label propagation (connected components) -------------
        def init_comp(self) -> None:
            nodes = (np.concatenate(self._node_parts)
                     if self._node_parts else np.empty(0, np.int64))
            self._node_parts = self._deg_parts = []
            self.nodes = np.unique(nodes)
            self.comp = self.nodes.copy()

        def min_contribs(self) -> list:
            if len(self.src) == 0:
                empty = pa.table({NODE: pa.array([], pa.int64()),
                                  "comp": pa.array([], pa.int64())})
                return [empty] * self.n
            ix = np.searchsorted(self.nodes, self.src)
            c = self.comp[ix]
            out = []
            for j in range(self.n):
                m = self.dst_shard == j
                d = self.dst[m]
                u, inv = np.unique(d, return_inverse=True)
                mn = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(mn, inv, c[m])
                out.append(pa.table({NODE: pa.array(u),
                                     "comp": pa.array(mn)}))
            return out

        def apply_min(self, *incoming) -> int:
            """Relax with incoming minima; returns how many labels
            CHANGED (the distributed convergence scalar)."""
            flat = []
            for t in incoming:
                flat.extend(t) if isinstance(t, list) else flat.append(t)
            new = self.comp.copy()
            for t in flat:
                nd = t.column(NODE).to_numpy(zero_copy_only=False)
                if len(nd) == 0:
                    continue
                ix = np.searchsorted(self.nodes, nd)
                np.minimum.at(
                    new, ix, t.column("comp").to_numpy(zero_copy_only=False))
            changed = int((new != self.comp).sum())
            self.comp = new
            return changed

        def comp_table(self) -> pa.Table:
            return pa.table({NODE: pa.array(self.nodes),
                             "comp": pa.array(self.comp)})

    return GraphShard


def pinned_pagerank(edges, *, src: str = "src", dst: str = "dst",
                    iters: int = 4, scale: int = 10 ** 12,
                    d_num: int = 85, d_den: int = 100,
                    n_shards: int | None = None):
    """PageRank over actor-pinned edge shards (see module docstring).

    Same result as ``graph.pagerank`` bit for bit; per-round data
    movement excludes the edge table entirely.  Returns a Dataset built
    from the shard rank tables WITHOUT driver materialization
    (``ray.data.from_arrow_refs``)."""
    import ray
    import ray.data as rd

    if scale * d_num >= 1 << 62:
        raise ValueError("scale * d_num must stay below 2^62")
    if n_shards is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = min(8, cpus)
    S = int(n_shards)
    GraphShard = _make_shard_cls()
    shards = [GraphShard.remote(i, S) for i in range(S)]

    # distributed ingestion: map tasks route each batch's edges to their
    # shard owners (acked inside the task — no driver-side batch loop)
    shards_ref = ray.put(shards)

    def route(b: pa.Table) -> pa.Table:
        hs = ray.get(shards_ref)
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        sh = _shard_of(s, S)
        acks = []
        for j in range(S):
            m = sh == j
            if m.any():
                acks.append(hs[j].add_edges.remote(s[m], d[m]))
        ray.get(acks)
        return pa.table({"_n": pa.array([len(b)], pa.int64())})

    edges.map_batches(route, batch_format="pyarrow").materialize()
    ray.get([sh.seal.remote() for sh in shards])

    # node universe + out-degrees via the Dataset combiner, routed to
    # the co-partitioned owners the same way
    nodes = node_degrees(edges, src=src, dst=dst).materialize()

    def route_nodes(b: pa.Table) -> pa.Table:
        hs = ray.get(shards_ref)
        nd = b.column(NODE).to_numpy(zero_copy_only=False).astype(np.int64)
        od = b.column("outdeg").to_numpy(zero_copy_only=False).astype(np.int64)
        sh = _shard_of(nd, S)
        acks = []
        for j in range(S):
            m = sh == j
            if m.any():
                acks.append(hs[j].add_nodes.remote(nd[m], od[m]))
        ray.get(acks)
        return pa.table({"_n": pa.array([len(b)], pa.int64())})

    nodes.map_batches(route_nodes, batch_format="pyarrow").materialize()

    n = nodes.count()
    if n == 0:
        return rd.from_arrow(pa.table({NODE: pa.array([], pa.int64()),
                                       "outdeg": pa.array([], pa.int64()),
                                       "pr": pa.array([], pa.int64())}))
    base = ((d_den - d_num) * scale) // (d_den * n)
    r0 = scale // n
    ray.get([sh.init_rank.remote(r0) for sh in shards])

    for _ in range(iters):
        # S refs per shard; partial tables flow actor-to-actor
        if S == 1:
            outs = [[sh.contribs.remote()] for sh in shards]
        else:
            outs = [sh.contribs.options(num_returns=S).remote()
                    for sh in shards]
        acks = [
            shards[j].apply.remote(base, d_num, d_den,
                                   *[outs[i][j] for i in range(S)])
            for j in range(S)
        ]
        ray.get(acks)

    refs = [sh.rank_table.remote() for sh in shards]
    # materialize before killing the shards so the blocks no longer
    # depend on actor-task lineage for reconstruction
    out = rd.from_arrow_refs(refs).materialize()
    for sh in shards:
        ray.kill(sh)
    return out


def pinned_components(edges, *, src: str = "src", dst: str = "dst",
                      max_rounds: int = 200, n_shards: int | None = None):
    """Weakly-connected components over actor-pinned edge shards:
    (node, comp) with comp = component-minimum node id — bit-identical
    to stages/graph.py:connected_components (parity-tested).

    Relax-only min-label propagation (no pointer jump — a cross-shard
    jump would need a second exchange per round), so rounds are
    DIAMETER-bound, each costing only a per-shard node-partial exchange;
    convergence is the sum of per-shard changed-label counts (no label
    sums, no overflow concern).  Raises if ``max_rounds`` is exceeded."""
    import ray
    import ray.data as rd

    if n_shards is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = min(8, cpus)
    S = int(n_shards)
    GraphShard = _make_shard_cls()
    shards = [GraphShard.remote(i, S) for i in range(S)]
    shards_ref = ray.put(shards)

    def route(b: pa.Table) -> pa.Table:
        hs = ray.get(shards_ref)
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        # symmetrize at routing time: each undirected edge lands in both
        # endpoints' shards as an out-edge
        s2 = np.concatenate([s, d])
        d2 = np.concatenate([d, s])
        sh = _shard_of(s2, S)
        acks = []
        for j in range(S):
            m = sh == j
            if m.any():
                acks.append(hs[j].add_edges.remote(s2[m], d2[m]))
                # node universe = all sources of the symmetric edges
                acks.append(hs[j].add_nodes.remote(
                    s2[m], np.zeros(int(m.sum()), np.int64)))
        ray.get(acks)
        return pa.table({"_n": pa.array([len(b)], pa.int64())})

    edges.map_batches(route, batch_format="pyarrow").materialize()
    ray.get([sh.seal.remote() for sh in shards])
    ray.get([sh.init_comp.remote() for sh in shards])

    converged = False
    for _ in range(max_rounds):
        if S == 1:
            outs = [[sh.min_contribs.remote()] for sh in shards]
        else:
            outs = [sh.min_contribs.options(num_returns=S).remote()
                    for sh in shards]
        changed = ray.get([
            shards[j].apply_min.remote(*[outs[i][j] for i in range(S)])
            for j in range(S)
        ])
        if sum(changed) == 0:
            converged = True
            break
    if not converged:
        for sh in shards:
            ray.kill(sh)
        raise RuntimeError(
            f"pinned_components did not converge in {max_rounds} relax "
            "rounds (rounds are diameter-bound on this path)")
    refs = [sh.comp_table.remote() for sh in shards]
    out = rd.from_arrow_refs(refs).materialize()
    for sh in shards:
        ray.kill(sh)
    return out
