"""Pregel-style actor-sharded graph ops: edge shards PINNED in actors
(PageRank — classic/weighted/personalized — min-label connected
components, frontier-delta BFS, dead-delta k-core peeling, and
degree-oriented triangle counting).

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


def _agg_pairs(a: np.ndarray, b: np.ndarray, c: np.ndarray):
    """Sum c over identical (a, b) pairs — lexsort + reduceat, no pandas."""
    o = np.lexsort((b, a))
    a, b, c = a[o], b[o], c[o]
    new = np.ones(len(a), bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    idx = np.flatnonzero(new)
    return a[idx], b[idx], np.add.reduceat(c, idx)


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
            self._w_parts: list[np.ndarray] = []
            self._node_parts: list[np.ndarray] = []
            self._deg_parts: list[np.ndarray] = []
            self._ins_parts: list[np.ndarray] = []   # scc: in-edges
            self._ind_parts: list[np.ndarray] = []
            self.nodes = np.empty(0, dtype=np.int64)
            self.outdeg = np.empty(0, dtype=np.int64)
            self.pr = np.empty(0, dtype=np.int64)
            self.seed = None  # None = classic (every node a seed)
            self.w = None  # None = unweighted edges

        def add_edges(self, src: np.ndarray, dst: np.ndarray,
                      w: np.ndarray | None = None) -> int:
            self._src_parts.append(np.asarray(src, dtype=np.int64))
            self._dst_parts.append(np.asarray(dst, dtype=np.int64))
            if w is not None:
                self._w_parts.append(np.asarray(w, dtype=np.int64))
            return len(src)

        def seal(self) -> int:
            """Sort edges by src once so each round's rank gather is one
            searchsorted pass."""
            src = (np.concatenate(self._src_parts)
                   if self._src_parts else np.empty(0, np.int64))
            dst = (np.concatenate(self._dst_parts)
                   if self._dst_parts else np.empty(0, np.int64))
            if self._w_parts:
                w = np.concatenate(self._w_parts)
                if len(w) != len(src):
                    raise ValueError("weighted and unweighted add_edges mixed")
            else:
                w = None
            self._src_parts = self._dst_parts = self._w_parts = []
            order = np.argsort(src, kind="mergesort")
            self.src = src[order]
            self.dst = dst[order]
            self.w = w[order] if w is not None else None
            # pre-split destinations by owner shard (static across rounds)
            self.dst_shard = _shard_of(self.dst, self.n)
            return len(self.src)

        def add_nodes(self, nodes: np.ndarray, outdeg: np.ndarray) -> int:
            # ACCUMULATE (never replace): callers may deliver the node
            # table in several batches
            self._node_parts.append(np.asarray(nodes, np.int64))
            self._deg_parts.append(np.asarray(outdeg, np.int64))
            return len(nodes)

        def init_rank(self, r0: int,
                      seed_ids: np.ndarray | None = None) -> None:
            """``seed_ids`` (a SORTED global seed array — seed sets are
            small by the personalization contract, so every shard gets
            the whole array) turns the walk personalized: teleport mass
            lands only on seeds; None = classic PageRank."""
            nodes = (np.concatenate(self._node_parts)
                     if self._node_parts else np.empty(0, np.int64))
            outdeg = (np.concatenate(self._deg_parts)
                      if self._deg_parts else np.empty(0, np.int64))
            self._node_parts = self._deg_parts = []
            order = np.argsort(nodes, kind="mergesort")
            self.nodes = nodes[order]
            self.outdeg = outdeg[order]
            if seed_ids is None:
                self.seed = np.ones(len(self.nodes), dtype=np.int64)
            else:
                sid = np.asarray(seed_ids, dtype=np.int64)
                if len(sid) and len(self.nodes):
                    ix = np.minimum(np.searchsorted(sid, self.nodes),
                                    len(sid) - 1)
                    self.seed = (sid[ix] == self.nodes).astype(np.int64)
                else:
                    self.seed = np.zeros(len(self.nodes), dtype=np.int64)
            self.pr = self.seed * int(r0)

        def warm_ranks(self, nd: np.ndarray, pr: np.ndarray) -> int:
            """Override the start vector for the given LOCAL nodes (warm
            start; call after init_rank).  Unknown nodes are ignored;
            pure overwrite, so redelivery is harmless (idempotent)."""
            nd = np.asarray(nd, np.int64)
            prv = np.asarray(pr, np.int64)
            if len(self.nodes) == 0 or len(nd) == 0:
                return 0
            ix = np.minimum(np.searchsorted(self.nodes, nd),
                            len(self.nodes) - 1)
            hit = self.nodes[ix] == nd
            self.pr[ix[hit]] = prv[hit]
            return int(hit.sum())

        def contribs(self) -> list:
            """S per-destination-shard (node, sum) partial tables."""
            if len(self.src) == 0:
                empty = pa.table({NODE: pa.array([], pa.int64()),
                                  "_s": pa.array([], pa.int64())})
                return [empty] * self.n
            ix = np.searchsorted(self.nodes, self.src)
            if self.w is None:
                c = self.pr[ix] // self.outdeg[ix]  # outdeg >= 1 for srcs
            else:
                # outdeg holds the node's total OUT-WEIGHT here; exact
                # integer per-edge share, same recurrence as
                # graph.pagerank(weight_col=...)
                c = (self.pr[ix] * self.w) // self.outdeg[ix]
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
            self.pr = self.seed * int(base) + (int(d_num) * s) // int(d_den)
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

        # --- strongly connected components (FW-BW refinement) ----------
        def add_in_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
            """Edges whose DESTINATION this shard owns (the backward-
            propagation copy; out-edges go through add_edges)."""
            self._ins_parts.append(np.asarray(src, dtype=np.int64))
            self._ind_parts.append(np.asarray(dst, dtype=np.int64))
            return len(src)

        def seal_scc(self) -> int:
            """seal() handles the out-edges; this sorts the in-edge
            copy by dst and derives the per-edge source-owner shard."""
            isrc = (np.concatenate(self._ins_parts)
                    if self._ins_parts else np.empty(0, np.int64))
            idst = (np.concatenate(self._ind_parts)
                    if self._ind_parts else np.empty(0, np.int64))
            self._ins_parts = self._ind_parts = []
            order = np.argsort(idst, kind="mergesort")
            self.in_src = isrc[order]
            self.in_dst = idst[order]
            self.in_src_shard = _shard_of(self.in_src, self.n)
            nodes = (np.concatenate(self._node_parts)
                     if self._node_parts else np.empty(0, np.int64))
            self._node_parts = self._deg_parts = []
            self.nodes = np.unique(nodes)
            self.part = self.nodes.copy()
            self.f = self.nodes.copy()
            self.b = self.nodes.copy()
            return len(self.in_src)

        def start_scc_round(self, blob_ref) -> int:
            """Begin an outer refinement round: take the regrouped
            global (nodes, part, final) blob, overwrite the local part
            slice, reset f/b to self labels, and PERMANENTLY drop
            edges that are cross-block or touch a finalized SCC —
            parts only refine, so a cross-part pair can never rejoin
            and the edge set shrinks monotonically (the FW-BW peel).
            After this filter every surviving edge is same-block, so
            the per-pass exchange ships no part column and the apply
            needs no equality check.  Returns live out-edge count."""
            import ray as _ray

            ns_g, part_g, final_g = _ray.get(blob_ref) \
                if not isinstance(blob_ref, tuple) else blob_ref
            if len(self.nodes):
                self.part = part_g[np.searchsorted(ns_g, self.nodes)]
            self.f = self.nodes.copy()
            self.b = self.nodes.copy()

            def alive(s, d):
                ps = part_g[np.searchsorted(ns_g, s)]
                pdv = part_g[np.searchsorted(ns_g, d)]
                fin = (final_g[np.searchsorted(ns_g, s)]
                       | final_g[np.searchsorted(ns_g, d)])
                return (ps == pdv) & ~fin

            if len(self.src):
                keep = alive(self.src, self.dst)
                self.src = self.src[keep]
                self.dst = self.dst[keep]
                self.dst_shard = self.dst_shard[keep]
            if len(self.in_src):
                keep = alive(self.in_src, self.in_dst)
                self.in_src = self.in_src[keep]
                self.in_dst = self.in_dst[keep]
                self.in_src_shard = self.in_src_shard[keep]
            return len(self.src)

        def scc_contribs(self) -> list:
            """One fused pass: forward candidates (min f over in-
            neighbors, shipped to the dst owner from the out-edge
            copy) and backward candidates (min b over out-neighbors,
            shipped to the src owner from the in-edge copy), one
            table per target shard with a dir tag."""
            empty = pa.table({NODE: pa.array([], pa.int64()),
                              "dir": pa.array([], pa.int64()),
                              "lab": pa.array([], pa.int64())})
            out = []
            fl = (self.f[np.searchsorted(self.nodes, self.src)]
                  if len(self.src) else np.empty(0, np.int64))
            bl = (self.b[np.searchsorted(self.nodes, self.in_dst)]
                  if len(self.in_src) else np.empty(0, np.int64))
            for j in range(self.n):
                parts = []
                if len(self.src):
                    m = self.dst_shard == j
                    if m.any():
                        u, inv = np.unique(self.dst[m],
                                           return_inverse=True)
                        mn = np.full(len(u), np.iinfo(np.int64).max,
                                     dtype=np.int64)
                        np.minimum.at(mn, inv, fl[m])
                        parts.append(pa.table({
                            NODE: pa.array(u),
                            "dir": pa.array(np.zeros(len(u), np.int64)),
                            "lab": pa.array(mn)}))
                if len(self.in_src):
                    m = self.in_src_shard == j
                    if m.any():
                        u, inv = np.unique(self.in_src[m],
                                           return_inverse=True)
                        mn = np.full(len(u), np.iinfo(np.int64).max,
                                     dtype=np.int64)
                        np.minimum.at(mn, inv, bl[m])
                        parts.append(pa.table({
                            NODE: pa.array(u),
                            "dir": pa.array(np.ones(len(u), np.int64)),
                            "lab": pa.array(mn)}))
                out.append(pa.concat_tables(parts) if parts else empty)
            return out

        def scc_apply(self, *incoming) -> int:
            """Min-apply the fused candidates into f (dir 0) and b
            (dir 1); returns the changed-label count."""
            flat = []
            for t in incoming:
                flat.extend(t) if isinstance(t, list) else flat.append(t)
            nf = self.f.copy()
            nb = self.b.copy()
            for t in flat:
                nd = t.column(NODE).to_numpy(zero_copy_only=False)
                if len(nd) == 0:
                    continue
                dirs = t.column("dir").to_numpy(zero_copy_only=False)
                lab = t.column("lab").to_numpy(zero_copy_only=False)
                ix = np.searchsorted(self.nodes, nd)
                m0 = dirs == 0
                if m0.any():
                    np.minimum.at(nf, ix[m0], lab[m0])
                if (~m0).any():
                    np.minimum.at(nb, ix[~m0], lab[~m0])
            changed = int((nf != self.f).sum() + (nb != self.b).sum())
            self.f, self.b = nf, nb
            return changed

        def scc_state(self) -> pa.Table:
            return pa.table({NODE: pa.array(self.nodes),
                             "f": pa.array(self.f),
                             "b": pa.array(self.b)})

        # --- degree-oriented triangle counting -------------------------
        def prep_tri(self, blob_ref) -> int:
            """Edges here are ORIENTED (lo -> hi, routed by shard(lo)).
            ``blob_ref``: (sorted global nodes, degrees) — node-bounded,
            shipped once.  Sorts local edges into wedge order
            (lo, deg[hi], hi), precomputes run ends and the packed
            dense-rank key set for closure membership."""
            import ray as _ray

            nodes_g, deg_g = _ray.get(blob_ref) \
                if not isinstance(blob_ref, tuple) else blob_ref
            self._tri_nodes = nodes_g
            self._tri_n = np.int64(len(nodes_g))
            dhi = deg_g[np.searchsorted(nodes_g, self.dst)]
            order = np.lexsort((self.dst, dhi, self.src))
            self._tlo = self.src[order]
            self._thi = self.dst[order]
            self._tdhi = dhi[order]
            self._trun_end = np.searchsorted(self._tlo, self._tlo,
                                             side="right")
            rlo = np.searchsorted(nodes_g, self._tlo)
            rhi = np.searchsorted(nodes_g, self._thi)
            self._tkeys = np.sort(rlo * self._tri_n + rhi)
            return len(self._tlo)

        def tri_wedges(self) -> list:
            """Enumerate wedges at local lo vertices; ship (h1, h2)
            candidate closing edges to shard(h1) as S tables.  Volume
            is arboricity-bounded by the (deg, id) orientation —
            identical to the Dataset path's streamed wedges."""
            empty = pa.table({"a": pa.array([], pa.int64()),
                              "b": pa.array([], pa.int64())})
            m = len(self._tlo)
            if m == 0:
                return [empty] * self.n
            g = np.arange(m, dtype=np.int64)
            cnt = self._trun_end - g - 1
            sel = cnt > 0
            g2, c2 = g[sel], cnt[sel]
            total = int(c2.sum())
            if total == 0:
                return [empty] * self.n
            offs = np.concatenate([[0], np.cumsum(c2)[:-1]])
            pos = (np.arange(total) - np.repeat(offs, c2)
                   + np.repeat(g2 + 1, c2))
            h1 = self._thi[np.repeat(g2, c2)]
            h2 = self._thi[pos]
            sh = _shard_of(h1, self.n)
            out = []
            for j in range(self.n):
                mm = sh == j
                out.append(pa.table({"a": pa.array(h1[mm]),
                                     "b": pa.array(h2[mm])}))
            return out

        def tri_count(self, *incoming) -> int:
            """Count incoming wedges whose closing edge (a -> b) exists
            in this shard's oriented set (dense-rank packed keys)."""
            flat = []
            for t in incoming:
                flat.extend(t) if isinstance(t, list) else flat.append(t)
            total = 0
            for t in flat:
                a = t.column("a").to_numpy(zero_copy_only=False)
                if len(a) == 0:
                    continue
                b = t.column("b").to_numpy(zero_copy_only=False)
                ra = np.searchsorted(self._tri_nodes, a)
                rb = np.searchsorted(self._tri_nodes, b)
                key = ra * self._tri_n + rb
                if len(self._tkeys):
                    ix = np.minimum(np.searchsorted(self._tkeys, key),
                                    len(self._tkeys) - 1)
                    total += int((self._tkeys[ix] == key).sum())
            return total

        # --- k-truss (support exchange + local peel) --------------------
        def prep_ktruss(self, blob_ref) -> int:
            """Reuses prep_tri's oriented wedge-order layout, then adds
            the alive mask, per-edge support, and a key→edge-index
            lookup (packed dense ranks, the tri scheme — ranks < 2^32
            by the documented pair-key constraint)."""
            self.prep_tri(blob_ref)
            m = len(self._tlo)
            rlo = np.searchsorted(self._tri_nodes, self._tlo)
            rhi = np.searchsorted(self._tri_nodes, self._thi)
            keys = rlo * self._tri_n + rhi
            self._ktarg = np.argsort(keys, kind="mergesort")
            self._ktkeys = keys[self._ktarg]
            self._alive = np.ones(m, dtype=bool)
            self._supp = np.zeros(m, dtype=np.int64)
            self._supp_last = np.empty(0, dtype=np.int64)
            return m

        def _kt_lookup(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
            """Local edge index of oriented (a -> b); -1 if absent."""
            if len(self._ktkeys) == 0 or len(a) == 0:
                return np.full(len(a), -1, dtype=np.int64)
            ra = np.searchsorted(self._tri_nodes, a)
            rb = np.searchsorted(self._tri_nodes, b)
            key = ra * self._tri_n + rb
            pos = np.minimum(np.searchsorted(self._ktkeys, key),
                             len(self._ktkeys) - 1)
            ix = self._ktarg[pos]
            return np.where(self._ktkeys[pos] == key, ix, np.int64(-1))

        def kt_wedges(self) -> list:
            """tri_wedges over the ALIVE edges only, carrying the wedge
            center so closures can route confirmations home: S tables
            (l, a, b) to shard(a)."""
            empty = pa.table({"l": pa.array([], pa.int64()),
                              "a": pa.array([], pa.int64()),
                              "b": pa.array([], pa.int64())})
            lo = self._tlo[self._alive]
            hi = self._thi[self._alive]
            m = len(lo)
            if m == 0:
                return [empty] * self.n
            run_end = np.searchsorted(lo, lo, side="right")
            g = np.arange(m, dtype=np.int64)
            cnt = run_end - g - 1
            sel = cnt > 0
            g2, c2 = g[sel], cnt[sel]
            total = int(c2.sum())
            if total == 0:
                return [empty] * self.n
            offs = np.concatenate([[0], np.cumsum(c2)[:-1]])
            pos = (np.arange(total) - np.repeat(offs, c2)
                   + np.repeat(g2 + 1, c2))
            ctr = lo[np.repeat(g2, c2)]
            h1 = hi[np.repeat(g2, c2)]
            h2 = hi[pos]
            sh = _shard_of(h1, self.n)
            out = []
            for j in range(self.n):
                mm = sh == j
                out.append(pa.table({"l": pa.array(ctr[mm]),
                                     "a": pa.array(h1[mm]),
                                     "b": pa.array(h2[mm])}))
            return out

        def kt_close(self, *incoming) -> list:
            """Check incoming wedges against the local ALIVE closing
            edges; add support to each closed (a -> b) here, route the
            closed (l, a, b) rows back to shard(l) so the two wedge
            edges get their +1 there."""
            empty = pa.table({"l": pa.array([], pa.int64()),
                              "a": pa.array([], pa.int64()),
                              "b": pa.array([], pa.int64())})
            flat = []
            for t in incoming:
                flat.extend(t) if isinstance(t, list) else flat.append(t)
            ls, as_, bs = [], [], []
            for t in flat:
                if t.num_rows == 0:
                    continue
                a = t.column("a").to_numpy(zero_copy_only=False)
                b = t.column("b").to_numpy(zero_copy_only=False)
                ix = self._kt_lookup(a, b)
                ok = (ix >= 0) & self._alive[np.maximum(ix, 0)]
                if not ok.any():
                    continue
                np.add.at(self._supp, ix[ok], 1)
                ls.append(t.column("l").to_numpy(zero_copy_only=False)[ok])
                as_.append(a[ok])
                bs.append(b[ok])
            if not ls:
                return [empty] * self.n
            l = np.concatenate(ls)
            a = np.concatenate(as_)
            b = np.concatenate(bs)
            sh = _shard_of(l, self.n)
            out = []
            for j in range(self.n):
                mm = sh == j
                out.append(pa.table({"l": pa.array(l[mm]),
                                     "a": pa.array(a[mm]),
                                     "b": pa.array(b[mm])}))
            return out

        def kt_confirm(self, *incoming) -> int:
            """Apply +1 support to the two local wedge edges (l -> a)
            and (l -> b) of each confirmed triangle."""
            flat = []
            for t in incoming:
                flat.extend(t) if isinstance(t, list) else flat.append(t)
            n = 0
            for t in flat:
                if t.num_rows == 0:
                    continue
                l = t.column("l").to_numpy(zero_copy_only=False)
                a = t.column("a").to_numpy(zero_copy_only=False)
                b = t.column("b").to_numpy(zero_copy_only=False)
                ixa = self._kt_lookup(l, a)
                ixb = self._kt_lookup(l, b)
                # wedge edges were alive when enumerated this round; the
                # mask guards np.add.at's negative-index wraparound
                ok = (ixa >= 0) & (ixb >= 0)
                np.add.at(self._supp, ixa[ok], 1)
                np.add.at(self._supp, ixb[ok], 1)
                n += int(ok.sum())
            return n

        def kt_peel(self, k: int) -> int:
            """Drop alive edges with support < k-2; reset supports for
            the next round; return how many edges DROPPED."""
            drop = self._alive & (self._supp < k - 2)
            self._alive &= ~drop
            self._supp_last = self._supp[self._alive].copy()
            self._supp = np.zeros(len(self._tlo), dtype=np.int64)
            return int(drop.sum())

        def kt_result(self) -> pa.Table:
            """Canonical (u, v, support) for the surviving edges with
            the LAST executed round's support (graph.ktruss contract)."""
            lo = self._tlo[self._alive]
            hi = self._thi[self._alive]
            u = np.minimum(lo, hi)
            v = np.maximum(lo, hi)
            return pa.table({
                "u": pa.array(u.astype(np.int64)),
                "v": pa.array(v.astype(np.int64)),
                "support": pa.array(self._supp_last.astype(np.int64)),
            })

        # --- common neighbors (pair-partial exchange) -------------------
        def cn_pairs(self, max_degree: int) -> list:
            """Edges here are SYMMETRIC adjacency rows (z, nb) routed by
            shard(z), so every center's full neighbor list — and its
            degree — is LOCAL.  Enumerate unordered neighbor pairs at
            centers with deg <= max_degree (the hub guard, identical to
            graph.common_neighbors), pre-aggregate locally (combiner),
            route partials to shard(pair.u) as S tables."""
            empty = pa.table({"u": pa.array([], pa.int64()),
                              "v": pa.array([], pa.int64()),
                              "c": pa.array([], pa.int64())})
            m = len(self.src)
            if m == 0:
                return [empty] * self.n
            order = np.lexsort((self.dst, self.src))
            z = self.src[order]
            nb = self.dst[order]
            run_end = np.searchsorted(z, z, side="right")
            deg = run_end - np.searchsorted(z, z, side="left")
            g = np.arange(m, dtype=np.int64)
            cnt = run_end - g - 1
            sel = (cnt > 0) & (deg <= max_degree)
            g2, c2 = g[sel], cnt[sel]
            total = int(c2.sum())
            if total == 0:
                return [empty] * self.n
            offs = np.concatenate([[0], np.cumsum(c2)[:-1]])
            pos = (np.arange(total) - np.repeat(offs, c2)
                   + np.repeat(g2 + 1, c2))
            a = nb[np.repeat(g2, c2)]   # nb ascending within a run -> a < b
            b = nb[pos]
            a, b, c = _agg_pairs(a, b, np.ones(total, dtype=np.int64))
            sh = _shard_of(a, self.n)
            out = []
            for j in range(self.n):
                mm = sh == j
                out.append(pa.table({"u": pa.array(a[mm]),
                                     "v": pa.array(b[mm]),
                                     "c": pa.array(c[mm])}))
            return out

        def cn_count(self, min_common: int, *incoming) -> pa.Table:
            """Sum this shard's incoming pair partials, filter to
            >= min_common — one reduce, output stays sharded."""
            flat = []
            for t in incoming:
                flat.extend(t) if isinstance(t, list) else flat.append(t)
            aas, bbs, ccs = [], [], []
            for t in flat:
                if t.num_rows:
                    aas.append(t.column("u").to_numpy(zero_copy_only=False))
                    bbs.append(t.column("v").to_numpy(zero_copy_only=False))
                    ccs.append(t.column("c").to_numpy(zero_copy_only=False))
            if not aas:
                return pa.table({"u": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64()),
                                 "n_common": pa.array([], pa.int64())})
            a, b, c = _agg_pairs(np.concatenate(aas), np.concatenate(bbs),
                                 np.concatenate(ccs).astype(np.int64))
            keep = c >= min_common
            return pa.table({"u": pa.array(a[keep]),
                             "v": pa.array(b[keep]),
                             "n_common": pa.array(c[keep])})

        # --- multi-source BFS (frontier-delta exchange) ----------------
        def init_bfs(self, seed_ids: np.ndarray) -> int:
            """Local seeds = the global seed set restricted to this
            shard's hash range; dist 0.  (Seed sets ship whole — they
            are small by the BFS contract, like pagerank seeds.)"""
            sid = np.unique(np.asarray(seed_ids, dtype=np.int64))
            mine = sid[_shard_of(sid, self.n) == self.shard_id]
            self.known = mine
            self.kdist = np.zeros(len(mine), dtype=np.int64)
            self.frontier = mine
            self.fdist = np.zeros(len(mine), dtype=np.int64)
            return len(mine)

        def bfs_contribs(self) -> list:
            """Relax ONLY the local frontier's out-edges (unit hops make
            distances final at first reach, so the settled interior
            never re-relaxes); S per-dst-shard (node, dist) partials."""
            empty = pa.table({NODE: pa.array([], pa.int64()),
                              "dist": pa.array([], pa.int64())})
            if len(self.frontier) == 0 or len(self.src) == 0:
                return [empty] * self.n
            ix = np.minimum(np.searchsorted(self.frontier, self.src),
                            len(self.frontier) - 1)
            m = self.frontier[ix] == self.src
            if not m.any():
                return [empty] * self.n
            d = self.dst[m]
            nd = self.fdist[ix[m]] + 1
            sh = self.dst_shard[m]
            out = []
            for j in range(self.n):
                mm = sh == j
                u, inv = np.unique(d[mm], return_inverse=True)
                mn = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(mn, inv, nd[mm])
                out.append(pa.table({NODE: pa.array(u),
                                     "dist": pa.array(mn)}))
            return out

        def bfs_apply(self, *incoming) -> int:
            """Merge incoming minima; UNSEEN nodes become the next
            frontier (their first-reach distance is final).  Returns the
            new frontier size (the distributed convergence scalar)."""
            flat = []
            for t in incoming:
                flat.extend(t) if isinstance(t, list) else flat.append(t)
            nodes, dists = [], []
            for t in flat:
                nd = t.column(NODE).to_numpy(zero_copy_only=False)
                if len(nd):
                    nodes.append(nd)
                    dists.append(t.column("dist").to_numpy(
                        zero_copy_only=False))
            if not nodes:
                self.frontier = np.empty(0, np.int64)
                self.fdist = np.empty(0, np.int64)
                return 0
            cand = np.concatenate(nodes)
            cd = np.concatenate(dists).astype(np.int64)
            u, inv = np.unique(cand, return_inverse=True)
            mn = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(mn, inv, cd)
            if len(self.known):
                ik = np.minimum(np.searchsorted(self.known, u),
                                len(self.known) - 1)
                fresh = self.known[ik] != u
            else:
                fresh = np.ones(len(u), dtype=bool)
            self.frontier = u[fresh]
            self.fdist = mn[fresh]
            merged = np.concatenate([self.known, self.frontier])
            md = np.concatenate([self.kdist, self.fdist])
            o = np.argsort(merged, kind="mergesort")
            self.known, self.kdist = merged[o], md[o]
            return len(self.frontier)

        def bfs_table(self) -> pa.Table:
            return pa.table({NODE: pa.array(self.known),
                             "dist": pa.array(self.kdist)})

        # --- weighted shortest paths (bounded Bellman-Ford) -----------
        def init_sssp(self, seed_ids: np.ndarray) -> int:
            """Same shard-restricted seed state as init_bfs; the delta
            set starts as the seeds."""
            return self.init_bfs(seed_ids)

        def sssp_contribs(self) -> list:
            """Relax only edges whose source IMPROVED last round — the
            CHANGED-DELTA rule (weighted distances are NOT final at
            first reach, so the BFS frontier rule would be wrong);
            candidates are dist(src) + w per edge, min-grouped per
            destination shard."""
            empty = pa.table({NODE: pa.array([], pa.int64()),
                              "dist": pa.array([], pa.int64())})
            if (len(self.frontier) == 0 or len(self.src) == 0
                    or self.w is None):
                return [empty] * self.n
            ix = np.minimum(np.searchsorted(self.frontier, self.src),
                            len(self.frontier) - 1)
            m = self.frontier[ix] == self.src
            if not m.any():
                return [empty] * self.n
            d = self.dst[m]
            nd = self.fdist[ix[m]] + self.w[m]
            sh = self.dst_shard[m]
            out = []
            for j in range(self.n):
                mm = sh == j
                u, inv = np.unique(d[mm], return_inverse=True)
                mn = np.full(len(u), np.iinfo(np.int64).max,
                             dtype=np.int64)
                np.minimum.at(mn, inv, nd[mm])
                out.append(pa.table({NODE: pa.array(u),
                                     "dist": pa.array(mn)}))
            return out

        def sssp_apply(self, *incoming) -> int:
            """Relax incoming minima against the local (node, dist)
            state; the next delta set = fresh nodes plus strictly
            improved knowns.  Returns |delta| (convergence scalar)."""
            flat = []
            for t in incoming:
                flat.extend(t) if isinstance(t, list) else flat.append(t)
            nodes, dists = [], []
            for t in flat:
                nd = t.column(NODE).to_numpy(zero_copy_only=False)
                if len(nd):
                    nodes.append(nd)
                    dists.append(t.column("dist").to_numpy(
                        zero_copy_only=False))
            if not nodes:
                self.frontier = np.empty(0, np.int64)
                self.fdist = np.empty(0, np.int64)
                return 0
            cand = np.concatenate(nodes)
            cd = np.concatenate(dists).astype(np.int64)
            u, inv = np.unique(cand, return_inverse=True)
            mn = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(mn, inv, cd)
            if len(self.known):
                ik = np.minimum(np.searchsorted(self.known, u),
                                len(self.known) - 1)
                exists = self.known[ik] == u
                better = exists & (mn < self.kdist[ik])
                self.kdist[ik[better]] = mn[better]
                fresh = ~exists
            else:
                better = np.zeros(len(u), dtype=bool)
                fresh = np.ones(len(u), dtype=bool)
            merged = np.concatenate([self.known, u[fresh]])
            md = np.concatenate([self.kdist, mn[fresh]])
            o = np.argsort(merged, kind="mergesort")
            self.known, self.kdist = merged[o], md[o]
            ch = np.concatenate([u[better], u[fresh]])
            chd = np.concatenate([mn[better], mn[fresh]])
            co = np.argsort(ch, kind="mergesort")
            self.frontier, self.fdist = ch[co], chd[co]
            return len(self.frontier)

        # --- synchronous k-core peeling (dead-delta exchange) ----------
        def init_alive(self) -> None:
            """Node universe = unique local edge sources (the symmetric
            routing delivers every endpoint as a source)."""
            nodes = (np.concatenate(self._node_parts)
                     if self._node_parts else np.empty(0, np.int64))
            self._node_parts = self._deg_parts = []
            self.nodes = np.unique(nodes)
            self.alive = np.ones(len(self.nodes), dtype=bool)
            self.deg = np.zeros(len(self.nodes), dtype=np.int64)
            self.edge_ok = np.ones(len(self.src), dtype=bool)

        def peel(self, k: int, *dead_in) -> np.ndarray:
            """One SYNCHRONOUS peel round: apply last round's deaths
            (mask dst-dead edges), recompute each alive node's degree
            among alive neighbors, kill deg < k, return the newly-dead
            ids (next round's delta).  Exactly graph.kcore's per-round
            semantics — parity-tested."""
            dead = [np.asarray(d, dtype=np.int64) for d in dead_in
                    if d is not None and len(d)]
            if dead:
                dd = np.sort(np.concatenate(dead))
                if len(self.dst) and self.edge_ok.any():
                    ix = np.minimum(np.searchsorted(dd, self.dst),
                                    len(dd) - 1)
                    self.edge_ok &= dd[ix] != self.dst
            if len(self.nodes) == 0:
                return np.empty(0, dtype=np.int64)
            m = self.edge_ok
            if len(self.src):
                m = m & self.alive[np.searchsorted(self.nodes, self.src)]
            deg = np.zeros(len(self.nodes), dtype=np.int64)
            if m.any():
                u, c = np.unique(self.src[m], return_counts=True)
                deg[np.searchsorted(self.nodes, u)] = c
            newly = self.nodes[self.alive & (deg < k)]
            self.alive &= deg >= k
            self.deg = deg
            return newly

        def core_table(self) -> pa.Table:
            return pa.table({NODE: pa.array(self.nodes[self.alive]),
                             "deg": pa.array(self.deg[self.alive])})

        # --- label propagation (community detection) -------------------
        def dedup_edges(self) -> int:
            """Distinct (src, dst) pairs within the shard — GLOBAL dedup,
            since every edge of one src lives on one shard.  Call after
            ``seal``; recomputes the dst-shard split.  LPA needs this:
            duplicate edges would double a neighbor's vote."""
            if len(self.src):
                o = np.lexsort((self.dst, self.src))
                s, d = self.src[o], self.dst[o]
                keep = np.ones(len(s), dtype=bool)
                keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
                self.src, self.dst = s[keep], d[keep]
                self.w = None
                self.dst_shard = _shard_of(self.dst, self.n)
            return len(self.src)

        def init_lab(self) -> None:
            nodes = (np.concatenate(self._node_parts)
                     if self._node_parts else np.empty(0, np.int64))
            self._node_parts = self._deg_parts = []
            self.nodes = np.unique(nodes)
            self.lab = self.nodes.copy()

        def lab_contribs(self) -> list:
            """S per-destination-shard (node, lab, count) vote partials:
            each local edge's SRC label votes for its DST."""
            empty = pa.table({NODE: pa.array([], pa.int64()),
                              "lab": pa.array([], pa.int64()),
                              "_c": pa.array([], pa.int64())})
            if len(self.src) == 0:
                return [empty] * self.n
            lv = self.lab[np.searchsorted(self.nodes, self.src)]
            out = []
            for j in range(self.n):
                m = self.dst_shard == j
                d, l = self.dst[m], lv[m]
                if len(d) == 0:
                    out.append(empty)
                    continue
                o = np.lexsort((l, d))
                d, l = d[o], l[o]
                new = np.ones(len(d), dtype=bool)
                new[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
                starts = np.flatnonzero(new)
                cnt = np.diff(np.append(starts, len(d)))
                out.append(pa.table({NODE: pa.array(d[starts]),
                                     "lab": pa.array(l[starts]),
                                     "_c": pa.array(cnt.astype(np.int64))}))
            return out

        def lab_apply(self, *incoming) -> int:
            """Merge incoming vote partials, per-node argmax (count
            desc, label asc) — returns how many labels changed."""
            flat = []
            for t in incoming:
                flat.extend(t) if isinstance(t, list) else flat.append(t)
            nds, lbs, ccs = [], [], []
            for t in flat:
                if len(t) == 0:
                    continue
                nds.append(t.column(NODE).to_numpy(zero_copy_only=False))
                lbs.append(t.column("lab").to_numpy(zero_copy_only=False))
                ccs.append(t.column("_c").to_numpy(zero_copy_only=False))
            if not nds:
                return 0
            nd = np.concatenate(nds)
            lb = np.concatenate(lbs)
            cc = np.concatenate(ccs).astype(np.int64)
            o = np.lexsort((lb, nd))
            nd, lb, cc = nd[o], lb[o], cc[o]
            new_run = np.ones(len(nd), dtype=bool)
            new_run[1:] = (nd[1:] != nd[:-1]) | (lb[1:] != lb[:-1])
            starts = np.flatnonzero(new_run)
            csum = np.add.reduceat(cc, starts)
            nd, lb = nd[starts], lb[starts]
            o2 = np.lexsort((lb, -csum, nd))
            nd, lb = nd[o2], lb[o2]
            first = np.ones(len(nd), dtype=bool)
            first[1:] = nd[1:] != nd[:-1]
            new = self.lab.copy()
            ix = np.searchsorted(self.nodes, nd[first])
            new[ix] = lb[first]
            changed = int((new != self.lab).sum())
            self.lab = new
            return changed

        def lab_table(self) -> pa.Table:
            return pa.table({NODE: pa.array(self.nodes),
                             "lab": pa.array(self.lab)})

    return GraphShard


def pinned_pagerank(edges, *, src: str = "src", dst: str = "dst",
                    iters: int = 4, scale: int = 10 ** 12,
                    d_num: int = 85, d_den: int = 100,
                    n_shards: int | None = None,
                    weight_col: str | None = None, seeds=None,
                    warm_state=None):
    """PageRank over actor-pinned edge shards (see module docstring).

    Same result as ``graph.pagerank`` bit for bit — including the
    WEIGHTED (``weight_col``: positive int edge weights, outdeg = total
    out-weight, per-edge share ``(pr*w)//W``) and PERSONALIZED
    (``seeds``: Dataset of teleport nodes; seed sets are small by
    contract, shipped whole to every shard) variants; per-round data
    movement excludes the edge table entirely.  Returns a Dataset built
    from the shard rank tables WITHOUT driver materialization
    (``ray.data.from_arrow_refs``).

    ``warm_state`` (Dataset of (node, pr), e.g. a prior run's output)
    overrides the start vector exactly like ``graph.pagerank``'s
    parameter: rows route to their owner shards in one map pass
    (overwrite semantics — idempotent, so normal retries are safe) —
    the pinned counterpart of ``incremental_pagerank``'s warm rounds."""
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
    try:
        # distributed ingestion: map tasks route each batch's edges to
        # their shard owners (acked inside the task — no driver-side
        # batch loop).  Routing MUTATES actor state, so the routing
        # stages run with max_retries=0: a retried task would re-deliver
        # its batch and silently duplicate edges/nodes — fail loudly
        # instead (the caller reruns the whole build, which is cheap
        # relative to corrupt ranks).
        shards_ref = ray.put(shards)

        def route(b: pa.Table) -> pa.Table:
            hs = ray.get(shards_ref)
            s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
            d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
            w = None if weight_col is None else b.column(
                weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
            sh = _shard_of(s, S)
            acks = []
            for j in range(S):
                m = sh == j
                if m.any():
                    acks.append(hs[j].add_edges.remote(
                        s[m], d[m], None if w is None else w[m]))
            ray.get(acks)
            return pa.table({"_n": pa.array([len(b)], pa.int64())})

        edges.map_batches(
            route, batch_format="pyarrow",
            max_retries=0, retry_exceptions=False,
        ).materialize()
        ray.get([sh.seal.remote() for sh in shards])

        # node universe + out-degrees (out-WEIGHTS when weighted) via the
        # Dataset combiner, routed to the co-partitioned owners
        nodes = node_degrees(edges, src=src, dst=dst,
                             weight_col=weight_col).materialize()

        def route_nodes(b: pa.Table) -> pa.Table:
            hs = ray.get(shards_ref)
            nd = b.column(NODE).to_numpy(zero_copy_only=False).astype(np.int64)
            od = b.column("outdeg").to_numpy(
                zero_copy_only=False).astype(np.int64)
            sh = _shard_of(nd, S)
            acks = []
            for j in range(S):
                m = sh == j
                if m.any():
                    acks.append(hs[j].add_nodes.remote(nd[m], od[m]))
            ray.get(acks)
            return pa.table({"_n": pa.array([len(b)], pa.int64())})

        nodes.map_batches(
            route_nodes, batch_format="pyarrow",
            max_retries=0, retry_exceptions=False,
        ).materialize()

        n = nodes.count()
        if n == 0:
            return rd.from_arrow(pa.table({NODE: pa.array([], pa.int64()),
                                           "outdeg": pa.array([], pa.int64()),
                                           "pr": pa.array([], pa.int64())}))
        seed_ids = None
        if seeds is not None:
            seed_ids = np.sort(np.unique(
                seeds.to_pandas()[NODE].to_numpy().astype(np.int64)))
            if len(seed_ids) == 0:
                raise ValueError("personalized pagerank needs >= 1 seed")
        s_count = n if seed_ids is None else int(len(seed_ids))
        base = ((d_den - d_num) * scale) // (d_den * s_count)
        r0 = scale // s_count
        ray.get([sh.init_rank.remote(r0, seed_ids) for sh in shards])
        if warm_state is not None:

            def route_warm(b: pa.Table) -> pa.Table:
                hs = ray.get(shards_ref)
                nd = b.column(NODE).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                pr = b.column("pr").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                sh = _shard_of(nd, S)
                acks = []
                for j in range(S):
                    m = sh == j
                    if m.any():
                        acks.append(hs[j].warm_ranks.remote(nd[m], pr[m]))
                ray.get(acks)
                return pa.table({"_n": pa.array([len(b)], pa.int64())})

            warm_state.map_batches(
                route_warm, batch_format="pyarrow").materialize()

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
        return rd.from_arrow_refs(refs).materialize()
    finally:
        # covers the n == 0 early return AND any raise between actor
        # creation and here — shard memory never outlives the call
        for sh in shards:
            ray.kill(sh)


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
    try:
        shards_ref = ray.put(shards)

        def route(b: pa.Table) -> pa.Table:
            hs = ray.get(shards_ref)
            s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
            d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
            # symmetrize at routing time: each undirected edge lands in
            # both endpoints' shards as an out-edge
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

        # max_retries=0: routing mutates actor state; a retried task
        # would duplicate edges/nodes (see pinned_pagerank)
        edges.map_batches(
            route, batch_format="pyarrow",
            max_retries=0, retry_exceptions=False,
        ).materialize()
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
            raise RuntimeError(
                f"pinned_components did not converge in {max_rounds} relax "
                "rounds (rounds are diameter-bound on this path)")
        refs = [sh.comp_table.remote() for sh in shards]
        return rd.from_arrow_refs(refs).materialize()
    finally:
        for sh in shards:
            ray.kill(sh)


def pinned_kcore(edges, *, k: int, rounds: int, src: str = "src",
                 dst: str = "dst", n_shards: int | None = None):
    """Synchronous k-core peeling over actor-pinned edge shards — same
    per-round semantics (and parity-tested results) as ``graph.kcore``,
    with the edge table shipped ONCE.

    Exchange shape: each round every shard returns only its NEWLY-DEAD
    node ids; the driver forwards the S delta refs to every shard for
    the next round (object-store peer-to-peer).  Total exchanged volume
    across ALL rounds is bounded by the number of nodes ever peeled —
    the shrinking-frontier property that makes deep peeling sequences
    cheap, where the Dataset path pays two semi joins per round."""
    import ray
    import ray.data as rd

    from .graph import distinct_tuples

    if rounds < 1:
        raise ValueError("pinned_kcore needs rounds >= 1")
    if n_shards is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = min(8, cpus)
    S = int(n_shards)

    # identical pre-pass to graph.kcore: symmetric DISTINCT neighbor
    # pairs so degree counts each neighbor once
    def symm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"u": pa.array(np.concatenate([s, d])),
                         "v": pa.array(np.concatenate([d, s]))})

    e = distinct_tuples(edges.map_batches(symm, batch_format="pyarrow"),
                        ["u", "v"]).materialize()

    GraphShard = _make_shard_cls()
    shards = [GraphShard.remote(i, S) for i in range(S)]
    try:
        shards_ref = ray.put(shards)

        def route(b: pa.Table) -> pa.Table:
            hs = ray.get(shards_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            sh = _shard_of(u, S)
            acks = []
            for j in range(S):
                m = sh == j
                if m.any():
                    acks.append(hs[j].add_edges.remote(u[m], v[m]))
                    acks.append(hs[j].add_nodes.remote(
                        u[m], np.zeros(int(m.sum()), np.int64)))
            ray.get(acks)
            return pa.table({"_n": pa.array([len(b)], pa.int64())})

        # max_retries=0: routing mutates actor state (see pinned_pagerank)
        e.map_batches(route, batch_format="pyarrow",
                      max_retries=0, retry_exceptions=False).materialize()
        ray.get([sh.seal.remote() for sh in shards])
        ray.get([sh.init_alive.remote() for sh in shards])

        deltas: list = []
        for _ in range(rounds):
            deltas = [sh.peel.remote(k, *deltas) for sh in shards]
        ray.get(deltas)  # barrier so core_table sees the final round
        refs = [sh.core_table.remote() for sh in shards]
        return rd.from_arrow_refs(refs).materialize()
    finally:
        for sh in shards:
            ray.kill(sh)


def pinned_bfs(edges, seeds, *, src: str = "src", dst: str = "dst",
               max_hops: int = 3, n_shards: int | None = None):
    """Multi-source bounded-hop BFS over actor-pinned edge shards —
    same results as ``graph.bfs_hops`` (parity-tested), edges shipped
    once.  Pure FRONTIER-DELTA exchange: each round ships only the
    newly-settled (node, dist) rows actor-to-actor, so total exchanged
    volume across the whole walk is bounded by the reachable set, and
    the loop exits early when every shard's frontier empties."""
    import ray
    import ray.data as rd

    if n_shards is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = min(8, cpus)
    S = int(n_shards)
    GraphShard = _make_shard_cls()
    shards = [GraphShard.remote(i, S) for i in range(S)]
    try:
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

        # max_retries=0: routing mutates actor state (see pinned_pagerank)
        edges.map_batches(route, batch_format="pyarrow",
                          max_retries=0, retry_exceptions=False).materialize()
        ray.get([sh.seal.remote() for sh in shards])

        seed_ids = np.sort(np.unique(
            seeds.to_pandas()[NODE].to_numpy().astype(np.int64)))
        ray.get([sh.init_bfs.remote(seed_ids) for sh in shards])

        for _ in range(max_hops):
            if S == 1:
                outs = [[sh.bfs_contribs.remote()] for sh in shards]
            else:
                outs = [sh.bfs_contribs.options(num_returns=S).remote()
                        for sh in shards]
            sizes = ray.get([
                shards[j].bfs_apply.remote(*[outs[i][j] for i in range(S)])
                for j in range(S)
            ])
            if sum(sizes) == 0:
                break  # all frontiers empty — distances are final
        refs = [sh.bfs_table.remote() for sh in shards]
        return rd.from_arrow_refs(refs).materialize()
    finally:
        for sh in shards:
            ray.kill(sh)


def pinned_triangles(edges, *, src: str = "src", dst: str = "dst",
                     n_shards: int | None = None):
    """Exact global triangle count over actor-pinned oriented edge
    shards — same degree-oriented wedge algorithm (and parity-tested
    count) as ``graph.triangle_count``, with one exchange total:
    wedges ship actor-to-actor to the shard owning their potential
    closing edge's lo endpoint; no Dataset joins at all.

    Plan: canonical distinct pairs + degrees via the Dataset combiners;
    degrees are node-bounded, so the (nodes, deg) blob ships once and
    orientation happens inside the routing map.  Returns a ONE-ROW
    Dataset {n_tri}."""
    import ray
    import ray.data as rd

    from .graph import distinct_tuples

    if n_shards is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = min(8, cpus)
    S = int(n_shards)

    def norm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        m = u != v
        return pa.table({"u": pa.array(u[m]), "v": pa.array(v[m])})

    pairs = distinct_tuples(edges.map_batches(norm, batch_format="pyarrow"),
                            ["u", "v"]).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        x = np.concatenate([
            b.column("u").to_numpy(zero_copy_only=False),
            b.column("v").to_numpy(zero_copy_only=False)])
        un, c = np.unique(x, return_counts=True)
        return pa.table({NODE: pa.array(un),
                         "_c": pa.array(c.astype(np.int64))})

    from .bucketed import bucketed_groupby

    deg = bucketed_groupby(
        pairs.map_batches(deg_partial, batch_format="pyarrow"),
        [NODE],
        lambda g: g.groupby(NODE, sort=False, as_index=False)["_c"].sum(),
    ).to_pandas()
    order = np.argsort(deg[NODE].to_numpy(), kind="mergesort")
    nodes_g = deg[NODE].to_numpy()[order].astype(np.int64)
    deg_g = deg["_c"].to_numpy()[order].astype(np.int64)

    GraphShard = _make_shard_cls()
    shards = [GraphShard.remote(i, S) for i in range(S)]
    try:
        shards_ref = ray.put(shards)
        blob_ref = ray.put((nodes_g, deg_g))

        def route(b: pa.Table) -> pa.Table:
            hs = ray.get(shards_ref)
            ng, dg = ray.get(blob_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            du = dg[np.searchsorted(ng, u)]
            dv = dg[np.searchsorted(ng, v)]
            swap = (dv < du) | ((dv == du) & (v < u))
            lo = np.where(swap, v, u)
            hi = np.where(swap, u, v)
            sh = _shard_of(lo, S)
            acks = []
            for j in range(S):
                m = sh == j
                if m.any():
                    acks.append(hs[j].add_edges.remote(lo[m], hi[m]))
            ray.get(acks)
            return pa.table({"_n": pa.array([len(b)], pa.int64())})

        pairs.map_batches(route, batch_format="pyarrow",
                          max_retries=0, retry_exceptions=False).materialize()
        ray.get([sh.seal.remote() for sh in shards])
        ray.get([sh.prep_tri.remote(blob_ref) for sh in shards])

        if S == 1:
            outs = [[sh.tri_wedges.remote()] for sh in shards]
        else:
            outs = [sh.tri_wedges.options(num_returns=S).remote()
                    for sh in shards]
        counts = ray.get([
            shards[j].tri_count.remote(*[outs[i][j] for i in range(S)])
            for j in range(S)
        ])
        return rd.from_arrow(pa.table({
            "n_tri": pa.array([int(sum(counts))], pa.int64())}))
    finally:
        for sh in shards:
            ray.kill(sh)


def pinned_common_neighbors(edges, *, src: str = "src", dst: str = "dst",
                            max_degree: int = 16, min_common: int = 2,
                            n_shards: int | None = None):
    """Per-pair common-neighbor counts over actor-pinned SYMMETRIC
    adjacency shards — parity-twin of ``graph.common_neighbors`` (same
    hub guard, same min_common filter) with exactly ONE exchange: each
    canonical pair routes to both endpoints' shards at ingest, every
    center's neighbor list is then fully shard-local (degree included,
    so no degree blob ships at all), and locally pre-aggregated pair
    partials hop actor-to-actor to shard(pair.u) for the final reduce.
    No Dataset joins; output stays sharded until the terminal
    ``from_arrow_refs``."""
    import ray
    import ray.data as rd

    from .graph import distinct_tuples

    if n_shards is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = min(8, cpus)
    S = int(n_shards)

    def norm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        m = u != v
        return pa.table({"u": pa.array(u[m]), "v": pa.array(v[m])})

    pairs = distinct_tuples(edges.map_batches(norm, batch_format="pyarrow"),
                            ["u", "v"]).materialize()

    GraphShard = _make_shard_cls()
    shards = [GraphShard.remote(i, S) for i in range(S)]
    try:
        shards_ref = ray.put(shards)

        def route(b: pa.Table) -> pa.Table:
            hs = ray.get(shards_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            # symmetric adjacency: (z=u, nb=v) to shard(u), mirror to shard(v)
            z = np.concatenate([u, v])
            nb = np.concatenate([v, u])
            sh = _shard_of(z, S)
            acks = []
            for j in range(S):
                m = sh == j
                if m.any():
                    acks.append(hs[j].add_edges.remote(z[m], nb[m]))
            ray.get(acks)
            return pa.table({"_n": pa.array([len(b)], pa.int64())})

        pairs.map_batches(route, batch_format="pyarrow",
                          max_retries=0, retry_exceptions=False).materialize()
        ray.get([sh.seal.remote() for sh in shards])

        if S == 1:
            outs = [[sh.cn_pairs.remote(max_degree)] for sh in shards]
        else:
            outs = [sh.cn_pairs.options(num_returns=S).remote(max_degree)
                    for sh in shards]
        refs = [
            shards[j].cn_count.remote(min_common,
                                      *[outs[i][j] for i in range(S)])
            for j in range(S)
        ]
        return rd.from_arrow_refs(refs).materialize()
    finally:
        for sh in shards:
            ray.kill(sh)


def pinned_lpa(edges, *, rounds: int, src: str = "src", dst: str = "dst",
               n_shards: int | None = None):
    """Fixed-round synchronous label propagation over actor-pinned edge
    shards — bit-identical to stages/graph.py:label_propagation
    (parity-tested), with the edge table shipped ONCE.

    Routing symmetrizes (each undirected edge lands in both endpoints'
    shards as an out-edge, self-loops dropped) and the shards dedup
    their local (src, dst) pairs — global dedup, since all edges of one
    src live on one shard — so a neighbor votes exactly once.  Rounds
    exchange per-shard (node, lab, count) VOTE PARTIALS actor-to-actor
    (``num_returns=S`` refs, object-store peer-to-peer; the driver only
    schedules); each shard merges incoming partials and applies the
    (count desc, label asc) argmax locally.  Early-exits when a round
    changes zero labels (synchronous LPA is then at a fixpoint — all
    later rounds are no-ops)."""
    import ray
    import ray.data as rd

    if rounds < 1:
        raise ValueError("pinned_lpa needs rounds >= 1")
    if n_shards is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = min(8, cpus)
    S = int(n_shards)
    GraphShard = _make_shard_cls()
    shards = [GraphShard.remote(i, S) for i in range(S)]
    try:
        shards_ref = ray.put(shards)

        def route(b: pa.Table) -> pa.Table:
            hs = ray.get(shards_ref)
            s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
            d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
            m = s != d
            s, d = s[m], d[m]
            s2 = np.concatenate([s, d])
            d2 = np.concatenate([d, s])
            sh = _shard_of(s2, S)
            acks = []
            for j in range(S):
                mj = sh == j
                if mj.any():
                    acks.append(hs[j].add_edges.remote(s2[mj], d2[mj]))
                    acks.append(hs[j].add_nodes.remote(
                        s2[mj], np.zeros(int(mj.sum()), np.int64)))
            ray.get(acks)
            return pa.table({"_n": pa.array([len(b)], pa.int64())})

        # max_retries=0: routing mutates actor state (see pinned_pagerank)
        edges.map_batches(
            route, batch_format="pyarrow",
            max_retries=0, retry_exceptions=False,
        ).materialize()
        ray.get([sh.seal.remote() for sh in shards])
        ray.get([sh.dedup_edges.remote() for sh in shards])
        ray.get([sh.init_lab.remote() for sh in shards])

        for _ in range(rounds):
            if S == 1:
                outs = [[sh.lab_contribs.remote()] for sh in shards]
            else:
                outs = [sh.lab_contribs.options(num_returns=S).remote()
                        for sh in shards]
            changed = ray.get([
                shards[j].lab_apply.remote(*[outs[i][j] for i in range(S)])
                for j in range(S)
            ])
            if sum(changed) == 0:
                break  # synchronous fixpoint: remaining rounds are no-ops
        refs = [sh.lab_table.remote() for sh in shards]
        return rd.from_arrow_refs(refs).materialize()
    finally:
        for sh in shards:
            ray.kill(sh)


def pinned_ktruss(edges, *, k: int, rounds: int, src: str = "src",
                  dst: str = "dst", n_shards: int | None = None):
    """k-truss peeling over actor-pinned oriented edge shards — the
    parity twin of ``graph.ktruss`` (same fixed-round synchronous
    semantics, same (u, v, support) output) completing the pinned
    family (pagerank/components/bfs/kcore/triangles/common-neighbors/
    lpa).  Edges ingest ONCE under the frozen initial (deg, id)
    orientation (any total order keeps the wedge enumeration exact on
    the alive subset, so no re-orientation is ever needed); each round
    is TWO actor-to-actor exchanges with zero Dataset joins:

    * wedge pass — every shard enumerates wedges at its alive lo
      vertices and ships (center, h1, h2) rows to shard(h1);
    * close pass — the closing shard checks (h1 -> h2) against its
      alive packed-key set, adds the closing edge's support locally and
      routes confirmations back to shard(center), where the two wedge
      edges get their +1;
    * local peel — drop support < k-2, early-exit when a round drops
      nothing anywhere (supports are recomputed per round, so the
      remaining rounds are no-ops — the exact fixed-round contract).

    Ingestion routing runs with max_retries=0 (a task retry would
    double-ingest); the actor pool dies in ``finally``.
    """
    import ray
    import ray.data as rd

    from .bucketed import bucketed_groupby
    from .graph import distinct_tuples

    if rounds < 1:
        raise ValueError("ktruss needs rounds >= 1")
    if n_shards is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = min(8, cpus)
    S = int(n_shards)

    def norm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        m = u != v
        return pa.table({"u": pa.array(u[m]), "v": pa.array(v[m])})

    pairs = distinct_tuples(edges.map_batches(norm, batch_format="pyarrow"),
                            ["u", "v"]).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        x = np.concatenate([
            b.column("u").to_numpy(zero_copy_only=False),
            b.column("v").to_numpy(zero_copy_only=False)])
        un, c = np.unique(x, return_counts=True)
        return pa.table({NODE: pa.array(un),
                         "_c": pa.array(c.astype(np.int64))})

    deg = bucketed_groupby(
        pairs.map_batches(deg_partial, batch_format="pyarrow"),
        [NODE],
        lambda g: g.groupby(NODE, sort=False, as_index=False)["_c"].sum(),
    ).to_pandas()
    order = np.argsort(deg[NODE].to_numpy(), kind="mergesort")
    nodes_g = deg[NODE].to_numpy()[order].astype(np.int64)
    deg_g = deg["_c"].to_numpy()[order].astype(np.int64)

    GraphShard = _make_shard_cls()
    shards = [GraphShard.remote(i, S) for i in range(S)]
    try:
        shards_ref = ray.put(shards)
        blob_ref = ray.put((nodes_g, deg_g))

        def route(b: pa.Table) -> pa.Table:
            hs = ray.get(shards_ref)
            ng, dg = ray.get(blob_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            du = dg[np.searchsorted(ng, u)]
            dv = dg[np.searchsorted(ng, v)]
            swap = (dv < du) | ((dv == du) & (v < u))
            lo = np.where(swap, v, u)
            hi = np.where(swap, u, v)
            sh = _shard_of(lo, S)
            acks = []
            for j in range(S):
                m = sh == j
                if m.any():
                    acks.append(hs[j].add_edges.remote(lo[m], hi[m]))
            ray.get(acks)
            return pa.table({"_n": pa.array([len(b)], pa.int64())})

        pairs.map_batches(route, batch_format="pyarrow",
                          max_retries=0, retry_exceptions=False).materialize()
        ray.get([sh.seal.remote() for sh in shards])
        ray.get([sh.prep_ktruss.remote(blob_ref) for sh in shards])

        for _ in range(rounds):
            if S == 1:
                wedges = [[sh.kt_wedges.remote()] for sh in shards]
            else:
                wedges = [sh.kt_wedges.options(num_returns=S).remote()
                          for sh in shards]
            if S == 1:
                confirms = [[shards[j].kt_close.remote(
                    *[wedges[i][j] for i in range(S)])] for j in range(S)]
            else:
                confirms = [shards[j].kt_close.options(num_returns=S)
                            .remote(*[wedges[i][j] for i in range(S)])
                            for j in range(S)]
            ray.get([
                shards[j].kt_confirm.remote(
                    *[confirms[i][j] for i in range(S)])
                for j in range(S)
            ])
            dropped = ray.get([sh.kt_peel.remote(k) for sh in shards])
            if sum(dropped) == 0:
                break  # stable: every remaining round is a no-op
        refs = [sh.kt_result.remote() for sh in shards]
        return rd.from_arrow_refs(refs).materialize()
    finally:
        for sh in shards:
            ray.kill(sh)


def pinned_sssp(edges, seeds, *, src: str = "src", dst: str = "dst",
                weight_col: str = "w", max_rounds: int = 3,
                n_shards: int | None = None):
    """Bounded-round weighted shortest paths over actor-pinned edge
    shards — same results as ``graph.sssp_bounded`` (parity-tested),
    edges shipped once.  Per-round exchange is the CHANGED-DELTA set
    (nodes whose distance improved), so volume shrinks as distances
    settle and the loop exits early once a round improves nothing."""
    import ray
    import ray.data as rd

    if n_shards is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = min(8, cpus)
    S = int(n_shards)
    GraphShard = _make_shard_cls()
    shards = [GraphShard.remote(i, S) for i in range(S)]
    try:
        shards_ref = ray.put(shards)

        def route(b: pa.Table) -> pa.Table:
            hs = ray.get(shards_ref)
            s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
            d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
            w = b.column(weight_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            sh = _shard_of(s, S)
            acks = []
            for j in range(S):
                m = sh == j
                if m.any():
                    acks.append(hs[j].add_edges.remote(s[m], d[m], w[m]))
            ray.get(acks)
            return pa.table({"_n": pa.array([len(b)], pa.int64())})

        # max_retries=0: routing mutates actor state (see pinned_pagerank)
        edges.map_batches(route, batch_format="pyarrow",
                          max_retries=0, retry_exceptions=False).materialize()
        ray.get([sh.seal.remote() for sh in shards])

        seed_ids = np.sort(np.unique(
            seeds.to_pandas()[NODE].to_numpy().astype(np.int64)))
        ray.get([sh.init_sssp.remote(seed_ids) for sh in shards])

        for _ in range(max_rounds):
            if S == 1:
                outs = [[sh.sssp_contribs.remote()] for sh in shards]
            else:
                outs = [sh.sssp_contribs.options(num_returns=S).remote()
                        for sh in shards]
            sizes = ray.get([
                shards[j].sssp_apply.remote(*[outs[i][j] for i in range(S)])
                for j in range(S)
            ])
            if sum(sizes) == 0:
                break  # nothing improved — distances are final
        refs = [sh.bfs_table.remote() for sh in shards]
        return rd.from_arrow_refs(refs).materialize()
    finally:
        for sh in shards:
            ray.kill(sh)


def pinned_scc(edges, *, src: str = "src", dst: str = "dst",
               max_rounds: int = 12, inner_rounds: int = 4096,
               n_shards: int | None = None):
    """STRONGLY-connected components over actor-pinned edge shards —
    bit-identical to stages/graph.py:strongly_connected_components
    (parity-tested), at actor-exchange cost per propagation pass
    instead of a Dataset execution.

    Sharding: every directed edge lives TWICE — an out-copy at
    shard(src) (forward min-reacher propagation flows src -> dst) and
    an in-copy at shard(dst) (backward min-reachable flows dst ->
    src); both directions' candidates travel in the SAME fused
    exchange (one table per target shard, dir-tagged).  Relax-only
    passes (a cross-shard pointer jump would need a second exchange),
    so inner passes are block-diameter-bound — they cost only a
    per-shard node-partial exchange, the pinned_components trade.

    Each outer round starts by shipping the regrouped (part, final)
    blob once: shards PERMANENTLY drop cross-block edges (refinement
    never rejoins blocks) and edges touching finalized SCCs, so the
    live edge set shrinks monotonically.  The regroup itself is the
    node-bounded driver step (the broadcast-threshold contract —
    shards pin the EDGES; per-node state is a few int64 arrays)."""
    import ray
    import ray.data as rd

    if n_shards is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = min(8, cpus)
    S = int(n_shards)
    GraphShard = _make_shard_cls()
    shards = [GraphShard.remote(i, S) for i in range(S)]
    try:
        shards_ref = ray.put(shards)

        def route(b: pa.Table) -> pa.Table:
            hs = ray.get(shards_ref)
            s = b.column(src).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            d = b.column(dst).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sh_s = _shard_of(s, S)
            sh_d = _shard_of(d, S)
            acks = []
            for j in range(S):
                m = sh_s == j
                if m.any():
                    acks.append(hs[j].add_edges.remote(s[m], d[m]))
                    acks.append(hs[j].add_nodes.remote(
                        s[m], np.zeros(int(m.sum()), np.int64)))
                m = sh_d == j
                if m.any():
                    acks.append(hs[j].add_in_edges.remote(s[m], d[m]))
                    acks.append(hs[j].add_nodes.remote(
                        d[m], np.zeros(int(m.sum()), np.int64)))
            ray.get(acks)
            return pa.table({"_n": pa.array([len(b)], pa.int64())})

        # max_retries=0: routing mutates actor state (see pinned_pagerank)
        edges.map_batches(route, batch_format="pyarrow",
                          max_retries=0,
                          retry_exceptions=False).materialize()
        ray.get([sh.seal.remote() for sh in shards])
        ray.get([sh.seal_scc.remote() for sh in shards])

        node_arrays = [t.column(NODE).to_numpy(zero_copy_only=False)
                       for t in ray.get([sh.scc_state.remote()
                                         for sh in shards])]
        ns = np.sort(np.concatenate(node_arrays)) if node_arrays \
            else np.empty(0, np.int64)
        if len(ns) == 0:
            return rd.from_arrow(pa.table({
                NODE: pa.array([], pa.int64()),
                "comp": pa.array([], pa.int64())}))
        part = np.full(len(ns), ns[0], dtype=np.int64)
        final = np.zeros(len(ns), dtype=bool)

        for _ in range(max_rounds):
            if np.array_equal(part, ns):          # all singletons
                break
            blob = ray.put((ns, part, final))
            ray.get([sh.start_scc_round.remote(blob) for sh in shards])
            for _p in range(inner_rounds):
                if S == 1:
                    outs = [[sh.scc_contribs.remote()] for sh in shards]
                else:
                    outs = [sh.scc_contribs.options(
                        num_returns=S).remote() for sh in shards]
                changed = ray.get([
                    shards[j].scc_apply.remote(
                        *[outs[i][j] for i in range(S)])
                    for j in range(S)])
                if sum(changed) == 0:
                    break
            else:
                raise RuntimeError(
                    f"pinned_scc inner propagation did not converge in "
                    f"{inner_rounds} relax passes (passes are "
                    "block-diameter-bound on this path)")
            import pandas as pd

            f = np.empty(len(ns), dtype=np.int64)
            bk = np.empty(len(ns), dtype=np.int64)
            for t in ray.get([sh.scc_state.remote() for sh in shards]):
                nd = t.column(NODE).to_numpy(zero_copy_only=False)
                if len(nd) == 0:
                    continue
                ix = np.searchsorted(ns, nd)
                f[ix] = t.column("f").to_numpy(zero_copy_only=False)
                bk[ix] = t.column("b").to_numpy(zero_copy_only=False)
            df = pd.DataFrame({"p": part, "f": f, "b": bk, "v": ns})
            cand = df.groupby(["p", "f", "b"], sort=False)["v"] \
                .transform("min").to_numpy().astype(np.int64)
            newp = np.where(final, part, cand)
            if np.array_equal(newp, part):
                break
            part = newp
            final = final | ((f == bk) & (f == newp))
            if final.all():
                break
        else:
            raise RuntimeError(
                f"pinned_scc did not converge in {max_rounds} "
                "refinement rounds; raise max_rounds")
        return rd.from_arrow(pa.table({NODE: pa.array(ns),
                                       "comp": pa.array(part)}))
    finally:
        for sh in shards:
            ray.kill(sh)
