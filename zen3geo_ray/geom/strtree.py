"""Packed STR (Sort-Tile-Recursive) R-tree, bulk-loaded, numpy-only.

The engine's replacement for shapely.STRtree (north-star requirement:
"vectorized Shapely-2 STRtree point-in-polygon joins").  Built once per
actor in ``__init__`` from a broadcast WKB blob; queries are *batch*
queries — thousands-to-millions of boxes/points at once — executed as a
level-by-level frontier expansion where every step is a single vectorized
bbox-overlap test over (query, node) pairs.  No per-query tree walk in
Python.

Layout: each level's nodes are contiguous chunks of FANOUT children over
the level below (uniform chunking after STR ordering), so child expansion
is pure arithmetic (``node*FANOUT + arange(FANOUT)``).
"""

from __future__ import annotations

import numpy as np

FANOUT = 16


def _str_order(minx, miny, maxx, maxy, leaf_cap: int) -> np.ndarray:
    """STR tile ordering: sort by x-center into vertical slabs, then by
    y-center within each slab.  Returns the permutation."""
    n = len(minx)
    cx = (minx + maxx) * 0.5
    cy = (miny + maxy) * 0.5
    n_leaves = max(1, -(-n // leaf_cap))
    n_slabs = max(1, int(np.ceil(np.sqrt(n_leaves))))
    slab_size = -(-n // n_slabs)
    by_x = np.argsort(cx, kind="stable")
    slab_of = np.arange(n) // slab_size  # slab index in x-sorted order
    # sort key: (slab, cy) — stable argsort over cy then slab
    order = by_x[np.lexsort((cy[by_x], slab_of))]
    return order


class STRtree:
    """Bulk-loaded packed R-tree over item boxes.

    Parameters: minx/miny/maxx/maxy — float64 arrays of item bounds.
    ``query_boxes`` returns candidate (query_idx, item_idx) overlap pairs;
    exact predicates (point-in-polygon, clip) run downstream on pairs.
    """

    def __init__(self, minx, miny, maxx, maxy):
        minx = np.ascontiguousarray(minx, dtype=np.float64)
        miny = np.ascontiguousarray(miny, dtype=np.float64)
        maxx = np.ascontiguousarray(maxx, dtype=np.float64)
        maxy = np.ascontiguousarray(maxy, dtype=np.float64)
        n = len(minx)
        self.n_items = n
        if n == 0:
            self.perm = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        self.perm = _str_order(minx, miny, maxx, maxy, FANOUT)
        boxes = np.stack([minx, miny, maxx, maxy], axis=1)[self.perm]
        # levels[0] = item boxes (STR order); levels[k] = parent boxes
        self.levels = [boxes]
        while len(self.levels[-1]) > 1:
            below = self.levels[-1]
            m = len(below)
            n_nodes = -(-m // FANOUT)
            pad = n_nodes * FANOUT - m
            if pad:
                padded = np.concatenate(
                    [below, np.full((pad, 4), np.nan)]
                ).reshape(n_nodes, FANOUT, 4)
            else:
                padded = below.reshape(n_nodes, FANOUT, 4)
            with np.errstate(invalid="ignore"):
                parents = np.stack(
                    [
                        np.nanmin(padded[:, :, 0], axis=1),
                        np.nanmin(padded[:, :, 1], axis=1),
                        np.nanmax(padded[:, :, 2], axis=1),
                        np.nanmax(padded[:, :, 3], axis=1),
                    ],
                    axis=1,
                )
            self.levels.append(parents)

    def query_boxes(
        self, qminx, qminy, qmaxx, qmaxy
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batch box query -> (query_idx, item_idx) candidate pairs."""
        if self.n_items == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        qminx = np.asarray(qminx, dtype=np.float64)
        qminy = np.asarray(qminy, dtype=np.float64)
        qmaxx = np.asarray(qmaxx, dtype=np.float64)
        qmaxy = np.asarray(qmaxy, dtype=np.float64)
        nq = len(qminx)
        # frontier: (query_idx, node_idx) pairs at the current level
        q = np.arange(nq, dtype=np.int64)
        node = np.zeros(nq, dtype=np.int64)
        top = self.levels[-1]
        hit = (
            (qminx <= top[0, 2])
            & (qmaxx >= top[0, 0])
            & (qminy <= top[0, 3])
            & (qmaxy >= top[0, 1])
        )
        q, node = q[hit], node[hit]
        for lvl in range(len(self.levels) - 1, 0, -1):
            below = self.levels[lvl - 1]
            m = len(below)
            # expand each node to its FANOUT children at level lvl-1
            child = node[:, None] * FANOUT + np.arange(FANOUT)[None, :]
            valid = child < m
            qq = np.broadcast_to(q[:, None], child.shape)[valid]
            cc = child[valid]
            b = below[cc]
            ok = (
                (qminx[qq] <= b[:, 2])
                & (qmaxx[qq] >= b[:, 0])
                & (qminy[qq] <= b[:, 3])
                & (qmaxy[qq] >= b[:, 1])
            )
            q, node = qq[ok], cc[ok]
        return q, self.perm[node]

    def query_points(self, px, py) -> tuple[np.ndarray, np.ndarray]:
        """Batch point query (degenerate boxes)."""
        return self.query_boxes(px, py, px, py)
