"""Per-group convex hulls over distributed point sets — exact integer
geometry with lossless block-local pruning.

The distributed shape (the reason hulls scale): a point on the GLOBAL
hull boundary of its group is necessarily on the LOCAL hull boundary of
every subset that contains it (the supporting line survives
restriction), so ``hull(union of block hulls) == hull(all points)``.
Each input block therefore reduces to its per-group local boundary
(map_batches, no shuffle), and only those few survivors — O(log n)
expected for random points — take the one bucketed shuffle to the
per-group finale.  The same pruning serves the diameter: the farthest
pair's endpoints are hull vertices, so the exact pairwise max runs over
the pruned set only.

Definition (mirrored verbatim by the SQL oracle): a distinct point p of
group g is a BOUNDARY point iff there exists another distinct point q of
g with every point r of g satisfying ``cross(q − p, r − p) >= 0`` — i.e.
a supporting line through p exists.  This includes collinear points on
hull edges; a group with a single distinct point emits nothing (no q
exists).  All arithmetic is int64 cross products — no floats, no
epsilons; coordinate domain ≲ 2^20 keeps every product exact.

Reference surface: the vector-side geometry ops of
/root/reference/zen3geo/datapipes/geopandas.py (geopandas delegates
hulls to shapely's convex_hull) — re-expressed as Ray Data partial
reductions instead of a single-process GeoSeries call.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bucketed import bucketed_groupby


def _akl_toussaint(pts: np.ndarray) -> np.ndarray:
    """Vectorized Akl–Toussaint prune: drop points STRICTLY inside the
    quadrilateral of the 4 extreme points in the x, y, x+y, x−y
    directions (strictly inside the hull of a subset ⇒ strictly inside
    the hull ⇒ not a boundary point, so the prune is lossless)."""
    if len(pts) <= 8:
        return pts
    x, y = pts[:, 0], pts[:, 1]
    # CCW quad (y-up): bottom-left, bottom-right, top-right, top-left
    corners = pts[[np.argmin(x + y), np.argmax(x - y),
                   np.argmax(x + y), np.argmin(x - y)]]
    keep = np.zeros(len(pts), dtype=bool)
    for i in range(4):
        ux, uy = corners[i]
        vx, vy = corners[(i + 1) % 4]
        # on or outside edge i (ccw quad): cross(v-u, p-u) <= 0 keeps
        keep |= (vx - ux) * (y - uy) - (vy - uy) * (x - ux) <= 0
    return pts[keep]


def _vertex_hull(pts: np.ndarray) -> np.ndarray:
    """Strict-vertex convex hull (Andrew monotone chain, collinear
    removed) of distinct lexicographically-sortable int64 points."""
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    p = pts[order]
    if len(p) <= 2:
        return p

    def chain(seq):
        out: list[np.ndarray] = []
        for q in seq:
            while len(out) >= 2:
                a, b = out[-2], out[-1]
                if ((b[0] - a[0]) * (q[1] - a[1])
                        - (b[1] - a[1]) * (q[0] - a[0])) <= 0:
                    out.pop()
                else:
                    break
            out.append(q)
        return out

    lower = chain(p)
    upper = chain(p[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.int64)


def _boundary_points(pts: np.ndarray) -> np.ndarray:
    """All DISTINCT points of ``pts`` lying on the hull polygon's
    boundary (vertices + collinear edge points); empty for a single
    distinct point (mirrors the oracle's EXISTS-q rule)."""
    pts = np.unique(pts, axis=0)
    if len(pts) < 2:
        return pts[:0]
    pruned = _akl_toussaint(pts)
    hull = _vertex_hull(pruned)
    m = len(hull)
    if m == 1:  # impossible with >= 2 distinct pts, but stay safe
        return pts[:0]
    edges = [(hull[i], hull[(i + 1) % m]) for i in range(m)] \
        if m > 2 else [(hull[0], hull[1])]
    x, y = pts[:, 0], pts[:, 1]
    on = np.zeros(len(pts), dtype=bool)
    for (u, v) in edges:
        col = (v[0] - u[0]) * (y - u[1]) - (v[1] - u[1]) * (x - u[0]) == 0
        inb = ((np.minimum(u[0], v[0]) <= x) & (x <= np.maximum(u[0], v[0]))
               & (np.minimum(u[1], v[1]) <= y)
               & (y <= np.maximum(u[1], v[1])))
        on |= col & inb
    return pts[on]


def _per_group(df: pd.DataFrame, g: str, x: str, y: str, fn):
    out = []
    for key, grp in df.groupby(g, sort=False):
        pts = np.stack([grp[x].to_numpy(dtype=np.int64),
                        grp[y].to_numpy(dtype=np.int64)], axis=1)
        out.append((key, fn(pts)))
    return out


def _partial(g: str, x: str, y: str):
    """Block-local boundary reduction — each block's rows collapse to
    their per-group local hull boundary before anything shuffles."""
    def fn(b: pa.Table) -> pa.Table:
        df = b.select([g, x, y]).to_pandas()
        ks, xs, ys = [], [], []
        for key, pts in _per_group(df, g, x, y, _boundary_points):
            # single-distinct-point groups must SURVIVE the partial
            # stage (other blocks may add their second point) — only
            # the finale applies the emit-nothing rule
            if len(pts) == 0:
                pts = np.unique(np.stack(
                    [df.loc[df[g] == key, x].to_numpy(dtype=np.int64),
                     df.loc[df[g] == key, y].to_numpy(dtype=np.int64)],
                    axis=1), axis=0)
            ks.append(np.full(len(pts), key, dtype=np.int64))
            xs.append(pts[:, 0])
            ys.append(pts[:, 1])
        if not ks:
            return pa.table({g: pa.array([], pa.int64()),
                             x: pa.array([], pa.int64()),
                             y: pa.array([], pa.int64())})
        return pa.table({g: pa.array(np.concatenate(ks)),
                         x: pa.array(np.concatenate(xs)),
                         y: pa.array(np.concatenate(ys))})
    return fn


def hull_boundary(ds, *, group_col: str = "g", x_col: str = "x",
                  y_col: str = "y", n_buckets: int = 32):
    """Distinct points on each group's convex-hull boundary.

    Output columns ``(group_col, x_col, y_col)``, all int64.  One
    map_batches partial (block-local hulls) + one bucketed shuffle of
    the survivors; input points never shuffle in full.
    """
    part = ds.map_batches(_partial(group_col, x_col, y_col),
                          batch_format="pyarrow")

    def finale(df: pd.DataFrame) -> pd.DataFrame:
        ks, xs, ys = [], [], []
        for key, pts in _per_group(
                df.drop_duplicates(), group_col, x_col, y_col,
                _boundary_points):
            ks.append(np.full(len(pts), key, dtype=np.int64))
            xs.append(pts[:, 0])
            ys.append(pts[:, 1])
        if not ks:
            return pd.DataFrame({group_col: pd.Series([], dtype="int64"),
                                 x_col: pd.Series([], dtype="int64"),
                                 y_col: pd.Series([], dtype="int64")})
        return pd.DataFrame({group_col: np.concatenate(ks),
                             x_col: np.concatenate(xs),
                             y_col: np.concatenate(ys)})

    return bucketed_groupby(part, [group_col], finale,
                            n_buckets=n_buckets)


def group_diameter(ds, *, group_col: str = "g", x_col: str = "x",
                   y_col: str = "y", n_buckets: int = 32):
    """Exact squared diameter (max pairwise squared distance, int64)
    per group — ``(group_col, d2)``.

    The farthest pair's endpoints are hull vertices, so the same
    block-local boundary pruning applies; the finale's O(k²) pairwise
    max runs over pruned survivors only.  Single-point groups emit
    d2 = 0 (the p = q pair), mirroring the oracle's self-join.
    """
    part = ds.map_batches(_partial(group_col, x_col, y_col),
                          batch_format="pyarrow")

    def finale(df: pd.DataFrame) -> pd.DataFrame:
        ks, ds_ = [], []
        for key, grp in df.drop_duplicates().groupby(group_col,
                                                     sort=False):
            pts = np.unique(np.stack(
                [grp[x_col].to_numpy(dtype=np.int64),
                 grp[y_col].to_numpy(dtype=np.int64)], axis=1), axis=0)
            cand = _boundary_points(pts)
            if len(cand) == 0:  # single distinct point
                cand = pts
            dx = cand[:, 0][:, None] - cand[:, 0][None, :]
            dy = cand[:, 1][:, None] - cand[:, 1][None, :]
            ks.append(key)
            ds_.append(int((dx * dx + dy * dy).max()))
        return pd.DataFrame({group_col: pd.Series(ks, dtype="int64"),
                             "d2": pd.Series(ds_, dtype="int64")})

    return bucketed_groupby(part, [group_col], finale,
                            n_buckets=n_buckets)
