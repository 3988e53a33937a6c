"""k-ring kNN over the cell index (north-star operator; no reference analog).

Pattern (SURVEY §2.3 joins): expand each query point's k-ring of grid
cells → broadcast the (cell → query) lookup → equi-join point batches on
their ``cell`` column (vectorized searchsorted, no shuffle) → haversine
distance → per-batch partial top-k → tiny final top-k per query.

At 100 TB the expensive side (the corpus) is never shuffled: each block
emits at most |queries| x k candidate rows, and only those move.  The
ring resolution bounds the search radius; callers pick (res, ring_k) so
the ring covers the kNN radius for their data density, or iterate with a
growing ring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import cells

EARTH_R_KM = 6371.0088


def haversine_km(lon1, lat1, lon2, lat2) -> np.ndarray:
    lon1, lat1, lon2, lat2 = (
        np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2)
    )
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_R_KM * np.arcsin(np.sqrt(h))


def build_ring_lookup(
    q_lon, q_lat, res: int, ring_k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted ring cells, matching query idx) — the broadcast side."""
    q_lon = np.asarray(q_lon, dtype=np.float64)
    q_lat = np.asarray(q_lat, dtype=np.float64)
    qc = cells.cell_of(q_lon, q_lat, res)
    rings = cells.k_ring(qc, res, ring_k)  # (Q, (2k+1)^2)
    qidx = np.repeat(np.arange(len(q_lon)), rings.shape[1])
    flat = rings.ravel()
    # dedup (cell, query) pairs (pole clamping can repeat the source cell)
    pairs = np.unique(np.stack([flat, qidx], axis=1), axis=0)
    order = np.argsort(pairs[:, 0], kind="stable")
    return pairs[order, 0], pairs[order, 1]


class KRingKNN:
    """Actor-pool map_batches fn emitting per-batch candidate top-k rows.

    Output columns: query_id, dist_km + ``keep_cols`` of the matched
    point.  Finalize with ``finalize_topk`` (a tiny groupby over
    ~#queries x k x #blocks rows).
    """

    def __init__(self, queries_ref_or_blob, res: int, ring_k: int, k: int,
                 keep_cols: list[str] | None = None,
                 lon_col: str = "lon", lat_col: str = "lat",
                 cell_col: str = "cell"):
        blob = queries_ref_or_blob
        try:
            import ray

            if isinstance(blob, ray.ObjectRef):
                blob = ray.get(blob)
        except (ImportError, TypeError):
            pass
        self.q_id = np.asarray(blob["query_id"], dtype=np.int64)
        self.q_lon = np.asarray(blob["lon"], dtype=np.float64)
        self.q_lat = np.asarray(blob["lat"], dtype=np.float64)
        self.res = res
        self.k = k
        self.ring_cells, self.ring_q = build_ring_lookup(
            self.q_lon, self.q_lat, res, ring_k
        )
        self.keep_cols = keep_cols
        self.lon_col, self.lat_col, self.cell_col = lon_col, lat_col, cell_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell = batch.column(self.cell_col).to_numpy(zero_copy_only=False)
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        # equi-join batch cells against the sorted ring-cell table
        lo = np.searchsorted(self.ring_cells, cell, side="left")
        hi = np.searchsorted(self.ring_cells, cell, side="right")
        nmatch = hi - lo
        rows = np.repeat(np.arange(len(cell)), nmatch)
        if len(rows) == 0:
            return self._empty(batch)
        # vectorized pair expansion: position within each match run
        run_off = np.arange(len(rows)) - np.repeat(
            np.cumsum(nmatch) - nmatch, nmatch
        )
        ring_pos = np.repeat(lo, nmatch) + run_off
        qsel = self.ring_q[ring_pos]
        d = haversine_km(
            self.q_lon[qsel], self.q_lat[qsel], lon[rows], lat[rows]
        )
        # partial top-k per query within the batch
        order = np.lexsort((d, qsel))
        qsel_s, rows_s, d_s = qsel[order], rows[order], d[order]
        # rank within query run
        newq = np.concatenate([[True], qsel_s[1:] != qsel_s[:-1]])
        run_start = np.maximum.accumulate(np.where(newq, np.arange(len(qsel_s)), 0))
        rank = np.arange(len(qsel_s)) - run_start
        keep = rank < self.k
        keep_cols = self.keep_cols or batch.column_names
        out = batch.select(keep_cols).take(pa.array(rows_s[keep]))
        out = out.append_column("query_id", pa.array(self.q_id[qsel_s[keep]], pa.int64()))
        out = out.append_column("dist_km", pa.array(d_s[keep], pa.float64()))
        return out

    def _empty(self, batch: pa.Table) -> pa.Table:
        keep_cols = self.keep_cols or batch.column_names
        out = batch.select(keep_cols).slice(0, 0)
        out = out.append_column("query_id", pa.array([], pa.int64()))
        out = out.append_column("dist_km", pa.array([], pa.float64()))
        return out


def adaptive_knn(points_ds, queries: dict, *, res: int, k: int,
                 ring_k: int = 2, max_ring: int = 16,
                 keep_cols: list[str] | None = None):
    """k-ring kNN with ring growth: queries that found fewer than k
    neighbors re-run with a doubled ring until satisfied or max_ring.

    Each round scans the dataset once but only for the UNSATISFIED
    queries (the broadcast ring lookup shrinks), so the common case is
    one pass and sparse-region queries cost extra passes, not a global
    shuffle.  Returns the finalized top-k Dataset (columns: keep_cols +
    query_id, dist_km, rank).
    """
    import pandas as pd

    remaining = {
        "query_id": np.asarray(queries["query_id"], dtype=np.int64),
        "lon": np.asarray(queries["lon"], dtype=np.float64),
        "lat": np.asarray(queries["lat"], dtype=np.float64),
    }
    results: list[pd.DataFrame] = []
    ring = ring_k
    while len(remaining["query_id"]) and ring <= max_ring:
        j = KRingKNN(remaining, res=res, ring_k=ring, k=k, keep_cols=keep_cols)
        partial = points_ds.map_batches(j, batch_format="pyarrow")
        got = finalize_topk(partial, k).to_pandas()
        counts = got.groupby("query_id").size()
        satisfied = set(counts[counts >= k].index)
        if ring * 2 > max_ring:  # last round: keep whatever was found
            satisfied |= set(remaining["query_id"].tolist())
        results.append(got[got["query_id"].isin(satisfied)])
        keep = ~np.isin(remaining["query_id"], np.fromiter(satisfied, dtype=np.int64, count=len(satisfied)) if satisfied else np.empty(0, dtype=np.int64))
        remaining = {kk: v[keep] for kk, v in remaining.items()}
        ring *= 2
    import ray.data as rd

    out = pd.concat(results, ignore_index=True) if results else pd.DataFrame()
    return rd.from_pandas(out) if len(out) else rd.from_items([])


def finalize_topk(ds, k: int, by: str = "query_id", metric: str = "dist_km",
                  ascending: bool = True, tie_cols: list[str] | None = None):
    """Final per-query top-k over the partial candidates (small shuffle).

    Ties on the metric are broken by ``tie_cols`` (default: every other
    column, sorted ascending) so the selection is deterministic under any
    partitioning."""
    import pandas as pd

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        ties = tie_cols or [c for c in g.columns if c not in (by, metric)]
        g = g.sort_values(
            [metric] + ties,
            ascending=[ascending] + [True] * len(ties),
            kind="mergesort",
        ).head(k)
        g["rank"] = np.arange(1, len(g) + 1)
        return g

    return ds.groupby(by).map_groups(topk, batch_format="pandas")


def nearest_rect_join(points_ds, rects: dict, *, id_col: str = "doc_id",
                      lon_col: str = "lon", lat_col: str = "lat"):
    """Nearest-RECTANGLE join (the ``st_nearest`` / nearest-facility
    surface beside the point-in-polygon join): for every point, the
    axis-aligned rectangle minimizing the clamped squared distance

        dx = max(minx − lon, lon − maxx, 0);  d2 = dx·dx + dy·dy

    ties (including d2 = 0 for points covered by several rects) break
    to the smallest rect id.  ``rects`` is the broadcast small side —
    ``{"poly_id", "minx", "miny", "maxx", "maxy"}`` numpy arrays
    shipped once via ``ray.put`` and fetched per worker; each batch
    computes the (n_points × n_rects) distance panel vectorized and
    argmins per row — points never shuffle.

    Every arithmetic step is a single IEEE op in a fixed order, so the
    SQL oracle value-checks d2 bit-for-bit.  Output: (id, poly_id, d2).
    """
    import ray

    ref = ray.put(rects)

    def fn(b: pa.Table, _ref=ref) -> pa.Table:
        from .graph import _get_blob

        r = _get_blob(_ref)
        pid = np.asarray(r["poly_id"], dtype=np.int64)
        order = np.argsort(pid, kind="stable")
        pid = pid[order]
        minx = np.asarray(r["minx"], dtype=np.float64)[order]
        miny = np.asarray(r["miny"], dtype=np.float64)[order]
        maxx = np.asarray(r["maxx"], dtype=np.float64)[order]
        maxy = np.asarray(r["maxy"], dtype=np.float64)[order]
        lon = b.column(lon_col).to_numpy(zero_copy_only=False)
        lat = b.column(lat_col).to_numpy(zero_copy_only=False)
        dx = np.maximum(np.maximum(minx[None, :] - lon[:, None],
                                   lon[:, None] - maxx[None, :]), 0.0)
        dy = np.maximum(np.maximum(miny[None, :] - lat[:, None],
                                   lat[:, None] - maxy[None, :]), 0.0)
        d2 = dx * dx + dy * dy
        best = np.argmin(d2, axis=1)   # first occurrence = smallest id
        return pa.table({
            id_col: b.column(id_col),
            "poly_id": pa.array(pid[best]),
            "d2": pa.array(d2[np.arange(len(lon)), best]),
        })

    return points_ds.map_batches(fn, batch_format="pyarrow")
