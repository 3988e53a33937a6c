"""Spatial statistics over the engine's grid-cell index — Moran's I /
Geary's C (global spatial autocorrelation), Getis-Ord Gi* (local hotspot
z-scores) and the empirical semivariogram, the ESDA trio every
geostatistics textbook opens with (Anselin 1995; Getis & Ord 1992;
Matheron 1963).

zen3geo has no spatial-stats stage (its raster leg stops at datashader
aggregation, `/root/reference/zen3geo/datapipes/datashader.py:229-242`);
this extends the zonal family the way the curation stages extend the
text leg — the statistics a user actually runs AFTER zonal_aggregate.

Scale shape (shared by all three): the corpus reduces to a per-cell
HISTOGRAM via block-local `np.unique` partials + one bucketed groupby —
state is GRID-bounded (``2**(2*res+1)`` cells max, res 6 -> 8192), the
corpus itself never shuffles and never materializes.  The finale probes
rook/ring neighbors on the sorted bounded histogram driver-side (the
ray.put-broadcast-bounded-state discipline; at res >= 14 move the probe
into a bucketed self-join on shifted cell ids — same arithmetic).

Exactness discipline (the spearman/proto_sim rules): cell counts are
native integers, every pair/moment statistic is an EXACT integer
(Python-int finale sums — pair products overflow int64 long before
HUGEINT), and each reported float is ONE shared shape over exactly-cast
integers, so the DuckDB oracle VALUE-checks all three:

- Moran's I with z'_i = n*x_i - S (integers; the 1/n factors cancel):
  I = (n * num) / (W * den),  num = SUM_pairs z'_i z'_j (both
  directions), den = SUM_i z'_i^2 = n^2*Q2 - n*S^2.
- Geary's C needs no centering at all: C = ((n-1) * n^2 * D) /
  (2 * W_d * (n^2*Q2 - n*S^2)) with D = SUM_undirected (x_i - x_j)^2.
- Gi*_i = (n*L_i - S*W_i) / sqrt((n*Q2 - S*S) * (n*W_i - W_i*W_i)
  / (n - 1.0))  — the textbook z-score multiplied through by n.
- gamma(h) = SSD_h / (2 * N_h) over Chebyshev-ring-h cell pairs.

Neighbor convention (mirrored in SQL, no wrap): rook adjacency on the
row-major grid — east = cell+1 iff nx < ncols-1, north = cell+ncols iff
ny < nrows-1; only OCCUPIED cells are spatial units.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geom.cells import _grid_dims
from .bucketed import bucketed_groupby
from .zonal import eq_mask


def cell_counts(ds, *, cell_col: str = "cell",
                value_col: str | None = None, n_buckets: int = 8):
    """Corpus -> (cell, x) histogram; combiner-first, the only shuffle
    any spatial statistic needs.  ``value_col=None`` counts records;
    an INTEGER value column sums instead (field statistics — weighted
    Moran etc.)."""

    def partial(b: pa.Table) -> pa.Table:
        c = b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if value_col is None:
            u, x = np.unique(c, return_counts=True)
            x = x.astype(np.int64)
        else:
            v = b.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            u, inv = np.unique(c, return_inverse=True)
            x = np.zeros(len(u), dtype=np.int64)
            np.add.at(x, inv, v)
        return pa.table({"cell": pa.array(u), "x": pa.array(x)})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("cell", as_index=False)["x"].sum()

    return bucketed_groupby(parts, ["cell"], fold, n_buckets=n_buckets)


def _histogram(ds, cell_col: str, n_buckets: int,
               value_col: str | None = None):
    """Materialize the GRID-BOUNDED histogram, sorted by cell id."""
    df = cell_counts(ds, cell_col=cell_col, value_col=value_col,
                     n_buckets=n_buckets).to_pandas()
    df = df.sort_values("cell", kind="mergesort")
    return (df["cell"].to_numpy().astype(np.int64),
            df["x"].to_numpy().astype(np.int64))


def _probe(cells_sorted: np.ndarray, targets: np.ndarray):
    """(found_mask, positions) of ``targets`` in the sorted cell array."""
    pos = np.searchsorted(cells_sorted, targets)
    pos = np.minimum(pos, len(cells_sorted) - 1)
    found = cells_sorted[pos] == targets
    return found, pos


def _isum(a: np.ndarray) -> int:
    """Exact sum of an int64 array: vectorized when provably safe
    (|max| * len < 2^62), exact-Python-int fallback otherwise."""
    if not len(a):
        return 0
    if int(np.abs(a).max()) * len(a) < (1 << 62):
        return int(a.sum())
    return int(sum(int(v) for v in a.tolist()))


def _exact_dot(a: np.ndarray, b: np.ndarray) -> int:
    """Exact SUM(a*b) over int64 arrays — int64 np.dot when the worst
    case provably fits, exact-Python-int fallback otherwise."""
    if not len(a):
        return 0
    bound = (int(np.abs(a).max()) * int(np.abs(b).max()) + 1) * len(a)
    if bound < (1 << 62):
        return int(np.dot(a, b))
    return int(sum(int(x) * int(y)
                   for x, y in zip(a.tolist(), b.tolist())))


def _exact_sq_diff(a: np.ndarray, b: np.ndarray) -> int:
    """Exact SUM((a-b)^2) with the same guard discipline."""
    if not len(a):
        return 0
    span = int(np.abs(a).max()) + int(np.abs(b).max())
    if (span * span + 1) * len(a) < (1 << 62):
        d = a - b
        return int(np.dot(d, d))
    return int(sum((int(x) - int(y)) ** 2
                   for x, y in zip(a.tolist(), b.tolist())))


def _rook_pairs(cells_: np.ndarray, x: np.ndarray, res: int):
    """Directed-once (east, north) occupied neighbor pairs -> exact-int
    (W_d, P1=SUM x_i x_j, P2=SUM (x_i+x_j), D=SUM (x_i-x_j)^2)."""
    ncols, nrows = _grid_dims(res)
    nx = cells_ % ncols
    ny = cells_ // ncols
    wd, p1, p2, d = 0, 0, 0, 0
    for off, ok in ((1, nx < ncols - 1), (ncols, ny < nrows - 1)):
        src = np.flatnonzero(ok)
        found, pos = _probe(cells_, cells_[src] + off)
        xi = x[src[found]]
        xj = x[pos[found]]
        wd += int(found.sum())
        p1 += _exact_dot(xi, xj)
        p2 += _isum(xi) + _isum(xj)
        d += _exact_sq_diff(xi, xj)
    return wd, p1, p2, d


def morans_i(ds, *, res: int, cell_col: str = "cell",
             value_col: str | None = None,
             n_buckets: int = 8) -> pa.Table:
    """Global Moran's I and Geary's C of per-cell record counts under
    rook adjacency (``value_col`` switches to per-cell integer value
    SUMS — the field-statistics variant).  One row: (n_cells, w_pairs,
    moran_i, geary_c) — w_pairs counts BOTH directions (the standard
    symmetric W)."""
    cells_, x = _histogram(ds, cell_col, n_buckets, value_col)
    n = int(len(cells_))
    s = _isum(x)
    q2 = _exact_dot(x, x)
    wd, p1, p2, d = _rook_pairs(cells_, x, res)

    # num = SUM_{ordered pairs} z'_i z'_j with z' = n*x - S; expanding the
    # directed-once sums: 2*(n^2*P1 - n*S*P2 + W_d*S^2).
    num = 2 * (n * n * p1 - n * s * p2 + wd * s * s)
    den = n * n * q2 - n * s * s
    w = 2 * wd
    moran = (float(n * num) / float(w * den)) if w and den else None
    geary = (float((n - 1) * n * n * d) / float(2 * wd * den)) \
        if wd and den else None
    return pa.table({
        "n_cells": pa.array([n], pa.int64()),
        "w_pairs": pa.array([w], pa.int64()),
        "moran_i": pa.array([moran], pa.float64()),
        "geary_c": pa.array([geary], pa.float64()),
    })


def _gi_scores(cells_: np.ndarray, x: np.ndarray, res: int):
    """(wi, li, gi-list-with-Nones) for a sorted histogram — the Gi*
    kernel shared by getis_ord_g / emerging_hotspots."""
    n = int(len(cells_))
    s = _isum(x)
    q2 = _exact_dot(x, x)
    ncols, nrows = _grid_dims(res)
    nx = cells_ % ncols
    ny = cells_ // ncols

    li = x.copy()
    wi = np.ones(n, dtype=np.int64)
    for off, ok in ((1, nx < ncols - 1), (-1, nx > 0),
                    (ncols, ny < nrows - 1), (-ncols, ny > 0)):
        src = np.flatnonzero(ok)
        found, pos = _probe(cells_, cells_[src] + off)
        np.add.at(li, src[found], x[pos[found]])
        np.add.at(wi, src[found], 1)

    gvar = n * q2 - s * s  # exact int, shared by every cell
    num = [n * int(a) - s * int(b) for a, b in zip(li.tolist(), wi.tolist())]
    gi = [float(nu) / math.sqrt(float(gvar * (n * int(w) - int(w) * int(w)))
                                / (n - 1.0))
          if n > 1 and n > int(w) and gvar > 0 else None
          for nu, w in zip(num, wi.tolist())]
    return wi, li, gi


def getis_ord_g(ds, *, res: int, cell_col: str = "cell",
                n_buckets: int = 8) -> pa.Table:
    """Per-cell Getis-Ord Gi* hotspot z-score (self-inclusive rook
    neighborhood).  Output (cell, x, wi, li, gi): wi = neighborhood
    size, li = neighborhood count sum, gi the z-score."""
    cells_, x = _histogram(ds, cell_col, n_buckets)
    wi, li, gi = _gi_scores(cells_, x, res)
    return pa.table({
        "cell": pa.array(cells_),
        "x": pa.array(x),
        "wi": pa.array(wi),
        "li": pa.array(li),
        "gi": pa.array(gi, pa.float64()),
    })


def emerging_hotspots(ds, store_dir: str, *, res: int,
                      cell_col: str = "cell", threshold: float = 1.645,
                      n_buckets: int = 8) -> pa.Table:
    """CROSS-RUN hotspot monitoring (the emerging-hot-spot-analysis
    shape): merge this run's occupancy histogram into a persistent
    per-cell count store, recompute Gi* on the merged counts, and
    classify every cell that is (or was) hot against the PRE-merge
    store:

        'new'        hot now, not before
        'persistent' hot in both
        'faded'      was hot, not any more

    Only GRID-bounded (cell, x) int64 rows ever persist (one parquet
    per run under ``store_dir``, the incremental-store discipline of
    incremental_exact_dedup).  Gi* floats are bit-exact, so the
    threshold comparison — and therefore the status — is
    deterministic.  Output (cell, x_old, x_new, gi_old, gi_new,
    status), hot-old-or-new cells only, sorted by cell."""
    import os
    import uuid

    import pyarrow.parquet as pq

    # pre-merge store histogram (may be empty on the first run)
    files = [
        os.path.join(root, f)
        for root, _, fs in os.walk(store_dir or "")
        for f in fs if f.endswith(".parquet")
    ] if os.path.isdir(store_dir) else []
    if files:
        old_df = pd.concat([pq.read_table(f).to_pandas() for f in files])
        old_df = old_df.groupby("cell", as_index=False)["x"].sum() \
            .sort_values("cell", kind="mergesort")
        old_c = old_df["cell"].to_numpy().astype(np.int64)
        old_x = old_df["x"].to_numpy().astype(np.int64)
    else:
        old_c = np.array([], dtype=np.int64)
        old_x = np.array([], dtype=np.int64)

    new_c, new_x = _histogram(ds, cell_col, n_buckets)

    # persist this run's histogram (append-only, idempotent re-read)
    os.makedirs(store_dir, exist_ok=True)
    run_path = os.path.join(store_dir,
                            f"run-{uuid.uuid4().hex[:12]}.parquet")
    pq.write_table(pa.table({"cell": pa.array(new_c),
                             "x": pa.array(new_x)}), run_path)

    # merged = old + new (old cells always a subset of merged)
    merged = pd.concat([
        pd.DataFrame({"cell": old_c, "x": old_x}),
        pd.DataFrame({"cell": new_c, "x": new_x}),
    ]).groupby("cell", as_index=False)["x"].sum() \
        .sort_values("cell", kind="mergesort")
    m_c = merged["cell"].to_numpy().astype(np.int64)
    m_x = merged["x"].to_numpy().astype(np.int64)

    _, _, gi_old = _gi_scores(old_c, old_x, res) if len(old_c) \
        else (None, None, [])
    _, _, gi_new = _gi_scores(m_c, m_x, res)

    old_idx = {int(c): i for i, c in enumerate(old_c.tolist())}
    rows = []
    for i, c in enumerate(m_c.tolist()):
        go = gi_old[old_idx[c]] if c in old_idx else None
        gn = gi_new[i]
        hot_o = go is not None and go > threshold
        hot_n = gn is not None and gn > threshold
        if not (hot_o or hot_n):
            continue
        status = ("persistent" if hot_o and hot_n
                  else "new" if hot_n else "faded")
        rows.append((c, int(old_x[old_idx[c]]) if c in old_idx else 0,
                     int(m_x[i]), go, gn, status))
    return pa.table({
        "cell": pa.array([r[0] for r in rows], pa.int64()),
        "x_old": pa.array([r[1] for r in rows], pa.int64()),
        "x_new": pa.array([r[2] for r in rows], pa.int64()),
        "gi_old": pa.array([r[3] for r in rows], pa.float64()),
        "gi_new": pa.array([r[4] for r in rows], pa.float64()),
        "status": pa.array([r[5] for r in rows], pa.string()),
    })


def temporal_gi(ds, *, ts_col: str = "ts",
                bin_us: int = 3_600_000_000,
                n_buckets: int = 8) -> pa.Table:
    """1-D Getis-Ord Gi* over time bins — temporal BURST detection,
    the time-axis sibling of getis_ord_g: events histogram into
    ``bin_us`` buckets (epoch_us // bin_us), neighbors are the
    adjacent OCCUPIED bins (±1), same exact-integer z-score shape.
    Output (bin, x, wi, li, gi), sorted by bin."""
    def binner(b: pa.Table) -> pa.Table:
        t = b.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"cell": pa.array(t // bin_us)})

    bins_, x = _histogram(
        ds.map_batches(binner, batch_format="pyarrow"),
        "cell", n_buckets)
    n = int(len(bins_))
    s = _isum(x)
    q2 = _exact_dot(x, x)

    li = x.copy()
    wi = np.ones(n, dtype=np.int64)
    for off in (1, -1):
        found, pos = _probe(bins_, bins_ + off)
        np.add.at(li, np.flatnonzero(found), x[pos[found]])
        np.add.at(wi, np.flatnonzero(found), 1)

    gvar = n * q2 - s * s
    num = [n * int(a) - s * int(b)
           for a, b in zip(li.tolist(), wi.tolist())]
    gi = [float(nu)
          / math.sqrt(float(gvar * (n * int(w) - int(w) * int(w)))
                      / (n - 1.0))
          if n > 1 and n > int(w) and gvar > 0 else None
          for nu, w in zip(num, wi.tolist())]
    return pa.table({
        "bin": pa.array(bins_),
        "x": pa.array(x),
        "wi": pa.array(wi),
        "li": pa.array(li),
        "gi": pa.array(gi, pa.float64()),
    })


def local_moran(ds, *, res: int, cell_col: str = "cell",
                n_buckets: int = 8) -> pa.Table:
    """LISA — Anselin's local Moran's I per cell (exclusive rook
    neighborhood).  With z' = n*x - S the statistic is a pure integer
    ratio:

        I_i = (n*x_i - S) * (n*L'_i - S*k_i) / (n*Q2 - S^2)

    (L'_i = neighbor count sum, k_i = #occupied neighbors) — every
    term exact, ONE float division, so the oracle VALUE-checks.
    Positive = in a like-valued cluster (hot-hot / cold-cold),
    negative = spatial outlier.  Output (cell, x, k, num, lisa)."""
    cells_, x = _histogram(ds, cell_col, n_buckets)
    n = int(len(cells_))
    s = _isum(x)
    q2 = _exact_dot(x, x)
    ncols, nrows = _grid_dims(res)
    nx = cells_ % ncols
    ny = cells_ // ncols

    li = np.zeros(n, dtype=np.int64)
    ki = np.zeros(n, dtype=np.int64)
    for off, ok in ((1, nx < ncols - 1), (-1, nx > 0),
                    (ncols, ny < nrows - 1), (-ncols, ny > 0)):
        src = np.flatnonzero(ok)
        found, pos = _probe(cells_, cells_[src] + off)
        np.add.at(li, src[found], x[pos[found]])
        np.add.at(ki, src[found], 1)

    den = n * q2 - s * s
    num = [(n * int(a) - s) * (n * int(b) - s * int(k))
           for a, b, k in zip(x.tolist(), li.tolist(), ki.tolist())]
    lisa = [float(v) / float(den) if den else None for v in num]
    return pa.table({
        "cell": pa.array(cells_),
        "x": pa.array(x),
        "k": pa.array(ki),
        "num": pa.array(num, pa.int64()),
        "lisa": pa.array(lisa, pa.float64()),
    })


def dissolve_stats(ds, *, res: int, group_col: str,
                   cell_col: str = "cell", n_buckets: int = 8) -> pa.Table:
    """Per-group DISSOLVED cell-region shape statistics — the
    ST_Union/dissolve analog on the grid tessellation.  Each group's
    region is the set of cells it occupies; on a unit-cell grid the
    dissolved geometry's measures are pure integers:

        area      = #cells
        perimeter = 4*area - 2*adj   (adj = rook-adjacent SAME-group
                                      cell pairs, counted once)
        squareness = 16*area / perimeter^2   (1.0 for a square block)

    Corpus reduces to distinct (group, cell) pairs (one bucketed
    shuffle, state bounded by groups x grid); the finale probes east/
    north neighbors per group on the sorted bounded set.  Output
    (group, area, adj_pairs, perimeter, squareness), one float shape."""
    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        c = b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": g, "cell": c}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def fold(f: pd.DataFrame) -> pd.DataFrame:
        return f.drop_duplicates(["g", "cell"])

    distinct = bucketed_groupby(parts, ["g", "cell"], fold,
                                n_buckets=n_buckets).to_pandas()
    ncols, nrows = _grid_dims(res)
    gs, areas, adjs = [], [], []
    for g, sub in sorted(distinct.groupby("g"), key=lambda kv: kv[0]):
        cells_ = np.sort(sub["cell"].to_numpy().astype(np.int64))
        nx = cells_ % ncols
        ny = cells_ // ncols
        adj = 0
        for off, ok in ((1, nx < ncols - 1), (ncols, ny < nrows - 1)):
            src = np.flatnonzero(ok)
            found, _ = _probe(cells_, cells_[src] + off)
            adj += int(found.sum())
        gs.append(g)
        areas.append(len(cells_))
        adjs.append(adj)
    perim = [4 * a - 2 * j for a, j in zip(areas, adjs)]
    sq = [float(16 * a) / float(p * p) if p > 0 else None
          for a, p in zip(areas, perim)]
    return pa.table({
        "g": pa.array(gs),
        "area": pa.array(areas, pa.int64()),
        "adj_pairs": pa.array(adjs, pa.int64()),
        "perimeter": pa.array(perim, pa.int64()),
        "squareness": pa.array(sq, pa.float64()),
    })


def idw_fill(ds, *, res: int, radius: int = 2,
             cell_col: str = "cell", n_buckets: int = 8,
             w_scale: int = 1 << 20) -> pa.Table:
    """Inverse-distance-weighted interpolation of EMPTY cells from the
    occupancy histogram — the gdal_grid / rio fill-nodata analog.

    Weights are QUANTIZED-RECIPROCAL integers ``wq = w_scale // d2``
    (d2 = dx^2 + dy^2 over the Chebyshev disk of ``radius``), so the
    accumulation is exact int64 (num = SUM wq*x, den = SUM wq) and the
    estimate is ONE float division — value-checked by the SQL oracle.
    Only empty cells with at least one occupied neighbor in the disk
    are emitted.  Like focal_stats, the scatter goes FROM each known
    cell INTO its neighborhood (one pass per offset over the bounded
    histogram; per-offset weight is a constant).

    Output (cell, num, den, est), sorted by cell."""
    cells_, x = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    nx = cells_ % ncols
    ny = cells_ // ncols

    acc_num: dict[int, int] = {}
    acc_den: dict[int, int] = {}
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx == 0 and dy == 0:
                continue
            wq = w_scale // (dx * dx + dy * dy)
            ok = ((nx + dx >= 0) & (nx + dx < ncols)
                  & (ny + dy >= 0) & (ny + dy < nrows))
            src = np.flatnonzero(ok)
            tgt = cells_[src] + dy * ncols + dx
            for t, v in zip(tgt.tolist(), x[src].tolist()):
                acc_num[t] = acc_num.get(t, 0) + wq * int(v)
                acc_den[t] = acc_den.get(t, 0) + wq
    occupied = set(cells_.tolist())
    out = sorted(t for t in acc_num if t not in occupied)
    num = [acc_num[t] for t in out]
    den = [acc_den[t] for t in out]
    return pa.table({
        "cell": pa.array(out, pa.int64()),
        "num": pa.array(num, pa.int64()),
        "den": pa.array(den, pa.int64()),
        "est": pa.array([float(a) / float(b) for a, b in zip(num, den)],
                        pa.float64()),
    })


def ripley_k(ds, *, res: int, max_lag: int = 3,
             cell_col: str = "cell", n_buckets: int = 8) -> pa.Table:
    """Cell-binned Ripley's K point-pattern statistic: for each lag h,
    the number of ORDERED point pairs at Chebyshev cell distance
    <= h (within-cell pairs = x*(x-1) count as distance 0), normalized
    by intensity: K(h) = M * pairs(h) / (n*n) with M the full grid
    size.  pairs(h) is a pure integer (the variogram pair machinery);
    K is one shared float shape — clustered patterns rise above the
    CSR expectation (2h+1)^2.  Output (h, pairs, k)."""
    cells_, x = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    m = ncols * nrows
    n = _isum(x)
    nx = cells_ % ncols
    ny = cells_ // ncols

    within = _exact_dot(x, x) - _isum(x)
    hs, pair_counts, ks = [], [], []
    cum = within
    for h in range(1, max_lag + 1):
        ring = 0
        for dy in range(0, h + 1):
            for dx in range(-h, h + 1):
                if max(abs(dx), abs(dy)) != h:
                    continue
                if dy == 0 and dx <= 0:
                    continue
                ok = (nx + dx >= 0) & (nx + dx < ncols) & (ny + dy < nrows)
                src = np.flatnonzero(ok)
                found, pos = _probe(cells_, cells_[src] + dy * ncols + dx)
                ring += 2 * _exact_dot(x[src[found]],
                                       x[pos[found]])
        cum += ring
        hs.append(h)
        pair_counts.append(cum)
        ks.append(float(m * cum) / float(n * n) if n else None)
    return pa.table({
        "h": pa.array(hs, pa.int64()),
        "pairs": pa.array(pair_counts, pa.int64()),
        "k": pa.array(ks, pa.float64()),
    })


def dispersion_index(ds, *, res: int, cell_col: str = "cell",
                     n_buckets: int = 8) -> pa.Table:
    """Quadrat-count index of dispersion (variance-mean ratio) over
    the FULL grid (empty cells are real zero quadrats):

        VMR  = s^2 / mean = M*(M*Q2 - n^2) / (n*M*(M-1))
        chi2 = (M-1) * VMR   (the CSR test statistic, df = M-1)

    all-integer numerator/denominator, two shared float shapes; VMR
    > 1 = clustered, < 1 = dispersed.  Output one row
    (m_cells, n_points, vmr, chi2)."""
    cells_, x = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    m = ncols * nrows
    n = _isum(x)
    q2 = _exact_dot(x, x)
    num = m * (m * q2 - n * n)
    den = n * m * (m - 1)
    vmr = float(num) / float(den) if den else None
    chi2 = float((m - 1) * num) / float(den) if den else None
    return pa.table({
        "m_cells": pa.array([m], pa.int64()),
        "n_points": pa.array([n], pa.int64()),
        "vmr": pa.array([vmr], pa.float64()),
        "chi2": pa.array([chi2], pa.float64()),
    })


def proximity(ds, *, res: int, max_dist: int = 3,
              cell_col: str = "cell", n_buckets: int = 8) -> pa.Table:
    """Distance transform of the occupancy mask — the gdal_proximity
    analog: for every EMPTY cell within ``max_dist`` Chebyshev rings
    of an occupied cell, the ring distance to the NEAREST occupied
    cell.  Pure integers (scatter from each occupied cell outward,
    first ring wins).  Output (cell, dist), sorted by cell; cells
    farther than max_dist are not emitted (the gdal maxdist
    contract)."""
    cells_, _x = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    nx = cells_ % ncols
    ny = cells_ // ncols

    dist: dict[int, int] = {}
    for h in range(1, max_dist + 1):
        for dy in range(-h, h + 1):
            for dx in range(-h, h + 1):
                if max(abs(dx), abs(dy)) != h:
                    continue
                ok = ((nx + dx >= 0) & (nx + dx < ncols)
                      & (ny + dy >= 0) & (ny + dy < nrows))
                for t in (cells_[np.flatnonzero(ok)]
                          + dy * ncols + dx).tolist():
                    dist.setdefault(t, h)
    occupied = set(cells_.tolist())
    out = sorted(t for t in dist if t not in occupied)
    return pa.table({
        "cell": pa.array(out, pa.int64()),
        "dist": pa.array([dist[t] for t in out], pa.int64()),
    })


def clark_evans(ds, *, res: int, max_dist: int = 3,
                cell_col: str = "cell", n_buckets: int = 8) -> pa.Table:
    """CLARK-EVANS nearest-neighbor index (Clark & Evans 1954) of the
    OCCUPIED-cell pattern under the grid (Chebyshev) metric: for each
    occupied cell, the ring distance to its nearest other occupied
    cell (within ``max_dist`` rings — farther cells are counted in
    ``n_far`` but excluded from the mean, the bounded-search
    contract); then

        R = mean_nn / (0.5 · sqrt(M / n))

    with M the full grid size and n the occupied count.  R < 1 =
    clustered, ~1 = CSR, > 1 = dispersed (toward the max 2.149).
    sum_d / n_found are exact ints; the one float shape is
    (sum_d / n_found) / (0.5 · sqrt(M / n)), mirrored term for term.
    Output one row (n_occ, n_found, n_far, sum_d, m_cells, r_ce)."""
    import math

    cells_, _x = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    m = ncols * nrows
    n = len(cells_)
    if n == 0:
        return pa.table({
            "n_occ": pa.array([0], pa.int64()),
            "n_found": pa.array([0], pa.int64()),
            "n_far": pa.array([0], pa.int64()),
            "sum_d": pa.array([0], pa.int64()),
            "m_cells": pa.array([m], pa.int64()),
            "r_ce": pa.array([None], pa.float64())})
    nx = cells_ % ncols
    ny = cells_ // ncols
    best = np.full(n, -1, dtype=np.int64)
    for h in range(1, max_dist + 1):
        todo = best < 0
        if not todo.any():
            break
        for dy in range(-h, h + 1):
            for dx in range(-h, h + 1):
                if max(abs(dx), abs(dy)) != h:
                    continue
                ok = todo & ((nx + dx >= 0) & (nx + dx < ncols)
                             & (ny + dy >= 0) & (ny + dy < nrows))
                t = cells_ + dy * ncols + dx
                found, _pos = _probe(cells_, np.where(ok, t, cells_[0]))
                hit = ok & found
                best[hit & (best < 0)] = h
    found_m = best >= 0
    n_found = int(found_m.sum())
    sum_d = int(best[found_m].sum())
    r_ce = None
    if n_found > 0 and n > 0:
        r_ce = ((float(sum_d) / float(n_found))
                / (0.5 * math.sqrt(float(m) / float(n))))
    return pa.table({
        "n_occ": pa.array([n], pa.int64()),
        "n_found": pa.array([n_found], pa.int64()),
        "n_far": pa.array([n - n_found], pa.int64()),
        "sum_d": pa.array([sum_d], pa.int64()),
        "m_cells": pa.array([m], pa.int64()),
        "r_ce": pa.array([r_ce], pa.float64())})


def proximity_label(ds, *, res: int, max_dist: int = 3,
                    cell_col: str = "cell",
                    n_buckets: int = 8) -> pa.Table:
    """Nearest-facility assignment (the gdal_proximity ``-values`` /
    discrete-Voronoi analog): for every EMPTY cell within ``max_dist``
    rings, the ring distance AND the id of the nearest occupied cell —
    ties at equal ring distance break to the SMALLEST source cell id
    (deterministic, SQL-mirrorable).  Output (cell, dist, nearest)."""
    cells_, _x = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    nx = cells_ % ncols
    ny = cells_ // ncols

    dist: dict[int, int] = {}
    near: dict[int, int] = {}
    for h in range(1, max_dist + 1):
        ring_min: dict[int, int] = {}
        for dy in range(-h, h + 1):
            for dx in range(-h, h + 1):
                if max(abs(dx), abs(dy)) != h:
                    continue
                ok = ((nx + dx >= 0) & (nx + dx < ncols)
                      & (ny + dy >= 0) & (ny + dy < nrows))
                src = np.flatnonzero(ok)
                for sc, t in zip(cells_[src].tolist(),
                                 (cells_[src] + dy * ncols
                                  + dx).tolist()):
                    if t in dist:
                        continue  # already assigned at a closer ring
                    prev = ring_min.get(t)
                    if prev is None or sc < prev:
                        ring_min[t] = sc
        for t, sc in ring_min.items():
            dist[t] = h
            near[t] = sc
    occupied = set(cells_.tolist())
    out = sorted(t for t in dist if t not in occupied)
    return pa.table({
        "cell": pa.array(out, pa.int64()),
        "dist": pa.array([dist[t] for t in out], pa.int64()),
        "nearest": pa.array([near[t] for t in out], pa.int64()),
    })


def colocation_counts(ds, *, res: int, mark_col: str,
                      cell_col: str = "cell",
                      n_buckets: int = 8) -> pa.Table:
    """Join-count statistics (the categorical Moran analog): label
    each occupied cell with its MAJORITY mark (count desc, mark asc on
    ties — the deterministic mode rule), then count rook-adjacent cell
    pairs per unordered mark pair.  BB/BW join counts read off the
    diagonal/off-diagonal.  All integers.  Output (ma, mb, n_pairs)
    with ma <= mb, sorted."""
    def partial(b: pa.Table) -> pa.Table:
        g = b.column(mark_col).to_numpy(zero_copy_only=False)
        c = b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = (pd.DataFrame({"cell": c, "m": g})
              .groupby(["cell", "m"], as_index=False).size()
              .rename(columns={"size": "n"}))
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def fold(f: pd.DataFrame) -> pd.DataFrame:
        return f.groupby(["cell", "m"], as_index=False)["n"].sum()

    cm = bucketed_groupby(parts, ["cell", "m"], fold,
                          n_buckets=n_buckets).to_pandas()
    cm = cm.sort_values(["cell", "n", "m"],
                        ascending=[True, False, True], kind="mergesort")
    top = cm.drop_duplicates("cell", keep="first")
    cells_ = top["cell"].to_numpy().astype(np.int64)
    order = np.argsort(cells_, kind="mergesort")
    cells_ = cells_[order]
    marks = np.asarray(top["m"].tolist(), dtype=object)[order]

    ncols, nrows = _grid_dims(res)
    nx = cells_ % ncols
    ny = cells_ // ncols
    pair_counts: dict[tuple, int] = {}
    for off, ok in ((1, nx < ncols - 1), (ncols, ny < nrows - 1)):
        src = np.flatnonzero(ok)
        found, pos = _probe(cells_, cells_[src] + off)
        for a, b in zip(marks[src[found]].tolist(),
                        marks[pos[found]].tolist()):
            key = (a, b) if a <= b else (b, a)
            pair_counts[key] = pair_counts.get(key, 0) + 1
    keys = sorted(pair_counts)
    return pa.table({
        "ma": pa.array([k[0] for k in keys]),
        "mb": pa.array([k[1] for k in keys]),
        "n_pairs": pa.array([pair_counts[k] for k in keys], pa.int64()),
    })


def join_count_stats(ds, *, res: int, cell_col: str = "cell",
                     n_buckets: int = 8) -> pa.Table:
    """Binary join-count statistics (Cliff & Ord 1981) over the
    occupancy histogram: marker B(lack) = cells with count STRICTLY
    above the occupied-cell mean (integer predicate n*x > S, no
    division), W(hite) otherwise; rook adjacency, directed-once pair
    counts BB / WW / BW.  ``e_bb`` is the free-sampling expectation
    W_d * nB*(nB-1) / (n*(n-1)) — ONE float division of exact ints.
    Output one row (n_cells, n_black, w_pairs, bb, ww, bw, e_bb)."""
    cells_, x = _histogram(ds, cell_col, n_buckets)
    n = int(len(cells_))
    s = _isum(x)
    mx = int(np.abs(x).max()) if n else 0
    if n * mx < (1 << 62):
        black = (n * x) > s
    else:
        black = np.array([n * int(a) > s for a in x.tolist()], dtype=bool)
    nb = int(black.sum())
    ncols, nrows = _grid_dims(res)
    nx = cells_ % ncols
    ny = cells_ // ncols
    wd, bb, ww, bw = 0, 0, 0, 0
    for off, ok in ((1, nx < ncols - 1), (ncols, ny < nrows - 1)):
        src = np.flatnonzero(ok)
        found, pos = _probe(cells_, cells_[src] + off)
        bi = black[src[found]]
        bj = black[pos[found]]
        wd += int(found.sum())
        bb += int((bi & bj).sum())
        ww += int((~bi & ~bj).sum())
        bw += int((bi ^ bj).sum())
    e_bb = (float(wd * nb * (nb - 1)) / float(n * (n - 1))
            if n > 1 else None)
    return pa.table({
        "n_cells": pa.array([n], pa.int64()),
        "n_black": pa.array([nb], pa.int64()),
        "w_pairs": pa.array([2 * wd], pa.int64()),
        "bb": pa.array([bb], pa.int64()),
        "ww": pa.array([ww], pa.int64()),
        "bw": pa.array([bw], pa.int64()),
        "e_bb": pa.array([e_bb], pa.float64()),
    })


def eb_rates(ds, *, res: int, cell_col: str = "cell",
             value_col: str, m: int = 20,
             n_buckets: int = 8) -> pa.Table:
    """Empirical-Bayes rate smoothing (the choropleth rate-stabilizer,
    Marshall 1991 shape): per-cell raw rate v/x shrunk toward the
    global rate theta = SV/SX with pseudo-count strength ``m``:

        smoothed = (v + m * theta) / (x + m)

    x = per-cell record count, v = per-cell integer ``value_col`` sum;
    theta and each smoothed rate are the ONLY float operations and
    share one parenthesization with the SQL mirror.  Output
    (cell, x, v, raw, smoothed) sorted by cell."""

    def partial(b: pa.Table) -> pa.Table:
        c = b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        xs = np.zeros(len(u), dtype=np.int64)
        vs = np.zeros(len(u), dtype=np.int64)
        np.add.at(xs, inv, 1)
        np.add.at(vs, inv, v)
        return pa.table({"cell": pa.array(u), "x": pa.array(xs),
                         "v": pa.array(vs)})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("cell", as_index=False)[["x", "v"]].sum()

    df = bucketed_groupby(parts, ["cell"], fold,
                          n_buckets=n_buckets).to_pandas()
    df = df.sort_values("cell", kind="mergesort")
    cells_ = df["cell"].to_numpy().astype(np.int64)
    x = df["x"].to_numpy().astype(np.int64)
    v = df["v"].to_numpy().astype(np.int64)
    sx = _isum(x)
    sv = _isum(v)
    theta = float(sv) / float(sx) if sx else 0.0
    raw = [float(int(a)) / float(int(b)) for a, b in
           zip(v.tolist(), x.tolist())]
    smoothed = [(float(int(a)) + m * theta) / float(int(b) + m)
                for a, b in zip(v.tolist(), x.tolist())]
    return pa.table({
        "cell": pa.array(cells_),
        "x": pa.array(x),
        "v": pa.array(v),
        "raw": pa.array(raw, pa.float64()),
        "smoothed": pa.array(smoothed, pa.float64()),
    })


def semivariogram(ds, *, res: int, max_lag: int = 3,
                  cell_col: str = "cell", n_buckets: int = 8) -> pa.Table:
    """Empirical semivariogram over Chebyshev cell-ring lags 1..max_lag:
    gamma(h) = SSD_h / (2 * N_h) over occupied unordered pairs at ring
    distance h.  Output (h, n_pairs, ssd, gamma)."""
    cells_, x = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    nx = cells_ % ncols
    ny = cells_ // ncols

    hs, ns, ssds, gammas = [], [], [], []
    for h in range(1, max_lag + 1):
        n_h, ssd = 0, 0
        for dy in range(0, h + 1):
            for dx in range(-h, h + 1):
                if max(abs(dx), abs(dy)) != h:
                    continue
                if dy == 0 and dx <= 0:  # directed-once
                    continue
                ok = (nx + dx >= 0) & (nx + dx < ncols) & (ny + dy < nrows)
                src = np.flatnonzero(ok)
                found, pos = _probe(cells_, cells_[src] + dy * ncols + dx)
                n_h += int(found.sum())
                ssd += _exact_sq_diff(x[src[found]], x[pos[found]])
        hs.append(h)
        ns.append(n_h)
        ssds.append(ssd)
        gammas.append(float(ssd) / float(2 * n_h) if n_h else None)
    return pa.table({
        "h": pa.array(hs, pa.int64()),
        "n_pairs": pa.array(ns, pa.int64()),
        "ssd": pa.array(ssds, pa.int64()),
        "gamma": pa.array(gammas, pa.float64()),
    })


def mann_kendall(ds, *, cell_col: str = "cell", bin_col: str = "bin",
                 n_buckets: int = 8) -> "object":
    """Per-cell MANN-KENDALL trend test over time-binned counts — the
    emerging-hotspot trend primitive (Mann 1945; Kendall 1975): for
    each cell, over its OCCUPIED time bins' counts x_t,

        S     = Σ_{i<j} sign(x_j - x_i)          (bins ordered)
        var18 = T(T-1)(2T+5) - Σ_ties t(t-1)(2t+5)   (= 18 * Var(S))
        z     = (S -/+ 1) / sqrt(var18 / 18)     (0 when S = 0)

    S / var18 are exact integers (pair signs, tie-corrected variance
    numerator kept times 18 so no division happens in integers); z is
    ONE shared float shape, so the SQL mirror VALUE-checks.  Plan: one
    combiner-first shuffle to (cell, bin, x), bins co-located per cell
    (bucket key = cell), per-cell T² sign sums vectorized (T = bins
    per cell, bounded by the binning).  Returns a lazy Dataset
    (cell, t_bins, s_stat, var18, z)."""
    import math

    def partial(b: pa.Table) -> pa.Table:
        c = b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column(bin_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"cell": c, "bin": t})
        df["x"] = np.int64(1)
        agg = df.groupby(["cell", "bin"], sort=False, as_index=False)[
            "x"].sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["cell", "bin"], as_index=False)["x"].sum()
        g = g.sort_values(["cell", "bin"], kind="mergesort")
        cells_, t_bins, s_stat, var18, z = [], [], [], [], []
        for cell, grp in g.groupby("cell", sort=False):
            x = grp["x"].to_numpy().astype(np.int64)
            T = len(x)
            d = np.sign(x[None, :] - x[:, None])
            s = int(np.triu(d, 1).sum())
            _, tc = np.unique(x, return_counts=True)
            tc = tc.astype(np.int64)
            tie18 = int((tc * (tc - 1) * (2 * tc + 5)).sum())
            v18 = T * (T - 1) * (2 * T + 5) - tie18
            num = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
            zv = (float(num) / math.sqrt(float(v18) / 18.0)
                  if v18 > 0 else None)
            cells_.append(cell)
            t_bins.append(T)
            s_stat.append(s)
            var18.append(v18)
            z.append(zv)
        return pd.DataFrame({
            "cell": np.asarray(cells_, np.int64),
            "t_bins": np.asarray(t_bins, np.int64),
            "s_stat": np.asarray(s_stat, np.int64),
            "var18": np.asarray(var18, np.int64),
            "z": np.asarray(z, np.float64)})

    return bucketed_groupby(parts, ["cell"], fold, n_buckets=n_buckets)


def uniformity_chi2(ds, *, cell_col: str = "cell",
                    cat_col: str = "cat", k: int = 7,
                    n_buckets: int = 8) -> "object":
    """Pearson CHI-SQUARE uniformity test per cell over ``k``
    categories (the day-of-week seasonality screen): with per-category
    counts o_j (absent categories are REAL zeros) and n = Σ o_j,

        chi2 = Σ_j (o_j − n/k)² / (n/k) = Σ_j (k·o_j − n)² / (k·n)

    — the numerator i_num = Σ_j (k·o_j − n)² is an exact integer
    (zero categories contribute n² each), chi2 = i_num / (k·n) is the
    ONE shared float.  df = k−1 for the caller.  Same plan as
    mann_kendall: one combiner-first (cell, cat) histogram shuffle,
    bounded per-cell finale.  Returns (cell, n, i_num, chi2)."""

    def partial(b: pa.Table) -> pa.Table:
        c = b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column(cat_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"cell": c, "cat": t})
        df["x"] = np.int64(1)
        agg = df.groupby(["cell", "cat"], sort=False, as_index=False)[
            "x"].sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["cell", "cat"], as_index=False)["x"].sum()
        cells_, ns, inum, chi2 = [], [], [], []
        for cell, grp in g.groupby("cell", sort=False):
            o = [int(v) for v in grp["x"]]
            n = sum(o)
            i = sum((k * v - n) ** 2 for v in o) \
                + (k - len(o)) * n * n
            cells_.append(cell)
            ns.append(n)
            inum.append(i)
            chi2.append(float(i) / float(k * n) if n > 0 else 0.0)
        return pd.DataFrame({
            "cell": np.asarray(cells_, np.int64),
            "n": np.asarray(ns, np.int64),
            "i_num": np.asarray(inum, np.int64),
            "chi2": np.asarray(chi2, np.float64)})

    return bucketed_groupby(parts, ["cell"], fold, n_buckets=n_buckets)


def haar_energy(ds, *, cell_col: str = "cell", bin_col: str = "bin",
                levels: int = 5, n_buckets: int = 8) -> "object":
    """UNNORMALIZED HAAR wavelet energy spectrum per cell over the
    time-binned count series (the multi-scale burst detector): the
    series is the dense window of 2^levels bins starting at the GLOBAL
    min bin (zeros filled, later bins dropped); level l in 1..levels
    halves the previous approximation

        a_l[k] = a_{l-1}[2k] + a_{l-1}[2k+1]
        d_l[k] = a_{l-1}[2k] − a_{l-1}[2k+1]
        energy_l = Σ_k d_l[k]²

    — all exact int64 (no 1/√2 normalization), so the per-level sums
    are order-free and the oracle is a chained GROUP BY t//2 with a
    sign CASE.  Plan: one combiner-first (cell, bin) histogram
    shuffle; the global origin comes from the same partials; the
    finale is grid-bounded.  Returns (cell, level, energy) long-form,
    levels 1 (finest) .. ``levels``."""
    W = 1 << levels

    def partial(b: pa.Table) -> pa.Table:
        c = b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column(bin_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"cell": c, "bin": t})
        df["x"] = np.int64(1)
        agg = df.groupby(["cell", "bin"], sort=False, as_index=False)[
            "x"].sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    mins = parts.map_batches(
        lambda b: pa.table({"m": pa.array(
            [int(b.column("bin").to_numpy(zero_copy_only=False).min())]
            if len(b) else [], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    if not len(mins):
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "cell": pa.array([], pa.int64()),
            "level": pa.array([], pa.int64()),
            "energy": pa.array([], pa.int64())}))
    origin = int(mins["m"].min())

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["cell", "bin"], as_index=False)["x"].sum()
        t = g["bin"].to_numpy().astype(np.int64) - origin
        keep = (t >= 0) & (t < W)
        g = g[keep]
        t = t[keep]
        cells_, lvls, es = [], [], []
        for cell, grp in g.groupby("cell", sort=False):
            v = np.zeros(W, np.int64)
            v[grp["bin"].to_numpy().astype(np.int64) - origin] = \
                grp["x"].to_numpy().astype(np.int64)
            a = v
            for lv in range(1, levels + 1):
                ev, od = a[0::2], a[1::2]
                d = ev - od
                a = ev + od
                cells_.append(cell)
                lvls.append(lv)
                es.append(int((d * d).sum()))
        return pd.DataFrame({
            "cell": np.asarray(cells_, np.int64),
            "level": np.asarray(lvls, np.int64),
            "energy": np.asarray(es, np.int64)})

    return bucketed_groupby(parts, ["cell"], fold, n_buckets=n_buckets)


THEIL_SCALE = 1 << 20


def theil_sen(ds, *, cell_col: str = "cell", bin_col: str = "bin",
              scale: int = THEIL_SCALE, n_buckets: int = 8) -> "object":
    """Per-cell THEIL-SEN slope estimator over time-binned counts —
    the robust companion of mann_kendall (Theil 1950; Sen 1968): for
    each cell, over its occupied bins' counts x_t, the slope is the
    MEDIAN of all pairwise slopes (x_j - x_i) / (bin_j - bin_i), i<j.

    Slopes are QUANTIZED as floor(dy * scale / dx) so the median is an
    exact integer pick (sorted index (n-1)//2 — the lower median, the
    ROW_NUMBER rn = (n+1)//2 element in SQL); dx > 0 always, and the
    floor-div mirrors in SQL via the nonneg-remainder identity
    (DuckDB // truncates).  ``slope`` = slope_q / scale is the ONE
    shared float.  Same plan as mann_kendall: one combiner-first
    shuffle to (cell, bin, x), per-cell T² pair slopes vectorized.
    Cells with a single occupied bin (no pairs) are dropped.
    Returns (cell, t_bins, n_pairs, slope_q, slope)."""

    def partial(b: pa.Table) -> pa.Table:
        c = b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column(bin_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"cell": c, "bin": t})
        df["x"] = np.int64(1)
        agg = df.groupby(["cell", "bin"], sort=False, as_index=False)[
            "x"].sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    fscale = float(scale)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["cell", "bin"], as_index=False)["x"].sum()
        g = g.sort_values(["cell", "bin"], kind="mergesort")
        cells_, t_bins, n_pairs, slope_q = [], [], [], []
        for cell, grp in g.groupby("cell", sort=False):
            x = grp["x"].to_numpy().astype(np.int64)
            bins = grp["bin"].to_numpy().astype(np.int64)
            T = len(x)
            if T < 2:
                continue
            iu, ju = np.triu_indices(T, 1)
            sq = ((x[ju] - x[iu]) * scale) // (bins[ju] - bins[iu])
            sq.sort(kind="mergesort")
            cells_.append(cell)
            t_bins.append(T)
            n_pairs.append(len(sq))
            slope_q.append(int(sq[(len(sq) - 1) // 2]))
        return pd.DataFrame({
            "cell": np.asarray(cells_, np.int64),
            "t_bins": np.asarray(t_bins, np.int64),
            "n_pairs": np.asarray(n_pairs, np.int64),
            "slope_q": np.asarray(slope_q, np.int64),
            "slope": np.asarray([float(v) / fscale for v in slope_q],
                                np.float64)})

    return bucketed_groupby(parts, ["cell"], fold, n_buckets=n_buckets)


def knox_test(ds, *, res: int, tau_us: int, cell_col: str = "cell",
              ts_col: str = "tu", id_col: str = "eid",
              n_buckets: int = 8) -> pa.Table:
    """KNOX space-time interaction test (Knox 1964, the outbreak /
    burst-cluster screen): over event points,

        X  = #pairs close in SPACE (same or 8-adjacent grid cell) AND
             TIME (|Δt| <= tau)
        Ns = #space-close pairs,  Nt = #time-close pairs
        E[X] = Ns * Nt / C(n, 2)   (permutation expectation)

    All pair counts are exact integers; E[X] is ONE float division.
    Plan (the PBSM discipline, pairs counted once at the MIN cell/bin):
    X — each event ships to its own cell plus lower-id neighbor cells,
    per-bucket counts use time-sorted searchsorted windows (no pair
    materialization); Ns — grid-bounded histogram arithmetic
    driver-side; Nt — the same 1-D window count over tau-width time
    bins.  The corpus shuffles once per statistic, never as pairs.
    Output one row (n, ns, nt, x, ex)."""
    ncols, nrows = _grid_dims(res)

    # ---- X: space-and-time-close pairs ------------------------------
    def rep_partial(b: pa.Table) -> pa.Table:
        c = b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        e = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        nx = c % ncols
        ny = c // ncols
        bks, ocs, ots, oes = [c], [c], [t], [e]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                ok = ((nx + dx >= 0) & (nx + dx < ncols)
                      & (ny + dy >= 0) & (ny + dy < nrows))
                tgt = c + dy * ncols + dx
                m = ok & (tgt < c)   # replicate only to SMALLER cells
                bks.append(tgt[m])
                ocs.append(c[m])
                ots.append(t[m])
                oes.append(e[m])
        return pa.table({
            "bk": pa.array(np.concatenate(bks)),
            "cell": pa.array(np.concatenate(ocs)),
            "tu": pa.array(np.concatenate(ots)),
            "eid": pa.array(np.concatenate(oes))})

    def bucket_count(g: pd.DataFrame, key: str, tau: int) -> int:
        """Pairs within tau counted once at the min-``key`` bucket:
        native-native unordered pairs + native-foreign pairs."""
        total = 0
        for bk, grp in g.groupby("bk", sort=False):
            t_all = np.sort(grp["tu"].to_numpy().astype(np.int64))
            nat = grp[grp[key].to_numpy() == bk]
            t_nat = np.sort(nat["tu"].to_numpy().astype(np.int64))
            if not len(t_nat):
                continue
            w_all = (np.searchsorted(t_all, t_nat + tau, "right")
                     - np.searchsorted(t_all, t_nat - tau, "left"))
            w_nat = (np.searchsorted(t_nat, t_nat + tau, "right")
                     - np.searchsorted(t_nat, t_nat - tau, "left"))
            foreign = int((w_all - w_nat).sum())
            nat_pairs = int((w_nat - 1).sum()) // 2
            total += foreign + nat_pairs
        return total

    reps = ds.map_batches(rep_partial, batch_format="pyarrow")

    def x_fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"x": [bucket_count(g, "cell", tau_us)]})

    x_parts = bucketed_groupby(reps, ["bk"], x_fold,
                               n_buckets=n_buckets).to_pandas()
    x = int(x_parts["x"].sum()) if len(x_parts) else 0

    # ---- Ns: all space-close pairs (histogram arithmetic) -----------
    cells_, xh = _histogram(ds, cell_col, n_buckets)
    ns = 0
    for v in xh.tolist():
        ns += v * (v - 1) // 2
    nx = cells_ % ncols
    ny = cells_ // ncols
    for dy in (0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx <= 0:   # directed-once
                continue
            ok = ((nx + dx >= 0) & (nx + dx < ncols) & (ny + dy < nrows))
            src = np.flatnonzero(ok)
            found, pos = _probe(cells_, cells_[src] + dy * ncols + dx)
            ns += _exact_dot(xh[src[found]], xh[pos[found]])

    # ---- Nt: all time-close pairs (1-D tau bins, same counting) -----
    def tbin_partial(b: pa.Table) -> pa.Table:
        t = b.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bn = t // tau_us
        # every event ships to its bin (native) and the bin below
        # (foreign copy): a |dt| <= tau pair spans at most one boundary
        return pa.table({
            "bk": pa.array(np.concatenate([bn, bn - 1])),
            "bin": pa.array(np.concatenate([bn, bn])),
            "tu": pa.array(np.concatenate([t, t]))})

    tb = ds.map_batches(tbin_partial, batch_format="pyarrow")

    def t_fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"x": [bucket_count(g, "bin", tau_us)]})

    t_parts = bucketed_groupby(tb, ["bk"], t_fold,
                               n_buckets=n_buckets).to_pandas()
    nt = int(t_parts["x"].sum()) if len(t_parts) else 0

    n = int(_isum(xh))
    npairs = n * (n - 1) // 2
    ex = float(ns * nt) / float(npairs) if npairs else None
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "ns": pa.array([ns], pa.int64()),
        "nt": pa.array([nt], pa.int64()),
        "x": pa.array([x], pa.int64()),
        "ex": pa.array([ex], pa.float64())})


# D8 neighbor order: dir index breaks steepest-descent ties, so the
# enumeration below is part of the operator contract (the SQL oracle
# carries the identical (dir, dx, dy) VALUES table).
D8_DIRS = ((0, 1, 0), (1, 1, 1), (2, 0, 1), (3, -1, 1),
           (4, -1, 0), (5, -1, -1), (6, 0, -1), (7, 1, -1))


def _d8_flow(cells_: np.ndarray, h: np.ndarray, ncols: int, nrows: int):
    """D8 steepest-descent drainage directions over the occupied-cell
    table: each cell's receiver is its lowest occupied 8-neighbor with
    strictly smaller height, ties broken by the fixed ``D8_DIRS``
    order.  Returns (flow_ix, flow_to): positional index and cell id
    of the receiver, -1 for sinks."""
    n = len(cells_)
    x = cells_ % ncols
    y = cells_ // ncols
    flow_ix = np.full(n, -1, dtype=np.int64)
    flow_to = np.full(n, -1, dtype=np.int64)
    best_nh = np.zeros(n, dtype=np.int64)
    has = np.zeros(n, dtype=bool)
    for _dir, dx, dy in D8_DIRS:
        tx, ty = x + dx, y + dy
        inb = (tx >= 0) & (tx < ncols) & (ty >= 0) & (ty < nrows)
        t = ty * ncols + tx
        found, pos = _probe(cells_, np.where(inb, t, cells_[0]))
        found &= inb
        nh = h[pos]
        cand = found & (nh < h)
        better = cand & (~has | (nh < best_nh))
        flow_ix[better] = pos[better]
        flow_to[better] = t[better]
        best_nh[better] = nh[better]
        has |= cand
    return flow_ix, flow_to


def flow_accumulation(ds, *, res: int, rounds: int = 6,
                      cell_col: str = "cell", n_buckets: int = 8):
    """D8 FLOW ACCUMULATION (the rio-terrain / hydrology primitive)
    over the occupied-cell histogram as the DEM: each occupied cell
    drains to its lowest occupied 8-neighbor with strictly smaller
    height (height = per-cell count; ties by the fixed ``D8_DIRS``
    order), sinks keep their water, and ``rounds`` Jacobi rounds of

        acc_i(v) = 1 + SUM_{u -> v} acc_{i-1}(u)

    count the upstream cells within ``rounds`` steps (heights strictly
    decrease along flow, so the drainage graph is a DAG and acc
    converges once rounds >= the longest flow path).  Returns
    (cell, h, flow_to, acc) with flow_to = -1 for sinks — all int64.

    100-TB shape: the ONE shuffle is the combiner-first cell histogram
    (``cell_counts``); the drainage kernel runs on the GRID-bounded
    (cell, h) table — the same bounded-finale contract as every
    statistic in this module."""
    import ray.data as rd

    cells_, h = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    n = len(cells_)
    if n == 0:
        return rd.from_arrow(pa.table({
            "cell": pa.array([], pa.int64()), "h": pa.array([], pa.int64()),
            "flow_to": pa.array([], pa.int64()),
            "acc": pa.array([], pa.int64())}))
    flow_ix, flow_to = _d8_flow(cells_, h, ncols, nrows)
    acc = np.ones(n, dtype=np.int64)
    m = flow_ix >= 0
    tgt = flow_ix[m]
    for _ in range(rounds):
        new = np.ones(n, dtype=np.int64)
        np.add.at(new, tgt, acc[m])
        acc = new
    return rd.from_arrow(pa.table({
        "cell": pa.array(cells_), "h": pa.array(h),
        "flow_to": pa.array(flow_to), "acc": pa.array(acc)}))


def ruggedness_index(ds, *, res: int, cell_col: str = "cell",
                     n_buckets: int = 8) -> "object":
    """TERRAIN RUGGEDNESS INDEX (Riley et al. 1999) over the
    occupancy-histogram DEM: per occupied cell, the square root of the
    sum of squared height differences to its OCCUPIED 8-neighbors
    (sparse-DEM convention — missing neighbors contribute nothing;
    isolated cells get tri = 0 with n_nbrs = 0).

        tri2 = Σ_nbr (h − h_nbr)²   (exact int64)
        tri  = sqrt(tri2)           (the one float; sqrt is
                                     correctly-rounded IEEE)

    Same plan as every statistic here: ONE combiner-first cell
    histogram shuffle, then the grid-bounded probe kernel.  Returns
    (cell, h, n_nbrs, tri2, tri)."""
    import math

    import ray.data as rd

    cells_, h = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    n = len(cells_)
    if n == 0:
        return rd.from_arrow(pa.table({
            "cell": pa.array([], pa.int64()), "h": pa.array([], pa.int64()),
            "n_nbrs": pa.array([], pa.int64()),
            "tri2": pa.array([], pa.int64()),
            "tri": pa.array([], pa.float64())}))
    x = cells_ % ncols
    y = cells_ // ncols
    tri2 = np.zeros(n, dtype=np.int64)
    nnb = np.zeros(n, dtype=np.int64)
    for _dir, dx, dy in D8_DIRS:
        tx, ty = x + dx, y + dy
        inb = (tx >= 0) & (tx < ncols) & (ty >= 0) & (ty < nrows)
        t = ty * ncols + tx
        found, pos = _probe(cells_, np.where(inb, t, cells_[0]))
        found &= inb
        d = h - h[pos]
        tri2[found] += d[found] * d[found]
        nnb[found] += 1
    return rd.from_arrow(pa.table({
        "cell": pa.array(cells_), "h": pa.array(h),
        "n_nbrs": pa.array(nnb), "tri2": pa.array(tri2),
        "tri": pa.array([math.sqrt(float(v)) for v in tri2.tolist()],
                        pa.float64())}))


def watershed_label(ds, *, res: int, jump_rounds: int = 6,
                    cell_col: str = "cell", n_buckets: int = 8):
    """WATERSHED (drainage-basin) labeling over the occupancy-histogram
    DEM: every occupied cell is labeled with the SINK its D8
    steepest-descent path reaches (same receiver rule as
    flow_accumulation — strictly-lower lowest 8-neighbor, fixed
    ``D8_DIRS`` tie order; sinks label themselves), plus the basin
    size.  The label is computed by ``jump_rounds`` POINTER-JUMPING
    rounds (p <- p[p]), covering paths up to 2^jump_rounds steps —
    the round count is part of the operator contract, mirrored by the
    chained pointer-doubling CTEs in the oracle (heights strictly
    decrease along flow, so real paths are short and the default 64
    steps converges on any realistic DEM).

    100-TB shape: identical to flow_accumulation — ONE combiner-first
    cell-histogram shuffle, then the grid-bounded kernel.  Returns
    (cell, h, sink, basin_n) all int64."""
    import ray.data as rd

    cells_, h = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    n = len(cells_)
    if n == 0:
        return rd.from_arrow(pa.table({
            "cell": pa.array([], pa.int64()), "h": pa.array([], pa.int64()),
            "sink": pa.array([], pa.int64()),
            "basin_n": pa.array([], pa.int64())}))
    flow_ix, _flow_to = _d8_flow(cells_, h, ncols, nrows)
    parent = np.arange(n, dtype=np.int64)
    m = flow_ix >= 0
    parent[m] = flow_ix[m]
    for _ in range(jump_rounds):
        parent = parent[parent]
    counts = np.bincount(parent, minlength=n).astype(np.int64)
    return rd.from_arrow(pa.table({
        "cell": pa.array(cells_), "h": pa.array(h),
        "sink": pa.array(cells_[parent]),
        "basin_n": pa.array(counts[parent])}))


def hausdorff_cells(ds, *, res: int, max_dist: int, group_a, group_b,
                    group_col: str = "g", cell_col: str = "cell",
                    n_buckets: int = 8) -> pa.Table:
    """GRID Hausdorff distance between two point patterns (Huttenlocher
    1993's shape-comparison metric, run on the occupancy grid): both
    groups reduce to their DISTINCT occupied-cell sets (one bucketed
    shuffle, GRID-bounded state), then each directed distance

        h(A, B) = max_{a in A} min_{b in B} d_chebyshev(a, b)

    comes from a bounded ring search — ring 0 is the shared-cell
    probe, rings 1..max_dist scan outward on the sorted other-set
    array; cells with no opposite-set cell within ``max_dist`` are
    counted in ``n_far_*`` and excluded from the max (the clark_evans
    bounded-search contract).  All integers.  Output one row
    (n_a, n_b, h_ab, h_ba, hausdorff, n_far_ab, n_far_ba);
    h = 0 when a side finds nothing (COALESCE discipline)."""

    def partial(b: pa.Table) -> pa.Table:
        gc = b.column(group_col)
        c = b.column(cell_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = []
        for tag, name in ((group_a, "a"), (group_b, "b")):
            m = eq_mask(gc, tag)
            rows.append(pd.DataFrame({"g": name,
                                      "cell": np.unique(c[m])}))
        out = pd.concat(rows, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["g", "cell"])

    pairs = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["g", "cell"], fold, n_buckets=n_buckets).to_pandas()
    a_cells = np.sort(pairs.loc[pairs["g"] == "a", "cell"]
                      .to_numpy().astype(np.int64))
    b_cells = np.sort(pairs.loc[pairs["g"] == "b", "cell"]
                      .to_numpy().astype(np.int64))
    ncols, nrows = _grid_dims(res)

    def directed(src: np.ndarray, dst: np.ndarray):
        n = len(src)
        if n == 0 or len(dst) == 0:
            return 0, n
        nx = src % ncols
        ny = src // ncols
        best = np.full(n, -1, dtype=np.int64)
        # ring 0: shared cell
        found0, _ = _probe(dst, src)
        best[found0] = 0
        for h in range(1, max_dist + 1):
            todo = best < 0
            if not todo.any():
                break
            for dy in range(-h, h + 1):
                for dx in range(-h, h + 1):
                    if max(abs(dx), abs(dy)) != h:
                        continue
                    ok = todo & ((nx + dx >= 0) & (nx + dx < ncols)
                                 & (ny + dy >= 0) & (ny + dy < nrows))
                    t = src + dy * ncols + dx
                    found, _pos = _probe(dst, np.where(ok, t, dst[0]))
                    hit = ok & found
                    best[hit & (best < 0)] = h
        found_m = best >= 0
        h_dir = int(best[found_m].max()) if found_m.any() else 0
        return h_dir, int((~found_m).sum())

    h_ab, far_ab = directed(a_cells, b_cells)
    h_ba, far_ba = directed(b_cells, a_cells)
    return pa.table({
        "n_a": pa.array([len(a_cells)], pa.int64()),
        "n_b": pa.array([len(b_cells)], pa.int64()),
        "h_ab": pa.array([h_ab], pa.int64()),
        "h_ba": pa.array([h_ba], pa.int64()),
        "hausdorff": pa.array([max(h_ab, h_ba)], pa.int64()),
        "n_far_ab": pa.array([far_ab], pa.int64()),
        "n_far_ba": pa.array([far_ba], pa.int64()),
    })


def coverage_by_ring(ds, *, res: int, max_dist: int,
                     cell_col: str = "cell",
                     n_buckets: int = 8) -> pa.Table:
    """ACCESSIBILITY coverage curve: for each ring distance h (0 =
    occupied, 1..max_dist = the proximity transform's bands), how
    many grid cells lie within h of an occupied cell, cumulatively,
    and as a fraction of the FULL grid — the service-area summary a
    siting analysis reads off gdal_proximity.  Pure integers off the
    grid-bounded histogram + the outward scatter; frac = cum/m is the
    one float shape per row.  Output (dist, n_cells, cum_cells,
    frac)."""
    cells_, _x = _histogram(ds, cell_col, n_buckets)
    ncols, nrows = _grid_dims(res)
    m = ncols * nrows
    nx = cells_ % ncols
    ny = cells_ // ncols
    dist: dict[int, int] = {}
    for h in range(1, max_dist + 1):
        for dy in range(-h, h + 1):
            for dx in range(-h, h + 1):
                if max(abs(dx), abs(dy)) != h:
                    continue
                ok = ((nx + dx >= 0) & (nx + dx < ncols)
                      & (ny + dy >= 0) & (ny + dy < nrows))
                for t in (cells_[np.flatnonzero(ok)]
                          + dy * ncols + dx).tolist():
                    dist.setdefault(t, h)
    occupied = set(cells_.tolist())
    per = {h: 0 for h in range(max_dist + 1)}
    per[0] = len(cells_)
    for t, h in dist.items():
        if t not in occupied:
            per[h] += 1
    ds_, ns_, cs_, fs_ = [], [], [], []
    cum = 0
    for h in range(max_dist + 1):
        cum += per[h]
        ds_.append(h)
        ns_.append(per[h])
        cs_.append(cum)
        fs_.append(float(cum) / float(m))
    return pa.table({
        "dist": pa.array(ds_, pa.int64()),
        "n_cells": pa.array(ns_, pa.int64()),
        "cum_cells": pa.array(cs_, pa.int64()),
        "frac": pa.array(fs_, pa.float64())})


def pyramid_counts(ds, *, res: int, deltas: list[int],
                   cell_col: str = "cell", n_buckets: int = 32):
    """Multi-resolution density PYRAMID in ONE pass — the vector-tile
    overview builder (gdaladdo / tippecanoe zoom rollup as a dataflow):
    per input row, occupancy counts at the base resolution AND at every
    coarser level ``res - d`` for d in ``deltas``, all from a single
    combiner-first partial + one bucketed reduce keyed (level, cell).

    Parent derivation is pure integer shift math on the row-major cell
    id (geom/cells.py:parent): at delta d,
    ``pcell = (ny >> d) * ncols_p + (nx >> d)`` — SQL-mirrorable, so a
    level-L row equals the GROUP BY of the base cells under it.  One
    pass instead of one shuffle per level: the partial's output is
    bounded by (levels x occupied cells per block), and coarser levels
    shrink geometrically.

    Output: (level, cell, n) with level = the resolution (res - d),
    sorted upstream of nothing (order-free reduce).
    """
    from ..geom.cells import _grid_dims

    levels = sorted({0, *deltas})
    ncols, _ = _grid_dims(res)

    def partial(b: pa.Table) -> pa.Table:
        c = b.column(cell_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ny, nx = c // ncols, c % ncols
        lvl_out, cell_out, n_out = [], [], []
        for d in levels:
            pncols, _ = _grid_dims(res - d)
            pc = (ny >> d) * pncols + (nx >> d)
            u, cnt = np.unique(pc, return_counts=True)
            lvl_out.append(np.full(len(u), res - d, dtype=np.int64))
            cell_out.append(u)
            n_out.append(cnt.astype(np.int64))
        return pa.table({
            "level": pa.array(np.concatenate(lvl_out)),
            "cell": pa.array(np.concatenate(cell_out)),
            "n": pa.array(np.concatenate(n_out))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["level", "cell"], sort=False,
                        as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["level", "cell"], fold, n_buckets=n_buckets)
