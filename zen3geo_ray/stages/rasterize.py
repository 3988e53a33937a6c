"""Rasterization: the datashader-kernel recast (SURVEY §2 ops #9+#10).

Reference semantics (``/root/reference/zen3geo/datapipes/datashader.py:28-259``):
for each (canvas, vector) pair, dispatch on geometry type — ``canvas.points``
/ ``canvas.line`` / ``canvas.polygons`` — with default agg ``count()`` for
points and ``any()`` for lines/polygons (docstring :49-55), cast bool→uint8
(:244-246), y axis flipped North→South on output (:247-253).

Pixel conventions reproduced exactly (verified against the reference's
golden sums 3/13/15 on the 14x10 canvas,
``zen3geo/tests/test_datapipes_datashader.py:77-104``):

* points: bin = floor((v-lo)/range*n), value==hi lands in the last bin;
* lines: vertices snapped with the same floor map (clamped at hi), then
  integer Bresenham — the polyline fixture touches exactly 13 pixels;
* polygons: even-odd test of the integer pixel-center grid against
  vertices scaled by (n-1)/range — the pentagon fixture fills 15 pixels.

Ray shapes:

* ``rasterize_tile_batches`` — per-tile canvas aggregation: points carry a
  ``tile_id``; a ``groupby(tile_id).map_groups`` histogramming stage emits
  one raster row per tile (dense H*W uint32 payload).
* ``partial_histogram`` + groupby-sum — the sparse/zonal form: per-batch
  partial (tile, py, px, count) rows pre-aggregated inside map_batches so
  the shuffle moves per-pixel partials, not raw points (SURVEY §4.2 —
  partial/combiner before the wide groupby).
* ``burn_geoms_for_tiles`` — vector burning: broadcast WKB geometries
  (ray.put once), per-tile mask rasterization in an actor pool.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import wkb

# --- numpy kernels --------------------------------------------------------


def _bin(vals: np.ndarray, lo: float, hi: float, n: int) -> np.ndarray:
    """Datashader point binning: floor map, hi-edge inclusive, else clip."""
    idx = np.floor((vals - lo) / (hi - lo) * n).astype(np.int64)
    idx[vals == hi] = n - 1
    return idx


def raster_points(
    px,
    py,
    width: int,
    height: int,
    bounds: tuple[float, float, float, float],
    weights=None,
    agg: str = "count",
) -> np.ndarray:
    """Histogram points into a (height, width) grid, row 0 = SOUTH.

    agg: 'count' | 'sum' | 'max' | 'min' | 'any' | 'mean' | 'var' | 'std'
    (all but count/any need weights) — the datashader ``agg=`` reduction
    surface (var/std are population moments, datashader semantics; empty
    pixels are NaN for the float aggs).
    Out-of-range points are dropped (datashader behavior).
    """
    x0, y0, x1, y1 = bounds
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    keep = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
    ix = _bin(px[keep], x0, x1, width)
    iy = _bin(py[keep], y0, y1, height)
    flat = iy * width + ix
    if agg == "count":
        out = np.bincount(flat, minlength=width * height).astype(np.uint32)
        return out.reshape(height, width)
    if agg == "any":
        out = np.zeros(width * height, dtype=np.uint8)
        out[flat] = 1
        return out.reshape(height, width)
    w = np.asarray(weights, dtype=np.float64)[keep]
    if agg == "sum":
        out = np.bincount(flat, weights=w, minlength=width * height)
        return out.reshape(height, width)
    if agg in ("max", "min"):
        fill = -np.inf if agg == "max" else np.inf
        out = np.full(width * height, fill)
        ufunc = np.maximum if agg == "max" else np.minimum
        ufunc.at(out, flat, w)
        out[~np.isfinite(out)] = np.nan
        return out.reshape(height, width)
    if agg in ("mean", "var", "std"):
        cnt = np.bincount(flat, minlength=width * height).astype(np.float64)
        s = np.bincount(flat, weights=w, minlength=width * height)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / cnt  # NaN where the pixel saw no points
            if agg == "mean":
                out = mean
            else:
                ss = np.bincount(flat, weights=w * w, minlength=width * height)
                var = ss / cnt - mean * mean
                out = var if agg == "var" else np.sqrt(var)
        return out.reshape(height, width)
    raise ValueError(f"unknown agg {agg!r}")


def _snap_line(coords: np.ndarray, width, height, bounds) -> np.ndarray:
    x0, y0, x1, y1 = bounds
    sx = width / (x1 - x0)
    sy = height / (y1 - y0)
    xx = ((np.asarray(coords)[:, 0] - x0) * sx).astype(np.int64)
    yy = ((np.asarray(coords)[:, 1] - y0) * sy).astype(np.int64)
    xx[xx == width] = width - 1
    yy[yy == height] = height - 1
    return np.stack([xx, yy], axis=1)


def _bresenham_mask(snapped: np.ndarray, width: int, height: int, out: np.ndarray):
    """Mark Bresenham pixels of a snapped integer polyline into ``out``."""
    for k in range(len(snapped) - 1):
        x, y = int(snapped[k, 0]), int(snapped[k, 1])
        x1, y1 = int(snapped[k + 1, 0]), int(snapped[k + 1, 1])
        dx, dy = abs(x1 - x), abs(y1 - y)
        sx = 1 if x1 > x else -1
        sy = 1 if y1 > y else -1
        err = dx - dy
        while True:
            if 0 <= x < width and 0 <= y < height:
                out[y, x] = 1
            if x == x1 and y == y1:
                break
            e2 = 2 * err
            if e2 > -dy:
                err -= dy
                x += sx
            if e2 < dx:
                err += dx
                y += sy


def raster_lines(lines, width: int, height: int, bounds) -> np.ndarray:
    """any()-rasterize polylines; row 0 = SOUTH."""
    out = np.zeros((height, width), dtype=np.uint8)
    for coords in lines:
        _bresenham_mask(_snap_line(coords, width, height, bounds), width, height, out)
    return out


def raster_polygons(polys, width: int, height: int, bounds) -> np.ndarray:
    """any()-fill polygons (list of rings-lists); row 0 = SOUTH.

    Even-odd scanline over the integer pixel grid with vertices scaled by
    (n-1)/range — the exact-parity convention for the golden sum 15.
    """
    x0, y0, x1, y1 = bounds
    sx = (width - 1) / (x1 - x0)
    sy = (height - 1) / (y1 - y0)
    out = np.zeros((height, width), dtype=np.uint8)
    gx = np.arange(width, dtype=np.float64)
    for rings in polys:
        inside = None
        for ri, ring in enumerate(rings):
            r = np.asarray(ring, dtype=np.float64)
            vx = (r[:, 0] - x0) * sx
            vy = (r[:, 1] - y0) * sy
            # vectorized even-odd: crossings per (row, edge)
            x1e, y1e = vx[:-1], vy[:-1]
            x2e, y2e = vx[1:], vy[1:]
            rows = np.arange(height, dtype=np.float64)[:, None]
            straddle = (y1e > rows) != (y2e > rows)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (x2e - x1e) * (rows - y1e) / (y2e - y1e) + x1e
            # per row: pixel col c inside iff #crossings right of c is odd
            m = np.zeros((height, width), dtype=bool)
            for j in range(height):
                xs = xint[j][straddle[j]]
                if len(xs) == 0:
                    continue
                cnt = (gx[:, None] < xs[None, :]).sum(axis=1)
                m[j] = cnt % 2 == 1
            inside = m if ri == 0 else (inside & ~m)
        out |= inside.astype(np.uint8)
    return out


def rasterize_geoms(
    geoms: list[dict], width: int, height: int, bounds, agg: str | None = None
) -> tuple[np.ndarray, str]:
    """Reference dispatch: geometry dtype -> points/line/polygons kernel.

    Returns (grid row0=NORTH — the reference's North→South flip
    ``datashader.py:247-253`` — , agg used).  Mixed Point/Line/Polygon
    inputs are unsupported exactly like the reference
    (``datashader.py:229-242`` raises on GeometryCollection).
    """
    if not geoms:
        raise ValueError("Cannot infer spatialpandas geometry type from empty vector")
    types = {g["type"].replace("Multi", "") for g in geoms}
    if len(types) > 1 or not types <= {"Point", "LineString", "Polygon"}:
        raise NotImplementedError(f"Unsupported geometry type(s) {types}")
    gtype = types.pop()
    if gtype == "Point":
        agg = agg or "count"
        pts = np.concatenate([np.asarray(g["coords"]).reshape(-1, 2) for g in geoms])
        grid = raster_points(pts[:, 0], pts[:, 1], width, height, bounds, agg=agg)
    elif gtype == "LineString":
        agg = agg or "any"
        lines = []
        for g in geoms:
            lines.extend(g["coords"] if g["type"] == "MultiLineString" else [g["coords"]])
        grid = raster_lines(lines, width, height, bounds)
    else:
        agg = agg or "any"
        polys = []
        for g in geoms:
            polys.extend(g["coords"] if g["type"] == "MultiPolygon" else [g["coords"]])
        grid = raster_polygons(polys, width, height, bounds)
    return grid[::-1], agg  # flip: row 0 = North


# --- Ray Data stages ------------------------------------------------------


def tile_grid_table(
    lon0: float, lat0: float, lon1: float, lat1: float,
    nx: int, ny: int, width: int, height: int, crs: str = "OGC:CRS84",
) -> pa.Table:
    """Generate a tile-spec table covering a bbox (the engine's canvases
    are *generated* grid specs, not extracted — SURVEY §2 #9)."""
    tw = (lon1 - lon0) / nx
    th = (lat1 - lat0) / ny
    tid, xs, ys = [], [], []
    for j in range(ny):
        for i in range(nx):
            tid.append(j * nx + i)
            xs.append(lon0 + i * tw)
            ys.append(lat0 + j * th)
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    return pa.table(
        {
            "tile_id": pa.array(tid, pa.int64()),
            "width": pa.array([width] * len(tid), pa.int32()),
            "height": pa.array([height] * len(tid), pa.int32()),
            "xmin": xs,
            "ymin": ys,
            "xmax": xs + tw,
            "ymax": ys + th,
            "crs": pa.array([crs] * len(tid)),
        }
    )


def canvas_from_raster(batch: pa.Table) -> pa.Table:
    """Grid-spec extraction (SURVEY op #9, ``datashader.py:352-368``):
    raster rows (tile_id/scene_id, height, width, bounds) -> blank canvas
    spec rows with identical plot dims and extent — a pure projection."""
    id_col = "tile_id" if "tile_id" in batch.column_names else "scene_id"
    cols = {
        "tile_id": batch.column(id_col),
        "width": batch.column("width"),
        "height": batch.column("height"),
        "xmin": batch.column("bminx" if "bminx" in batch.column_names else "xmin"),
        "ymin": batch.column("bminy" if "bminy" in batch.column_names else "ymin"),
        "xmax": batch.column("bmaxx" if "bmaxx" in batch.column_names else "xmax"),
        "ymax": batch.column("bmaxy" if "bmaxy" in batch.column_names else "ymax"),
    }
    if "crs" in batch.column_names:
        cols["crs"] = batch.column("crs")
    else:
        cols["crs"] = pa.array(["OGC:CRS84"] * len(batch))
    return pa.table(cols)


def assign_tiles(batch: pa.Table, *, lon0, lat0, lon1, lat1, nx, ny,
                 lon_col="lon", lat_col="lat") -> pa.Table:
    """map_batches fn: add ``tile_id`` for a regular tile grid (arithmetic,
    no lookup — the grid IS the partitioning function)."""
    lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
    lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
    ix = np.clip(np.floor((lon - lon0) / (lon1 - lon0) * nx), 0, nx - 1).astype(np.int64)
    iy = np.clip(np.floor((lat - lat0) / (lat1 - lat0) * ny), 0, ny - 1).astype(np.int64)
    inb = (lon >= lon0) & (lon <= lon1) & (lat >= lat0) & (lat <= lat1)
    tile = np.where(inb, iy * nx + ix, -1)
    return batch.append_column("tile_id", pa.array(tile, pa.int64()))


class TileRasterizer:
    """Per-tile map_groups fn: one group (all points of one tile) ->
    one raster row.  Tile specs are broadcast via ray.put in the caller
    and fetched once per actor here (never re-shipped per batch).

    SMALL-GRID path: a map_groups call per tile is O(#tiles) Python
    overhead and shuffles raw points — right for dozens of tiles (or
    weighted sum/min/max aggs), wrong for thousands.  Large count grids
    route through ``partial_histogram`` + ``assemble_rasters``
    (api.Pipe.rasterize_tiles does this automatically)."""

    def __init__(self, tile_specs_ref=None, tile_specs: pa.Table | None = None,
                 agg: str = "count", value_col: str | None = None):
        if tile_specs is None:
            import ray

            tile_specs = ray.get(tile_specs_ref)
        self.specs = {
            int(r["tile_id"]): r for r in tile_specs.to_pylist()
        }
        self.agg = agg
        if agg in ("sum", "max", "min", "mean", "var", "std") and not value_col:
            raise ValueError(f"agg={agg!r} needs value_col")
        self.value_col = value_col

    def __call__(self, group: pa.Table) -> pa.Table:
        tid = int(group.column("tile_id")[0].as_py())
        spec = self.specs[tid]
        weights = (
            group.column(self.value_col).to_numpy(zero_copy_only=False)
            if self.value_col
            else None
        )
        grid = raster_points(
            group.column("lon").to_numpy(zero_copy_only=False),
            group.column("lat").to_numpy(zero_copy_only=False),
            spec["width"],
            spec["height"],
            (spec["xmin"], spec["ymin"], spec["xmax"], spec["ymax"]),
            weights=weights,
            agg=self.agg,
        )[::-1]  # row 0 = North
        if self.agg in ("count", "any"):
            data = pa.array([grid.ravel().astype(np.uint32)], pa.list_(pa.uint32()))
        else:
            data = pa.array([grid.ravel().astype(np.float64)], pa.list_(pa.float64()))
        return pa.table(
            {
                "tile_id": pa.array([tid], pa.int64()),
                "height": pa.array([grid.shape[0]], pa.int32()),
                "width": pa.array([grid.shape[1]], pa.int32()),
                "data": data,
            }
        )


def partial_histogram(batch: pa.Table, *, tile_specs: dict,
                      lon_col="lon", lat_col="lat") -> pa.Table:
    """map_batches fn: sparse per-batch partial counts (tile_id, py, px, n).

    The scale path: the downstream ``groupby(['tile_id','py','px']).sum('n')``
    moves pre-aggregated pixel partials instead of raw points, so the
    shuffle volume is bounded by touched-pixels x batches, not rows.
    """
    lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
    lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
    tids = batch.column("tile_id").to_numpy(zero_copy_only=False)
    out_t, out_y, out_x, out_n = [], [], [], []
    for tid in np.unique(tids):
        if tid < 0 or int(tid) not in tile_specs:
            continue
        spec = tile_specs[int(tid)]
        sel = tids == tid
        W, H = spec["width"], spec["height"]
        ix = _bin(lon[sel], spec["xmin"], spec["xmax"], W)
        iy = _bin(lat[sel], spec["ymin"], spec["ymax"], H)
        flat, counts = np.unique(iy * W + ix, return_counts=True)
        out_t.append(np.full(len(flat), tid, dtype=np.int64))
        # row 0 = North: py = H-1-iy
        out_y.append((H - 1 - flat // W).astype(np.int64))
        out_x.append((flat % W).astype(np.int64))
        out_n.append(counts.astype(np.int64))
    if not out_t:
        return pa.table({"tile_id": pa.array([], pa.int64()),
                         "py": pa.array([], pa.int64()),
                         "px": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    return pa.table({"tile_id": np.concatenate(out_t),
                     "py": np.concatenate(out_y),
                     "px": np.concatenate(out_x),
                     "n": np.concatenate(out_n)})


def band_normalized_diff(ds, tile_specs: dict, *, band_col: str,
                         band_a, band_b, lon_col: str = "lon",
                         lat_col: str = "lat", n_buckets: int = 16):
    """NDVI-shape map algebra between two CATEGORICAL bands rasterized
    in one pass: per pixel a = count(band == band_a), b = count(band
    == band_b), ndi = (a - b) / (a + b) — the xarray
    ``(b1 - b2) / (b1 + b2)`` band-arithmetic staple over the engine's
    sparse raster rows.  Integer counts (same partial-histogram
    combiner, one bucketed shuffle), ONE float division, NULL where
    a + b = 0 rows never materialize (only touched-by-either pixels
    emit).  Output (tile_id, py, px, a, b, ndi)."""
    import pandas as pd

    from .bucketed import bucketed_groupby

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        tids = batch.column("tile_id").to_numpy(zero_copy_only=False)
        band = np.asarray(batch.column(band_col).to_pylist(),
                          dtype=object)
        in_a = band == band_a
        in_b = band == band_b
        out = {"tile_id": [], "py": [], "px": [], "a": [], "b": []}
        for tid in np.unique(tids):
            if tid < 0 or int(tid) not in tile_specs:
                continue
            spec = tile_specs[int(tid)]
            sel = (tids == tid) & (in_a | in_b)
            if not sel.any():
                continue
            W, H = spec["width"], spec["height"]
            ix = _bin(lon[sel], spec["xmin"], spec["xmax"], W)
            iy = _bin(lat[sel], spec["ymin"], spec["ymax"], H)
            flat = iy * W + ix
            u, inv = np.unique(flat, return_inverse=True)
            a = np.bincount(inv, weights=in_a[sel].astype(np.float64),
                            minlength=len(u)).astype(np.int64)
            bb = np.bincount(inv, weights=in_b[sel].astype(np.float64),
                             minlength=len(u)).astype(np.int64)
            out["tile_id"].append(np.full(len(u), tid, dtype=np.int64))
            out["py"].append((H - 1 - u // W).astype(np.int64))
            out["px"].append((u % W).astype(np.int64))
            out["a"].append(a)
            out["b"].append(bb)
        if not out["tile_id"]:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("tile_id", "py", "px", "a", "b")})
        return pa.table({c: pa.array(np.concatenate(v))
                         for c, v in out.items()})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["tile_id", "py", "px"], sort=False,
                        as_index=False)[["a", "b"]].sum()
        a = agg["a"].to_numpy().astype(np.int64)
        b = agg["b"].to_numpy().astype(np.int64)
        ndi = (a - b).astype(np.float64) / (a + b).astype(np.float64)
        return pa.table({
            "tile_id": pa.array(agg["tile_id"].to_numpy()
                                .astype(np.int64)),
            "py": pa.array(agg["py"].to_numpy().astype(np.int64)),
            "px": pa.array(agg["px"].to_numpy().astype(np.int64)),
            "a": pa.array(a), "b": pa.array(b),
            "ndi": pa.array(ndi, pa.float64()),
        })

    return bucketed_groupby(parts, ["tile_id", "py", "px"],
                            lambda g: fold(g).to_pandas(),
                            n_buckets=n_buckets)


def histogram_equalize(raster, *, value_col: str = "n",
                       out_max: int = 255, n_buckets: int = 16):
    """GLOBAL histogram equalization of a sparse raster (the classic
    contrast-enhancement remap, OpenCV's integer formula with floor):

        eq(v) = (cdf(v) - cdf_min) * out_max // (N - cdf_min)

    over the value histogram of ``value_col`` (N = touched pixels,
    cdf_min = cdf of the smallest present value).  The histogram is
    bounded by DISTINCT values (block combiners, one bucketed sum);
    the remap broadcasts as two sorted arrays into a stateless map —
    pixels never shuffle.  Degenerate single-value rasters map to 0.
    Adds an ``eq`` int64 column."""
    import pandas as pd
    import ray

    from .bucketed import bucketed_groupby

    def vpart(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    def vfold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v", as_index=False)["c"].sum()

    vh = bucketed_groupby(raster.map_batches(vpart,
                                             batch_format="pyarrow"),
                          ["v"], vfold, n_buckets=n_buckets).to_pandas()
    vh = vh.sort_values("v", kind="mergesort")
    vals = vh["v"].to_numpy().astype(np.int64)
    cdf = np.cumsum(vh["c"].to_numpy().astype(np.int64))
    total = int(cdf[-1]) if len(cdf) else 0
    cmin = int(cdf[0]) if len(cdf) else 0
    den = total - cmin
    eq = ((cdf - cmin) * out_max // den).astype(np.int64) if den \
        else np.zeros(len(cdf), dtype=np.int64)
    ref = ray.put((vals, eq)) if ray.is_initialized() else (vals, eq)

    def remap(b: pa.Table, _ref=ref) -> pa.Table:
        vs, es = ray.get(_ref) if not isinstance(_ref, tuple) else _ref
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return b.append_column(
            "eq", pa.array(es[np.searchsorted(vs, v)]))

    return raster.map_batches(remap, batch_format="pyarrow")


def partial_weighted_histogram(batch: pa.Table, *, tile_specs: dict,
                               value_col: str, lon_col="lon",
                               lat_col="lat") -> pa.Table:
    """Weighted-sum twin of ``partial_histogram``: sparse per-batch
    partial SUMS (tile_id, py, px, v float64) — the scale path for
    agg='sum' rasters (downstream groupby moves pixel partials, the
    final assemble densifies).  Same binning/N-up conventions."""
    lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
    lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
    w = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
    tids = batch.column("tile_id").to_numpy(zero_copy_only=False)
    out_t, out_y, out_x, out_v = [], [], [], []
    for tid in np.unique(tids):
        if tid < 0 or int(tid) not in tile_specs:
            continue
        spec = tile_specs[int(tid)]
        sel = tids == tid
        W, H = spec["width"], spec["height"]
        ix = _bin(lon[sel], spec["xmin"], spec["xmax"], W)
        iy = _bin(lat[sel], spec["ymin"], spec["ymax"], H)
        flat, inv = np.unique(iy * W + ix, return_inverse=True)
        sums = np.bincount(inv, weights=w[sel], minlength=len(flat))
        out_t.append(np.full(len(flat), tid, dtype=np.int64))
        out_y.append((H - 1 - flat // W).astype(np.int64))
        out_x.append((flat % W).astype(np.int64))
        out_v.append(sums)
    if not out_t:
        return pa.table({"tile_id": pa.array([], pa.int64()),
                         "py": pa.array([], pa.int64()),
                         "px": pa.array([], pa.int64()),
                         "v": pa.array([], pa.float64())})
    return pa.table({"tile_id": np.concatenate(out_t),
                     "py": np.concatenate(out_y),
                     "px": np.concatenate(out_x),
                     "v": pa.array(np.concatenate(out_v), pa.float64())})


def partial_moment_histogram(batch: pa.Table, *, tile_specs: dict,
                             value_col: str, lon_col="lon",
                             lat_col="lat") -> pa.Table:
    """Moment partials for mean/var/std rasters: sparse per-batch
    (tile_id, py, px, n, s, ss) rows — count, weight sum and weight
    sum-of-squares are all ASSOCIATIVE, so the downstream groupby-sum
    moves pre-aggregated pixel partials and the finalize step derives
    mean = s/n, var = ss/n - mean², std = sqrt(var) (population moments,
    the datashader ``mean``/``var``/``std`` reductions).  Integer weight
    columns keep int64 partials, so the sums — and with them the SQL
    oracle comparison — are exact."""
    lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
    lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
    wcol = batch.column(value_col)
    is_int = pa.types.is_integer(wcol.type)
    w = wcol.to_numpy(zero_copy_only=False)
    w = w.astype(np.int64) if is_int else w.astype(np.float64)
    tids = batch.column("tile_id").to_numpy(zero_copy_only=False)
    sdt = np.int64 if is_int else np.float64
    out_t, out_y, out_x, out_n, out_s, out_ss = [], [], [], [], [], []
    for tid in np.unique(tids):
        if tid < 0 or int(tid) not in tile_specs:
            continue
        spec = tile_specs[int(tid)]
        sel = tids == tid
        W, H = spec["width"], spec["height"]
        ix = _bin(lon[sel], spec["xmin"], spec["xmax"], W)
        iy = _bin(lat[sel], spec["ymin"], spec["ymax"], H)
        flat, inv = np.unique(iy * W + ix, return_inverse=True)
        ws = w[sel]
        # np.add.at keeps int64 exactness (np.bincount forces float64)
        s = np.zeros(len(flat), dtype=sdt)
        ss = np.zeros(len(flat), dtype=sdt)
        np.add.at(s, inv, ws)
        np.add.at(ss, inv, ws * ws)
        out_t.append(np.full(len(flat), tid, dtype=np.int64))
        out_y.append((H - 1 - flat // W).astype(np.int64))
        out_x.append((flat % W).astype(np.int64))
        out_n.append(np.bincount(inv, minlength=len(flat)).astype(np.int64))
        out_s.append(s)
        out_ss.append(ss)
    pt = pa.int64() if is_int else pa.float64()
    if not out_t:
        return pa.table({"tile_id": pa.array([], pa.int64()),
                         "py": pa.array([], pa.int64()),
                         "px": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "s": pa.array([], pt),
                         "ss": pa.array([], pt)})
    return pa.table({"tile_id": np.concatenate(out_t),
                     "py": np.concatenate(out_y),
                     "px": np.concatenate(out_x),
                     "n": np.concatenate(out_n),
                     "s": pa.array(np.concatenate(out_s), pt),
                     "ss": pa.array(np.concatenate(out_ss), pt)})


def finalize_moments(batch: pa.Table) -> pa.Table:
    """Summed moment partials -> (tile_id, py, px, n, mean, var, std).

    Operation-for-operation mirror of the SQL oracle: mean = s/n and
    ex2 = ss/n as single float64 divisions of exact int64 sums, then
    var = ex2 - mean*mean and std = sqrt(var) — every step restates
    bit-exactly in DuckDB DOUBLE arithmetic."""
    n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    s = batch.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
    ss = batch.column("ss").to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s / n
        ex2 = ss / n
        var = ex2 - mean * mean
        std = np.sqrt(var)
    return pa.table({
        "tile_id": batch.column("tile_id"),
        "py": batch.column("py"),
        "px": batch.column("px"),
        "n": batch.column("n"),
        "mean": pa.array(mean, pa.float64()),
        "var": pa.array(var, pa.float64()),
        "std": pa.array(std, pa.float64()),
    })


def pixel_bin_batch(batch: pa.Table, *, tile_specs: dict, lon_col="lon",
                    lat_col="lat") -> pa.Table:
    """map_batches fn: add (py, px) pixel coordinates (N-up) for each
    row's tile — the shared binning step for per-pixel keyed reductions
    (first/last, argmin-style winners).  Out-of-grid rows are dropped."""
    lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
    lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
    tids = batch.column("tile_id").to_numpy(zero_copy_only=False)
    py = np.full(len(batch), -1, dtype=np.int64)
    px = np.full(len(batch), -1, dtype=np.int64)
    for tid in np.unique(tids):
        if tid < 0 or int(tid) not in tile_specs:
            continue
        spec = tile_specs[int(tid)]
        sel = tids == tid
        W, H = spec["width"], spec["height"]
        ix = _bin(lon[sel], spec["xmin"], spec["xmax"], W)
        iy = _bin(lat[sel], spec["ymin"], spec["ymax"], H)
        py[sel] = H - 1 - iy
        px[sel] = ix
    out = batch.append_column("py", pa.array(py)).append_column(
        "px", pa.array(px)
    )
    return out.filter(pa.array(py >= 0))


def first_last_rasters(points_ds, tile_specs: dict, *, order_cols: list[str],
                       keep_cols: list[str], agg: str = "first",
                       lon_col="lon", lat_col="lat", n_buckets: int = 64):
    """datashader ``first``/``last`` reductions with an EXPLICIT order
    key (data order is meaningless distributed — pass a unique order
    column, e.g. [ts, id], for a deterministic winner).

    Scale shape: per-batch pre-reduction (one winner per touched pixel
    per batch — associative) then ONE coarse-bucket keyed reduce over
    pixels; only per-pixel winner rows shuffle, never raw points.
    Output: one row per touched pixel with (tile_id, py, px) +
    ``keep_cols`` of the winning row.
    """
    if agg not in ("first", "last"):
        raise ValueError(agg)
    from .bucketed import bucketed_groupby

    pix = ["tile_id", "py", "px"]
    keep = agg  # pandas drop_duplicates keep= matches first/last

    def winner(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(order_cols, kind="mergesort").drop_duplicates(
            pix, keep=keep
        )
        return out[pix + order_cols
                   + [c for c in keep_cols if c not in order_cols]]

    def partial(batch: pa.Table) -> pa.Table:
        binned = pixel_bin_batch(batch, tile_specs=tile_specs,
                                 lon_col=lon_col, lat_col=lat_col)
        return pa.Table.from_pandas(
            winner(binned.to_pandas()), preserve_index=False
        )

    parts = points_ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_groupby(parts, pix, winner, n_buckets=n_buckets)


def moment_rasters(points_ds, tile_specs: dict, *, value_col: str,
                   lon_col="lon", lat_col="lat"):
    """Scale path for mean/var/std rasters: partial moments inside
    map_batches → one groupby-sum over touched pixels → vectorized
    finalize.  Raw points never shuffle."""
    from ray.data.aggregate import Sum

    sparse = points_ds.map_batches(
        lambda b: partial_moment_histogram(
            b, tile_specs=tile_specs, value_col=value_col,
            lon_col=lon_col, lat_col=lat_col,
        ),
        batch_format="pyarrow",
    )
    summed = sparse.groupby(["tile_id", "py", "px"]).aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s"),
        Sum("ss", alias_name="ss"),
    )
    return summed.map_batches(finalize_moments, batch_format="pyarrow")


def assemble_moment_rasters(summed_ds, tile_specs: pa.Table,
                            stat: str = "mean"):
    """Dense float64 per-tile ``stat`` rasters (mean/var/std) from summed
    moment partials; empty pixels are NaN (datashader semantics)."""
    specs = {int(r["tile_id"]): r for r in tile_specs.to_pylist()}

    def assemble(g) -> pa.Table:
        tid = int(g["tile_id"].iloc[0])
        spec = specs[tid]
        H, W = spec["height"], spec["width"]
        n = np.zeros(H * W, dtype=np.float64)
        s = np.zeros(H * W, dtype=np.float64)
        ss = np.zeros(H * W, dtype=np.float64)
        flat = (g["py"].to_numpy() * W + g["px"].to_numpy()).astype(np.int64)
        np.add.at(n, flat, g["n"].to_numpy().astype(np.float64))
        np.add.at(s, flat, g["s"].to_numpy().astype(np.float64))
        np.add.at(ss, flat, g["ss"].to_numpy().astype(np.float64))
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / n
            if stat == "mean":
                grid = mean
            else:
                var = ss / n - mean * mean
                grid = var if stat == "var" else np.sqrt(var)
        return pa.table(
            {
                "tile_id": pa.array([tid], pa.int64()),
                "height": pa.array([H], pa.int32()),
                "width": pa.array([W], pa.int32()),
                "data": pa.array([grid], pa.list_(pa.float64())),
            }
        )

    return summed_ds.groupby("tile_id").map_groups(assemble, batch_format="pandas")


def assemble_weighted_rasters(sparse_ds, tile_specs: pa.Table):
    """Dense float64 per-tile rasters from sparse weighted partials
    (sums duplicates like the count assembler)."""
    specs = {int(r["tile_id"]): r for r in tile_specs.to_pylist()}

    def assemble(g) -> pa.Table:
        tid = int(g["tile_id"].iloc[0])
        spec = specs[tid]
        H, W = spec["height"], spec["width"]
        grid = np.zeros(H * W, dtype=np.float64)
        flat = (g["py"].to_numpy() * W + g["px"].to_numpy()).astype(np.int64)
        np.add.at(grid, flat, g["v"].to_numpy())
        return pa.table(
            {
                "tile_id": pa.array([tid], pa.int64()),
                "height": pa.array([H], pa.int32()),
                "width": pa.array([W], pa.int32()),
                "data": pa.array([grid], pa.list_(pa.float64())),
            }
        )

    return sparse_ds.groupby("tile_id").map_groups(assemble, batch_format="pandas")


def assemble_rasters(sparse_ds, tile_specs: pa.Table):
    """Sparse (tile_id, py, px, n) partials -> dense per-tile raster rows.

    The scale path for per-tile count rasters: raw points never shuffle —
    ``partial_histogram`` pre-bins inside map_batches, the groupby moves
    only touched-pixel partials (≤ H*W per tile per block), and this
    stage sums + densifies per tile.  Equivalent to TileRasterizer over
    raw rows (test_partial_histogram_matches_dense) at a fraction of the
    exchange volume.
    """
    specs = {int(r["tile_id"]): r for r in tile_specs.to_pylist()}

    def assemble(g) -> pa.Table:
        import pandas as pd

        tid = int(g["tile_id"].iloc[0])
        spec = specs[tid]
        H, W = spec["height"], spec["width"]
        grid = np.zeros(H * W, dtype=np.uint32)
        flat = (g["py"].to_numpy() * W + g["px"].to_numpy()).astype(np.int64)
        np.add.at(grid, flat, g["n"].to_numpy().astype(np.uint32))
        return pa.table(
            {
                "tile_id": pa.array([tid], pa.int64()),
                "height": pa.array([H], pa.int32()),
                "width": pa.array([W], pa.int32()),
                "data": pa.array([grid], pa.list_(pa.uint32())),
            }
        )

    return sparse_ds.groupby("tile_id").map_groups(assemble, batch_format="pandas")


class GeomBurner:
    """Actor: burn broadcast WKB geometries into each tile's grid
    (rectangle-clip prefilter via bbox, then the exact kernels)."""

    def __init__(self, wkb_ref, agg: str | None = None):
        blobs = wkb_ref
        try:
            import ray

            if isinstance(wkb_ref, ray.ObjectRef):
                blobs = ray.get(wkb_ref)
        except (ImportError, TypeError):
            pass
        self.geoms = [wkb.loads(b) for b in blobs]
        self.bounds = [wkb.bounds(g) for g in self.geoms]
        self.agg = agg

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out_rows = {k: [] for k in ("tile_id", "height", "width", "data", "agg")}
        for r in rows:
            # reference parity: a canvas without CRS is an error
            # (datashader.py:195-212, "Missing crs information")
            if "crs" in r and not r["crs"]:
                raise AttributeError(
                    f"Missing crs information for canvas tile_id={r['tile_id']}"
                )
            bb = (r["xmin"], r["ymin"], r["xmax"], r["ymax"])
            geoms = [
                g
                for g, (gx0, gy0, gx1, gy1) in zip(self.geoms, self.bounds)
                if gx0 <= bb[2] and gx1 >= bb[0] and gy0 <= bb[3] and gy1 >= bb[1]
            ]
            if not geoms:
                grid = np.zeros((r["height"], r["width"]), dtype=np.uint32)
                agg = self.agg or "count"
            else:
                grid, agg = rasterize_geoms(
                    geoms, r["width"], r["height"], bb, agg=self.agg
                )
            out_rows["tile_id"].append(r["tile_id"])
            out_rows["height"].append(r["height"])
            out_rows["width"].append(r["width"])
            out_rows["data"].append(grid.ravel().astype(np.uint32))
            out_rows["agg"].append(agg)
        return pa.table(
            {
                "tile_id": pa.array(out_rows["tile_id"], pa.int64()),
                "height": pa.array(out_rows["height"], pa.int32()),
                "width": pa.array(out_rows["width"], pa.int32()),
                "data": pa.array(out_rows["data"], pa.list_(pa.uint32())),
                "agg": pa.array(out_rows["agg"]),
            }
        )


# --- nearest-neighbor regrid / warp (the rio.reproject analog) -------------

def regrid_nearest(sparse_ds, *, src: dict, dst: dict,
                   value_col: str = "n", inv_transform=None,
                   n_buckets: int = 16):
    """Resample a sparse raster onto a NEW grid by nearest-neighbor
    sampling — the reference's ``rioxarray.rio.reproject`` / regrid
    surface (`/root/reference/zen3geo/datapipes/rioxarray.py` delegates
    to rioxarray; here it is a distributed join).

    ``sparse_ds`` holds the engine's sparse raster rows
    ``(tile_id, py, px, value_col)`` on the ``src`` tile grid
    (``{'x0','y0','x1','y1','nx','ny','px'}`` — nx*ny North-up tiles of
    px*px pixels, tile ids row-major from the South-West like
    ``assign_tiles``).  ``dst`` is the target grid
    ``{'x0','y0','x1','y1','w','h'}``; each target pixel takes the value
    of the SOURCE pixel containing its center (rows whose center misses
    every populated source pixel are omitted — the output is sparse
    too).  Output: ``(ty, tx, value_col)`` with ty counted from the top
    (North-up), tx from the left.

    ``inv_transform(cx, cy) -> (lon, lat)`` is the cross-CRS hook: when
    given, target centers are in the DST CRS and map back to source
    lon/lat through it (e.g. ``lambda x, y:
    crs.transform_inverse(x, y, "EPSG:3857")``).  The affine
    (no-transform) path is oracle-checked (query ``warp``); the
    cross-CRS path is golden-tested (libm trig is not bit-mirrorable in
    SQL).

    100-TB shape: the source side maps (tile,py,px)->global integer
    pixel keys with no shuffle; the target side streams from
    ``ray.data.range(w*h)`` (never materialized on the driver); ONE
    bucketed hash join on the integer pixel key joins them.  Both sides
    scale out; no raster is ever assembled densely.
    """
    import ray.data as rd

    from .hashjoin import bucketed_join

    nx, ny, pxn = int(src["nx"]), int(src["ny"]), int(src["px"])
    sx0, sy1 = float(src["x0"]), float(src["y1"])
    pw = (float(src["x1"]) - float(src["x0"])) / (nx * pxn)
    ph = (float(src["y1"]) - float(src["y0"])) / (ny * pxn)
    w, h = int(dst["w"]), int(dst["h"])
    dx0, dy1 = float(dst["x0"]), float(dst["y1"])
    tw = (float(dst["x1"]) - float(dst["x0"])) / w
    th = (float(dst["y1"]) - float(dst["y0"])) / h

    def src_keys(b: pa.Table) -> pa.Table:
        tid = b.column("tile_id").to_numpy(zero_copy_only=False)
        py = b.column("py").to_numpy(zero_copy_only=False)
        px = b.column("px").to_numpy(zero_copy_only=False)
        gx = (tid % nx) * pxn + px
        gyt = (ny - 1 - tid // nx) * pxn + py
        return pa.table({
            "gx": pa.array(gx.astype(np.int64)),
            "gyt": pa.array(gyt.astype(np.int64)),
            value_col: b.column(value_col),
        })

    def tgt_keys(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        ty = i // w
        tx = i % w
        cx = dx0 + (tx.astype(np.float64) + 0.5) * tw
        cy = dy1 - (ty.astype(np.float64) + 0.5) * th
        if inv_transform is not None:
            lon, lat = inv_transform(cx, cy)
        else:
            lon, lat = cx, cy
        gx = np.floor((lon - sx0) / pw)
        gyt = np.floor((sy1 - lat) / ph)
        ok = ((gx >= 0) & (gx < nx * pxn) & (gyt >= 0)
              & (gyt < ny * pxn) & np.isfinite(gx) & np.isfinite(gyt))
        return pa.table({
            "ty": pa.array(ty[ok].astype(np.int64)),
            "tx": pa.array(tx[ok].astype(np.int64)),
            "gx": pa.array(gx[ok].astype(np.int64)),
            "gyt": pa.array(gyt[ok].astype(np.int64)),
        })

    srcs = sparse_ds.map_batches(src_keys, batch_format="pyarrow")
    # size the target stream's blocks to ~1M pixels: the default
    # range splitting shatters small grids into 64 tiny blocks and
    # every downstream barrier pays per-task latency (CLAUDE.md
    # block-count lesson; 6k-pixel bench case measured 3 barriers
    # x 64 tasks over 277 rows)
    tgts = rd.range(w * h, override_num_blocks=max(1, -(-(w * h) // 1_048_576))
                    ).map_batches(tgt_keys, batch_format="pyarrow")
    joined = bucketed_join(tgts, srcs, on=["gx", "gyt"], how="inner",
                           n_buckets=n_buckets)
    return joined.select_columns(["ty", "tx", value_col])


def regrid_bilinear(sparse_ds, *, src: dict, dst: dict,
                    value_col: str = "n", inv_transform=None,
                    n_buckets: int = 16):
    """Bilinear warp/regrid of a sparse raster — the smooth resampling
    mode beside :func:`regrid_nearest` (rioxarray ``Resampling.bilinear``
    analog).  Each target pixel center interpolates the 4 surrounding
    source pixel CENTERS; absent (sparse) or out-of-range neighbors
    contribute 0 — count-raster semantics.  Output ``(ty, tx, val)``
    DOUBLE rows for target pixels with >= 1 populated neighbor.

    BIT-PARITY float discipline (the bm25 convention): per neighbor
    ``term = v * ((xw) * (yw))`` with one shared expression shape, the
    four terms combine as ``((t0 + t1) + (t2 + t3))`` — each group holds
    at most ONE nonzero row per quadrant, so masked pandas sums are
    IEEE-exact regardless of reduce order and DuckDB mirrors them with
    CASE-pivot SUMs.

    100-TB shape: target pixels stream from ``ray.data.range`` and
    flat-expand to <= 4 neighbor rows; ONE bucketed hash join + ONE
    bucketed (ty, tx) reduce — both sides scale out, nothing dense.
    """
    import ray.data as rd

    from .bucketed import bucketed_groupby
    from .hashjoin import bucketed_join

    nx, ny, pxn = int(src["nx"]), int(src["ny"]), int(src["px"])
    sx0, sy1 = float(src["x0"]), float(src["y1"])
    pw = (float(src["x1"]) - float(src["x0"])) / (nx * pxn)
    ph = (float(src["y1"]) - float(src["y0"])) / (ny * pxn)
    w, h = int(dst["w"]), int(dst["h"])
    dx0, dy1 = float(dst["x0"]), float(dst["y1"])
    tw = (float(dst["x1"]) - float(dst["x0"])) / w
    th = (float(dst["y1"]) - float(dst["y0"])) / h
    gw, gh = nx * pxn, ny * pxn

    def src_keys(b: pa.Table) -> pa.Table:
        tid = b.column("tile_id").to_numpy(zero_copy_only=False)
        py = b.column("py").to_numpy(zero_copy_only=False)
        px = b.column("px").to_numpy(zero_copy_only=False)
        gx = (tid % nx) * pxn + px
        gyt = (ny - 1 - tid // nx) * pxn + py
        return pa.table({
            "gx": pa.array(gx.astype(np.int64)),
            "gyt": pa.array(gyt.astype(np.int64)),
            value_col: b.column(value_col),
        })

    def tgt_quads(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        ty = i // w
        tx = i % w
        cx = dx0 + (tx.astype(np.float64) + 0.5) * tw
        cy = dy1 - (ty.astype(np.float64) + 0.5) * th
        if inv_transform is not None:
            lon, lat = inv_transform(cx, cy)
        else:
            lon, lat = cx, cy
        fx = (lon - sx0) / pw - 0.5
        fy = (sy1 - lat) / ph - 0.5
        i0 = np.floor(fx)
        j0 = np.floor(fy)
        dx = fx - i0
        dy = fy - j0
        outs = {"ty": [], "tx": [], "q": [], "gx": [], "gyt": [], "w": []}
        for q in range(4):
            gi = i0 + (q % 2)
            gj = j0 + (q // 2)
            wq = (np.where(q % 2 == 0, 1.0 - dx, dx)
                  * np.where(q // 2 == 0, 1.0 - dy, dy))
            ok = ((gi >= 0) & (gi < gw) & (gj >= 0) & (gj < gh)
                  & np.isfinite(gi) & np.isfinite(gj))
            outs["ty"].append(ty[ok])
            outs["tx"].append(tx[ok])
            outs["q"].append(np.full(int(ok.sum()), q, dtype=np.int64))
            outs["gx"].append(gi[ok].astype(np.int64))
            outs["gyt"].append(gj[ok].astype(np.int64))
            outs["w"].append(wq[ok])
        return pa.table({
            "ty": pa.array(np.concatenate(outs["ty"]).astype(np.int64)),
            "tx": pa.array(np.concatenate(outs["tx"]).astype(np.int64)),
            "q": pa.array(np.concatenate(outs["q"])),
            "gx": pa.array(np.concatenate(outs["gx"])),
            "gyt": pa.array(np.concatenate(outs["gyt"])),
            "w": pa.array(np.concatenate(outs["w"]), pa.float64()),
        })

    srcs = sparse_ds.map_batches(src_keys, batch_format="pyarrow")
    tgts = rd.range(w * h, override_num_blocks=max(1, -(-(w * h) // 1_048_576))
                    ).map_batches(tgt_quads, batch_format="pyarrow")
    joined = bucketed_join(tgts, srcs, on=["gx", "gyt"], how="inner",
                           n_buckets=n_buckets)

    def reduce_fn(df):
        import pandas as pd

        v = df[value_col].to_numpy().astype(np.float64)
        term = v * df["w"].to_numpy()
        q = df["q"].to_numpy()
        cols = {f"t{k}": np.where(q == k, term, 0.0) for k in range(4)}
        g = (df.assign(**cols)
             .groupby(["ty", "tx"], sort=False, as_index=False)
             [["t0", "t1", "t2", "t3"]].sum())
        # at most one nonzero row per quadrant per key: the masked sums
        # are IEEE-exact in any order; combine in ONE parenthesization
        val = (g["t0"].to_numpy() + g["t1"].to_numpy()) \
            + (g["t2"].to_numpy() + g["t3"].to_numpy())
        return pd.DataFrame({"ty": g["ty"], "tx": g["tx"], "val": val})

    return bucketed_groupby(joined, ["ty", "tx"], reduce_fn,
                            n_buckets=n_buckets)


def regrid_average(sparse_ds, *, src: dict, dst: dict,
                   value_col: str = "n", fwd_transform=None,
                   n_buckets: int = 16):
    """Area-average (anti-aliased) DOWNSAMPLE of a sparse raster — the
    ``Resampling.average`` mode beside :func:`regrid_nearest` /
    :func:`regrid_bilinear` (rioxarray delegates this to GDAL,
    `/root/reference/zen3geo/datapipes/rioxarray.py`).  Each populated
    SOURCE pixel center lands in exactly one target cell; the cell's
    value is the mean over its present source pixels — weights
    renormalize over what exists, which is exactly what makes the
    result alias-free on sparse data.  Output ``(ty, tx, npix, val)``:
    ``npix`` the int64 contributing-pixel count, ``val`` DOUBLE.

    BIT-PARITY float discipline: the mean is computed as an EXACT int64
    sum and count with ONE IEEE division at the end — no
    float-summation-order hazard, so the oracle (query ``warp_avg``)
    value-checks the DOUBLE bit-exactly.  ``value_col`` must therefore
    be integral (count rasters); float inputs would need a per-cell
    ordered reduction instead.

    ``fwd_transform(lon, lat) -> (X, Y)`` is the cross-CRS hook (the
    FORWARD direction this time: source centers project into the dst
    CRS before binning — e.g. ``geom.crs.transform`` to EPSG:3857).

    100-TB shape: this is the FAST regrid path — no join at all.  Source
    rows pre-aggregate per (ty, tx) inside each batch (combiner) and ONE
    bucketed reduce merges the partials; only touched-cell partials ever
    shuffle, the target grid is never even enumerated.
    """
    from .bucketed import bucketed_groupby

    nx, ny, pxn = int(src["nx"]), int(src["ny"]), int(src["px"])
    sx0, sy1 = float(src["x0"]), float(src["y1"])
    pw = (float(src["x1"]) - float(src["x0"])) / (nx * pxn)
    ph = (float(src["y1"]) - float(src["y0"])) / (ny * pxn)
    w, h = int(dst["w"]), int(dst["h"])
    dx0, dy1 = float(dst["x0"]), float(dst["y1"])
    tw = (float(dst["x1"]) - float(dst["x0"])) / w
    th = (float(dst["y1"]) - float(dst["y0"])) / h

    def partial(b: pa.Table) -> pa.Table:
        tid = b.column("tile_id").to_numpy(zero_copy_only=False)
        py = b.column("py").to_numpy(zero_copy_only=False)
        px = b.column("px").to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        gx = (tid % nx) * pxn + px
        gyt = (ny - 1 - tid // nx) * pxn + py
        lon = sx0 + (gx.astype(np.float64) + 0.5) * pw
        lat = sy1 - (gyt.astype(np.float64) + 0.5) * ph
        if fwd_transform is not None:
            lon, lat = fwd_transform(lon, lat)
        tx = np.floor((lon - dx0) / tw)
        ty = np.floor((dy1 - lat) / th)
        ok = ((tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
              & np.isfinite(tx) & np.isfinite(ty))
        key = ty[ok].astype(np.int64) * w + tx[ok].astype(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        vs = np.zeros(len(uk), dtype=np.int64)
        np.add.at(vs, inv, v[ok])
        np_ = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table({
            "ty": pa.array(uk // w), "tx": pa.array(uk % w),
            "_vs": pa.array(vs), "_np": pa.array(np_),
        })

    def reduce_fn(df):
        import pandas as pd

        g = (df.groupby(["ty", "tx"], sort=False, as_index=False)
             [["_vs", "_np"]].sum())
        vs = g["_vs"].to_numpy().astype(np.int64)
        npx = g["_np"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "ty": g["ty"], "tx": g["tx"], "npix": npx,
            "val": vs.astype(np.float64) / npx.astype(np.float64),
        })

    return bucketed_groupby(
        sparse_ds.map_batches(partial, batch_format="pyarrow"),
        ["ty", "tx"], reduce_fn, n_buckets=n_buckets)


def focal_stats(sparse, *, px_size: int, radius: int = 1,
                tile_col: str = "tile_id", y_col: str = "py",
                x_col: str = "px", val_col: str = "n",
                n_buckets: int = 16):
    """FOCAL (moving-window) statistics over a sparse raster — the
    rioxarray/scipy ``focal`` / convolution analog recast for the
    sparse per-tile histogram representation every rasterize stage here
    emits.  For every TOUCHED pixel, the (2r+1)² window around it
    (clipped at tile edges; absent pixels contribute nothing, windows
    never cross tiles — per-tile canvas semantics)::

        (tile, py, px, n, focal_n, focal_cnt, focal_max, focal_mean)

    n = the center's own value, focal_n/focal_cnt/focal_max = sum /
    touched-count / max over the window, focal_mean = focal_n /
    focal_cnt (the ONE float division, mirrored by the SQL oracle).

    Plan shape (100 TB): each sparse row SCATTERS into its ≤(2r+1)²
    neighbor positions inside map_batches (the self position carries a
    marker), ONE bucketed reduce on (tile, y, x) folds them, and a
    marker filter keeps rows whose center exists — no join, a single
    all-to-all over output-bounded fixed-width partials (the sparse
    raster is canvas-bounded, never point-bounded).
    """
    import pandas as pd

    from .bucketed import bucketed_groupby

    offs = [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)]
    n_off = len(offs)
    dy_a = np.array([o[0] for o in offs], dtype=np.int64)
    dx_a = np.array([o[1] for o in offs], dtype=np.int64)

    def scatter(b: pa.Table) -> pa.Table:
        t = b.column(tile_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = b.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(t)
        ty = np.repeat(y, n_off) + np.tile(dy_a, n)
        tx = np.repeat(x, n_off) + np.tile(dx_a, n)
        tt = np.repeat(t, n_off)
        vv = np.repeat(v, n_off)
        here = (np.tile(dy_a, n) == 0) & (np.tile(dx_a, n) == 0)
        keep = (ty >= 0) & (ty < px_size) & (tx >= 0) & (tx < px_size)
        return pa.table({
            tile_col: pa.array(tt[keep]),
            y_col: pa.array(ty[keep]),
            x_col: pa.array(tx[keep]),
            "_v": pa.array(vv[keep]),
            "_h": pa.array(here[keep].astype(np.int64)),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby([tile_col, y_col, x_col], sort=False,
                      as_index=False).agg(
            focal_n=("_v", "sum"), focal_cnt=("_v", "size"),
            focal_max=("_v", "max"), _hn=("_h", "sum"),
            _cv=("_hv", "sum"))
        s = s[s["_hn"] > 0]
        return pd.DataFrame({
            tile_col: s[tile_col].to_numpy(),
            y_col: s[y_col].to_numpy(),
            x_col: s[x_col].to_numpy(),
            val_col: s["_cv"].to_numpy().astype(np.int64),
            "focal_n": s["focal_n"].to_numpy().astype(np.int64),
            "focal_cnt": s["focal_cnt"].to_numpy().astype(np.int64),
            "focal_max": s["focal_max"].to_numpy().astype(np.int64),
        })

    def add_hv(b: pa.Table) -> pa.Table:
        v = b.column("_v").to_numpy(zero_copy_only=False)
        h = b.column("_h").to_numpy(zero_copy_only=False)
        return b.append_column("_hv", pa.array(v * h))

    scattered = sparse.map_batches(scatter, batch_format="pyarrow") \
        .map_batches(add_hv, batch_format="pyarrow")
    folded = bucketed_groupby(scattered, [tile_col, y_col, x_col], fold,
                              n_buckets=n_buckets)

    def finish(b: pa.Table) -> pa.Table:
        fn = b.column("focal_n").to_numpy(zero_copy_only=False).astype(np.int64)
        fc = b.column("focal_cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            tile_col: b.column(tile_col).cast(pa.int64()),
            y_col: b.column(y_col).cast(pa.int64()),
            x_col: b.column(x_col).cast(pa.int64()),
            val_col: b.column(val_col).cast(pa.int64()),
            "focal_n": pa.array(fn),
            "focal_cnt": pa.array(fc),
            "focal_max": b.column("focal_max").cast(pa.int64()),
            "focal_mean": pa.array(fn.astype(np.float64)
                                   / fc.astype(np.float64)),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def focal_conv(sparse, *, px_size: int, kernels: dict[str, dict],
               tile_col: str = "tile_id", y_col: str = "py",
               x_col: str = "px", val_col: str = "n",
               n_buckets: int = 16):
    """General integer-KERNEL convolution over a sparse raster — the
    weighted upgrade of :func:`focal_stats` (Sobel / Laplacian /
    box-blur territory).  ``kernels`` maps output column name ->
    {(dy, dx): weight}; every kernel evaluates in the SAME scatter
    pass, so k kernels cost one shuffle, not k.

    conv_K(p) = Σ_{(dy,dx),w in K} w · v(p + (dy, dx)), with absent
    pixels contributing 0 and windows clipped at tile edges (per-tile
    canvas semantics, like focal_stats).  Output rows are the TOUCHED
    pixels only: (tile, y, x, v, conv_<name>...).  All int64 — the
    SQL oracle mirrors via an offset VALUES join.
    """
    import pandas as pd

    from .bucketed import bucketed_groupby

    # union of all kernel offsets (+ the self marker offset)
    offs = sorted({o for k in kernels.values() for o in k}
                  | {(0, 0)})
    names = list(kernels)
    n_off = len(offs)
    dy_a = np.array([o[0] for o in offs], dtype=np.int64)
    dx_a = np.array([o[1] for o in offs], dtype=np.int64)
    w_by_name = {
        nm: np.array([kernels[nm].get(o, 0) for o in offs],
                     dtype=np.int64)
        for nm in names
    }
    self_i = offs.index((0, 0))

    def scatter(b: pa.Table) -> pa.Table:
        t = b.column(tile_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = b.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(t)
        # source s contributes to target p = s - offset with weight w
        ty = np.repeat(y, n_off) - np.tile(dy_a, n)
        tx = np.repeat(x, n_off) - np.tile(dx_a, n)
        tt = np.repeat(t, n_off)
        vv = np.repeat(v, n_off)
        here = np.zeros(n_off, dtype=np.int64)
        here[self_i] = 1
        hh = np.tile(here, n)
        keep = (ty >= 0) & (ty < px_size) & (tx >= 0) & (tx < px_size)
        cols = {
            tile_col: pa.array(tt[keep]),
            y_col: pa.array(ty[keep]),
            x_col: pa.array(tx[keep]),
            "_h": pa.array(hh[keep]),
            "_cv": pa.array((vv * hh)[keep]),
        }
        for nm in names:
            cols[f"_c_{nm}"] = pa.array((vv * np.tile(w_by_name[nm], n))[keep])
        return pa.table(cols)

    sums = ["_h", "_cv"] + [f"_c_{nm}" for nm in names]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby([tile_col, y_col, x_col], sort=False,
                      as_index=False)[sums].sum()
        return s[s["_h"] > 0]

    folded = bucketed_groupby(
        sparse.map_batches(scatter, batch_format="pyarrow"),
        [tile_col, y_col, x_col], fold, n_buckets=n_buckets)

    def finish(b: pa.Table) -> pa.Table:
        cols = {
            tile_col: b.column(tile_col).cast(pa.int64()),
            y_col: b.column(y_col).cast(pa.int64()),
            x_col: b.column(x_col).cast(pa.int64()),
            val_col: b.column("_cv").cast(pa.int64()),
        }
        for nm in names:
            cols[nm] = b.column(f"_c_{nm}").cast(pa.int64())
        return pa.table(cols)

    return folded.map_batches(finish, batch_format="pyarrow")


def write_density_tiles(ds, out_dir: str, *, res: int, deltas: list[int],
                        tile_px: int = 256, cap: int = 255,
                        cell_col: str = "cell", n_buckets: int = 32):
    """Slippy-map DENSITY TILE pyramid sink — the tippecanoe/gdal2tiles
    product surface: grayscale PNG tiles ``{out}/{level}/{tx}/{ty}.png``
    (one pixel per grid cell, North-up, intensity = min(count, cap)
    scaled onto 0..255) for the base resolution and every coarser
    ``res - d`` level, rendered and WRITTEN inside the reduce tasks —
    a distributed sink, no driver image traffic.

    One pass end to end: the multi-level cell counts come from the
    pyramid combiner (stages/spatial_stats.py:pyramid_counts shape)
    with tile keys attached, ONE bucketed shuffle keyed
    (level, tx, ty), then each group renders its tile with the
    pure-numpy PNG codec (sources/png.py) and lands it via the
    temp+rename idempotent-write discipline (tarshards) — re-running a
    failed job just overwrites byte-identical files.

    Returns the tile manifest Dataset: (level, tx, ty, path, n_cells,
    total) — resumable-output bookkeeping (SURVEY lineage contract).
    """
    import os

    import pandas as pd

    from ..geom.cells import _grid_dims
    from ..sources.png import write_png
    from .bucketed import bucketed_groupby

    ncols, _ = _grid_dims(res)
    levels = sorted({0, *deltas})

    def partial(b: pa.Table) -> pa.Table:
        c = b.column(cell_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ny, nx = c // ncols, c % ncols
        lvl, cell, n = [], [], []
        for d in levels:
            pncols, _ = _grid_dims(res - d)
            pc = (ny >> d) * pncols + (nx >> d)
            u, cnt = np.unique(pc, return_counts=True)
            lvl.append(np.full(len(u), res - d, dtype=np.int64))
            cell.append(u)
            n.append(cnt.astype(np.int64))
        lvl = np.concatenate(lvl)
        cell = np.concatenate(cell)
        n = np.concatenate(n)
        # per-row grid width at its own level: 2 << level
        pnc = (np.int64(2) << lvl)
        py, px = cell // pnc, cell % pnc
        return pa.table({
            "level": pa.array(lvl),
            "tx": pa.array(px // tile_px), "ty": pa.array(py // tile_px),
            "cell": pa.array(cell), "n": pa.array(n)})

    os.makedirs(out_dir, exist_ok=True)

    def render(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (lvl, tx, ty), grp in g.groupby(["level", "tx", "ty"],
                                            sort=False):
            lvl, tx, ty = int(lvl), int(tx), int(ty)
            pnc = 2 << lvl
            agg = grp.groupby("cell", sort=False)["n"].sum()
            cells_ = agg.index.to_numpy().astype(np.int64)
            counts = agg.to_numpy().astype(np.int64)
            py, px = cells_ // pnc, cells_ % pnc
            img = np.zeros((tile_px, tile_px), dtype=np.uint8)
            v = np.minimum(counts, cap) * 255 // cap
            # North-up: image row 0 = the tile's highest ny
            rows = tile_px - 1 - (py - ty * tile_px)
            img[rows, px - tx * tile_px] = v.astype(np.uint8)
            tdir = os.path.join(out_dir, str(lvl), str(tx))
            os.makedirs(tdir, exist_ok=True)
            path = os.path.join(tdir, f"{ty}.png")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(write_png(img))
            os.replace(tmp, path)
            out.append((lvl, tx, ty, path, int(len(cells_)),
                        int(counts.sum())))
        return pd.DataFrame(out, columns=["level", "tx", "ty", "path",
                                          "n_cells", "total"])

    return bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["level", "tx", "ty"], render, n_buckets=n_buckets)
