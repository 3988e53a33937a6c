"""Raster → vector conversion (the reverse of stages/rasterize.py).

The north star calls for datashader-style raster↔vector conversion;
rasterize covers vector→raster, this module covers the way back:

* ``raster_to_points`` — nonzero (or thresholded) pixels -> point rows
  at pixel centers with their values (mask → point cloud);
* ``raster_to_regions`` — 4-connected components of the thresholded
  mask -> one region row per component with pixel count, geographic
  bbox, and an EXACT traced boundary polygon (Moore boundary tracing on
  the pixel grid, interior rings included) as WKB.

Both are per-tile map_batches transforms over raster rows (tile_id,
height, width, data + tile bounds): embarrassingly parallel, no
shuffle.  Connected-component labeling is a vectorized two-pass
union-find in numpy (no scipy dependency).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import wkb


def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected component labeling (two-pass union-find, vectorized).

    Returns (labels int32 array with 0 = background, n_components).
    """
    H, W = mask.shape
    labels = np.zeros((H, W), dtype=np.int32)
    parent = [0]  # union-find; parent[0] unused

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nxt = 1
    # pass 1: provisional labels + equivalences (row-wise vectorized runs)
    for y in range(H):
        row = mask[y]
        if not row.any():
            continue
        # run starts/ends in this row
        padded = np.concatenate([[False], row, [False]])
        starts = np.flatnonzero(~padded[:-1] & padded[1:])
        ends = np.flatnonzero(padded[:-1] & ~padded[1:])
        for s, e in zip(starts, ends):
            if y > 0:
                above = labels[y - 1, s:e]
                roots = np.unique(above[above > 0])
            else:
                roots = np.empty(0, dtype=np.int32)
            if len(roots) == 0:
                parent.append(nxt)
                lab = nxt
                nxt += 1
            else:
                lab = find(int(roots[0]))
                for r in roots[1:]:
                    rr = find(int(r))
                    if rr != lab:
                        parent[rr] = lab
            labels[y, s:e] = lab
    # pass 2: flatten equivalences, compact label ids
    flat = np.array([find(i) for i in range(nxt)], dtype=np.int32)
    uniq = np.unique(flat[1:]) if nxt > 1 else np.empty(0, dtype=np.int32)
    remap = np.zeros(nxt, dtype=np.int32)
    remap[uniq] = np.arange(1, len(uniq) + 1)
    labels = remap[flat[labels]]
    return labels, len(uniq)


def trace_boundary(mask: np.ndarray) -> np.ndarray:
    """Trace the outer boundary of a connected region as a closed ring of
    pixel-CORNER coordinates (pixel units; x right, y DOWN image rows).

    Marching-squares crack following: at each grid corner the 2x2 pixel
    neighborhood determines the outgoing direction (saddles resolved by
    the incoming direction), keeping the region on the RIGHT of travel.
    The ring encloses exactly the region's pixels, so |shoelace area| ==
    pixel count for hole-free regions.
    """
    H, W = mask.shape
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.empty((0, 2))
    y0 = int(ys.min())
    x0 = int(xs[ys == y0].min())

    def px(ix: int, iy: int) -> bool:
        return 0 <= ix < W and 0 <= iy < H and bool(mask[iy, ix])

    UP, RIGHT, DOWN, LEFT = (0, -1), (1, 0), (0, 1), (-1, 0)
    # outgoing direction per 2x2 state s = TL + 2*TR + 4*BL + 8*BR,
    # derived from "inside pixel on the LEFT of travel" (y down):
    #   UP    iff TL and not TR;  DOWN  iff BR and not BL;
    #   RIGHT iff TR and not BR;  LEFT  iff BL and not TL.
    TABLE = {1: UP, 2: RIGHT, 3: RIGHT, 4: LEFT, 5: UP, 7: RIGHT,
             8: DOWN, 10: DOWN, 11: DOWN, 12: LEFT, 13: UP, 14: LEFT}
    start = (x0, y0)
    x, y = start
    prev = None
    pts = [start]
    for _ in range(4 * (H + 2) * (W + 2) + 4):
        tl = px(x - 1, y - 1)
        tr = px(x, y - 1)
        bl = px(x - 1, y)
        br = px(x, y)
        s = tl * 1 + tr * 2 + bl * 4 + br * 8
        if s == 6:  # saddle TR+BL: keep the incoming wall's region
            d = LEFT if prev == UP else RIGHT
        elif s == 9:  # saddle TL+BR
            d = UP if prev == RIGHT else DOWN
        elif s in TABLE:
            d = TABLE[s]
        else:  # 0/15 cannot occur on a boundary; terminate defensively
            break
        x, y = x + d[0], y + d[1]
        prev = d
        if (x, y) == start:
            break
        pts.append((x, y))
    return np.asarray(pts + [start], dtype=np.float64)


def region_rings(labels: np.ndarray, lab: int,
                 bg_labels: tuple | None = None) -> list[np.ndarray]:
    """Outer boundary + interior (hole) rings of one labeled region, in
    pixel-corner coordinates.

    Holes = 4-connected background components that don't touch the tile
    border and are surrounded by this region (checked via the pixel above
    the hole's topmost pixel).  Each hole's outer boundary (traced on the
    hole mask) becomes an interior ring; even-odd PIP semantics make
    orientation irrelevant.
    """
    m = labels == lab
    rings = [trace_boundary(m)]
    H, W = labels.shape
    if bg_labels is None:
        bg_labels = label_components(labels == 0)
    bg, nbg = bg_labels
    for hl in range(1, nbg + 1):
        hm = bg == hl
        ys, xs = np.nonzero(hm)
        if ys.min() == 0 or xs.min() == 0 or ys.max() == H - 1 or xs.max() == W - 1:
            continue  # touches the border: outside, not a hole
        # surrounding label: pixel above the topmost-leftmost hole pixel
        y0 = ys.min()
        x0 = xs[ys == y0].min()
        if labels[y0 - 1, x0] != lab:
            continue  # hole belongs to a different region
        rings.append(trace_boundary(hm))
    return rings


def raster_to_points(batch: pa.Table, *, threshold: float = 0.0) -> pa.Table:
    """Raster rows -> one point row per pixel with value > threshold.

    Output: tile_id, lon, lat (pixel centers; row 0 = North), value.
    Requires tile bounds columns (xmin..ymax).
    """
    out_t, out_lon, out_lat, out_v = [], [], [], []
    for r in batch.to_pylist():
        H, W = r["height"], r["width"]
        grid = np.asarray(r["data"], dtype=np.float64).reshape(H, W)
        ys, xs = np.nonzero(grid > threshold)
        if len(ys) == 0:
            continue
        pw = (r["xmax"] - r["xmin"]) / W
        ph = (r["ymax"] - r["ymin"]) / H
        out_t.append(np.full(len(ys), r["tile_id"], dtype=np.int64))
        out_lon.append(r["xmin"] + (xs + 0.5) * pw)
        out_lat.append(r["ymax"] - (ys + 0.5) * ph)  # row 0 = North
        out_v.append(grid[ys, xs])
    if not out_t:
        return pa.table({"tile_id": pa.array([], pa.int64()),
                         "lon": pa.array([], pa.float64()),
                         "lat": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    return pa.table({"tile_id": np.concatenate(out_t),
                     "lon": np.concatenate(out_lon),
                     "lat": np.concatenate(out_lat),
                     "value": np.concatenate(out_v)})


def raster_to_regions(batch: pa.Table, *, threshold: float = 0.0,
                      simplify_eps: float | None = None) -> pa.Table:
    """Raster rows -> one region row per 4-connected component.

    Output: tile_id, region_id, pixel_count, value_sum, rminx..rmaxy
    (geographic bbox) + region_wkb: the traced OUTER boundary polygon
    (marching-squares crack following; pixel-exact, so the polygon's
    area equals pixel_count * pixel_area for hole-free regions).
    ``simplify_eps`` (geographic units) runs Douglas-Peucker on every
    ring before encoding — traced pixel boundaries grow with perimeter,
    so large regions shrink by orders of magnitude at sub-pixel eps.
    """
    cols = {k: [] for k in ("tile_id", "region_id", "pixel_count", "value_sum",
                            "rminx", "rminy", "rmaxx", "rmaxy", "region_wkb")}
    for r in batch.to_pylist():
        H, W = r["height"], r["width"]
        grid = np.asarray(r["data"], dtype=np.float64).reshape(H, W)
        labels, n = label_components(grid > threshold)
        if n == 0:
            continue
        pw = (r["xmax"] - r["xmin"]) / W
        ph = (r["ymax"] - r["ymin"]) / H
        flat = labels.ravel()
        ys, xs = np.divmod(np.arange(H * W), W)
        bg_labels = label_components(labels == 0)  # shared across regions
        for lab in range(1, n + 1):
            sel = flat == lab
            lx, ly = xs[sel], ys[sel]
            minx = r["xmin"] + lx.min() * pw
            maxx = r["xmin"] + (lx.max() + 1) * pw
            maxy = r["ymax"] - ly.min() * ph
            miny = r["ymax"] - (ly.max() + 1) * ph
            cols["tile_id"].append(r["tile_id"])
            cols["region_id"].append(lab)
            cols["pixel_count"].append(int(sel.sum()))
            cols["value_sum"].append(float(grid.ravel()[sel].sum()))
            cols["rminx"].append(minx)
            cols["rminy"].append(miny)
            cols["rmaxx"].append(maxx)
            cols["rmaxy"].append(maxy)
            # exact boundary (outer + hole rings), pixel-corner -> geo
            geo_rings = [
                np.stack(
                    [r["xmin"] + ring[:, 0] * pw, r["ymax"] - ring[:, 1] * ph],
                    axis=1,
                )
                for ring in region_rings(labels, lab, bg_labels)
            ]
            if simplify_eps:
                from ..geom.simplify import simplify_ring

                geo_rings = [simplify_ring(g, simplify_eps) for g in geo_rings]
            cols["region_wkb"].append(
                wkb.dumps({"type": "Polygon", "coords": geo_rings})
            )
    return pa.table(
        {
            "tile_id": pa.array(cols["tile_id"], pa.int64()),
            "region_id": pa.array(cols["region_id"], pa.int32()),
            "pixel_count": pa.array(cols["pixel_count"], pa.int64()),
            "value_sum": pa.array(cols["value_sum"], pa.float64()),
            "rminx": pa.array(cols["rminx"], pa.float64()),
            "rminy": pa.array(cols["rminy"], pa.float64()),
            "rmaxx": pa.array(cols["rmaxx"], pa.float64()),
            "rmaxy": pa.array(cols["rmaxy"], pa.float64()),
            "region_wkb": pa.array(cols["region_wkb"], pa.binary()),
        }
    )


def filter_geom_types(batch: pa.Table, *, wkb_col: str,
                      keep: tuple[str, ...]) -> pa.Table:
    """map_batches fn: keep rows whose WKB geometry type is in ``keep``.

    The reference rasterizes one geometry TYPE at a time and raises on
    GeometryCollection (``datashader.py:220-242``); mixed vector tables
    are split per type with this filter before each rasterize pass
    (parity helper for ``test_datapipes_datashader.py:88``'s per-type
    spatialpandas conversion).  Header peek only — no geometry decode.
    """
    types = wkb.peek_types(batch.column(wkb_col).to_pylist())
    mask = np.fromiter((t in keep for t in types), dtype=bool,
                       count=len(types))
    return batch.filter(pa.array(mask))
