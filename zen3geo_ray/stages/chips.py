"""Chip/tile slicing — the xbatcher-kernel recast (SURVEY §2 op #12).

Reference semantics (``/root/reference/zen3geo/datapipes/xbatcher.py:16-116``):
each scene is cut into fixed-size sliding windows by
``xbatcher.BatchGenerator(input_dims={'y':H,'x':W}, input_overlap=...)``;
chip count per dim is the floor division ``(size - overlap) // (length -
overlap)`` (plain ``size // length`` without overlap), enumerated
row-major.  Goldens: 128²→64² gives 4 chips
(``zen3geo/tests/test_datapipes_xbatcher.py:31``); two 1024x1536-ish
scenes → 12 chips of 512² without overlap, 30 with 256 overlap
(``docs/chipping.md:125-148``).

The reference enumerates chips implicitly by iteration order; distributed
execution replaces that with the explicit identity ``(scene_id, chip_y,
chip_x)`` so any partitioning (and any retry) yields the same assignment.
``enumerate_chips`` is a vectorized map_batches fn: scenes batch in, chips
batch out (a flat_map expressed as batch-level numpy repeats).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def chips_per_dim(size, length: int, overlap: int = 0) -> np.ndarray:
    """xbatcher's per-dimension window count (floor division)."""
    size = np.asarray(size, dtype=np.int64)
    if overlap:
        if overlap >= length:
            raise ValueError("input_overlap must be < input_dims")
        return np.maximum((size - overlap) // (length - overlap), 0)
    return size // length


def enumerate_chips(
    batch: pa.Table,
    *,
    chip_h: int,
    chip_w: int,
    overlap_h: int = 0,
    overlap_w: int = 0,
) -> pa.Table:
    """Scenes batch -> chips batch with deterministic row-major ids.

    Input columns: scene_id, height, width (+ passthrough bands/fill if
    present).  Output: one row per chip with (scene_id, chip_id, chip_y,
    chip_x, y0, x0, height, width [, bands, fill]).
    """
    H = batch.column("height").to_numpy(zero_copy_only=False).astype(np.int64)
    W = batch.column("width").to_numpy(zero_copy_only=False).astype(np.int64)
    sid = batch.column("scene_id").to_numpy(zero_copy_only=False)
    ny = chips_per_dim(H, chip_h, overlap_h)
    nx = chips_per_dim(W, chip_w, overlap_w)
    n = ny * nx
    total = int(n.sum())
    rep = np.repeat(np.arange(len(sid)), n)
    # within-scene chip index 0..n_i-1, row-major
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    local = np.arange(total) - np.repeat(starts, n)
    cy = local // nx[rep]
    cx = local % nx[rep]
    sy = chip_h - overlap_h
    sx = chip_w - overlap_w
    cols = {
        "scene_id": pa.array(sid[rep]),
        "chip_id": pa.array(local, pa.int64()),
        "chip_y": pa.array(cy.astype(np.int32), pa.int32()),
        "chip_x": pa.array(cx.astype(np.int32), pa.int32()),
        "y0": pa.array((cy * sy).astype(np.int32), pa.int32()),
        "x0": pa.array((cx * sx).astype(np.int32), pa.int32()),
        "height": pa.array(np.full(total, chip_h, dtype=np.int32), pa.int32()),
        "width": pa.array(np.full(total, chip_w, dtype=np.int32), pa.int32()),
    }
    for extra in ("bands", "fill"):
        if extra in batch.column_names:
            vals = batch.column(extra).to_numpy(zero_copy_only=False)
            cols[extra] = pa.array(vals[rep])
    return pa.table(cols)


def slice_chip_tensors(
    batch: pa.Table,
    *,
    chip_h: int,
    chip_w: int,
    overlap_h: int = 0,
    overlap_w: int = 0,
    data_col: str = "data",
) -> pa.Table:
    """Scene-tensor rows -> per-chip rows with ACTUAL windowed data.

    Input rows carry (scene_id, height, width, bands, data) where data is
    the flat band-major (B, H, W) float32 tensor; output is one row per
    chip with the same deterministic (chip_id, chip_y, chip_x, y0, x0)
    identity ``enumerate_chips`` assigns plus the chip's
    (bands * chip_h * chip_w) tensor — the reference's
    ``xbatcher.BatchGenerator`` window contents
    (``/root/reference/zen3geo/datapipes/xbatcher.py:105-110``; fixture
    golden: an all-ones 3x128x128 scene -> 4 chips of real data,
    ``test_datapipes_xbatcher.py:21-31``).

    Per scene the windowing is one strided view + transpose (no Python
    per-chip loop); batches should be sized so scenes * tensor bytes fit
    the worker heap (large scenes -> small ``batch_size``).
    """
    sy = chip_h - overlap_h
    sx = chip_w - overlap_w
    sid = batch.column("scene_id").to_numpy(zero_copy_only=False)
    H = batch.column("height").to_numpy(zero_copy_only=False).astype(np.int64)
    W = batch.column("width").to_numpy(zero_copy_only=False).astype(np.int64)
    B = batch.column("bands").to_numpy(zero_copy_only=False).astype(np.int64)
    data = batch.column(data_col)
    if isinstance(data, pa.ChunkedArray):
        data = data.combine_chunks()
    out_sid, out_cid, out_cy, out_cx, out_data, out_bands = [], [], [], [], [], []
    for i in range(len(sid)):
        arr = np.asarray(data[i].values, dtype=np.float32).reshape(
            int(B[i]), int(H[i]), int(W[i])
        )
        ny = int(chips_per_dim(H[i], chip_h, overlap_h))
        nx = int(chips_per_dim(W[i], chip_w, overlap_w))
        if ny == 0 or nx == 0:
            continue
        win = np.lib.stride_tricks.sliding_window_view(
            arr, (chip_h, chip_w), axis=(1, 2)
        )[:, ::sy, ::sx][:, :ny, :nx]          # (B, ny, nx, ch, cw)
        tiles = win.transpose(1, 2, 0, 3, 4).reshape(ny * nx, -1)
        out_sid.append(np.full(ny * nx, sid[i]))
        out_cid.append(np.arange(ny * nx, dtype=np.int64))
        yy, xx = np.divmod(np.arange(ny * nx), nx)
        out_cy.append(yy)
        out_cx.append(xx)
        out_data.append(np.ascontiguousarray(tiles))
        out_bands.append(int(B[i]))
    if not out_sid:
        return pa.table(
            {
                "scene_id": pa.array([], batch.schema.field("scene_id").type),
                "chip_id": pa.array([], pa.int64()),
                "chip_y": pa.array([], pa.int32()),
                "chip_x": pa.array([], pa.int32()),
                "y0": pa.array([], pa.int32()),
                "x0": pa.array([], pa.int32()),
                "height": pa.array([], pa.int32()),
                "width": pa.array([], pa.int32()),
                "bands": pa.array([], pa.int64()),
                "data": pa.array([], pa.list_(pa.float32())),
            }
        )
    cy = np.concatenate(out_cy)
    cx = np.concatenate(out_cx)
    nchips = len(cy)
    flat = np.concatenate([t.reshape(-1) for t in out_data])
    sizes = np.concatenate(
        [np.full(t.shape[0], t.shape[1], dtype=np.int32) for t in out_data]
    )
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
    data_arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat, pa.float32())
    )
    bands_rep = np.repeat(
        np.asarray(out_bands, dtype=np.int64), [t.shape[0] for t in out_data]
    )
    return pa.table(
        {
            "scene_id": pa.array(np.concatenate(out_sid)),
            "chip_id": pa.array(np.concatenate(out_cid), pa.int64()),
            "chip_y": pa.array(cy.astype(np.int32), pa.int32()),
            "chip_x": pa.array(cx.astype(np.int32), pa.int32()),
            "y0": pa.array((cy * sy).astype(np.int32), pa.int32()),
            "x0": pa.array((cx * sx).astype(np.int32), pa.int32()),
            "height": pa.array(np.full(nchips, chip_h, dtype=np.int32), pa.int32()),
            "width": pa.array(np.full(nchips, chip_w, dtype=np.int32), pa.int32()),
            "bands": pa.array(bands_rep, pa.int64()),
            "data": data_arr,
        }
    )


def chip_bboxes(
    chips: pa.Table,
    *,
    scene_transforms: dict[int, tuple[float, float, float]],
) -> pa.Table:
    """Add geographic bounds per chip from each scene's geotransform.

    ``scene_transforms[scene_id] = (origin_minx, origin_maxy, res)`` —
    pixel row 0 is the NORTH edge (raster convention), so chip_y=0 starts
    at maxy going south, matching the reference's chip coords
    (``docs/object-detection-boxes.md:328-364`` y-flip).
    """
    sid = chips.column("scene_id").to_numpy(zero_copy_only=False)
    minx0 = np.empty(len(sid))
    maxy0 = np.empty(len(sid))
    res = np.empty(len(sid))
    for s, (ox, oy, r) in scene_transforms.items():
        sel = sid == s
        minx0[sel], maxy0[sel], res[sel] = ox, oy, r
    y0 = chips.column("y0").to_numpy(zero_copy_only=False).astype(np.float64)
    x0 = chips.column("x0").to_numpy(zero_copy_only=False).astype(np.float64)
    hh = chips.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
    ww = chips.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
    bminx = minx0 + x0 * res
    bmaxy = maxy0 - y0 * res
    return (
        chips.append_column("bminx", pa.array(bminx))
        .append_column("bminy", pa.array(bmaxy - hh * res))
        .append_column("bmaxx", pa.array(bminx + ww * res))
        .append_column("bmaxy", pa.array(bmaxy))
    )


def chip_bboxes_simple(
    chips: pa.Table, *, minx: float, maxy: float, res: float
) -> pa.Table:
    """Chip pixel windows -> geographic boxes for a single geotransform
    (origin at the scene's NW corner, square pixels of size ``res``)."""
    y0 = chips.column("y0").to_numpy(zero_copy_only=False).astype(np.float64)
    x0 = chips.column("x0").to_numpy(zero_copy_only=False).astype(np.float64)
    hh = chips.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
    ww = chips.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
    bminx = minx + x0 * res
    bmaxy = maxy - y0 * res
    return (
        chips.append_column("bminx", pa.array(bminx))
        .append_column("bminy", pa.array(bmaxy - hh * res))
        .append_column("bmaxx", pa.array(bminx + ww * res))
        .append_column("bmaxy", pa.array(bmaxy))
    )
