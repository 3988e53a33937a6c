"""Per-record raster/vector math from the reference walkthroughs.

Each function is the vectorized recast of a user-supplied ``map`` UDF in
the reference docs (SURVEY §2.3 "Per-record maps"):

* ``linear_to_decibel`` — 10*log10 with non-positive masking
  (``docs/vector-segmentation-masks.md:134-147``);
* ``normalize_lon`` — 0..360 -> ±180 longitude shift
  (``docs/multi-resolution.md:171-179``);
* ``imgbox_to_geobox`` — the object-detection INVERSE path: image-space
  (x1,y1,x2,y2) back to geographic bounds via the chip transform
  (``docs/object-detection-boxes.md:499-524`` shapely.affine_transform).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def linear_to_decibel(values) -> np.ndarray:
    """10*log10(x); non-positive inputs -> NaN (the reference masks zeros
    before the log)."""
    v = np.asarray(values, dtype=np.float64)
    out = np.full_like(v, np.nan)
    pos = v > 0
    out[pos] = 10.0 * np.log10(v[pos])
    return out


def normalize_lon(lon) -> np.ndarray:
    """Longitudes from [0, 360) to [-180, 180)."""
    lon = np.asarray(lon, dtype=np.float64)
    return (lon + 180.0) % 360.0 - 180.0


def imgbox_to_geobox(batch: pa.Table) -> pa.Table:
    """Inverse of pipelines.walkthroughs.geobox_to_imgbox: recover
    geographic (gminx, gminy, gmaxx, gmaxy) from image (x1,y1,x2,y2)
    given the chip bounds + pixel size columns."""
    left = batch.column("bminx").to_numpy(zero_copy_only=False)
    top = batch.column("bmaxy").to_numpy(zero_copy_only=False)
    right = batch.column("bmaxx").to_numpy(zero_copy_only=False)
    bottom = batch.column("bminy").to_numpy(zero_copy_only=False)
    w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
    h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
    xres = (right - left) / w
    yres = (top - bottom) / h
    gminx = left + batch.column("x1").to_numpy(zero_copy_only=False) * xres
    gmaxy = top - batch.column("y1").to_numpy(zero_copy_only=False) * yres
    gmaxx = left + batch.column("x2").to_numpy(zero_copy_only=False) * xres
    gminy = top - batch.column("y2").to_numpy(zero_copy_only=False) * yres
    return (
        batch.append_column("gminx", pa.array(gminx))
        .append_column("gminy", pa.array(gminy))
        .append_column("gmaxx", pa.array(gmaxx))
        .append_column("gmaxy", pa.array(gmaxy))
    )
