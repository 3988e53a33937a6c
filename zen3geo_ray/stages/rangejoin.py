"""Range (interval) joins: value-in-interval matching.

Two scale shapes, picked by the interval side's size:

* ``broadcast_range_join`` — the interval table fits a broadcast
  (``ray.put`` once): each batch matches its values against the sorted
  interval endpoints with ``np.searchsorted`` — NO shuffle, linear in
  input blocks.  Overlapping intervals are handled by a bounded sweep
  over the max overlap depth.
* ``bucketed_range_join`` — large x large: quantize the value axis into
  width-``w`` buckets; every interval REPLICATES to each bucket it
  overlaps (replication factor = interval_len / w + 1 — document the
  boundedness assumption), values go to their single bucket, and the
  match runs vectorized inside each bucket.  One all-to-all.

Semantics: left row matches interval rows with ``lo <= v < hi``
(half-open, mirroring SQL ``v >= lo AND v < hi``); inner join (an
unmatched left row emits nothing), one output row per (row, interval)
pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import _bucket_ids, int_exact_frame  # noqa: F401

_BUCKET = "__rbucket"
_SIDE = "__rside"


def _match_intervals(v: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """All (value_idx, interval_idx) pairs with lo <= v < hi.

    Intervals are processed in lo-sorted order; the sweep bounds work by
    the maximum overlap depth D: each value is tested against at most D
    candidate intervals (vectorized per depth level), so cost is
    O((n + m) log m + n * D).
    """
    order = np.argsort(lo, kind="stable")
    lo_s, hi_s = lo[order], hi[order]
    # for each value: index of first interval with lo > v
    upper = np.searchsorted(lo_s, v, side="right")
    out_v, out_i = [], []
    # sweep depth: walk back from `upper` while intervals may still cover v.
    # running max of hi over prefixes lets us stop early.
    run_max_hi = np.maximum.accumulate(hi_s) if len(hi_s) else hi_s
    active = np.flatnonzero(upper > 0)
    depth = 0
    idx = upper.copy()
    while len(active):
        idx[active] -= 1
        cand = idx[active]
        vv = v[active]
        hit = vv < hi_s[cand]
        if hit.any():
            out_v.append(active[hit])
            out_i.append(order[cand[hit]])
        # keep walking while an earlier interval could still reach v
        cont = (cand > 0) & (vv < run_max_hi[np.maximum(cand - 1, 0)])
        active = active[cont]
        depth += 1
    if not out_v:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    return np.concatenate(out_v), np.concatenate(out_i)


def intervals_blob(tbl: pa.Table, *, lo_col: str, hi_col: str,
                   keep_cols: list[str]) -> dict:
    """Driver-side: pack an interval table for ray.put broadcast."""
    return {
        "lo": tbl.column(lo_col).to_numpy(zero_copy_only=False),
        "hi": tbl.column(hi_col).to_numpy(zero_copy_only=False),
        "keep": {c: tbl.column(c).to_numpy(zero_copy_only=False)
                 for c in keep_cols},
        "keep_types": {c: tbl.schema.field(c).type for c in keep_cols},
    }


def make_broadcast_range_join(blob_ref, *, value_col: str):
    """Task fn for map_batches: match rows to broadcast intervals
    (per-worker memoized unpack, vectorized sweep)."""
    from .join import _PROCESS_CACHE

    key = ("rangejoin", str(blob_ref), value_col)

    def join_batch(batch: pa.Table) -> pa.Table:
        blob = _PROCESS_CACHE.get(key)
        if blob is None:
            b = blob_ref
            try:
                import ray

                if isinstance(b, ray.ObjectRef):
                    b = ray.get(b)
            except (ImportError, TypeError):
                pass
            blob = b
            _PROCESS_CACHE[key] = blob
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        vi, ii = _match_intervals(
            np.asarray(v), np.asarray(blob["lo"]), np.asarray(blob["hi"])
        )
        out = batch.take(pa.array(vi))
        for c, vals in blob["keep"].items():
            out = out.append_column(
                c, pa.array(np.asarray(vals)[ii], blob["keep_types"][c])
            )
        return out

    return join_batch


_SLAB = "__rslab"


def _schema_prep(left, right):
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"columns overlap: {sorted(overlap)}")
    types = {n: t for n, t in zip(lschema.names, lschema.types)}
    types.update({n: t for n, t in zip(rschema.names, rschema.types)})
    return lcols, rcols, types


def _typed_empty(cols: list[str], types: dict) -> pa.Table:
    """Zero-row block with the REAL output schema (all-null-typed empties
    trigger Ray schema-mismatch warnings and break schema dedup)."""
    return pa.table({c: pa.array([], types[c]) for c in cols})


def _restore_int_dtypes(out: pd.DataFrame, cols: list[str], types: dict):
    """Undo the union's null-padding dtype pollution: int columns arrive
    as MASKED integer arrays (int_exact_frame — exact at 64 bits) or,
    defensively, float64; cast back to plain numpy ints once null-free."""
    for c in cols:
        t = types[c]
        if not pa.types.is_integer(t):
            continue
        dt = out[c].dtype
        if (isinstance(dt, pd.api.extensions.ExtensionDtype)
                or dt.kind == "f") and not out[c].isna().any():
            out[c] = out[c].to_numpy(dtype=t.to_pandas_dtype())
    return out


def _interval_slabs(lo: np.ndarray, hi: np.ndarray, w: float):
    """(rep_idx, slab) replication of [lo, hi) intervals onto width-w
    slabs — the slab containing ``hi`` is skipped when hi sits exactly on
    a slab edge (half-open)."""
    s0 = np.floor(lo / w).astype(np.int64)
    s1 = np.ceil(hi / w).astype(np.int64) - 1
    s1 = np.maximum(s1, s0)
    counts = (s1 - s0 + 1).astype(np.int64)
    rep = np.repeat(np.arange(len(lo)), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slab = np.arange(int(counts.sum())) - np.repeat(starts, counts) + s0[rep]
    return rep, slab


def bucketed_range_join(left, right, *, value_col: str, lo_col: str,
                        hi_col: str, bucket_width: float,
                        n_buckets: int = 64):
    """Large x large range join via value-axis quantization.

    Each RIGHT interval replicates to every width-``bucket_width`` slab
    it overlaps; each LEFT value goes to its single slab; slabs map into
    ``n_buckets`` COARSE shuffle buckets (slab % n_buckets — one
    map_groups task per bucket, not the O(#slabs) Python-call shape) and
    inside each bucket the exact half-open compare runs vectorized PER
    SLAB (two slabs of one interval landing in the same bucket must not
    double-match, so slabs stay separate inner groups).  Pick
    ``bucket_width`` >= the typical interval length so replication stays
    O(1) per interval.
    """
    lcols, rcols, types = _schema_prep(left, right)

    def pad_left(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        slab = np.floor(v / bucket_width).astype(np.int64)
        cols = {c: b.column(c) for c in lcols}
        for c in rcols:
            cols[c] = pa.nulls(len(b), types[c])
        out = pa.table(cols)
        return (
            out.append_column(_SLAB, pa.array(slab))
            .append_column(_BUCKET, pa.array(slab % n_buckets))
            .append_column(_SIDE, pa.array(np.zeros(len(b), dtype=np.int8)))
        )

    def pad_right(b: pa.Table) -> pa.Table:
        lo = b.column(lo_col).to_numpy(zero_copy_only=False).astype(np.float64)
        hi = b.column(hi_col).to_numpy(zero_copy_only=False).astype(np.float64)
        rep, slab = _interval_slabs(lo, hi, bucket_width)
        cols = {}
        for c in lcols:
            cols[c] = pa.nulls(len(rep), types[c])
        taken = b.take(pa.array(rep))
        for c in rcols:
            cols[c] = taken.column(c)
        out = pa.table(cols)
        return (
            out.append_column(_SLAB, pa.array(slab))
            .append_column(_BUCKET, pa.array(slab % n_buckets))
            .append_column(_SIDE, pa.array(np.ones(len(rep), dtype=np.int8)))
        )

    lt = left.map_batches(pad_left, batch_format="pyarrow")
    rt = right.map_batches(pad_right, batch_format="pyarrow")
    both = lt.union(rt)

    def join_bucket(t: pa.Table) -> pa.Table:
        g = int_exact_frame(t)
        outs = []
        for _, sg in g.groupby(_SLAB, sort=False):
            l = sg[sg[_SIDE] == 0]
            r = sg[sg[_SIDE] == 1]
            if len(l) == 0 or len(r) == 0:
                continue
            v = l[value_col].to_numpy(dtype=np.float64)
            lo = r[lo_col].to_numpy(dtype=np.float64)
            hi = r[hi_col].to_numpy(dtype=np.float64)
            vi, ii = _match_intervals(v, lo, hi)
            outs.append(pd.concat(
                [
                    l.iloc[vi][lcols].reset_index(drop=True),
                    r.iloc[ii][rcols].reset_index(drop=True),
                ],
                axis=1,
            ))
        if not outs:
            return _typed_empty(lcols + rcols, types)
        out = pd.concat(outs, ignore_index=True)
        out = _restore_int_dtypes(out, lcols + rcols, types)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return both.groupby(_BUCKET).map_groups(join_bucket, batch_format="pyarrow")


def keyed_range_join(left, right, *, left_key: str, right_key: str,
                     value_col: str, lo_col: str, hi_col: str,
                     bucket_width: int, n_buckets: int = 64):
    """Keyed (``by=`` + interval) range join: left row matches right rows
    with ``left.key == right.key AND lo <= v < hi`` — per-key validity
    intervals, the asof-style bucketing.

    Scale shape: the shuffle key is hash(key) combined with the value
    slab, so only rows that can possibly match co-locate (an interval
    replicates to its few slabs WITHIN its key, exactly like the unkeyed
    join).  Inside each coarse bucket the (key, slab) pairs are
    factorized and folded into ONE integer composite axis
    ``pair_code * bucket_width + (v - slab*width)`` — a single vectorized
    sweep matches every key's values at once, no per-key Python loop.
    The composite is exact for int64 axes (timestamps, cents); float
    axes would need a per-pair fallback and are rejected.
    """
    lcols, rcols, types = _schema_prep(left, right)
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be a positive integer")

    def pad_left(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        if v.dtype.kind != "i":
            raise TypeError(f"{value_col} must be int64 (got {v.dtype})")
        slab = v // w
        cols = {c: b.column(c) for c in lcols}
        for c in rcols:
            cols[c] = pa.nulls(len(b), types[c])
        out = pa.table(cols)
        key_h = _bucket_ids(b.select([left_key]).rename_columns(["__k"]),
                            ["__k"], 1 << 62)
        bucket = ((key_h.astype(np.uint64)
                   * np.uint64(1099511628211)
                   + slab.astype(np.uint64))
                  % np.uint64(n_buckets)).astype(np.int64)
        return (
            out.append_column(_SLAB, pa.array(slab))
            .append_column(_BUCKET, pa.array(bucket))
            .append_column(_SIDE, pa.array(np.zeros(len(b), dtype=np.int8)))
        )

    def pad_right(b: pa.Table) -> pa.Table:
        lo = b.column(lo_col).to_numpy(zero_copy_only=False)
        hi = b.column(hi_col).to_numpy(zero_copy_only=False)
        if lo.dtype.kind != "i" or hi.dtype.kind != "i":
            raise TypeError(f"{lo_col}/{hi_col} must be int64")
        # slab replication in exact integer arithmetic (floor div)
        s0 = lo // w
        s1 = np.maximum(-((-hi) // w) - 1, s0)  # ceil(hi/w)-1, int-exact
        counts = (s1 - s0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(lo)), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        slab = np.arange(int(counts.sum())) - np.repeat(starts, counts) + s0[rep]
        cols = {}
        for c in lcols:
            cols[c] = pa.nulls(len(rep), types[c])
        taken = b.take(pa.array(rep))
        for c in rcols:
            cols[c] = taken.column(c)
        out = pa.table(cols)
        key_h = _bucket_ids(out.select([right_key]).rename_columns(["__k"]),
                            ["__k"], 1 << 62)
        bucket = ((key_h.astype(np.uint64)
                   * np.uint64(1099511628211)
                   + slab.astype(np.uint64))
                  % np.uint64(n_buckets)).astype(np.int64)
        return (
            out.append_column(_SLAB, pa.array(slab))
            .append_column(_BUCKET, pa.array(bucket))
            .append_column(_SIDE, pa.array(np.ones(len(rep), dtype=np.int8)))
        )

    lt = left.map_batches(pad_left, batch_format="pyarrow")
    rt = right.map_batches(pad_right, batch_format="pyarrow")
    both = lt.union(rt)

    def join_bucket(t: pa.Table) -> pa.Table:
        g = int_exact_frame(t)
        l = g[g[_SIDE] == 0]
        r = g[g[_SIDE] == 1]
        if len(l) == 0 or len(r) == 0:
            return _typed_empty(lcols + rcols, types)
        l = _restore_int_dtypes(l.copy(), lcols, types)
        r = _restore_int_dtypes(r.copy(), rcols, types)
        lk = l[left_key].to_numpy()
        rk = r[right_key].to_numpy()
        ls = l[_SLAB].to_numpy(dtype=np.int64)
        rs = r[_SLAB].to_numpy(dtype=np.int64)
        pair = pd.MultiIndex.from_arrays(
            [np.concatenate([lk, rk]), np.concatenate([ls, rs])]
        )
        codes, _ = pd.factorize(pair, sort=False)
        cl = codes[: len(l)].astype(np.int64)
        cr = codes[len(l):].astype(np.int64)
        ncodes = int(codes.max()) + 1
        if ncodes * w >= (1 << 62):
            raise OverflowError(
                "composite axis overflow: raise n_buckets or shrink "
                "bucket_width so pairs-per-bucket x width fits int64"
            )
        v = l[value_col].to_numpy(dtype=np.int64)
        lo = r[lo_col].to_numpy(dtype=np.int64)
        hi = r[hi_col].to_numpy(dtype=np.int64)
        comp_v = cl * w + (v - ls * w)
        comp_lo = cr * w + np.clip(lo - rs * w, 0, w)
        comp_hi = cr * w + np.clip(hi - rs * w, 0, w)
        vi, ii = _match_intervals(comp_v, comp_lo, comp_hi)
        out = pd.concat(
            [
                l.iloc[vi][lcols].reset_index(drop=True),
                r.iloc[ii][rcols].reset_index(drop=True),
            ],
            axis=1,
        )
        out = _restore_int_dtypes(out, lcols + rcols, types)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return both.groupby(_BUCKET).map_groups(join_bucket, batch_format="pyarrow")


def lpm_lookup(pts, table, *, x_col: str, lo_col: str = "lo",
               hi_col: str = "hi", len_col: str = "len",
               id_col: str = "rid", keep_cols: list[str] | None = None):
    """LONGEST-PREFIX-MATCH lookup — the CIDR / IP-geolocation join:
    each point value matches the longest (most specific) enclosing
    interval of a broadcast LAMINAR interval family (every two
    intervals are nested or disjoint — the CIDR property).

    Broadcast-side state: per prefix LENGTH a sorted (lo, hi, id)
    array; the probe is one vectorized pass per length, most-specific
    first — ``idx = searchsorted(lo_L, x, 'right') - 1`` then an
    ``x <= hi`` check — so a point takes its first (= longest) hit and
    drops out.  <= L passes per batch, no shuffle, immune to point
    skew (the PIP-join discipline).  Unmatched points emit len = -1,
    id = -1 (the LEFT join contract).

    Output: point pass-through columns + (len, id).
    """
    import ray

    t = table if isinstance(table, pa.Table) else pa.table(table)
    lo = t.column(lo_col).to_numpy(zero_copy_only=False).astype(np.int64)
    hi = t.column(hi_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ln = t.column(len_col).to_numpy(zero_copy_only=False).astype(np.int64)
    rid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    by_len = []
    for lv in sorted(set(ln.tolist()), reverse=True):
        m = ln == lv
        o = np.argsort(lo[m], kind="mergesort")
        by_len.append((int(lv), lo[m][o], hi[m][o], rid[m][o]))
    blob = ray.put(by_len) if ray.is_initialized() else by_len

    def probe(b: pa.Table, _ref=blob) -> pa.Table:
        from ..stages.graph import _get_blob

        tbl = _get_blob(_ref) if not isinstance(_ref, list) else _ref
        x = b.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out_len = np.full(len(x), -1, dtype=np.int64)
        out_id = np.full(len(x), -1, dtype=np.int64)
        un = np.ones(len(x), dtype=bool)
        for lv, lo_s, hi_s, id_s in tbl:
            if not un.any() or len(lo_s) == 0:
                break
            xi = x[un]
            idx = np.searchsorted(lo_s, xi, side="right") - 1
            ok = idx >= 0
            idx = np.maximum(idx, 0)
            ok &= xi <= hi_s[idx]
            tgt = np.flatnonzero(un)[ok]
            out_len[tgt] = lv
            out_id[tgt] = id_s[idx[ok]]
            un[tgt] = False
        keep = b.select(keep_cols) if keep_cols else b
        return keep.append_column("len", pa.array(out_len)) \
            .append_column("rid", pa.array(out_id))

    return pts.map_batches(probe, batch_format="pyarrow")
