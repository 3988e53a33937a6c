"""Large-x-large equi-joins (the non-broadcast join path).

The reference has only positional zips and broadcast pairings (SURVEY
§2.3 joins); at engine scale two big tables sometimes must join on a key
(points x points on cell, orders x lineitem).  Two implementations:

* ``equi_join`` — Ray Data's built-in hash-partitioned ``Dataset.join``
  when available (Ray >= 2.46), with ``num_partitions`` as the explicit
  shuffle-width knob;
* ``bucketed_join`` — the portable fallback: pad both sides to a shared
  schema, tag them, union, ONE all-to-all on ``hash(key) % B``, then a
  vectorized pandas merge inside each bucket.

Skew note: a hot key lands in one bucket either way — for skewed keys
pre-aggregate the skewed side first (stages/zonal.py) or broadcast it if
small enough; joins replicate rows, so salting alone cannot fix a hot
join key without replicating the other side (document per pipeline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import _bucket_ids, int_exact_frame, nullable_int_name

_SIDE = "__side"
_BUCKET = "__jbucket"


def equi_join(left, right, on: list[str], how: str = "inner",
              num_partitions: int = 32, right_on: list[str] | None = None):
    """Hash-partitioned join via Dataset.join (falls back to bucketed)."""
    try:
        return left.join(
            right,
            join_type=how,
            num_partitions=num_partitions,
            on=tuple(on),
            right_on=tuple(right_on) if right_on else None,
        )
    except (AttributeError, TypeError):
        if right_on and list(right_on) != list(on):
            raise NotImplementedError("bucketed fallback needs same key names")
        return bucketed_join(left, right, on, how=how, n_buckets=num_partitions)


_KEYSET_CACHE: dict = {}


def _get_keyset(ref):
    """Per-worker-process memoized ray.get of a broadcast key array
    (the stages/join.py / stages/graph.py pattern)."""
    import ray

    k = ref.hex() if hasattr(ref, "hex") else id(ref)
    if k not in _KEYSET_CACHE:
        _KEYSET_CACHE[k] = ray.get(ref)
    return _KEYSET_CACHE[k]


def broadcast_semi(left, keys, on: str, *, anti: bool = False,
                   threshold: int = 2_000_000, n_buckets: int = 32):
    """Semi/anti filter of ``left`` against a key Dataset WITHOUT a
    shuffle: when the key side's row count fits under ``threshold``,
    the distinct sorted int64 keys ship once via ``ray.put`` and every
    block filters with a per-worker memoized searchsorted — the big
    side never moves, and one Sort barrier disappears from the plan
    (q3_top measured the semi's all-to-all as pure stage latency).
    Above the threshold the bucketed semi/anti join runs (the
    cluster-scale path).  Single int64 key column only."""
    import ray

    keys = keys.materialize()
    if keys.count() > threshold:
        return bucketed_join(left, keys, [on],
                             how="anti" if anti else "semi",
                             n_buckets=n_buckets)
    kdf = keys.to_pandas()
    # an empty key Dataset can surface as a column-less DataFrame
    arr = (np.unique(kdf[on].to_numpy().astype(np.int64))
           if on in kdf.columns else np.empty(0, dtype=np.int64))
    ref = ray.put(arr)

    def flt(b: pa.Table, _ref=ref) -> pa.Table:
        ks = _get_keyset(_ref)
        v = b.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ks) == 0:
            hit = np.zeros(len(v), dtype=bool)
        else:
            ix = np.minimum(np.searchsorted(ks, v), len(ks) - 1)
            hit = ks[ix] == v
        return b.filter(pa.array(~hit if anti else hit))

    return left.map_batches(flt, batch_format="pyarrow")


def _tagged_union(left, right, on: list[str], n_buckets: int,
                  keep_right_cols: bool = True):
    """Pad both sides to a shared schema, tag side + coarse key bucket,
    union — the single all-to-all every bucketed join variant shares."""
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c not in on] if keep_right_cols else []
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key columns overlap: {sorted(overlap)}")
    types = {n: t for n, t in zip(lschema.names, lschema.types)}
    types.update({n: t for n, t in zip(rschema.names, rschema.types)})
    all_cols = lcols + rcols

    def pad(side: int):
        def fn(b: pa.Table) -> pa.Table:
            n = len(b)
            cols = {}
            for name in all_cols:
                if name in b.column_names:
                    cols[name] = b.column(name)
                else:
                    cols[name] = pa.nulls(n, types[name])
            out = pa.table(cols)
            bucket = _bucket_ids(b, on, n_buckets)
            return out.append_column(_BUCKET, pa.array(bucket)).append_column(
                _SIDE, pa.array(np.full(n, side, dtype=np.int8))
            )

        return fn

    lt = left.map_batches(pad(0), batch_format="pyarrow")
    rt = right.map_batches(pad(1), batch_format="pyarrow")

    def restore(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
        """Undo the union's dtype pollution: padding the OTHER side with
        nulls makes int columns arrive as MASKED integer arrays (via
        int_exact_frame — exact at all 64 bits, unlike the old float64
        fallback); once a side is subset back to its own (non-null) rows,
        cast ints back to plain numpy so key hashing and merges run at
        native speed."""
        df = df[cols]
        for c in cols:
            if not pa.types.is_integer(types[c]):
                continue
            dt = df[c].dtype
            if (isinstance(dt, pd.api.extensions.ExtensionDtype)
                    or dt.kind == "f") and not df[c].isna().any():
                df = df.assign(
                    **{c: df[c].to_numpy(dtype=types[c].to_pandas_dtype())})
        return df

    return (lt.union(rt), lcols, rcols, restore, types)


def bucketed_join(left, right, on: list[str], how: str = "inner",
                  n_buckets: int = 64):
    """Portable partitioned hash join (same key names on both sides;
    non-key columns must be disjoint).

    how: 'inner' | 'left' | 'semi' | 'anti'.  Semi/anti return LEFT rows
    filtered by key existence on the right (each left row at most once) —
    the distributed NOT IN / EXISTS shape, no driver-side key set.
    """
    filter_only = how in ("semi", "anti")
    both, lcols, rcols, restore, types = _tagged_union(
        left, right, on, n_buckets, keep_right_cols=not filter_only
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        g = int_exact_frame(t)
        l = restore(g[g[_SIDE] == 0], lcols)
        if filter_only:
            rkeys = restore(g[g[_SIDE] == 1], on).drop_duplicates()
            m = l.merge(rkeys, how="left", on=on, indicator=True)
            want = "both" if how == "semi" else "left_only"
            merged = m[m["_merge"] == want].drop(columns=["_merge"])
        else:
            r = restore(g[g[_SIDE] == 1], on + rcols)
            if how == "left":
                # unmatched left rows put nulls in right payloads; masked
                # ints keep them exact (plain int64 would fall back to
                # lossy float64 and emit mixed int/double block schemas)
                for c in rcols:
                    if pa.types.is_integer(types[c]):
                        r = r.assign(
                            **{c: r[c].astype(nullable_int_name(types[c]))})
            merged = l.merge(r, how=how, on=on)
        return pa.Table.from_pandas(merged, preserve_index=False).replace_schema_metadata(None)

    return both.groupby(_BUCKET).map_groups(join_bucket, batch_format="pyarrow")


def asof_join(left, right, by: list[str], on: str, n_buckets: int = 64,
              direction: str = "backward"):
    """Distributed AS-OF join: for each left row, the single right row of
    the same ``by`` key with the largest ``on`` <= left's ``on``
    (direction='backward'; 'forward' = smallest >=).  Left-join
    semantics — unmatched left rows keep nulls.

    One coarse-bucket shuffle on the ``by`` key (the order column stays
    OUT of the bucket hash so a key's whole timeline co-locates), then a
    vectorized ``pd.merge_asof`` per bucket over ``on``-sorted frames —
    the standard partitioned as-of plan; skew note: one key's full
    history lands in one bucket, pre-filter or split by time range for
    pathological keys.  Ties on (key, on) resolve to the LAST right row
    in (on)-order, matching DuckDB's ASOF JOIN with unique (key, on)
    rows (dedupe the right side first if it has exact duplicates).
    """
    lschema = left.schema()
    rschema = right.schema()
    shared = list(by) + [on]
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c not in shared]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key columns overlap: {sorted(overlap)}")
    types = {n: t for n, t in zip(lschema.names, lschema.types)}
    types.update({n: t for n, t in zip(rschema.names, rschema.types)})
    all_cols = lcols + rcols

    def pad(side: int):
        def fn(b: pa.Table) -> pa.Table:
            n = len(b)
            cols = {}
            for name in all_cols:
                if name in b.column_names:
                    cols[name] = b.column(name)
                else:
                    cols[name] = pa.nulls(n, types[name])
            out = pa.table(cols)
            bucket = _bucket_ids(b, by, n_buckets)
            return out.append_column(_BUCKET, pa.array(bucket)).append_column(
                _SIDE, pa.array(np.full(n, side, dtype=np.int8))
            )

        return fn

    lt = left.map_batches(pad(0), batch_format="pyarrow")
    rt = right.map_batches(pad(1), batch_format="pyarrow")
    both = lt.union(rt)

    def restore(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
        df = df[cols]
        for c in cols:
            if not pa.types.is_integer(types[c]):
                continue
            dt = df[c].dtype
            if (isinstance(dt, pd.api.extensions.ExtensionDtype)
                    or dt.kind == "f") and not df[c].isna().any():
                df = df.assign(
                    **{c: df[c].to_numpy(dtype=types[c].to_pandas_dtype())})
        return df

    def join_bucket(t: pa.Table) -> pa.Table:
        g = int_exact_frame(t)
        l = restore(g[g[_SIDE] == 0], lcols).sort_values(on, kind="mergesort")
        r = restore(g[g[_SIDE] == 1], shared + rcols).sort_values(
            on, kind="mergesort"
        )
        # as-of is left-join-shaped: unmatched rows null the right
        # payloads — masked ints keep them exact (see bucketed_join)
        for c in rcols:
            if pa.types.is_integer(types[c]):
                r = r.assign(**{c: r[c].astype(nullable_int_name(types[c]))})
        merged = pd.merge_asof(l, r, on=on, by=by, direction=direction)
        return pa.Table.from_pandas(merged, preserve_index=False).replace_schema_metadata(None)

    return both.groupby(_BUCKET).map_groups(join_bucket, batch_format="pyarrow")


def sort_merge_join(left, right, on: list[str], how: str = "inner",
                    n_buckets: int = 64):
    """Sort-merge variant of the bucketed join: within each bucket both
    sides are sorted on the key and merged with ``pd.merge(..., sort=
    True)`` semantics — output rows come back key-ordered per bucket.

    Same single all-to-all as ``bucketed_join``; pick this when a
    downstream stage wants per-bucket key order (e.g. range windows over
    the join result) — the hash variant returns probe order.
    """
    if how not in ("inner", "left"):
        raise ValueError("sort_merge_join supports how='inner'|'left'")
    both, lcols, rcols, restore, types = _tagged_union(left, right, on,
                                                       n_buckets)

    def join_bucket(t: pa.Table) -> pa.Table:
        g = int_exact_frame(t)
        l = restore(g[g[_SIDE] == 0], lcols).sort_values(on, kind="mergesort")
        r = restore(g[g[_SIDE] == 1], on + rcols).sort_values(on, kind="mergesort")
        if how == "left":
            for c in rcols:
                if pa.types.is_integer(types[c]):
                    r = r.assign(
                        **{c: r[c].astype(nullable_int_name(types[c]))})
        merged = pd.merge_ordered(l, r, on=on, how=how)
        return pa.Table.from_pandas(merged, preserve_index=False).replace_schema_metadata(None)

    return both.groupby(_BUCKET).map_groups(join_bucket, batch_format="pyarrow")
