"""Coarse-bucket grouped execution — the scalable keyed-reduce pattern.

``groupby(key).map_groups(fn)`` costs a Python call per GROUP; with
millions of tiny key groups (urls, LSH buckets) that is the bottleneck,
not the data.  The scale shape used across this engine: shuffle on a
COARSE bucket (`hash(key) % B`, B ~ #CPUs x 4) and run a VECTORIZED
pandas/numpy reduction over each bucket's rows — per-key semantics are
preserved because every row of one key lands in the same bucket, while
the Python-call count drops from |keys| to B.  This is also the natural
place to salt skew: B spreads hot keys' *shuffle* pressure only when the
reduce is associative; order-sensitive reduces keep whole keys together
by construction here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import fnv1a_str_array

_BUCKET = "__bucket"


def int_exact_frame(t: pa.Table) -> pd.DataFrame:
    """Arrow -> pandas WITHOUT the int64-through-float64 hazard.

    pandas' default Arrow conversion turns an integer column that holds
    ANY null into float64 — every padded bucketed-join union does this to
    the other side's payload columns, silently corrupting values above
    2^53 (64-bit hashed node ids, fixed-point ranks).  Null-bearing
    integer columns are therefore converted to pandas MASKED integer
    arrays (exact int64 storage + separate validity mask); null-free
    columns take the normal fast path so the hot joins pay nothing.
    """
    risky = [
        c for c in t.column_names
        if pa.types.is_integer(t.schema.field(c).type)
        and t.column(c).null_count > 0
    ]
    if not risky:
        return t.to_pandas()
    df = t.drop_columns(risky).to_pandas()
    for c in risky:
        arr = t.column(c).combine_chunks()
        mask = arr.is_null().to_numpy(zero_copy_only=False)
        vals = arr.fill_null(0).to_numpy(zero_copy_only=False)
        df[c] = pd.arrays.IntegerArray(np.ascontiguousarray(vals), mask)
    return df[t.column_names]


def _bucket_ids(batch: pa.Table, key_cols: list[str], n_buckets: int) -> np.ndarray:
    h = np.zeros(len(batch), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            col = batch.column(c)
            if pa.types.is_integer(col.type):
                v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            elif pa.types.is_floating(col.type):
                f = col.to_numpy(zero_copy_only=False).astype(np.float64)
                # canonicalize before hashing by bit pattern: -0.0 == 0.0
                # under the in-bucket merge, and every NaN payload compares
                # the same way — collapse both to one representative
                f = f + 0.0
                f = np.where(np.isnan(f), np.float64(np.nan), f)
                v = f.view(np.uint64)
            else:
                v = fnv1a_str_array(col.to_pylist())
            h = h * np.uint64(1099511628211) + v
            h ^= h >> np.uint64(29)
    return (h % np.uint64(n_buckets)).astype(np.int64)


_NULLABLE_INT = {
    "int8": "Int8", "int16": "Int16", "int32": "Int32", "int64": "Int64",
    "uint8": "UInt8", "uint16": "UInt16", "uint32": "UInt32",
    "uint64": "UInt64",
}


def nullable_int_name(pa_type: pa.DataType) -> str:
    """pandas masked dtype name matching an Arrow integer type — used to
    keep int payloads exact through a LEFT merge (whose unmatched rows
    would otherwise force the lossy float64 fallback)."""
    return _NULLABLE_INT[str(pa_type)]


def bucketed_groupby(ds, key_cols: list[str], bucket_fn, n_buckets: int = 64):
    """Shuffle by coarse bucket; ``bucket_fn(pandas_df) -> pandas_df`` runs
    once per bucket with ALL rows of its keys (vectorize inside!)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            _BUCKET, pa.array(_bucket_ids(batch, key_cols, n_buckets))
        )

    def run(t: pa.Table) -> pa.Table:
        # int_exact_frame (not Ray's pandas conversion): a chained left
        # join upstream can leave nulls in int columns, and the default
        # float64 fallback corrupts values above 2^53
        out = bucket_fn(int_exact_frame(t.drop_columns([_BUCKET])))
        # emit Arrow blocks: downstream groupby/aggregate over pandas
        # blocks is an order of magnitude slower in Ray Data
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(run, batch_format="pyarrow")
    )


def first_per_key(ds, key_cols: list[str], order_cols: list[str],
                  n_buckets: int = 64):
    """First row per key in order_cols order — vectorized drop_duplicates."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_cols, kind="mergesort").drop_duplicates(
            key_cols, keep="first"
        )

    return bucketed_groupby(ds, key_cols, fn, n_buckets)


def first_valid_per_key(ds, key_cols: list[str], order_cols: list[str],
                        value_cols: list[str], n_buckets: int = 64):
    """First NON-NULL value per (key, value_col) in order — pandas
    groupby.first() semantics (= stackstac.mosaic first-valid)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        return g.groupby(key_cols, as_index=False, sort=False)[value_cols].first()

    return bucketed_groupby(ds, key_cols, fn, n_buckets)


def stack_per_key(ds, key_cols: list[str], order_cols: list[str],
                  value_col: str, list_col: str | None = None,
                  n_buckets: int = 64):
    """Values stacked to a list per key, sorted by order_cols."""
    list_col = list_col or f"{value_col}_stack"

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        agg = g.groupby(key_cols, sort=False)[value_col].agg(list)
        out = agg.reset_index().rename(columns={value_col: list_col})
        out["n_layers"] = out[list_col].map(len)
        return out

    return bucketed_groupby(ds, key_cols, fn, n_buckets)
