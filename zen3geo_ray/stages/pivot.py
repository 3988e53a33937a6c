"""Pivot (long -> wide conditional aggregation) and ordered group-concat.

Reshaping ops a reference user reaches for right after groupby (the
torchdata collate analog of "one row per key, one column per category";
reference collate surface: /root/reference/zen3geo/datapipes/xbatcher.py
collate_fn docs).  Scale shapes:

* ``pivot_table`` — the pivot-value universe is SMALL by definition (it
  becomes columns), so it is resolved once up front (caller-supplied or
  a bounded streamed distinct) and FIXED; then a per-batch combiner
  pre-aggregates (index, pivot) partials so only one row per (index,
  pivot, block) shuffles, and a coarse-bucket reduce emits wide rows.
  Index cardinality can be arbitrarily large — index keys never meet
  the driver.
* ``group_concat`` — order-sensitive string aggregation; coarse buckets
  keep whole keys together (stages/bucketed.py contract) and the
  in-bucket sort + join is vectorized pandas.  Exact (string concat has
  no float hazards), so ``string_agg(... ORDER BY ...)`` mirrors it.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import bucketed_groupby


def sanitize(val: str) -> str:
    """Pivot value -> column-name fragment (lowercase, [a-z0-9_])."""
    return re.sub(r"[^a-z0-9]+", "_", str(val).lower()).strip("_")


def distinct_small(ds, col: str) -> list:
    """Distinct values of a LOW-CARDINALITY column: per-block unique
    partials, bounded streamed driver union (never more than one partial
    plus the accumulator held) — the pivot-universe resolver."""

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({col: b.column(col).unique()})

    vals: set = set()
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        vals.update(b.column(col).to_pylist())
    return sorted(vals)


def pivot_table(ds, index_cols: list[str], pivot_col: str,
                value_col: str | None = None, pivot_values: list | None = None,
                count_prefix: str = "n", sum_prefix: str | None = "sum",
                n_buckets: int = 64):
    """Wide conditional aggregation: one row per index key, per pivot
    value a count column ``{count_prefix}_{sanitize(v)}`` and (when
    ``value_col`` is an int64 measure) a sum column
    ``{sum_prefix}_{sanitize(v)}``.  Missing cells are 0 — the exact
    integer arithmetic of ``SUM(CASE WHEN pivot = v THEN ...)``.
    """
    if pivot_values is None:
        pivot_values = distinct_small(ds, pivot_col)
    pivot_values = list(pivot_values)
    frags = [sanitize(v) for v in pivot_values]
    if len(set(frags)) != len(frags):
        raise ValueError(f"pivot values collide after sanitize: {frags}")

    def part(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c).to_numpy(zero_copy_only=False)
                for c in index_cols}
        cols[pivot_col] = batch.column(pivot_col).to_numpy(
            zero_copy_only=False)
        if value_col is not None:
            cols[value_col] = batch.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(cols)
        agg = (df.groupby(index_cols + [pivot_col], sort=False)
               .agg(__n=(pivot_col, "size"),
                    **({"__s": (value_col, "sum")} if value_col else {}))
               .reset_index())
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    partials = ds.map_batches(part, batch_format="pyarrow")

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        merged = (g.groupby(index_cols + [pivot_col], sort=False,
                            as_index=False).sum())
        out = merged[index_cols].drop_duplicates().reset_index(drop=True)
        out = out.set_index(index_cols)
        for v, frag in zip(pivot_values, frags):
            sel = merged[merged[pivot_col] == v].set_index(index_cols)
            out[f"{count_prefix}_{frag}"] = sel["__n"].reindex(
                out.index, fill_value=0).astype(np.int64)
            if value_col is not None:
                out[f"{sum_prefix}_{frag}"] = sel["__s"].reindex(
                    out.index, fill_value=0).astype(np.int64)
        return out.reset_index()

    return bucketed_groupby(partials, index_cols, widen, n_buckets=n_buckets)


def group_concat(ds, key_cols: list[str], value_col: str,
                 order_cols: list[str], sep: str = ",",
                 out_col: str | None = None, n_buckets: int = 64):
    """Per-key ordered string concatenation —
    ``string_agg(value, sep ORDER BY order_cols)``."""
    out_col = out_col or f"{value_col}_seq"

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        agg = (g.groupby(key_cols, sort=False)[value_col]
               .agg(sep.join).reset_index()
               .rename(columns={value_col: out_col}))
        return agg

    return bucketed_groupby(ds, key_cols, fn, n_buckets=n_buckets)


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_col: str = "variable", value_out: str = "value"):
    """Unpivot (wide -> long): one output row per (input row, value
    column), ``var_col`` naming the source column.  Pure ``map_batches``
    — each batch emits its stacked copies, no shuffle; the value columns
    must share one type (the UNION ALL contract).
    """

    def fn(batch: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            cols = {c: batch.column(c) for c in id_cols}
            cols[var_col] = pa.array([vc] * len(batch), pa.string())
            cols[value_out] = batch.column(vc)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow")
