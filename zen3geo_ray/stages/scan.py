"""Distributed prefix scan (cumulative aggregates over a global order)
and the sequence-packing shard assignment built on it.

The reference composes streams in a fixed iteration order
(torchdata pipes are ordered generators — e.g. xbatcher enumeration,
`/root/reference/zen3geo/datapipes/xbatcher.py:105-110`); the tabular
analog of "running state along the stream" is a cumulative aggregate
over a global order column.  The scale shape is the classic two-pass
scan:

* pass 1 — ``map_batches`` reduces every block to ONE summary row
  ``(lo, hi, total)``; only these O(#blocks) rows reach the driver;
* the driver sorts summaries by ``lo``, verifies the blocks are
  non-overlapping ranges of the order column (parquet written sorted on
  the order column stays block-contiguous under Ray's read splitting;
  a violation raises rather than silently mis-scanning), computes the
  EXCLUSIVE running offsets and broadcasts them via ``ray.put``;
* pass 2 — ``map_batches`` re-executes the same deterministic upstream
  and emits ``offset[block.lo] + local cumsum`` per row.

No shuffle ever moves data rows; the input is scanned twice (pass 1
reads only the two needed columns).  Both passes map whole blocks
(``batch_size=None``), so the block↔offset association is exact.

``pack_sequences`` derives training-shard ids from the scan: shard =
exclusive_cumsum(tokens) // budget — documents are packed in order and
a document straddling a budget boundary belongs to the shard where it
starts.  (True greedy bin packing — "open a new shard when the doc
doesn't fit" — is a non-associative sequential recurrence and cannot be
distributed exactly; the straddle convention is associative, one integer
division away from the scan, and what a deterministic resumable 100-TB
shard layout needs.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _block_summary(batch: pa.Table, order_col: str, value_col: str) -> pa.Table:
    if len(batch) == 0:
        return pa.table({"lo": pa.array([], pa.int64()),
                         "hi": pa.array([], pa.int64()),
                         "total": pa.array([], pa.int64())})
    o = batch.column(order_col).to_numpy(zero_copy_only=False)
    v = batch.column(value_col).to_numpy(zero_copy_only=False)
    return pa.table({
        "lo": pa.array([int(o.min())], pa.int64()),
        "hi": pa.array([int(o.max())], pa.int64()),
        "total": pa.array([int(v.sum())], pa.int64()),
    })


def prefix_scan(ds, order_col: str, value_col: str, out_col: str | None = None,
                inclusive: bool = True):
    """Cumulative sum of ``value_col`` over the global ``order_col`` order.

    Requires integer order/value columns and block-contiguous order
    ranges (see module docstring).  Returns the input columns plus
    ``out_col`` (default ``{value_col}_cum``): the inclusive (or
    exclusive) running total in order_col order.
    """
    import ray

    out_col = out_col or f"{value_col}_cum"

    summaries = ds.map_batches(
        lambda b: _block_summary(b, order_col, value_col),
        batch_format="pyarrow",
    ).to_pandas()  # bounded: one row per block
    summaries = summaries.sort_values("lo", kind="mergesort").reset_index(drop=True)
    lo = summaries["lo"].to_numpy()
    hi = summaries["hi"].to_numpy()
    if len(lo) > 1 and (lo[1:] < hi[:-1]).any():
        raise ValueError(
            f"prefix_scan: blocks overlap in {order_col} — input must be "
            "block-contiguous (written sorted on the order column)"
        )
    offsets = np.concatenate([[0], np.cumsum(summaries["total"].to_numpy())[:-1]])
    off_ref = ray.put({int(k): int(v) for k, v in zip(lo, offsets)})

    def add_cum(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        off_map = ray.get(off_ref)
        o = batch.column(order_col).to_numpy(zero_copy_only=False)
        order = np.argsort(o, kind="mergesort")
        v = batch.column(value_col).to_numpy(zero_copy_only=False)[order]
        try:
            off = off_map[int(o.min())]
        except KeyError:
            raise RuntimeError(
                "prefix_scan: pass-2 block boundaries diverged from pass 1 "
                "(non-deterministic upstream?)"
            )
        cum = np.cumsum(v) + off
        if not inclusive:
            cum -= v
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return batch.append_column(out_col, pa.array(cum[inv], pa.int64()))

    return ds.map_batches(add_cum, batch_format="pyarrow")


def pack_sequences(ds, order_col: str, token_col: str, budget: int,
                   shard_col: str = "shard", cum_col: str = "cum"):
    """Assign each row (document) to a token-budget shard, in order.

    shard = exclusive running token total // budget — deterministic,
    resumable (a shard is a pure function of the prefix totals), and
    exactly mirrored by SQL ``SUM() OVER (ORDER BY ...)``.
    """
    scanned = prefix_scan(ds, order_col, token_col, out_col=cum_col,
                          inclusive=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        cum = batch.column(cum_col).to_numpy(zero_copy_only=False)
        v = batch.column(token_col).to_numpy(zero_copy_only=False)
        shard = (cum - v) // budget
        return batch.append_column(shard_col, pa.array(shard, pa.int64()))

    return scanned.map_batches(add_shard, batch_format="pyarrow")
