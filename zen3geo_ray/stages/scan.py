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


def pack_span_index(ds, order_col: str, token_col: str, budget: int):
    """GPT-style concatenate-and-split packing INDEX.

    Where :func:`pack_sequences` assigns whole documents to shards,
    this is the other canonical training layout: conceptually
    concatenate every document's tokens in global ``order_col`` order
    and cut the stream into fixed-length chunks of ``budget`` tokens —
    a document that straddles a boundary contributes a slice to each
    chunk it touches.  The output is the index a loader needs to
    assemble chunk ``c`` without materializing the concatenation:

    ``(order_col, chunk_id, doc_off, chunk_off, n_tok)`` — one row per
    (document, chunk) incidence: this document's slice starting at
    token ``doc_off`` (within the doc) lands at position ``chunk_off``
    of chunk ``chunk_id`` and is ``n_tok`` tokens long.  Every chunk
    except the last sums to exactly ``budget``.

    Built on the two-pass :func:`prefix_scan` (one summary row per
    block reaches the driver, data rows never shuffle); the expansion
    to incidence rows is a vectorized repeat — a doc touching ``s``
    chunks emits ``s`` rows, so output size is
    ``n_docs + total_tokens // budget`` rows regardless of skew.
    Zero-token documents emit nothing.

    Mirrored exactly by SQL: exclusive window SUM + per-row
    ``unnest(range(start // B, (start + n - 1) // B + 1))``.
    """
    scanned = prefix_scan(ds, order_col, token_col, out_col="__cum",
                          inclusive=True)

    def expand(batch: pa.Table) -> pa.Table:
        def out(o, c, do, co, nt):
            return pa.table({
                order_col: pa.array(o, pa.int64()),
                "chunk_id": pa.array(c, pa.int64()),
                "doc_off": pa.array(do, pa.int64()),
                "chunk_off": pa.array(co, pa.int64()),
                "n_tok": pa.array(nt, pa.int64()),
            })

        if len(batch) == 0:
            z = np.empty(0, np.int64)
            return out(z, z, z, z, z)
        o = batch.column(order_col).to_numpy(zero_copy_only=False)
        v = batch.column(token_col).to_numpy(zero_copy_only=False)
        cum = batch.column("__cum").to_numpy(zero_copy_only=False)
        start = cum - v
        keep = v > 0
        o, v, start = o[keep], v[keep], start[keep]
        c_lo = start // budget
        nsp = (start + v - 1) // budget - c_lo + 1
        idx = np.repeat(np.arange(len(v)), nsp)
        base = np.concatenate([[0], np.cumsum(nsp)[:-1]])
        c = c_lo[idx] + (np.arange(int(nsp.sum())) - np.repeat(base, nsp))
        cs = c * budget
        s, e = start[idx], (start + v)[idx]
        lo = np.maximum(s, cs)
        hi = np.minimum(e, cs + budget)
        return out(o[idx], c, lo - s, lo - cs, hi - lo)

    return scanned.map_batches(expand, batch_format="pyarrow")


# --- keyed prefix scan (PARTITION BY key ORDER BY order) -------------------

def _ident(x) -> int:
    """Injective ORDER-PRESERVING int64 image of a key/order scalar
    (uint64 shifts by -2^63 — monotone — so the driver's block walk
    chains carries in true sort order; signed ints pass through)."""
    if np.asarray(x).dtype == np.uint64:
        return int(x) - (1 << 63)
    return int(x)


def _kval(x):
    """Key scalar for driver-side block chaining: strings pass through
    (Python str comparison is code-point order, which equals Arrow's
    UTF-8 byte order, so the driver's walk matches Ray's sort), ints go
    through the order-preserving :func:`_ident` image."""
    if isinstance(x, (str, np.str_)):
        return str(x)
    return _ident(x)


def _key_arr(val, ktype: pa.DataType):
    return pa.array([_kval(val)],
                    pa.string() if pa.types.is_string(ktype) else pa.int64())


def keyed_prefix_scan(ds, key_col: str, order_col: str,
                      value_col: str | None = None,
                      out_col: str = "cum", inclusive: bool = True):
    """Per-key running totals: ``SUM(value) OVER (PARTITION BY key ORDER
    BY order)`` (``value_col=None`` counts rows — i.e. ``ROW_NUMBER``-1
    when ``inclusive=False``).

    Requires an integer or STRING ``key_col`` and an integer
    ``order_col`` with UNIQUE (key, order) pairs (ties would need frame
    semantics; the unique-order contract keeps the scan exact and the
    block identity well-defined).

    Scale shape — one distributed range sort plus two light passes:

    * ``ds.sort([key, order])`` range-partitions AND orders the rows, so
      every key's rows are contiguous; the sorted dataset is materialized
      ONCE (a deliberate fork point: both passes must see identical
      block boundaries).
    * pass 1 reduces each block to ONE row: its first/last key and their
      in-block totals.  Only keys that may SPAN a block boundary matter
      for carry, so the driver sees O(#blocks) rows — never O(#keys)
      (cf. the Bloom-merge lesson: a per-key summary would OOM the
      driver at 1e9 keys).
    * the driver chains carries block-to-block (a key spanning many
      blocks accumulates through them) and broadcasts
      ``{block_id: carry_in}`` via ``ray.put``.
    * pass 2 computes a segmented in-block cumsum and adds the carry to
      the head rows of each block's first key.

    Both passes map whole blocks (``batch_size=None``) so the
    block↔carry association is exact.
    """
    import ray

    sorted_ds = ds.sort([key_col, order_col]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        ktype = b.column(key_col).type
        if len(b) == 0:
            kt = pa.string() if pa.types.is_string(ktype) else pa.int64()
            return pa.table({
                "bk": pa.array([], kt), "bo": pa.array([], pa.int64()),
                "fk": pa.array([], kt), "ft": pa.array([], pa.int64()),
                "lk": pa.array([], kt), "lt": pa.array([], pa.int64()),
            })
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        v = (np.ones(len(b), dtype=np.int64) if value_col is None
             else b.column(value_col).to_numpy(zero_copy_only=False)
             .astype(np.int64))
        o = b.column(order_col).to_numpy(zero_copy_only=False)
        first_mask = k == k[0]
        last_mask = k == k[-1]
        return pa.table({
            "bk": _key_arr(k[0], ktype),
            "bo": pa.array([_ident(o[0])], pa.int64()),
            "fk": _key_arr(k[0], ktype),
            "ft": pa.array([int(v[first_mask].sum())], pa.int64()),
            "lk": _key_arr(k[-1], ktype),
            "lt": pa.array([int(v[last_mask].sum())], pa.int64()),
        })

    summ = sorted_ds.map_batches(
        summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # bounded: ONE row per block
    summ = summ.sort_values(["bk", "bo"], kind="mergesort").reset_index(drop=True)

    carries: dict[tuple, int] = {}
    open_key, acc = None, 0
    for row in summ.itertuples(index=False):
        carry = acc if row.fk == open_key else 0
        carries[(_kval(row.bk), int(row.bo))] = carry
        if row.lk == row.fk:
            acc = carry + int(row.lt)
        else:
            acc = int(row.lt)
        open_key = _kval(row.lk)
    carry_ref = ray.put(carries)

    def add_cum(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b.append_column(out_col, pa.array([], pa.int64()))
        cmap = ray.get(carry_ref)
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        o = b.column(order_col).to_numpy(zero_copy_only=False)
        v = (np.ones(len(b), dtype=np.int64) if value_col is None
             else b.column(value_col).to_numpy(zero_copy_only=False)
             .astype(np.int64))
        try:
            carry = cmap[(_kval(k[0]), _ident(o[0]))]
        except KeyError:
            raise RuntimeError(
                "keyed_prefix_scan: pass-2 block boundaries diverged from "
                "pass 1 (non-deterministic upstream?)"
            )
        cs = np.cumsum(v)
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        base = cs[starts] - v[starts]
        run_lens = np.diff(np.concatenate([starts, [len(k)]]))
        cum = cs - np.repeat(base, run_lens)
        cum[k == k[0]] += carry
        if not inclusive:
            cum -= v
        return b.append_column(out_col, pa.array(cum, pa.int64()))

    return sorted_ds.map_batches(add_cum, batch_format="pyarrow",
                                 batch_size=None)


def keyed_lag(ds, key_col: str, order_col: str, value_col: str,
              out_col: str = "prev"):
    """Previous row's value within key — ``LAG(value) OVER (PARTITION BY
    key ORDER BY order)``; null for each key's first row.

    Same contract and scale shape as :func:`keyed_prefix_scan` (integer
    or string key, integer order/value, UNIQUE (key, order) pairs): one
    range sort materialized once, pass 1 reduces each block to ONE row
    (its identity plus its LAST row's key and value), the driver maps
    every block to its predecessor block's last (key, value) — O(#blocks)
    rows — and pass 2 is an in-block shift patching only row 0.
    """
    import ray

    sorted_ds = ds.sort([key_col, order_col]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        ktype = b.column(key_col).type
        kt = pa.string() if pa.types.is_string(ktype) else pa.int64()
        if len(b) == 0:
            return pa.table({
                "bk": pa.array([], kt), "bo": pa.array([], pa.int64()),
                "lk": pa.array([], kt), "lv": pa.array([], pa.int64()),
            })
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        o = b.column(order_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bk": _key_arr(k[0], ktype),
            "bo": pa.array([_ident(o[0])], pa.int64()),
            "lk": _key_arr(k[-1], ktype),
            "lv": pa.array([int(v[-1])], pa.int64()),
        })

    summ = sorted_ds.map_batches(
        summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # bounded: ONE row per block
    summ = summ.sort_values(["bk", "bo"], kind="mergesort").reset_index(drop=True)

    prevs: dict[tuple, tuple] = {}
    last = None  # (last_key, last_value) of the preceding block
    for row in summ.itertuples(index=False):
        prevs[(_kval(row.bk), int(row.bo))] = last
        last = (_kval(row.lk), int(row.lv))
    prev_ref = ray.put(prevs)

    def add_prev(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b.append_column(out_col, pa.array([], pa.int64()))
        pmap = ray.get(prev_ref)
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        try:
            prior = pmap[(_kval(k[0]), _ident(
                b.column(order_col).to_numpy(zero_copy_only=False)[0]))]
        except KeyError:
            raise RuntimeError(
                "keyed_lag: pass-2 block boundaries diverged from pass 1 "
                "(non-deterministic upstream?)"
            )
        prev = np.empty(len(v), dtype=np.int64)
        prev[1:] = v[:-1]
        valid = np.empty(len(v), dtype=bool)
        valid[1:] = k[1:] == k[:-1]
        if prior is not None and prior[0] == _kval(k[0]):
            prev[0], valid[0] = prior[1], True
        else:
            valid[0] = False
        return b.append_column(out_col, pa.array(prev, pa.int64(),
                                                 mask=~valid))

    return sorted_ds.map_batches(add_prev, batch_format="pyarrow",
                                 batch_size=None)


def keyed_rank(ds, key_col: str, value_col: str, uid_col: str,
               rank_col: str = "rnk", dense_col: str = "dnk"):
    """``RANK()`` and ``DENSE_RANK() OVER (PARTITION BY key ORDER BY
    value)`` — the tied-order siblings of :func:`keyed_prefix_scan`.

    Ties are first-class: rank = rows-with-smaller-value + 1, dense =
    distinct-smaller-values + 1, both independent of intra-tie order.
    ``uid_col`` (unique int) is only a sort tiebreaker making block
    identity well-defined when a tie run spans a block boundary.

    Scale shape: one range sort materialized once; pass 1 reduces each
    block to ONE row (identity + its LAST key's row/run/distinct
    counts); the driver chains per-key (rows, run_len, distinct) state
    across blocks — O(#blocks) rows — and pass 2 is a segmented
    vectorized rank with a carry patch on the first key's rows.
    """
    import ray

    sorted_ds = ds.sort([key_col, value_col, uid_col]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        ktype = b.column(key_col).type
        kt = pa.string() if pa.types.is_string(ktype) else pa.int64()
        if len(b) == 0:
            return pa.table({
                "bk": pa.array([], kt), "bv": pa.array([], pa.int64()),
                "bu": pa.array([], pa.int64()), "lk": pa.array([], kt),
                "lv": pa.array([], pa.int64()),
                "n_lk": pa.array([], pa.int64()),
                "n_lkv": pa.array([], pa.int64()),
                "nd_lk": pa.array([], pa.int64()),
            })
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        u = b.column(uid_col).to_numpy(zero_copy_only=False)
        lk_vals = v[k == k[-1]]  # sorted ascending within the key
        return pa.table({
            "bk": _key_arr(k[0], ktype),
            "bv": pa.array([_ident(v[0])], pa.int64()),
            "bu": pa.array([_ident(u[0])], pa.int64()),
            "lk": _key_arr(k[-1], ktype),
            "lv": pa.array([_ident(v[-1])], pa.int64()),
            "n_lk": pa.array([len(lk_vals)], pa.int64()),
            "n_lkv": pa.array([int((lk_vals == v[-1]).sum())], pa.int64()),
            "nd_lk": pa.array([1 + int((np.diff(lk_vals) != 0).sum())],
                              pa.int64()),
        })

    summ = sorted_ds.map_batches(
        summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # bounded: ONE row per block
    summ = summ.sort_values(["bk", "bv", "bu"],
                            kind="mergesort").reset_index(drop=True)

    carries: dict[tuple, tuple] = {}
    open_key, rows, run_val, run_len, distinct = None, 0, None, 0, 0
    for r in summ.itertuples(index=False):
        bk = _kval(r.bk)
        if bk == open_key:
            cont = int(r.bv) == run_val
            carries[(bk, int(r.bv), int(r.bu))] = (
                rows, run_len if cont else 0, distinct, cont)
        else:
            cont = False
            carries[(bk, int(r.bv), int(r.bu))] = (0, 0, 0, False)
        if _kval(r.lk) == bk and bk == open_key:
            rows += int(r.n_lk)
            distinct += int(r.nd_lk) - (1 if cont else 0)
            run_len = (run_len + int(r.n_lkv)
                       if (cont and int(r.nd_lk) == 1) else int(r.n_lkv))
        else:
            rows, distinct, run_len = int(r.n_lk), int(r.nd_lk), int(r.n_lkv)
        run_val, open_key = int(r.lv), _kval(r.lk)
    carry_ref = ray.put(carries)

    def add_ranks(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return (b.append_column(rank_col, pa.array([], pa.int64()))
                    .append_column(dense_col, pa.array([], pa.int64())))
        cmap = ray.get(carry_ref)
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        u = b.column(uid_col).to_numpy(zero_copy_only=False)
        try:
            rb, rl, db, cont = cmap[(_kval(k[0]), _ident(v[0]),
                                     _ident(u[0]))]
        except KeyError:
            raise RuntimeError(
                "keyed_rank: pass-2 block boundaries diverged from pass 1 "
                "(non-deterministic upstream?)"
            )
        key_change = k[1:] != k[:-1]
        run_change = key_change | (v[1:] != v[:-1])
        key_start = np.concatenate([[True], key_change])
        run_start = np.concatenate([[True], run_change])
        key_start_idx = np.flatnonzero(key_start)
        key_id = np.cumsum(key_start) - 1
        key_start_of_row = key_start_idx[key_id]
        run_start_idx = np.flatnonzero(run_start)
        run_id = np.cumsum(run_start) - 1
        run_start_of_row = run_start_idx[run_id]
        rank = (run_start_of_row - key_start_of_row + 1).astype(np.int64)
        dense = (run_id - run_id[key_start_of_row] + 1).astype(np.int64)
        first_key = k == k[0]
        rank[first_key] += rb
        if cont:
            rank[first_key & (v == v[0])] -= rl
            dense[first_key] += db - 1
        else:
            dense[first_key] += db
        return (b.append_column(rank_col, pa.array(rank, pa.int64()))
                .append_column(dense_col, pa.array(dense, pa.int64())))

    return sorted_ds.map_batches(add_ranks, batch_format="pyarrow",
                                 batch_size=None)


def keyed_lead(ds, key_col: str, order_col: str, value_col: str,
               out_col: str = "next"):
    """Next row's value within key — ``LEAD(value) OVER (PARTITION BY
    key ORDER BY order)``; null for each key's last row.

    Mirror of :func:`keyed_lag`: pass 1 reduces each block to ONE row
    (its identity plus its FIRST row's key and value), the driver maps
    every block to its successor block's first (key, value) — O(#blocks)
    rows — and pass 2 is an in-block shift patching only the last row.
    """
    import ray

    sorted_ds = ds.sort([key_col, order_col]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        ktype = b.column(key_col).type
        kt = pa.string() if pa.types.is_string(ktype) else pa.int64()
        if len(b) == 0:
            return pa.table({
                "bk": pa.array([], kt), "bo": pa.array([], pa.int64()),
                "fv": pa.array([], pa.int64()),
            })
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        o = b.column(order_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bk": _key_arr(k[0], ktype),
            "bo": pa.array([_ident(o[0])], pa.int64()),
            "fv": pa.array([int(v[0])], pa.int64()),
        })

    summ = sorted_ds.map_batches(
        summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # bounded: ONE row per block
    summ = summ.sort_values(["bk", "bo"], kind="mergesort").reset_index(drop=True)

    nexts: dict[tuple, tuple] = {}
    ahead = None  # (first_key, first_value) of the following block
    for row in reversed(list(summ.itertuples(index=False))):
        nexts[(_kval(row.bk), int(row.bo))] = ahead
        ahead = (_kval(row.bk), int(row.fv))
    next_ref = ray.put(nexts)

    def add_next(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b.append_column(out_col, pa.array([], pa.int64()))
        nmap = ray.get(next_ref)
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        try:
            succ = nmap[(_kval(k[0]), _ident(
                b.column(order_col).to_numpy(zero_copy_only=False)[0]))]
        except KeyError:
            raise RuntimeError(
                "keyed_lead: pass-2 block boundaries diverged from pass 1 "
                "(non-deterministic upstream?)"
            )
        nxt = np.empty(len(v), dtype=np.int64)
        nxt[:-1] = v[1:]
        valid = np.empty(len(v), dtype=bool)
        valid[:-1] = k[1:] == k[:-1]
        if succ is not None and succ[0] == _kval(k[-1]):
            nxt[-1], valid[-1] = succ[1], True
        else:
            valid[-1] = False
        return b.append_column(out_col, pa.array(nxt, pa.int64(),
                                                 mask=~valid))

    return sorted_ds.map_batches(add_next, batch_format="pyarrow",
                                 batch_size=None)


def keyed_window(ds, key_col: str, value_col: str, uid_col: str,
                 ntile: int = 4):
    """The complete ranking-window family in one two-pass scan:
    ``ROW_NUMBER`` / ``RANK`` / ``DENSE_RANK`` / ``PERCENT_RANK`` /
    ``CUME_DIST`` / ``NTILE(n) OVER (PARTITION BY key ORDER BY value)``
    (row_number/ntile break ties by ``uid_col``, matching a SQL
    ``ORDER BY value, uid`` frame; the rank family is tie-order
    independent).

    Output: input columns + ``rn rnk dnk`` (int64), ``prnk cume``
    (float64: ``(rnk-1)/(n_k-1)`` — 0.0 for single-row keys — and
    ``count(v'<=v)/n_k``), ``nt`` (int64 NTILE bucket: the first
    ``n_k % n`` buckets get the extra row).

    Scale shape — :func:`keyed_rank`'s two passes with a wider summary:
    pass 1 reduces each block to ONE row carrying its FIRST key/run
    sizes as well as its last; the driver's O(#blocks) walk chains
    forward carries AND closes per-key / per-run TOTALS for exactly the
    keys and tie-runs that touch a block boundary (interior keys and
    runs never need driver state); pass 2 is segmented vectorized math
    with dict lookups only for each block's edge key/run.
    """
    import ray

    sorted_ds = ds.sort([key_col, value_col, uid_col]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        ktype = b.column(key_col).type
        kt = pa.string() if pa.types.is_string(ktype) else pa.int64()
        if len(b) == 0:
            return pa.table({
                "bk": pa.array([], kt), "bv": pa.array([], pa.int64()),
                "bu": pa.array([], pa.int64()),
                "n_bk": pa.array([], pa.int64()),
                "n_bkv": pa.array([], pa.int64()),
                "lk": pa.array([], kt), "lv": pa.array([], pa.int64()),
                "n_lk": pa.array([], pa.int64()),
                "n_lkv": pa.array([], pa.int64()),
                "nd_lk": pa.array([], pa.int64()),
            })
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        u = b.column(uid_col).to_numpy(zero_copy_only=False)
        fk_vals = v[k == k[0]]
        lk_vals = v[k == k[-1]]
        return pa.table({
            "bk": _key_arr(k[0], ktype),
            "bv": pa.array([_ident(v[0])], pa.int64()),
            "bu": pa.array([_ident(u[0])], pa.int64()),
            "n_bk": pa.array([len(fk_vals)], pa.int64()),
            "n_bkv": pa.array([int((fk_vals == v[0]).sum())], pa.int64()),
            "lk": _key_arr(k[-1], ktype),
            "lv": pa.array([_ident(v[-1])], pa.int64()),
            "n_lk": pa.array([len(lk_vals)], pa.int64()),
            "n_lkv": pa.array([int((lk_vals == v[-1]).sum())], pa.int64()),
            "nd_lk": pa.array([1 + int((np.diff(lk_vals) != 0).sum())],
                              pa.int64()),
        })

    summ = sorted_ds.map_batches(
        summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # bounded: ONE row per block
    summ = summ.sort_values(["bk", "bv", "bu"],
                            kind="mergesort").reset_index(drop=True)

    carries: dict[tuple, tuple] = {}
    key_totals: dict = {}       # boundary keys -> total rows in key
    run_totals: dict = {}       # boundary (key, value) runs -> total len
    boundary_keys: set = set()
    boundary_runs: set = set()
    open_key, rows, run_val, run_len, distinct = None, 0, None, 0, 0
    for r in summ.itertuples(index=False):
        bk = _kval(r.bk)
        if bk == open_key:
            cont = int(r.bv) == run_val
            carries[(bk, int(r.bv), int(r.bu))] = (
                rows, run_len if cont else 0, distinct, cont)
            boundary_keys.add(bk)
            if cont:
                boundary_runs.add((bk, run_val))
            elif (open_key, run_val) in boundary_runs:
                run_totals[(open_key, run_val)] = run_len
            lk = _kval(r.lk)
            if lk != bk:  # open key closes inside this block
                key_totals[bk] = rows + int(r.n_bk)
                if cont:
                    run_totals[(bk, run_val)] = run_len + int(r.n_bkv)
            elif cont and int(r.nd_lk) > 1:
                # single-key block but the boundary run ends inside it
                run_totals[(bk, run_val)] = run_len + int(r.n_bkv)
        else:
            cont = False
            carries[(bk, int(r.bv), int(r.bu))] = (0, 0, 0, False)
            if open_key in boundary_keys:
                key_totals[open_key] = rows
            if (open_key, run_val) in boundary_runs:
                run_totals[(open_key, run_val)] = run_len
        if _kval(r.lk) == bk and bk == open_key:
            rows += int(r.n_lk)
            distinct += int(r.nd_lk) - (1 if cont else 0)
            run_len = (run_len + int(r.n_lkv)
                       if (cont and int(r.nd_lk) == 1) else int(r.n_lkv))
        else:
            rows, distinct, run_len = int(r.n_lk), int(r.nd_lk), int(r.n_lkv)
        run_val, open_key = int(r.lv), _kval(r.lk)
    if open_key in boundary_keys:
        key_totals[open_key] = rows
    if (open_key, run_val) in boundary_runs:
        run_totals[(open_key, run_val)] = run_len
    state_ref = ray.put((carries, key_totals, run_totals))

    def add_windows(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            out = b
            for c, t in (("rn", pa.int64()), ("rnk", pa.int64()),
                         ("dnk", pa.int64()), ("prnk", pa.float64()),
                         ("cume", pa.float64()), ("nt", pa.int64())):
                out = out.append_column(c, pa.array([], t))
            return out
        cmap, ktot, rtot = ray.get(state_ref)
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        u = b.column(uid_col).to_numpy(zero_copy_only=False)
        try:
            rb, rl, db, cont = cmap[(_kval(k[0]), _ident(v[0]),
                                     _ident(u[0]))]
        except KeyError:
            raise RuntimeError(
                "keyed_window: pass-2 block boundaries diverged from pass 1 "
                "(non-deterministic upstream?)"
            )
        n = len(k)
        key_change = k[1:] != k[:-1]
        run_change = key_change | (v[1:] != v[:-1])
        key_start = np.concatenate([[True], key_change])
        run_start = np.concatenate([[True], run_change])
        key_start_idx = np.flatnonzero(key_start)
        key_id = np.cumsum(key_start) - 1
        key_start_of_row = key_start_idx[key_id]
        run_start_idx = np.flatnonzero(run_start)
        run_id = np.cumsum(run_start) - 1
        run_start_of_row = run_start_idx[run_id]
        idx = np.arange(n)
        rank = (run_start_of_row - key_start_of_row + 1).astype(np.int64)
        dense = (run_id - run_id[key_start_of_row] + 1).astype(np.int64)
        rn = (idx - key_start_of_row + 1).astype(np.int64)
        first_key = k == k[0]
        rank[first_key] += rb
        rn[first_key] += rb
        if cont:
            rank[first_key & (v == v[0])] -= rl
            dense[first_key] += db - 1
        else:
            dense[first_key] += db
        # per-row key totals: local sizes, edge keys overridden from dict
        key_sizes = np.diff(np.concatenate([key_start_idx, [n]]))
        n_k = key_sizes[key_id].astype(np.int64)
        t0 = ktot.get(_kval(k[0]))
        if t0 is not None:
            n_k[first_key] = t0
        last_key = k == k[-1]
        tl = ktot.get(_kval(k[-1]))
        if tl is not None:
            n_k[last_key] = tl
        # per-row tie-run totals: local sizes, edge runs overridden
        run_sizes = np.diff(np.concatenate([run_start_idx, [n]]))
        r_len = run_sizes[run_id].astype(np.int64)
        r0 = rtot.get((_kval(k[0]), _ident(v[0])))
        if r0 is not None:
            r_len[first_key & (v == v[0])] = r0
        rz = rtot.get((_kval(k[-1]), _ident(v[-1])))
        if rz is not None:
            r_len[last_key & (v == v[-1])] = rz
        count_le = rank + r_len - 1
        cume = count_le.astype(np.float64) / n_k.astype(np.float64)
        prnk = np.where(
            n_k > 1,
            (rank - 1).astype(np.float64)
            / np.maximum(n_k - 1, 1).astype(np.float64),
            0.0)
        size = n_k // ntile
        rem = n_k % ntile
        thresh = (size + 1) * rem
        nt = np.where(
            rn <= thresh,
            (rn - 1) // (size + 1) + 1,
            rem + (rn - 1 - thresh) // np.maximum(size, 1) + 1,
        ).astype(np.int64)
        out = b
        for c, arr, t in (("rn", rn, pa.int64()), ("rnk", rank, pa.int64()),
                          ("dnk", dense, pa.int64()),
                          ("prnk", prnk, pa.float64()),
                          ("cume", cume, pa.float64()),
                          ("nt", nt, pa.int64())):
            out = out.append_column(c, pa.array(arr, t))
        return out

    return sorted_ds.map_batches(add_windows, batch_format="pyarrow",
                                 batch_size=None)


_I64_MAX = np.iinfo(np.int64).max
_I64_MIN = np.iinfo(np.int64).min


def keyed_rolling(ds, key_col: str, order_col: str, value_col: str, n: int,
                  prefix: str = "roll"):
    """Moving-frame aggregates ``SUM/COUNT/MIN/MAX(value) OVER
    (PARTITION BY key ORDER BY order ROWS BETWEEN n-1 PRECEDING AND
    CURRENT ROW)`` — exact, integer arithmetic end-to-end.

    Same contract as :func:`keyed_prefix_scan` (unique (key, order)
    pairs).  Scale shape: one range sort materialized once; pass 1
    reduces each block to ONE row whose only payload is the last
    ``min(n-1, rows)`` values of its LAST key (a small list — the only
    state a frame of n rows can ever need across a boundary); the
    driver chains these value tails per open key (O(#blocks x n)
    state) and pass 2 is fully vectorized: running-sum differences for
    sum/count and a sentinel-gapped ``sliding_window_view`` for
    min/max (per-key clamping without any per-key Python).  Intended
    for bounded frames (n <= ~256); for day-long value windows use
    ``stages/windows.py`` sliding aggregates.
    """
    import ray

    if n < 1:
        raise ValueError("frame size n must be >= 1")
    if n > 256:
        raise ValueError(
            "keyed_rolling is for bounded row frames (n <= 256); use the "
            "dense sliding aggregates in stages/windows.py for big windows"
        )

    sorted_ds = ds.sort([key_col, order_col]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        ktype = b.column(key_col).type
        kt = pa.string() if pa.types.is_string(ktype) else pa.int64()
        if len(b) == 0:
            return pa.table({
                "bk": pa.array([], kt), "bo": pa.array([], pa.int64()),
                "lk": pa.array([], kt),
                "tail": pa.array([], pa.list_(pa.int64())),
            })
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        o = b.column(order_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tail = v[k == k[-1]][-(n - 1):] if n > 1 else v[:0]
        return pa.table({
            "bk": _key_arr(k[0], ktype),
            "bo": pa.array([_ident(o[0])], pa.int64()),
            "lk": _key_arr(k[-1], ktype),
            "tail": pa.array([tail.tolist()], pa.list_(pa.int64())),
        })

    summ = sorted_ds.map_batches(
        summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # bounded: ONE row per block
    summ = summ.sort_values(["bk", "bo"], kind="mergesort") \
        .reset_index(drop=True)

    carries: dict[tuple, list] = {}
    open_key, tail = None, []
    for row in summ.itertuples(index=False):
        bk = _kval(row.bk)
        carries[(bk, int(row.bo))] = list(tail) if bk == open_key else []
        blk_tail = list(row.tail)
        if _kval(row.lk) == bk and bk == open_key:
            tail = (tail + blk_tail)[-(n - 1):] if n > 1 else []
        else:
            tail = blk_tail
        open_key = _kval(row.lk)
    carry_ref = ray.put(carries)

    def add_rolling(b: pa.Table) -> pa.Table:
        cols = [f"{prefix}_sum", f"{prefix}_cnt",
                f"{prefix}_min", f"{prefix}_max"]
        if len(b) == 0:
            out = b
            for c in cols:
                out = out.append_column(c, pa.array([], pa.int64()))
            return out
        cmap = ray.get(carry_ref)
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        o = b.column(order_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        try:
            pre = np.asarray(cmap[(_kval(k[0]), _ident(o[0]))],
                             dtype=np.int64)
        except KeyError:
            raise RuntimeError(
                "keyed_rolling: pass-2 block boundaries diverged from "
                "pass 1 (non-deterministic upstream?)"
            )
        p = len(pre)
        m = len(v)
        key_start = np.concatenate([[True], k[1:] != k[:-1]])
        key_start_idx = np.flatnonzero(key_start)
        key_id = np.cumsum(key_start) - 1
        key_start_of_row = key_start_idx[key_id]
        # ext coords: prefix rows (same key as k[0]) occupy [0, p)
        first_key = k == k[0]
        ks_ext = key_start_of_row + p
        ks_ext[first_key] = 0
        i_ext = np.arange(m) + p
        win_lo = np.maximum(ks_ext, i_ext - (n - 1))
        ext_v = np.concatenate([pre, v])
        cs = np.concatenate([[0], np.cumsum(ext_v)])
        roll_sum = (cs[i_ext + 1] - cs[win_lo]).astype(np.int64)
        roll_cnt = (i_ext - win_lo + 1).astype(np.int64)
        # min/max: insert n-1 sentinel gaps between keys so a width-n
        # window can never see another key's values
        ext_kid = np.concatenate([np.zeros(p, np.int64), key_id])
        gpos = np.arange(p + m) + ext_kid * (n - 1)
        glen = (p + m) + (int(key_id[-1]) if m else 0) * (n - 1) + (n - 1)
        if n == 1:
            roll_min = roll_max = v
        else:
            from numpy.lib.stride_tricks import sliding_window_view
            buf_min = np.full(glen, _I64_MAX, np.int64)
            buf_min[gpos + (n - 1)] = ext_v
            roll_min_all = sliding_window_view(buf_min, n).min(axis=1)
            buf_max = np.full(glen, _I64_MIN, np.int64)
            buf_max[gpos + (n - 1)] = ext_v
            roll_max_all = sliding_window_view(buf_max, n).max(axis=1)
            roll_min = roll_min_all[gpos[p:]]
            roll_max = roll_max_all[gpos[p:]]
        out = b
        for c, arr in zip(cols, (roll_sum, roll_cnt, roll_min, roll_max)):
            out = out.append_column(c, pa.array(arr, pa.int64()))
        return out

    return sorted_ds.map_batches(add_rolling, batch_format="pyarrow",
                                 batch_size=None)


def quantile_normalize(ds, *, key_col: str, value_col: str,
                       uid_col: str, n_buckets: int = 16):
    """QUANTILE NORMALIZATION of a per-group integer score onto the
    GLOBAL distribution (the cross-source score-calibration step): a
    row with within-group ROW_NUMBER r of n_g rows (ordered by
    (value, uid) — the exact total order) maps to the global value at
    rank (r·N) // n_g of the pooled (value, uid) order.  All integer:
    the rank arithmetic is one floor-division, the mapped value an
    exact pick.

    Plan: two keyed_window passes (per-group and constant-key global
    ROW_NUMBER — each one range sort + a bounded block-summary walk),
    group sizes broadcast (group-domain-bounded), then ONE bucketed
    join on the computed global rank.  Returns (uid, key, value,
    g_rank, q_value)."""
    import pandas as pd

    from .hashjoin import bucketed_join

    per = keyed_window(ds, key_col, value_col, uid_col)
    sizes = per.map_batches(
        lambda b: pa.Table.from_pandas(pd.DataFrame(
            {key_col: b.column(key_col).to_pandas()})
            .groupby(key_col, as_index=False).size()
            .rename(columns={"size": "_n"}), preserve_index=False)
        .replace_schema_metadata(None),
        batch_format="pyarrow").to_pandas() \
        .groupby(key_col, as_index=False)["_n"].sum()
    n_of = {k: int(v) for k, v in zip(sizes[key_col], sizes["_n"])}
    big_n = int(sizes["_n"].sum())

    def add_idx(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_pandas()
        rn = b.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
        ns = k.map(n_of).to_numpy().astype(np.int64)
        return pa.table({
            uid_col: b.column(uid_col),
            key_col: b.column(key_col),
            value_col: b.column(value_col),
            "g_rank": pa.array((rn * big_n) // ns)})

    left = per.map_batches(add_idx, batch_format="pyarrow")

    glob = keyed_window(
        ds.map_batches(
            lambda b: pa.table({
                "_one": pa.array(np.zeros(len(b), np.int64)),
                value_col: b.column(value_col),
                uid_col: b.column(uid_col)}),
            batch_format="pyarrow"),
        "_one", value_col, uid_col)
    right = glob.map_batches(
        lambda b: pa.table({
            "g_rank": b.column("rn"),
            "q_value": b.column(value_col)}),
        batch_format="pyarrow")

    return bucketed_join(left, right, ["g_rank"], n_buckets=n_buckets)
